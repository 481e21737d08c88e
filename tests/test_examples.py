"""Examples stay runnable (mirrors the reference's examples/ as canonical
flows; env vars PQ_VECTOR_SOURCE/INDEXED/QUERY_ROW per common.py)."""

import os
import runpy
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.fixture()
def example_env(tmp_path, monkeypatch):
    source = tmp_path / "src.parquet"
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(300)),
                "title": pa.array([f"t{i}" for i in range(300)]),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        ),
        source,
    )
    monkeypatch.setenv("PQ_VECTOR_SOURCE", str(source))
    monkeypatch.setenv("PQ_VECTOR_INDEXED", str(tmp_path / "indexed.parquet"))
    monkeypatch.setenv("PQ_VECTOR_QUERY_ROW", "7")
    monkeypatch.syspath_prepend(EXAMPLES_DIR)
    # examples import `common`; ensure a fresh module per test env
    sys.modules.pop("common", None)
    return source


def run_example(name):
    runpy.run_path(os.path.join(EXAMPLES_DIR, name), run_name="__main__")


def test_build_index_example(example_env, capsys):
    run_example("build_index.py")
    out = capsys.readouterr().out
    assert "indexed copy ready" in out
    assert "has_pq_vector_index=True" in out


def test_topk_search_example(example_env, capsys):
    run_example("topk_search.py")
    out = capsys.readouterr().out
    assert "row=       7  distance=0.0000" in out


def test_sql_query_example(example_env, capsys):
    run_example("sql_query.py")
    out = capsys.readouterr().out
    assert "vector_topk" in out
    assert "t7" in out
