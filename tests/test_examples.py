"""Smoke-run the example scripts (component #23, SURVEY.md §2).

Each example is executed as a real subprocess — same as a user running
``python examples/topk_search.py`` — against a tiny synthetic dataset in a
temp dir (via the reference env vars PQ_VECTOR_SOURCE / PQ_VECTOR_INDEXED /
PQ_VECTOR_QUERY_ROW, examples/common/mod.rs:12-36 in the reference).
"""

import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


@pytest.fixture(scope="module")
def example_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("examples")
    source = tmp / "src.parquet"
    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(300), pa.int64()),
                "title": pa.array([f"row {i}" for i in range(300)]),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        ),
        source,
    )
    env = dict(os.environ)
    env.update(
        PQ_VECTOR_SOURCE=str(source),
        PQ_VECTOR_INDEXED=str(tmp / "indexed.parquet"),
        PQ_VECTOR_QUERY_ROW="7",
        JAX_PLATFORMS="cpu",
    )
    return env


def run_example(name, env):
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, name)],
        env=env,
        cwd=EXAMPLES,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"{name} failed:\n{proc.stdout}\n{proc.stderr}"
    return proc.stdout


def test_build_index_example(example_env):
    out = run_example("build_index.py", example_env)
    assert "indexed copy ready" in out
    assert "has_pq_vector_index=True" in out


def test_topk_search_example(example_env):
    out = run_example("topk_search.py", example_env)
    # Query is row 7 itself, so the nearest neighbor is row 7 at distance 0.
    assert "row=       7  distance=0.0000" in out
    assert "batched ids[0]:" in out


def test_sql_query_example(example_env):
    out = run_example("sql_query.py", example_env)
    assert "vector_topk" in out  # rewrite fired, tree rendered
    assert "row 7" in out  # title column of the top hit


def test_serving_example(example_env):
    out = run_example("serving.py", example_env)
    assert "scan ids[0]:" in out
    assert "loop ids[0]:" in out
    assert "sql ids:" in out
