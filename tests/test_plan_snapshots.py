"""Plan-tree snapshot tests (insta analog, SURVEY.md §4).

The reference pins both the rewrite structure and the I/O counters in
``.snap`` files (/root/reference/src/df_vector/snapshots/). Same approach:
render the tree (with metric values) after execution and compare against a
committed snapshot; set ``PQVECTOR_TPU_UPDATE_SNAPSHOTS=1`` to regenerate.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.engine import Session, VectorTopKOptions, tree_render

SNAPSHOT_DIR = os.path.join(os.path.dirname(__file__), "snapshots")

VECS = [
    [0.0, 0.0],
    [1.0, 0.0],
    [0.0, 2.0],
    [5.0, 5.0],
    [2.0, 2.0],
    [0.1, 0.1],
]


def assert_snapshot(name: str, rendered: str):
    os.makedirs(SNAPSHOT_DIR, exist_ok=True)
    path = os.path.join(SNAPSHOT_DIR, name + ".snap")
    if os.environ.get("PQVECTOR_TPU_UPDATE_SNAPSHOTS") or not os.path.exists(path):
        with open(path, "w") as f:
            f.write(rendered)
        if not os.environ.get("PQVECTOR_TPU_UPDATE_SNAPSHOTS"):
            pytest.skip(f"snapshot {name} created; rerun to assert")
    expected = open(path).read()
    assert rendered == expected, f"snapshot {name} drifted:\n{rendered}"


def _run(tmp_path, sql_suffix, options):
    path = tmp_path / "data.parquet"
    table = pa.table(
        {
            "id": pa.array(range(len(VECS)), pa.int32()),
            "vec": pa.array(VECS, pa.list_(pa.float32())),
        }
    )
    pq.write_table(table, path)
    IndexBuilder(path, "vec").n_clusters(2).build_inplace()
    session = Session(options)
    session.register_parquet("t", path)
    df = session.sql(f"SELECT id FROM t {sql_suffix}")
    df.collect()
    return tree_render(df.physical_plan())


def test_vector_topk_plan_tree(tmp_path):
    tree = _run(
        tmp_path,
        "WHERE id >= 2 ORDER BY array_distance(vec, [0.0, 0.0]) LIMIT 2",
        VectorTopKOptions(nprobe=64),
    )
    assert_snapshot("vector_topk_filter_plan_tree", tree)


def test_vector_topk_plain_tree(tmp_path):
    tree = _run(
        tmp_path,
        "ORDER BY array_distance(vec, [0.0, 0.0]) LIMIT 2",
        VectorTopKOptions(nprobe=64, max_candidates=2048),
    )
    assert_snapshot("vector_topk_plan_tree", tree)
