"""Multi-file table tests: per-file indexes, budget fairness, merged top-k.

The reference engine handles one table = many parquet files (file_groups,
access.rs:178-191); candidates are budgeted round-robin across files
(access.rs:193-243)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.engine import Session, VectorTopKOptions, tree_render


def write_indexed(path, ids, vecs):
    table = pa.table(
        {
            "id": pa.array(ids, pa.int32()),
            "vec": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    pq.write_table(table, path)
    IndexBuilder(path, "vec").n_clusters(2).build_inplace()


def test_two_files_merged_topk(tmp_path):
    # File A holds the nearest vector, file B the second nearest.
    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    write_indexed(a, [0, 1, 2], [[0.0, 0.0], [4.0, 4.0], [8.0, 8.0]])
    write_indexed(b, [10, 11, 12], [[0.1, 0.1], [5.0, 5.0], [9.0, 9.0]])

    session = Session(VectorTopKOptions(nprobe=64))
    session.register_parquet("t", [a, b])
    df = session.sql(
        "SELECT id FROM t ORDER BY array_distance(vec, [0.0, 0.0]) LIMIT 3"
    )
    result = df.collect()
    assert result.column("id").to_pylist() == [0, 10, 1]
    tree = tree_render(df.physical_plan())
    assert "files=2" in tree
    assert "candidate_rows=6" in tree


def test_budget_round_robin_across_files(tmp_path):
    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    rng = np.random.default_rng(0)
    write_indexed(a, list(range(10)), list(rng.normal(0, 1, (10, 2)).astype(np.float32)))
    write_indexed(
        b, list(range(100, 110)), list(rng.normal(0, 1, (10, 2)).astype(np.float32))
    )

    session = Session(VectorTopKOptions(nprobe=64, max_candidates=4))
    session.register_parquet("t", [a, b])
    df = session.sql(
        "SELECT id FROM t ORDER BY array_distance(vec, [0.0, 0.0]) LIMIT 20"
    )
    result = df.collect()
    ids = result.column("id").to_pylist()
    # 4-candidate budget split fairly: 2 rows considered from each file.
    assert len(ids) == 4
    assert sum(1 for i in ids if i < 100) == 2
    assert sum(1 for i in ids if i >= 100) == 2


def test_unindexed_file_among_indexed_fails_cleanly(tmp_path):
    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    write_indexed(a, [0, 1], [[0.0, 0.0], [2.0, 2.0]])
    pq.write_table(
        pa.table({"id": pa.array([9], pa.int32()), "vec": pa.array([[1.0, 1.0]], pa.list_(pa.float32()))}),
        b,
    )
    session = Session(VectorTopKOptions(nprobe=4))
    session.register_parquet("t", [a, b])
    import pytest

    from pqvector_tpu.errors import ExecutionError

    with pytest.raises(ExecutionError, match="Missing pq-vector index metadata"):
        session.sql(
            "SELECT id FROM t ORDER BY array_distance(vec, [0.0, 0.0]) LIMIT 1"
        ).collect()
