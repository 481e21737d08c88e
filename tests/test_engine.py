"""SQL engine end-to-end tests.

Mirrors the reference integration suite (/root/reference/src/df_vector/tests.rs):
(a) exact result ids [5, 2] for the 6-row fixture with WHERE id >= 2
    (tests.rs:16-104),
(b) filter-after-candidate-pruning semantics -> [3, 4] (tests.rs:151-241),
plus plan-shape pins, metric counts, and rewrite safety conditions.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.engine import (
    Session,
    VectorTopKExec,
    VectorTopKOptions,
    tree_render,
)
from pqvector_tpu.engine.physical import GlobalLimitExec, ProjectionExec, SortExec

END_TO_END_VECS = [
    [0.0, 0.0],
    [1.0, 0.0],
    [0.0, 2.0],
    [5.0, 5.0],
    [2.0, 2.0],
    [0.1, 0.1],
]

FILTER_VECS = [
    [0.0, 0.0],
    [0.05, 0.05],
    [0.2, 0.2],
    [1.0, 1.0],
    [1.1, 1.1],
    [1.4, 1.4],
]


def make_indexed(tmp_path, vecs, name="data.parquet"):
    path = tmp_path / name
    table = pa.table(
        {
            "id": pa.array(range(len(vecs)), pa.int32()),
            "vec": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    pq.write_table(table, path)
    IndexBuilder(path, "vec").n_clusters(2).build_inplace()
    return path


def find_topk(plan):
    if isinstance(plan, VectorTopKExec):
        return plan
    for child in plan.children():
        found = find_topk(child)
        if found is not None:
            return found
    return None


def test_vector_topk_end_to_end(tmp_path):
    path = make_indexed(tmp_path, END_TO_END_VECS)
    session = Session(VectorTopKOptions(nprobe=64))
    session.register_parquet("t", path)

    df = session.sql(
        "SELECT id, vec FROM t WHERE id >= 2 "
        "ORDER BY array_distance(vec, [0.0, 0.0]) LIMIT 2"
    )
    plan = df.physical_plan()
    assert find_topk(plan) is not None, "rewrite must fire"
    result = df.collect()
    assert result.column("id").to_pylist() == [5, 2]

    tree = tree_render(plan)
    assert "vector_topk" in tree
    assert "candidate_rows=6" in tree
    # Filter ran in the scan child: only rows with id >= 2 were fetched.
    assert "embeddings_fetched=4" in tree


def test_filters_apply_after_candidate_pruning(tmp_path):
    path = make_indexed(tmp_path, FILTER_VECS)
    session = Session(VectorTopKOptions(nprobe=64))
    session.register_parquet("t", path)

    df = session.sql(
        "SELECT id FROM t WHERE id >= 3 "
        "ORDER BY array_distance(vec, [0.0, 0.0]) LIMIT 2"
    )
    result = df.collect()
    # Nearest rows (0, 1, 2) fail the predicate; the answer must be [3, 4]
    # (tests.rs:235).
    assert result.column("id").to_pylist() == [3, 4]
    tree = tree_render(df.physical_plan())
    assert "candidate_rows=6" in tree
    assert "embeddings_fetched=3" in tree


def test_unindexed_session_matches(tmp_path):
    path = make_indexed(tmp_path, END_TO_END_VECS)
    plain = Session(enable_vector_topk=False)
    plain.register_parquet("t", path)
    df = plain.sql(
        "SELECT id FROM t WHERE id >= 2 "
        "ORDER BY array_distance(vec, [0.0, 0.0]) LIMIT 2"
    )
    assert find_topk(df.physical_plan()) is None
    assert df.collect().column("id").to_pylist() == [5, 2]


def test_no_rewrite_on_desc(tmp_path):
    path = make_indexed(tmp_path, END_TO_END_VECS)
    session = Session(VectorTopKOptions(nprobe=64))
    session.register_parquet("t", path)
    df = session.sql(
        "SELECT id FROM t ORDER BY array_distance(vec, [0.0, 0.0]) DESC LIMIT 2"
    )
    assert find_topk(df.physical_plan()) is None
    # Still executes correctly (farthest rows first).
    assert df.collect().column("id").to_pylist() == [3, 4]


def test_no_rewrite_on_offset(tmp_path):
    path = make_indexed(tmp_path, END_TO_END_VECS)
    session = Session(VectorTopKOptions(nprobe=64))
    session.register_parquet("t", path)
    df = session.sql(
        "SELECT id FROM t ORDER BY array_distance(vec, [0.0, 0.0]) LIMIT 2 OFFSET 1"
    )
    assert find_topk(df.physical_plan()) is None
    assert df.collect().column("id").to_pylist() == [5, 1]


def test_no_rewrite_without_index_column_match(tmp_path):
    """Engine-level failure when the index column differs from the queried
    column (index_exec.rs:123-129)."""
    path = make_indexed(tmp_path, END_TO_END_VECS)
    session = Session(VectorTopKOptions(nprobe=64))
    session.register_parquet("t", path)
    # 'vec2' is not in the schema at all -> planner error.
    from pqvector_tpu.errors import PlanError

    with pytest.raises(PlanError, match="not found"):
        session.sql(
            "SELECT id FROM t ORDER BY array_distance(vec2, [0.0, 0.0]) LIMIT 1"
        ).collect()


def test_no_rewrite_on_plain_column_sort(tmp_path):
    path = make_indexed(tmp_path, END_TO_END_VECS)
    session = Session(VectorTopKOptions(nprobe=64))
    session.register_parquet("t", path)
    df = session.sql("SELECT id FROM t ORDER BY id DESC LIMIT 3")
    assert find_topk(df.physical_plan()) is None
    assert df.collect().column("id").to_pylist() == [5, 4, 3]


def test_rewrite_fires_with_cast_wrappers(tmp_path):
    path = make_indexed(tmp_path, END_TO_END_VECS)
    session = Session(VectorTopKOptions(nprobe=64))
    session.register_parquet("t", path)
    df = session.sql(
        "SELECT id FROM t ORDER BY CAST(array_distance(vec, [0.0, 0.0]) AS float) LIMIT 2"
    )
    assert find_topk(df.physical_plan()) is not None
    assert df.collect().column("id").to_pylist() == [0, 5]


def test_max_candidates_budget(tmp_path):
    path = make_indexed(tmp_path, END_TO_END_VECS)
    session = Session(VectorTopKOptions(nprobe=64, max_candidates=3))
    session.register_parquet("t", path)
    df = session.sql(
        "SELECT id FROM t ORDER BY array_distance(vec, [0.0, 0.0]) LIMIT 6"
    )
    result = df.collect()
    assert result.num_rows == 3
    tree = tree_render(df.physical_plan())
    assert "max_candidates=3" in tree
    assert "embeddings_fetched=3" in tree


def test_query_vector_reorderable(tmp_path):
    """array_distance([..], col) — literal first — still rewrites
    (physical.rs:206-212)."""
    path = make_indexed(tmp_path, END_TO_END_VECS)
    session = Session(VectorTopKOptions(nprobe=64))
    session.register_parquet("t", path)
    df = session.sql(
        "SELECT id FROM t ORDER BY array_distance([0.0, 0.0], vec) LIMIT 1"
    )
    assert find_topk(df.physical_plan()) is not None
    assert df.collect().column("id").to_pylist() == [0]


def test_projection_star(tmp_path):
    path = make_indexed(tmp_path, END_TO_END_VECS)
    session = Session(VectorTopKOptions(nprobe=64))
    session.register_parquet("t", path)
    result = session.sql(
        "SELECT * FROM t ORDER BY array_distance(vec, [0.0, 0.0]) LIMIT 1"
    ).collect()
    assert result.column_names == ["id", "vec"]
    assert result.column("id").to_pylist() == [0]


def test_plan_shape_snapshot(tmp_path):
    """Pin the rewritten plan structure (the reference snapshot-tests its
    TreeRender, tests.rs:101-103)."""
    path = make_indexed(tmp_path, END_TO_END_VECS)
    session = Session(VectorTopKOptions(nprobe=64))
    session.register_parquet("t", path)
    df = session.sql(
        "SELECT id FROM t WHERE id >= 2 "
        "ORDER BY array_distance(vec, [0.0, 0.0]) LIMIT 2"
    )
    plan = df.physical_plan()
    assert isinstance(plan, ProjectionExec)
    topk = plan.input
    assert isinstance(topk, VectorTopKExec)
    from pqvector_tpu.engine.index_exec import VectorIndexScanExec
    from pqvector_tpu.engine.physical import FilterExec, ParquetScanExec

    index_child, scan_child = topk.children()
    assert isinstance(index_child, VectorIndexScanExec)
    assert isinstance(scan_child, FilterExec)
    assert isinstance(scan_child.input, ParquetScanExec)


def test_sql_distance_values_are_euclidean(tmp_path):
    """Projected array_distance values use sqrt (DataFusion semantics) while
    the TopK operator orders by squared distance internally."""
    path = make_indexed(tmp_path, END_TO_END_VECS)
    session = Session(enable_vector_topk=False)
    session.register_parquet("t", path)
    result = session.sql(
        "SELECT id, array_distance(vec, [0.0, 0.0]) AS d FROM t ORDER BY d LIMIT 2"
    ).collect()
    np.testing.assert_allclose(
        result.column("d").to_pylist(), [0.0, np.sqrt(0.02)], atol=1e-6
    )
