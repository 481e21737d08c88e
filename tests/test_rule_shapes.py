"""Rewrite-rule shape coverage: all four reference plan shapes
(/root/reference/src/df_vector/physical.rs:37-88), built manually since the
single-partition planner only emits two of them naturally."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.engine import (
    Session,
    VectorTopKExec,
    VectorTopKOptions,
    VectorTopKPhysicalOptimizerRule,
)
from pqvector_tpu.engine.access import ScanFile
from pqvector_tpu.engine.expr import Column, Literal, ScalarFunction
from pqvector_tpu.engine.physical import (
    GlobalLimitExec,
    LocalLimitExec,
    ParquetScanExec,
    SortExec,
    SortExpr,
    SortPreservingMergeExec,
)


@pytest.fixture()
def scan(tmp_path):
    path = tmp_path / "d.parquet"
    vecs = [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [3.0, 3.0]]
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(4), pa.int32()),
                "vec": pa.array(vecs, pa.list_(pa.float32())),
            }
        ),
        path,
    )
    IndexBuilder(path, "vec").n_clusters(2).build_inplace()
    import os

    schema = pq.ParquetFile(path).schema_arrow
    return ParquetScanExec(
        [ScanFile(str(path), os.path.getsize(path))], schema
    )


def sort_expr():
    return SortExpr(
        ScalarFunction("array_distance", (Column("vec"), Literal([0.0, 0.0])))
    )


RULE = VectorTopKPhysicalOptimizerRule(VectorTopKOptions(nprobe=4))


def rewrites_to_topk(plan):
    out = RULE.optimize(plan)
    return isinstance(out, VectorTopKExec), out


def test_shape_global_limit_sort(scan):
    plan = GlobalLimitExec(SortExec([sort_expr()], scan, fetch=2), skip=0, fetch=2)
    ok, out = rewrites_to_topk(plan)
    assert ok and out.k == 2


def test_shape_global_limit_with_skip_not_rewritten(scan):
    plan = GlobalLimitExec(SortExec([sort_expr()], scan, fetch=3), skip=1, fetch=2)
    ok, _ = rewrites_to_topk(plan)
    assert not ok


def test_shape_local_limit_sort(scan):
    plan = LocalLimitExec(SortExec([sort_expr()], scan), fetch=3)
    ok, out = rewrites_to_topk(plan)
    assert ok and out.k == 3


def test_shape_bare_sort_with_fetch(scan):
    plan = SortExec([sort_expr()], scan, fetch=2)
    ok, out = rewrites_to_topk(plan)
    assert ok and out.k == 2


def test_shape_bare_sort_without_fetch_not_rewritten(scan):
    plan = SortExec([sort_expr()], scan)
    ok, _ = rewrites_to_topk(plan)
    assert not ok


def test_shape_merge_over_partitioned_sort(scan):
    sort = SortExec([sort_expr()], scan, fetch=2, preserve_partitioning=True)
    plan = SortPreservingMergeExec([sort_expr()], sort, fetch=2)
    ok, out = rewrites_to_topk(plan)
    assert ok and out.k == 2


def test_shape_merge_mismatched_exprs_not_rewritten(scan):
    sort = SortExec([sort_expr()], scan, fetch=2, preserve_partitioning=True)
    plan = SortPreservingMergeExec([SortExpr(Column("id"))], sort, fetch=2)
    ok, _ = rewrites_to_topk(plan)
    assert not ok


def test_shape_partitioned_sort_without_merge_not_rewritten(scan):
    # preserve_partitioning blocks the non-merge paths (physical.rs:120-123).
    plan = GlobalLimitExec(
        SortExec([sort_expr()], scan, fetch=2, preserve_partitioning=True),
        skip=0,
        fetch=2,
    )
    ok, _ = rewrites_to_topk(plan)
    assert not ok


def test_k_is_min_of_fetches(scan):
    plan = GlobalLimitExec(SortExec([sort_expr()], scan, fetch=5), skip=0, fetch=3)
    ok, out = rewrites_to_topk(plan)
    assert ok and out.k == 3
    plan = LocalLimitExec(SortExec([sort_expr()], scan, fetch=2), fetch=9)
    ok, out = rewrites_to_topk(plan)
    assert ok and out.k == 2


def test_descending_not_rewritten(scan):
    desc = SortExpr(
        ScalarFunction("array_distance", (Column("vec"), Literal([0.0, 0.0]))),
        descending=True,
    )
    plan = GlobalLimitExec(SortExec([desc], scan, fetch=2), skip=0, fetch=2)
    ok, _ = rewrites_to_topk(plan)
    assert not ok


def test_executes_after_manual_rewrite(scan):
    plan = GlobalLimitExec(SortExec([sort_expr()], scan, fetch=2), skip=0, fetch=2)
    _, out = rewrites_to_topk(plan)
    from pqvector_tpu.engine.physical import TaskContext

    table = out.execute(TaskContext())
    assert table.column("id").to_pylist() == [0, 1]
