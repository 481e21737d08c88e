"""Regression tests for the round-3 ADVICE fixes (engine cache identity,
resident escalation cap, stat-failure sentinel, dist scan chunking)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.engine import exec as exec_mod
from pqvector_tpu.engine.options import VectorTopKOptions
from pqvector_tpu.engine.physical import STAT_FAILED, file_cache_key
from pqvector_tpu.engine.session import Session


def _write(path, n=400, dim=8, seed=5, kmeans_seed=42):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, dim)).astype(np.float32)
    flat = pa.array(x.reshape(-1), pa.float32())
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * dim)
    table = pa.table(
        {
            "id": pa.array(np.arange(n)),
            "vec": pa.ListArray.from_arrays(offsets, flat),
        }
    )
    pq.write_table(table, path, row_group_size=64)
    IndexBuilder(path, "vec").n_clusters(8).seed(kmeans_seed).build_inplace()
    return x


def _query_sql(x, qrow, k=5, where=""):
    q = ", ".join(f"{v:.6f}" for v in x[qrow])
    return (
        f"SELECT id FROM t {where} "
        f"ORDER BY array_distance(vec, [{q}]) LIMIT {k}"
    )


def _ids(session, sql):
    return session.sql(sql).collect().column("id").to_pylist()


def test_index_cache_invalidates_on_same_size_rewrite(tmp_path):
    """A same-size in-place rewrite must not serve a stale decoded index
    (ADVICE r2: cache was keyed by (path, file_size) only)."""
    path = str(tmp_path / "a.parquet")
    other = str(tmp_path / "b.parquet")
    x = _write(path, kmeans_seed=42)
    _write(other, kmeans_seed=123)  # same data, different k-means seed
    assert os.path.getsize(path) == os.path.getsize(other), (
        "fixture requires equal file sizes for the regression to bite"
    )

    s = Session(VectorTopKOptions(nprobe=2))
    s.register_parquet("t", path)
    sql = _query_sql(x, 17, k=5)
    _ids(s, sql)  # populates the session index cache
    cached_keys = list(s._index_cache)
    assert cached_keys and all(len(k) == 3 for k in cached_keys), (
        "index cache key must carry the (size, mtime) identity"
    )

    # Same-size replacement with a differently-seeded index.
    os.replace(other, path)
    # os.replace preserves the source mtime which differs from the original.
    _ids(s, sql)
    new_keys = set(s._index_cache) - set(cached_keys)
    assert new_keys, "rewrite with equal size must miss the index cache"


def test_resident_escalation_cap_falls_back_to_host(tmp_path, monkeypatch):
    """When the filter is so selective that escalation passes the cap, the
    resident path must yield to the host path, not keep growing k."""
    path = str(tmp_path / "c.parquet")
    x = _write(path)

    host = Session(VectorTopKOptions(nprobe=8))
    host.register_parquet("t", path)
    sql = _query_sql(x, 50, k=5, where="WHERE id < 2")
    ids_host = _ids(host, sql)

    monkeypatch.setattr(exec_mod, "RESIDENT_K_CAP", 8)
    res = Session(VectorTopKOptions(nprobe=8))
    res.register_parquet("t", path)
    res.device_searcher("t")
    df = res.sql(sql)
    ids_res = df.collect().column("id").to_pylist()
    assert ids_res == ids_host

    plan = df.physical_plan()
    nodes = []

    def visit(node):
        nodes.append(node)
        for c in node.children():
            visit(c)

    visit(plan)
    topk = [n for n in nodes if n.name == "VectorTopKExec"][0]
    # The capped resident attempt must NOT have served the candidates.
    assert topk._resident_candidates.value == 0


def test_stat_failure_sentinel_never_matches(tmp_path, monkeypatch):
    """Two failed stats say nothing about freshness: when stat fails on
    both sides the resident searcher must be rejected, not trusted."""
    assert file_cache_key(str(tmp_path / "missing.parquet")) == STAT_FAILED

    path = str(tmp_path / "d.parquet")
    x = _write(path)
    s = Session(VectorTopKOptions(nprobe=8))
    s.register_parquet("t", path)
    searcher = s.device_searcher("t")
    searcher.source_key = STAT_FAILED  # simulate from_parquet stat failure

    import pqvector_tpu.engine.physical as physical_mod

    real_key = file_cache_key

    def failing_key(p):
        if os.fspath(p) == path:
            return STAT_FAILED
        return real_key(p)

    monkeypatch.setattr(physical_mod, "file_cache_key", failing_key)
    monkeypatch.setattr(exec_mod, "file_cache_key", failing_key)

    sql = _query_sql(x, 17, k=5)
    df = s.sql(sql)
    ids = df.collect().column("id").to_pylist()

    plan = df.physical_plan()
    nodes = []

    def visit(node):
        nodes.append(node)
        for c in node.children():
            visit(c)

    visit(plan)
    topk = [n for n in nodes if n.name == "VectorTopKExec"][0]
    assert topk._resident_candidates.value == 0, (
        "STAT_FAILED == STAT_FAILED must not validate the resident searcher"
    )
    monkeypatch.undo()
    host = Session(VectorTopKOptions(nprobe=8))
    host.register_parquet("t", path)
    assert ids == _ids(host, sql)


def test_dist_scan_chunk_shrinks_for_large_k():
    """k > 32 on cluster-sorted shards must use 64k score chunks (mirrors
    DeviceIvfSearcher._approx_chunk; PartialReduce bin-collision recall)."""
    import inspect

    from pqvector_tpu.dist import search as dist_search

    src = inspect.getsource(dist_search.DistributedIvfSearcher._scan_body)
    assert "65536 if k > 32" in src
