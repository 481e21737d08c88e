"""SQL engine resident fast path: device-served candidates must EQUAL the
host path (probe -> candidate pages -> filter -> top-k) in every case."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.engine.options import VectorTopKOptions
from pqvector_tpu.engine.session import Session


def _write(path, n=400, dim=8, seed=5):
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
    IndexBuilder(path, "vec").n_clusters(8).build_inplace()
    return x


@pytest.fixture(scope="module")
def indexed(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("resident") / "data.parquet")
    x = _write(path)
    return path, x


def _query_sql(x, qrow, k=5, where=""):
    q = ", ".join(f"{v:.6f}" for v in x[qrow])
    return (
        f"SELECT id FROM t {where} "
        f"ORDER BY array_distance(vec, [{q}]) LIMIT {k}"
    )


def _run(session, sql):
    df = session.sql(sql)
    table = df.collect()
    return table.column("id").to_pylist(), df


@pytest.mark.parametrize("where", ["", "WHERE id >= 200", "WHERE id < 3"])
def test_resident_matches_host(indexed, where):
    path, x = indexed
    host = Session(VectorTopKOptions(nprobe=3))
    host.register_parquet("t", path)
    res = Session(VectorTopKOptions(nprobe=3))
    res.register_parquet("t", path)
    res.device_searcher("t")  # cache -> resident path active

    sql = _query_sql(x, 17, k=5, where=where)
    ids_host, _ = _run(host, sql)
    ids_res, _ = _run(res, sql)
    assert ids_res == ids_host


def test_resident_metric_counts(indexed):
    path, x = indexed
    s = Session(VectorTopKOptions(nprobe=3))
    s.register_parquet("t", path)
    s.device_searcher("t")
    df = s.sql(_query_sql(x, 3, k=4))
    df.collect()
    plan = df.physical_plan()
    found = []

    def visit(node):
        found.append(node)
        for c in node.children():
            visit(c)

    visit(plan)
    topk = [n for n in found if n.name == "VectorTopKExec"]
    assert topk, "rewrite did not fire"
    assert topk[0]._resident_candidates.value > 0


def test_max_candidates_disables_resident(indexed):
    path, x = indexed
    s = Session(VectorTopKOptions(nprobe=3, max_candidates=50))
    s.register_parquet("t", path)
    s.device_searcher("t")
    df = s.sql(_query_sql(x, 9, k=4))
    df.collect()
    plan = df.physical_plan()
    nodes = []

    def visit(node):
        nodes.append(node)
        for c in node.children():
            visit(c)

    visit(plan)
    topk = [n for n in nodes if n.name == "VectorTopKExec"][0]
    assert topk._resident_candidates.value == 0

    # And results still match a host session with the same budget.
    host = Session(VectorTopKOptions(nprobe=3, max_candidates=50))
    host.register_parquet("t", path)
    ids_host, _ = _run(host, _query_sql(x, 9, k=4))
    ids_res, _ = _run(s, _query_sql(x, 9, k=4))
    assert ids_res == ids_host


def test_filter_escalation_reaches_exhaustion(indexed):
    """A filter that keeps only a handful of rows forces the escalation loop
    all the way to the probed set; results must equal the host path."""
    path, x = indexed
    host = Session(VectorTopKOptions(nprobe=8))
    host.register_parquet("t", path)
    res = Session(VectorTopKOptions(nprobe=8))
    res.register_parquet("t", path)
    res.device_searcher("t")
    sql = _query_sql(x, 50, k=5, where="WHERE id < 2")
    ids_host, _ = _run(host, sql)
    ids_res, _ = _run(res, sql)
    assert ids_res == ids_host
    assert len(ids_res) <= 2


# ----------------------------------------------------------------------
# Multi-file resident serving: per-file device top-k sets merged by
# distance must EQUAL the host path's union semantics.
# ----------------------------------------------------------------------


@pytest.fixture(scope="module")
def indexed_pair(tmp_path_factory):
    root = tmp_path_factory.mktemp("resident_multi")
    import pyarrow as _pa

    rng = np.random.default_rng(9)
    paths, xs = [], []
    for i, n in enumerate((300, 200)):
        x = rng.standard_normal((n, 8)).astype(np.float32)
        flat = _pa.array(x.reshape(-1), _pa.float32())
        offsets = _pa.array(np.arange(n + 1, dtype=np.int32) * 8)
        table = _pa.table(
            {
                "id": _pa.array(np.arange(n) + 1000 * i),
                "vec": _pa.ListArray.from_arrays(offsets, flat),
            }
        )
        p = str(root / f"f{i}.parquet")
        pq.write_table(table, p, row_group_size=64)
        IndexBuilder(p, "vec").n_clusters(6).build_inplace()
        paths.append(p)
        xs.append(x)
    return paths, xs


@pytest.mark.parametrize(
    "where", ["", "WHERE id >= 1000", "WHERE id < 3 OR id >= 1150"]
)
def test_multifile_resident_matches_host(indexed_pair, where):
    paths, xs = indexed_pair
    q = xs[1][7]  # nearest neighbors live in file 1
    qs = ", ".join(f"{v:.6f}" for v in q)
    sql = (
        f"SELECT id FROM t {where} "
        f"ORDER BY array_distance(vec, [{qs}]) LIMIT 6"
    )
    host = Session(VectorTopKOptions(nprobe=4))
    host.register_parquet("t", paths)
    res = Session(VectorTopKOptions(nprobe=4))
    res.register_parquet("t", paths)
    searchers = res.device_searcher("t")
    assert isinstance(searchers, list) and len(searchers) == 2
    ids_host, _ = _run(host, sql)
    ids_res, df = _run(res, sql)
    assert ids_res == ids_host
    # The resident path actually served it (device counter non-zero).
    plan = df.physical_plan()

    def find(node):
        if node.name == "VectorTopKExec":
            return node
        for c in node.children():
            got = find(c)
            if got is not None:
                return got
        return None

    topk = find(plan)
    assert topk is not None
    assert topk.metrics.value("resident_candidates") > 0


def test_multifile_resident_partial_searchers_fall_back(indexed_pair):
    """Only one of two files resident -> host path (results still equal)."""
    paths, xs = indexed_pair
    q = xs[0][0]
    qs = ", ".join(f"{v:.6f}" for v in q)
    sql = f"SELECT id FROM t ORDER BY array_distance(vec, [{qs}]) LIMIT 5"
    host = Session(VectorTopKOptions(nprobe=4))
    host.register_parquet("t", paths)
    res = Session(VectorTopKOptions(nprobe=4))
    res.register_parquet("t", paths)
    res.register_parquet("t0", paths[0])
    res.device_searcher("t0")  # resident entry for file 0 only
    ids_host, _ = _run(host, sql)
    ids_res, df = _run(res, sql)
    assert ids_res == ids_host

    plan = df.physical_plan()

    def find(node):
        if node.name == "VectorTopKExec":
            return node
        for c in node.children():
            got = find(c)
            if got is not None:
                return got
        return None

    assert find(plan).metrics.value("resident_candidates") == 0


def test_resident_spilled_lifts_recall(indexed):
    """A spilled resident searcher (Session.device_searcher(spill=...))
    intentionally DIVERGES from the host path: its probe recall is at
    least the host's at the same nprobe (boundary rows are reachable via
    their runner-up cluster). Results carry original ids, no duplicates
    from the replicated rows, and respect the WHERE filter."""
    path, x = indexed
    host = Session(VectorTopKOptions(nprobe=3))
    host.register_parquet("t", path)
    res = Session(VectorTopKOptions(nprobe=3))
    res.register_parquet("t", path)
    searcher = res.device_searcher("t", spill=0.3)
    assert searcher._spill_dups

    d2 = np.sum((x - x[23]) ** 2, axis=1)
    for where, mask in (("", np.ones(len(x), bool)),
                        ("WHERE id >= 200", np.arange(len(x)) >= 200)):
        truth = set(np.flatnonzero(mask)[
            np.argsort(d2[mask], kind="stable")[:5]
        ].tolist())
        sql = _query_sql(x, 23, k=5, where=where)
        ids_host, _ = _run(host, sql)
        ids_res, _ = _run(res, sql)
        assert len(set(ids_res)) == len(ids_res) == 5
        assert all((i >= 200) for i in ids_res) or where == ""
        assert len(set(ids_res) & truth) >= len(set(ids_host) & truth)


@pytest.mark.parametrize("where", ["", "WHERE id >= 200"])
def test_bf16_resident_with_reference_matches_host(indexed, where):
    """bf16 storage + the f32 re-score reference is f32-exact over the
    probed set, so the parity guard admits it (half the residency);
    results must equal the host path exactly."""
    import jax.numpy as jnp

    path, x = indexed
    host = Session(VectorTopKOptions(nprobe=3))
    host.register_parquet("t", path)
    res = Session(VectorTopKOptions(nprobe=3))
    res.register_parquet("t", path)
    s = res.device_searcher("t", dtype=jnp.bfloat16)
    assert s._emb_ref is not None  # default rescore_dtype="auto"

    sql = _query_sql(x, 17, k=5, where=where)
    ids_host, _ = _run(host, sql)
    ids_res, df = _run(res, sql)
    assert ids_res == ids_host
    plan = df.physical_plan()
    found = []

    def visit(node):
        found.append(node)
        for c in node.children():
            visit(c)

    visit(plan)
    topk = [n for n in found if n.name == "VectorTopKExec"]
    assert topk and topk[0]._resident_candidates.value > 0  # really resident


def test_bf16_resident_without_reference_falls_back(indexed):
    """Opt-out control: a bf16 searcher with rescore_dtype=None stays
    storage-bounded and the parity guard must reject it (host path)."""
    import jax.numpy as jnp

    path, x = indexed
    s = Session(VectorTopKOptions(nprobe=3))
    s.register_parquet("t", path)
    s.device_searcher("t", dtype=jnp.bfloat16, rescore_dtype=None)
    df = s.sql(_query_sql(x, 3, k=4))
    df.collect()
    plan = df.physical_plan()
    found = []

    def visit(node):
        found.append(node)
        for c in node.children():
            visit(c)

    visit(plan)
    topk = [n for n in found if n.name == "VectorTopKExec"]
    assert topk
    assert topk[0]._resident_candidates.value == 0  # fell back to host
