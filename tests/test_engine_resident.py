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
