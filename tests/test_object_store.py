"""Object-store seam tests: the index scan works against non-filesystem
stores (the reference reads footers/payloads through DataFusion's
object_store so remote files work, index_exec.rs:93-143)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.engine import VectorTopKOptions
from pqvector_tpu.engine.access import ScanFile
from pqvector_tpu.engine.index_exec import VectorIndexScanExec
from pqvector_tpu.engine.object_store import MemoryStore
from pqvector_tpu.engine.physical import TaskContext
from pqvector_tpu.errors import ExecutionError


@pytest.fixture()
def mem_setup(tmp_path):
    path = tmp_path / "x.parquet"
    vecs = [
        [0.0, 0.0],
        [50.0, 50.0],
        [0.1, 0.1],
        [50.1, 50.1],
        [0.2, 0.0],
        [50.0, 50.2],
    ]
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(6), pa.int32()),
                "vec": pa.array(vecs, pa.list_(pa.float32())),
            }
        ),
        path,
    )
    IndexBuilder(path, "vec").n_clusters(2).build_inplace()
    blob = path.read_bytes()
    store = MemoryStore({"mem://bucket/x.parquet": blob})
    return store, len(blob)


def test_index_scan_through_memory_store(mem_setup):
    store, size = mem_setup
    scan = VectorIndexScanExec(
        [ScanFile("mem://bucket/x.parquet", size)],
        "vec",
        np.array([0.0, 0.0], np.float32),
        VectorTopKOptions(nprobe=1),
    )
    batch = scan.execute(TaskContext(object_store=store))
    rows = sorted(batch.column("pq_vector_row_id").to_pylist())
    assert rows == [0, 2, 4]  # the near blob only
    assert scan.metrics.value("files_scanned") == 1
    assert scan.metrics.value("candidate_rows") == 3


def test_index_scan_column_mismatch_through_store(mem_setup):
    store, size = mem_setup
    scan = VectorIndexScanExec(
        [ScanFile("mem://bucket/x.parquet", size)],
        "other_col",
        np.array([0.0, 0.0], np.float32),
        VectorTopKOptions(nprobe=1),
    )
    with pytest.raises(ExecutionError, match="column mismatch"):
        scan.execute(TaskContext(object_store=store))


def test_missing_object(mem_setup):
    store, _ = mem_setup
    scan = VectorIndexScanExec(
        [ScanFile("mem://bucket/nope.parquet", 100)],
        "vec",
        np.array([0.0, 0.0], np.float32),
        VectorTopKOptions(nprobe=1),
    )
    with pytest.raises(ExecutionError):
        scan.execute(TaskContext(object_store=store))


@pytest.fixture()
def mem_sql_setup(tmp_path):
    """A bigger indexed file (several row groups, build_new page layout)
    loaded into a MemoryStore only — no file exists at the virtual path."""
    rng = np.random.default_rng(3)
    n, dim = 600, 8
    x = rng.standard_normal((n, dim)).astype(np.float32)
    src = tmp_path / "src.parquet"
    out = tmp_path / "indexed.parquet"
    pq.write_table(
        pa.table(
            {
                "id": pa.array(np.arange(n), pa.int64()),
                "vec": pa.array(list(x), pa.list_(pa.float32())),
            }
        ),
        src,
        row_group_size=128,
    )
    IndexBuilder(src, "vec").n_clusters(8).build_new(out)
    blob = out.read_bytes()
    store = MemoryStore({"mem://bucket/t.parquet": blob})
    return store, out, x


def _sql_ids(session, x, qrow, where=""):
    q = ", ".join(f"{v:.6f}" for v in x[qrow])
    sql = (
        f"SELECT id FROM t {where} "
        f"ORDER BY array_distance(vec, [{q}]) LIMIT 5"
    )
    return session.sql(sql).collect().column("id").to_pylist()


def test_full_sql_through_memory_store(mem_sql_setup):
    """End-to-end SQL top-k against a MemoryStore: index probe, row-count
    metadata, and candidate page reads all through the store seam — and
    results equal the same query served from the local file."""
    from pqvector_tpu.engine.session import Session

    store, local_path, x = mem_sql_setup
    mem = Session(VectorTopKOptions(nprobe=3), object_store=store)
    mem.register_parquet("t", "mem://bucket/t.parquet")
    local = Session(VectorTopKOptions(nprobe=3))
    local.register_parquet("t", str(local_path))

    for where in ("", "WHERE id >= 100", "WHERE id < 50"):
        assert _sql_ids(mem, x, 11, where) == _sql_ids(local, x, 11, where)


def test_memory_store_sql_reads_pages_not_files(mem_sql_setup, monkeypatch):
    """The MemoryStore query path must never open a local file: every byte
    must come through the store."""
    import builtins

    from pqvector_tpu.engine.session import Session

    store, _, x = mem_sql_setup
    s = Session(VectorTopKOptions(nprobe=3), object_store=store)
    s.register_parquet("t", "mem://bucket/t.parquet")

    real_open = builtins.open

    def guarded_open(file, *args, **kwargs):
        if isinstance(file, (str, bytes)) and "t.parquet" in str(file):
            raise AssertionError(f"local open of {file} in store mode")
        return real_open(file, *args, **kwargs)

    monkeypatch.setattr(builtins, "open", guarded_open)
    ids = _sql_ids(s, x, 42, "WHERE id >= 10")
    assert len(ids) > 0
