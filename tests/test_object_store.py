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


# ---------------------------------------------------------------------------
# Remote stores (round-4 VERDICT item 8): HTTP range store + latency-
# simulated store with pinned request counts and overlapped range reads.
# ---------------------------------------------------------------------------


def _start_range_server(files):
    """A local HTTP server with proper Range support (stdlib only; the
    zero-egress env still allows loopback)."""
    import http.server
    import threading

    log = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def _blob(self):
            return files.get(self.path.lstrip("/"))

        def do_HEAD(self):
            blob = self._blob()
            if blob is None:
                self.send_error(404)
                return
            log.append(("HEAD", self.path, None))
            self.send_response(200)
            self.send_header("Content-Length", str(len(blob)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()

        def do_GET(self):
            blob = self._blob()
            if blob is None:
                self.send_error(404)
                return
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                a, b = rng[6:].split("-")
                start, end = int(a), int(b) + 1
                log.append(("GET", self.path, (start, end)))
                body = blob[start:end]
                self.send_response(206)
                self.send_header(
                    "Content-Range", f"bytes {start}-{end - 1}/{len(blob)}"
                )
            else:
                log.append(("GET", self.path, None))
                body = blob
                self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence stderr
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, log


def test_http_store_ranges(mem_sql_setup):
    from pqvector_tpu.engine.object_store import HttpStore

    store_mem, local_path, _ = mem_sql_setup
    blob = local_path.read_bytes()
    srv, log = _start_range_server({"t.parquet": blob})
    try:
        hs = HttpStore(f"http://127.0.0.1:{srv.server_address[1]}")
        assert hs.head("t.parquet") == len(blob)
        assert hs.get_range("t.parquet", 0, 4) == blob[:4]
        assert hs.get_tail("t.parquet", 8) == blob[-8:]
        parts = hs.get_ranges(
            "t.parquet", [(0, 10), (100, 200), (len(blob) - 5, len(blob))]
        )
        assert parts == [blob[0:10], blob[100:200], blob[-5:]]
        # every read was a ranged 206, never a full-object 200
        assert all(r[2] is not None for r in log if r[0] == "GET")
    finally:
        srv.shutdown()


def test_full_sql_through_http_store(mem_sql_setup):
    """End-to-end SQL top-k against a real (loopback) HTTP range server:
    footer, payload, row counts, and candidate pages all as ranged GETs —
    results equal the local-file session's."""
    from pqvector_tpu.engine.object_store import HttpStore
    from pqvector_tpu.engine.session import Session

    _, local_path, x = mem_sql_setup
    blob = local_path.read_bytes()
    srv, log = _start_range_server({"t.parquet": blob})
    try:
        hs = HttpStore(f"http://127.0.0.1:{srv.server_address[1]}")
        remote = Session(VectorTopKOptions(nprobe=3), object_store=hs)
        remote.register_parquet("t", "t.parquet")
        local = Session(VectorTopKOptions(nprobe=3))
        local.register_parquet("t", str(local_path))
        for where in ("", "WHERE id >= 100"):
            assert _sql_ids(remote, x, 11, where) == _sql_ids(
                local, x, 11, where
            )
        gets = [r for r in log if r[0] == "GET"]
        assert gets, "no ranged reads issued"
        assert all(r[2] is not None for r in gets)  # never full-object
        # ranged reads must cover a small fraction of the file (selective
        # candidate pages, not a full scan)
        total = sum(e - s for _, _, (s, e) in gets)
        assert total < 2 * len(blob)  # footer+index+pages, not N full scans
    finally:
        srv.shutdown()


def test_simulated_remote_store_counts_and_overlap(mem_sql_setup):
    """Request counters pin the query path's round trips, and get_ranges
    overlaps latency: 8 spans at 40 ms must land well under sequential."""
    import time

    from pqvector_tpu.engine.object_store import (
        MemoryStore,
        SimulatedRemoteStore,
    )

    _, local_path, x = mem_sql_setup
    blob = local_path.read_bytes()
    sim = SimulatedRemoteStore(
        MemoryStore({"mem://b/t.parquet": blob}), latency_s=0.04, workers=8
    )
    spans = [(i * 100, i * 100 + 50) for i in range(8)]
    t0 = time.perf_counter()
    parts = sim.get_ranges("mem://b/t.parquet", spans)
    dt = time.perf_counter() - t0
    assert parts == [blob[a:b] for a, b in spans]
    assert sim.range_requests == 8
    assert dt < 8 * 0.04 * 0.75  # overlapped, not sequential

    # End-to-end SQL through the simulated store: pinned request count.
    from pqvector_tpu.engine.session import Session

    sim.latency_s = 0.0
    sim.reset_counters()
    s = Session(VectorTopKOptions(nprobe=3), object_store=sim)
    s.register_parquet("t", "mem://b/t.parquet")
    ids = _sql_ids(s, x, 11)
    assert len(ids) == 5
    assert sim.range_requests > 0
    # footer tail + metadata + payload + row-count/page metadata + spans:
    # a handful of round trips, never per-row reads
    assert sim.range_requests < 40, sim.range_requests


def test_simulated_store_counters_threadsafe():
    """get_ranges counts from pool workers; the counters must not
    undercount under concurrency (ADVICE r4: '+=' is non-atomic)."""
    from pqvector_tpu.engine.object_store import (
        MemoryStore,
        SimulatedRemoteStore,
    )

    blob = bytes(range(256)) * 64
    sim = SimulatedRemoteStore(
        MemoryStore({"mem://b/x": blob}), latency_s=0.0, workers=16
    )
    spans = [(i, i + 8) for i in range(0, 4096, 8)]  # 512 ranges
    for _ in range(4):
        sim.get_ranges("mem://b/x", spans)
    assert sim.range_requests == 4 * len(spans)
    assert sim.bytes_read == 4 * 8 * len(spans)


def test_open_parquet_rejects_tiny_object():
    """A remote object smaller than the minimal parquet framing must fail
    with a clear 'not a valid parquet file' error, not a malformed
    suffix-range read (ADVICE r4)."""
    from pqvector_tpu.engine.object_store import MemoryStore, open_parquet

    store = MemoryStore({"mem://b/empty": b"", "mem://b/tiny": b"PAR1"})
    for path in ("mem://b/empty", "mem://b/tiny"):
        with pytest.raises(ExecutionError, match="not a valid parquet"):
            open_parquet(store, path)
