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
