"""Robustness: malformed inputs must raise typed errors, never crash/hang.

The reference's defense is Rust's type system + explicit validation
(SURVEY.md §5.3); ours is exhaustive error paths over untrusted bytes.
"""

import numpy as np
import pytest

from pqvector_tpu.errors import FormatError
from pqvector_tpu.io import native
from pqvector_tpu.io.thrift import (
    parse_struct_fields,
    read_key_value_metadata,
    splice_key_value_metadata,
)


@pytest.mark.parametrize("seed", range(8))
def test_thrift_parser_rejects_random_bytes(seed):
    rng = np.random.default_rng(seed)
    blob = rng.integers(0, 256, rng.integers(1, 200), dtype=np.uint8).tobytes()
    try:
        parse_struct_fields(memoryview(blob))
    except FormatError:
        pass  # rejection is fine; crashing/hanging is not


@pytest.mark.parametrize("seed", range(8))
def test_thrift_splice_rejects_random_bytes(seed):
    rng = np.random.default_rng(seed + 100)
    blob = rng.integers(0, 256, rng.integers(1, 200), dtype=np.uint8).tobytes()
    try:
        splice_key_value_metadata(blob, [("a", "b")])
    except FormatError:
        pass


@pytest.mark.parametrize("seed", range(8))
def test_native_splice_rejects_random_bytes(seed):
    if native.load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(seed + 200)
    blob = rng.integers(0, 256, rng.integers(1, 200), dtype=np.uint8).tobytes()
    try:
        native.splice_key_value_metadata_native(blob, [("a", "b")])
    except FormatError:
        pass


@pytest.mark.parametrize("seed", range(8))
def test_native_page_decode_rejects_random_bytes(seed):
    if native.load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(seed + 300)
    blob = rng.integers(0, 256, rng.integers(16, 400), dtype=np.uint8).tobytes()
    try:
        native.decode_data_page_native(blob, "snappy", 4, 3, 1)
    except FormatError:
        pass


def test_truncated_valid_metadata_rejected(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pqvector_tpu.io.embed import read_footer_metadata

    path = tmp_path / "t.parquet"
    pq.write_table(pa.table({"x": pa.array([1, 2, 3])}), path)
    meta = read_footer_metadata(path)
    for cut in (1, len(meta) // 2, len(meta) - 1):
        with pytest.raises(FormatError):
            parse_struct_fields(memoryview(meta[:cut]))


def test_device_rescore_path(tmp_path, monkeypatch):
    """Exercise VectorTopKExec's device re-scoring branch by lowering the
    row threshold."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pqvector_tpu.builder import IndexBuilder
    from pqvector_tpu.engine import Session, VectorTopKOptions
    import pqvector_tpu.engine.exec as exec_mod

    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((64, 4)).astype(np.float32)
    path = tmp_path / "d.parquet"
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(64), pa.int32()),
                "vec": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        ),
        path,
    )
    IndexBuilder(path, "vec").n_clusters(4).build_inplace()

    monkeypatch.setattr(exec_mod, "_DEVICE_THRESHOLD", 1)
    session = Session(VectorTopKOptions(nprobe=4, use_device=True))
    session.register_parquet("t", path)
    q = vecs[10]
    lit = "[" + ", ".join(str(v) for v in q) + "]"
    out = session.sql(
        f"SELECT id FROM t ORDER BY array_distance(vec, {lit}) LIMIT 3"
    ).collect()
    d = ((vecs - q) ** 2).sum(1)
    want = np.argsort(d, kind="stable")[:3].tolist()
    assert out.column("id").to_pylist() == want
