"""Round-2 hardening: hostile page headers, null FixedSizeList slots,
candidate-id bounds, SortExec NaN ordering, encrypted-footer errors.

Covers the advisor findings (ADVICE.md round 1) plus VERDICT.md §8 edges.
"""

import numpy as np
import pyarrow as pa
import pytest

from pqvector_tpu.engine.access import ScanFile, access_plan_for_rows
from pqvector_tpu.engine.exec import VectorTopKExec
from pqvector_tpu.engine.index_exec import VectorIndexScanExec
from pqvector_tpu.engine.object_store import MemoryStore
from pqvector_tpu.engine.options import VectorTopKOptions
from pqvector_tpu.engine.physical import SortExec, SortExpr, TaskContext
from pqvector_tpu.errors import ExecutionError, FormatError
from pqvector_tpu.io import native
from pqvector_tpu.io.pages import SchemaLeaf, decode_data_page


# ----------------------------------------------------------------------
# Hostile page headers (ADVICE high: native decoder trusted declared sizes)
# ----------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz32(v: int) -> bytes:
    return _varint(((v << 1) ^ (v >> 31)) & 0xFFFFFFFF)


def _v2_page(
    num_values=4,
    uncompressed=16,
    compressed=16,
    def_len=0,
    rep_len=0,
    body=b"\x00" * 16,
) -> bytes:
    """Hand-built Thrift compact PageHeader for a DATA_PAGE_V2 + body."""
    hdr = bytearray()
    hdr += b"\x15" + _zz32(3)  # field 1: type = DATA_PAGE_V2
    hdr += b"\x15" + _zz32(uncompressed)  # field 2: uncompressed_page_size
    hdr += b"\x15" + _zz32(compressed)  # field 3: compressed_page_size
    hdr += b"\x5c"  # field 8 (delta 5): data_page_header_v2 struct
    hdr += b"\x15" + _zz32(num_values)  # 1: num_values
    hdr += b"\x15" + _zz32(0)  # 2: num_nulls
    hdr += b"\x15" + _zz32(num_values)  # 3: num_rows
    hdr += b"\x15" + _zz32(0)  # 4: encoding = PLAIN
    hdr += b"\x15" + _zz32(def_len)  # 5: definition_levels_byte_length
    hdr += b"\x15" + _zz32(rep_len)  # 6: repetition_levels_byte_length
    hdr += b"\x12"  # 7: is_compressed = false
    hdr += b"\x00"  # struct stop
    hdr += b"\x00"  # header stop
    return bytes(hdr) + body


_LEAF = SchemaLeaf(path=["v"], ptype=4, max_def=0, max_rep=0)


def test_wellformed_v2_page_decodes_both_paths():
    vals = np.arange(4, dtype="<f4")
    raw = _v2_page(body=vals.tobytes())
    page = decode_data_page(raw, "UNCOMPRESSED", _LEAF)
    np.testing.assert_array_equal(page.values, vals)
    out = native.decode_data_page_native(raw, "UNCOMPRESSED", 4, 0, 0)
    if out is not None:
        np.testing.assert_array_equal(out[0], vals)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(rep_len=0x7FFF0000),  # OOB read PoC from ADVICE.md
        dict(def_len=0x7FFF0000),
        dict(uncompressed=-5),
        dict(num_values=-1),
        dict(compressed=-16),
        dict(rep_len=8, def_len=12, compressed=16, uncompressed=16),
    ],
)
def test_hostile_v2_page_headers_rejected(kwargs):
    raw = _v2_page(**kwargs)
    with pytest.raises(ExecutionError):
        decode_data_page(raw, "UNCOMPRESSED", _LEAF)
    lib = native.load()
    if lib is not None:
        with pytest.raises(FormatError):
            native.decode_data_page_native(raw, "UNCOMPRESSED", 4, 0, 0)


def test_huge_uncompressed_size_rejected_not_bad_alloc():
    lib = native.load()
    if lib is None:
        pytest.skip("native library unavailable")
    # 0x7FFFFFF0 would bad_alloc (std::terminate across ffi) without the cap.
    raw = _v2_page(uncompressed=0x7FFFFFF0, compressed=16)
    with pytest.raises(FormatError):
        native.decode_data_page_native(raw, "UNCOMPRESSED", 4, 0, 0)


# ----------------------------------------------------------------------
# FixedSizeList null slots (ADVICE medium: flatten() drops null slots)
# ----------------------------------------------------------------------


def _topk_exec(query, k=3):
    opts = VectorTopKOptions(nprobe=4)
    index_plan = VectorIndexScanExec([], "vec", query, opts)
    return VectorTopKExec(index_plan, index_plan, "vec", query, k, opts)


def test_fixed_size_list_null_slot_distances():
    query = np.array([0.0, 0.0], dtype=np.float32)
    vecs = pa.array(
        [[1.0, 0.0], None, [3.0, 0.0], [2.0, 0.0]],
        pa.list_(pa.float32(), 2),
    )
    table = pa.table({"vec": vecs})
    d = _topk_exec(query)._compute_distances(table)
    assert np.isnan(d[1])
    # Rows after the null must score against their own vectors, not shifted.
    np.testing.assert_allclose(d[[0, 2, 3]], [1.0, 9.0, 4.0])


def test_fixed_size_list_null_slot_sliced_chunk():
    query = np.array([0.0, 0.0], dtype=np.float32)
    vecs = pa.array(
        [[9.0, 9.0], [1.0, 0.0], None, [2.0, 0.0]],
        pa.list_(pa.float32(), 2),
    )
    table = pa.table({"vec": vecs}).slice(1)  # nonzero chunk offset
    d = _topk_exec(query)._compute_distances(table)
    assert np.isnan(d[1])
    np.testing.assert_allclose(d[[0, 2]], [1.0, 4.0])


# ----------------------------------------------------------------------
# Candidate-id bounds (ADVICE low: silent clip into the last row group)
# ----------------------------------------------------------------------


def test_access_plan_rejects_out_of_bounds_rows():
    with pytest.raises(ExecutionError, match="out of bounds"):
        access_plan_for_rows([10, 10], np.array([3, 25]))
    with pytest.raises(ExecutionError, match="out of bounds"):
        access_plan_for_rows([10, 10], np.array([-1, 3]))


def test_access_plan_accepts_last_valid_row():
    plan = access_plan_for_rows([10, 10], np.array([19]))
    assert plan.groups[1].rows.tolist() == [9]


# ----------------------------------------------------------------------
# SortExec NaN ordering (VERDICT §8: untested claim)
# ----------------------------------------------------------------------


class _TableSource:
    """Minimal ExecutionPlan-shaped leaf yielding a fixed table."""

    def __init__(self, table):
        self.table = table

    def execute(self, context):
        return self.table

    def schema(self):
        return self.table.schema

    def children(self):
        return []


class _ColExpr:
    def __init__(self, name):
        self.name = name

    def evaluate(self, table):
        return table.column(self.name).to_numpy(zero_copy_only=False)

    def __str__(self):
        return self.name


def _sorted_ids(descending):
    table = pa.table(
        {
            "id": pa.array([0, 1, 2, 3], pa.int64()),
            "key": pa.array([2.0, float("nan"), 1.0, 3.0], pa.float64()),
        }
    )
    plan = SortExec(
        [SortExpr(_ColExpr("key"), descending=descending)], _TableSource(table)
    )
    out = plan.execute(TaskContext(MemoryStore()))
    return out.column("id").to_pylist()


def test_sortexec_nan_sorts_last_asc():
    assert _sorted_ids(descending=False) == [2, 0, 3, 1]


def test_sortexec_nan_sorts_last_desc():
    # -NaN is still NaN, so NaN rows sort last for DESC too (pinned).
    assert _sorted_ids(descending=True) == [3, 0, 2, 1]


# ----------------------------------------------------------------------
# Encrypted footer error in the index scan (VERDICT §8)
# ----------------------------------------------------------------------


def test_index_scan_reports_encrypted_footer():
    store = MemoryStore()
    data = b"\x00" * 32 + (16).to_bytes(4, "little") + b"PARE"
    store.put("enc.parquet", data)
    plan = VectorIndexScanExec(
        [ScanFile("enc.parquet", len(data))],
        "vec",
        np.zeros(2, np.float32),
        VectorTopKOptions(),
    )
    with pytest.raises(ExecutionError, match="encrypted footer"):
        plan.execute(TaskContext(store))
