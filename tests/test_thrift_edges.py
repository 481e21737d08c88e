"""Thrift compact-protocol edge cases for the splice machinery."""

import pytest

from pqvector_tpu.io import native
from pqvector_tpu.io.thrift import (
    decode_key_value_list,
    encode_key_value_list,
    read_key_value_metadata,
    splice_key_value_metadata,
    write_field_header,
    write_varint,
    zigzag_encode,
)


def test_kv_list_long_form_header():
    """>=15 entries forces the long-form list header (0xF? + varint size)."""
    pairs = [(f"key{i}", f"value{i}") for i in range(20)]
    blob = encode_key_value_list(pairs)
    assert blob[0] & 0x0F == 0x0C  # struct elements
    assert blob[0] >> 4 == 15  # long form
    decoded = decode_key_value_list(memoryview(blob), 0)
    assert decoded == pairs


def test_kv_value_none_round_trip():
    pairs = [("k", None), ("k2", "v2")]
    blob = encode_key_value_list(pairs)
    assert decode_key_value_list(memoryview(blob), 0) == pairs


def test_field_header_delta_and_long_form():
    # Small delta: single byte.
    assert write_field_header(0, 5, 0x9) == bytes([(5 << 4) | 0x9])
    # Delta > 15: long form (type byte + zigzag varint field id).
    hdr = write_field_header(0, 100, 0x9)
    assert hdr[0] == 0x9
    assert hdr[1:] == write_varint(zigzag_encode(100))


def test_splice_into_minimal_struct():
    """A struct with only field 1 (i32) gains a KV list as field 5."""
    # field 1, type i32 (0x5), zigzag(7)=14
    minimal = bytes([(1 << 4) | 0x5]) + write_varint(14) + b"\x00"
    out = splice_key_value_metadata(minimal, [("a", "1")])
    assert read_key_value_metadata(out) == [("a", "1")]


def test_splice_with_field_after_kv_slot():
    """Insert field 5 between fields 4 and 6; field 6's delta must be
    recomputed."""
    # field 4 (i32) then field 6 (i32), no field 5.
    buf = (
        bytes([(4 << 4) | 0x5]) + write_varint(2)
        + bytes([(2 << 4) | 0x5]) + write_varint(4)
        + b"\x00"
    )
    out = splice_key_value_metadata(buf, [("k", "v")])
    kv = read_key_value_metadata(out)
    assert kv == [("k", "v")]
    # Native implementation agrees byte-for-byte.
    if native.load() is not None:
        nat = native.splice_key_value_metadata_native(buf, [("k", "v")])
        assert nat == out


def test_splice_drop_all_leaves_empty_list():
    base = splice_key_value_metadata(b"\x00", [("a", "1"), ("b", "2")])
    out = splice_key_value_metadata(base, [], drop_keys={"a", "b"})
    assert read_key_value_metadata(out) == []


def test_unicode_keys_and_values():
    out = splice_key_value_metadata(b"\x00", [("clé", "väl🔥")])
    assert read_key_value_metadata(out) == [("clé", "väl🔥")]
    if native.load() is not None:
        nat = native.splice_key_value_metadata_native(b"\x00", [("clé", "väl🔥")])
        assert nat == out
