"""Parquet embed/extract + footer surgery tests.

Mirrors the reference integration test (write tiny parquet -> build_inplace ->
file grew -> re-read index, /root/reference/src/ivf/parquet.rs:623-660) plus
validation paths (nulls, ragged dims, f64 narrowing, encrypted footers,
truncated payloads)."""

import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu import FormatError, ValidationError
from pqvector_tpu.builder import IndexBuilder, has_pq_vector_index
from pqvector_tpu.index.ivf import IvfIndex
from pqvector_tpu.io.embed import (
    PQ_VECTOR_EMBEDDING_COLUMN_KEY,
    PQ_VECTOR_INDEX_OFFSET_KEY,
    append_index_inplace,
    read_index_from_parquet,
    read_index_from_payload,
    read_index_metadata,
)
from pqvector_tpu.io.reader import extract_embeddings, read_parquet_with_embeddings
from pqvector_tpu.io.thrift import (
    read_key_value_metadata,
    splice_key_value_metadata,
)
from pqvector_tpu.types import EmbeddingColumn


def tiny_table(dtype=pa.float32()):
    return pa.table(
        {
            "id": pa.array([0, 1, 2], pa.int32()),
            "vec": pa.array([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]], pa.list_(dtype)),
        }
    )


def write_tiny(path, dtype=pa.float32()):
    pq.write_table(tiny_table(dtype), path)


def test_build_inplace_appends_footer(tmp_path):
    path = tmp_path / "data.parquet"
    write_tiny(path)
    original_size = path.stat().st_size

    IndexBuilder(path, "vec").n_clusters(2).build_inplace()
    assert path.stat().st_size > original_size

    index, column = read_index_from_parquet(path)
    assert str(column) == "vec"
    assert index.dim == 2
    assert index.total_rows == 3

    # Standard readers still see the data (the interop contract).
    table = pq.read_table(path)
    assert table.column("id").to_pylist() == [0, 1, 2]
    meta = pq.ParquetFile(path).metadata.metadata
    assert PQ_VECTOR_INDEX_OFFSET_KEY.encode() in meta
    assert meta[PQ_VECTOR_EMBEDDING_COLUMN_KEY.encode()] == b"vec"


def test_build_inplace_twice_replaces_keys(tmp_path):
    path = tmp_path / "data.parquet"
    write_tiny(path)
    IndexBuilder(path, "vec").n_clusters(2).build_inplace()
    IndexBuilder(path, "vec").n_clusters(1).build_inplace()
    index, _ = read_index_from_parquet(path)
    assert index.n_clusters == 1
    kv = pq.ParquetFile(path).metadata.metadata
    # Exactly one offset key (old pq keys stripped, parquet.rs:573-575).
    assert sum(1 for k in kv if k == PQ_VECTOR_INDEX_OFFSET_KEY.encode()) == 1


def test_build_new_preserves_data(tmp_path):
    src = tmp_path / "src.parquet"
    dst = tmp_path / "dst.parquet"
    write_tiny(src)
    IndexBuilder(src, "vec").n_clusters(2).build_new(dst)
    assert not has_pq_vector_index(src)
    assert has_pq_vector_index(dst)
    t_src = pq.read_table(src)
    t_dst = pq.read_table(dst)
    assert t_dst.column("id").to_pylist() == t_src.column("id").to_pylist()
    assert t_dst.column("vec").to_pylist() == t_src.column("vec").to_pylist()
    index, column = read_index_from_parquet(dst)
    assert index.dim == 2 and str(column) == "vec"


def test_build_new_cluster_sorted(tmp_path):
    src = tmp_path / "src.parquet"
    dst = tmp_path / "dst.parquet"
    n = 64
    rng = np.random.default_rng(0)
    vecs = np.concatenate(
        [
            rng.normal(0, 0.1, (n // 2, 2)),
            rng.normal(10, 0.1, (n // 2, 2)),
        ]
    ).astype(np.float32)
    table = pa.table(
        {
            "id": pa.array(range(n), pa.int32()),
            "vec": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    pq.write_table(table, src)
    IndexBuilder(src, "vec").n_clusters(2).cluster_sorted().build_new(dst)
    index, _ = read_index_from_parquet(dst)
    # Inverted lists are contiguous ranges over the permuted file.
    np.testing.assert_array_equal(index.row_ids, np.arange(n))
    # Every original row survives the permutation.
    ids = pq.read_table(dst).column("id").to_pylist()
    assert sorted(ids) == list(range(n))


def test_f64_narrowed_to_f32(tmp_path):
    path = tmp_path / "f64.parquet"
    write_tiny(path, pa.float64())
    parquet = read_parquet_with_embeddings(path, EmbeddingColumn("vec"))
    assert parquet.embeddings.data.dtype == np.float32
    assert parquet.embeddings.row_count == 3


def test_fixed_size_list_supported():
    table = pa.table(
        {
            "vec": pa.array(
                [[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float32(), 2)
            )
        }
    )
    emb = extract_embeddings(table, EmbeddingColumn("vec"))
    np.testing.assert_array_equal(emb.data, [[1, 2], [3, 4]])


def test_null_rows_rejected():
    table = pa.table({"vec": pa.array([[1.0, 2.0], None], pa.list_(pa.float32()))})
    with pytest.raises(ValidationError, match="null rows"):
        extract_embeddings(table, EmbeddingColumn("vec"))


def test_null_values_rejected():
    table = pa.table({"vec": pa.array([[1.0, None]], pa.list_(pa.float32()))})
    with pytest.raises(ValidationError, match="null"):
        extract_embeddings(table, EmbeddingColumn("vec"))


def test_ragged_dims_rejected():
    table = pa.table({"vec": pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32()))})
    with pytest.raises(ValidationError, match="inconsistent"):
        extract_embeddings(table, EmbeddingColumn("vec"))


def test_zero_length_row_rejected():
    table = pa.table({"vec": pa.array([[1.0], []], pa.list_(pa.float32()))})
    with pytest.raises(ValidationError, match="zero length"):
        extract_embeddings(table, EmbeddingColumn("vec"))


def test_non_float_rejected():
    table = pa.table({"vec": pa.array([[1, 2]], pa.list_(pa.int32()))})
    with pytest.raises(ValidationError, match="float32/float64"):
        extract_embeddings(table, EmbeddingColumn("vec"))


def test_missing_column_rejected():
    table = tiny_table()
    with pytest.raises(ValidationError, match="not found"):
        extract_embeddings(table, EmbeddingColumn("nope"))


def test_missing_index_metadata(tmp_path):
    path = tmp_path / "plain.parquet"
    write_tiny(path)
    assert not has_pq_vector_index(path)
    assert read_index_metadata(path) is None
    with pytest.raises(FormatError, match="Missing pq-vector index metadata"):
        read_index_from_parquet(path)


def test_encrypted_footer_rejected(tmp_path):
    path = tmp_path / "enc.parquet"
    write_tiny(path)
    raw = path.read_bytes()
    path.write_bytes(raw[:-4] + b"PARE")
    index = IvfIndex.from_lists(
        1, np.zeros((1, 1), np.float32), [np.array([0], np.uint32)]
    )
    with pytest.raises(FormatError, match="Encrypted"):
        append_index_inplace(path, index, EmbeddingColumn("vec"))


def test_truncated_payload_rejected():
    with pytest.raises(FormatError, match="truncated"):
        read_index_from_payload(b"PQ_VECTOR1\x00", EmbeddingColumn("vec"))
    with pytest.raises(FormatError, match="magic"):
        read_index_from_payload(b"NOT_MAGIC!" + b"\x00" * 8, EmbeddingColumn("vec"))
    # Declared length exceeds available bytes.
    with pytest.raises(FormatError, match="truncated"):
        read_index_from_payload(
            b"PQ_VECTOR1" + struct.pack("<Q", 100) + b"\x00" * 8,
            EmbeddingColumn("vec"),
        )


def test_thrift_splice_preserves_foreign_kv(tmp_path):
    path = tmp_path / "kv.parquet"
    pq.write_table(
        tiny_table(),
        path,
    )
    # Add a foreign KV pair first via pyarrow rewrite.
    table = pq.read_table(path)
    table = table.replace_schema_metadata({"user_key": "user_value"})
    pq.write_table(table, path)

    IndexBuilder(path, "vec").n_clusters(2).build_inplace()
    kv = pq.ParquetFile(path).metadata.metadata
    assert kv[b"user_key"] == b"user_value"
    assert kv[PQ_VECTOR_EMBEDDING_COLUMN_KEY.encode()] == b"vec"


def test_thrift_splice_round_trip(tmp_path):
    """The spliced metadata decodes identically through pyarrow."""
    path = tmp_path / "t.parquet"
    write_tiny(path)
    from pqvector_tpu.io.embed import read_footer_metadata

    meta = read_footer_metadata(path)
    kv_before = read_key_value_metadata(meta)
    new_meta = splice_key_value_metadata(meta, [("a", "1"), ("b", "2")])
    kv_after = read_key_value_metadata(new_meta)
    assert kv_after == kv_before + [("a", "1"), ("b", "2")]
    # Dropping works too.
    new_meta2 = splice_key_value_metadata(new_meta, [("a", "3")], drop_keys={"a"})
    kv2 = dict(read_key_value_metadata(new_meta2))
    assert kv2["a"] == "3" and kv2["b"] == "2"


def test_file_too_small():
    import io as _io

    with pytest.raises(FormatError):
        from pqvector_tpu.io.embed import FooterTail

        FooterTail(b"PAR1")


def test_pandas_reads_indexed_file(tmp_path):
    """The interop contract: standard readers see plain Parquet."""
    path = tmp_path / "p.parquet"
    write_tiny(path)
    IndexBuilder(path, "vec").n_clusters(2).build_inplace()
    df = pq.read_table(path).to_pandas()
    assert list(df["id"]) == [0, 1, 2]
    assert len(df["vec"][1]) == 2


def test_reference_procedure_file_decodes(tmp_path):
    """Hand-run the reference's append procedure (parquet.rs:542-611) byte
    by byte — payload at file_len-8, spliced metadata, fresh tail — and
    confirm our readers decode it. This simulates a reference-written file
    without running Rust."""
    import struct as _struct

    from pqvector_tpu.io.embed import read_footer_metadata
    from pqvector_tpu.io.thrift import splice_key_value_metadata

    path = tmp_path / "ref.parquet"
    write_tiny(path)
    index = IvfIndex.from_lists(
        dim=2,
        centroids=np.array([[0.0, 0.0], [1.0, 1.0]], np.float32),
        inverted_lists=[np.array([0, 2], np.uint32), np.array([1], np.uint32)],
    )
    index_bytes = index.to_bytes()

    raw = path.read_bytes()
    file_len = len(raw)
    meta_len = _struct.unpack("<I", raw[-8:-4])[0]
    old_meta = raw[file_len - 8 - meta_len : file_len - 8]
    offset = file_len - 8
    new_meta = splice_key_value_metadata(
        old_meta,
        [
            (PQ_VECTOR_INDEX_OFFSET_KEY, str(offset)),
            (PQ_VECTOR_EMBEDDING_COLUMN_KEY, "vec"),
        ],
    )
    payload = b"PQ_VECTOR1" + _struct.pack("<Q", len(index_bytes)) + index_bytes
    new_file = (
        raw[: file_len - 8]
        + payload
        + new_meta
        + _struct.pack("<I", len(new_meta))
        + b"PAR1"
    )
    path.write_bytes(new_file)

    assert has_pq_vector_index(path)
    restored, column = read_index_from_parquet(path)
    assert str(column) == "vec"
    assert restored.to_bytes() == index_bytes
    # And the standalone query path works on it.
    from pqvector_tpu import TopkBuilder

    results = TopkBuilder(path, np.array([0.0, 0.0])).k(2).nprobe(2).search()
    assert results[0].row_idx == 0


def test_extract_embeddings_from_sliced_table():
    """Sliced Arrow chunks have nonzero value offsets; extraction must
    respect them."""
    vecs = [[float(i), float(i + 10)] for i in range(10)]
    table = pa.table({"vec": pa.array(vecs, pa.list_(pa.float32()))})
    sliced = table.slice(3, 4)
    emb = extract_embeddings(sliced, EmbeddingColumn("vec"))
    np.testing.assert_array_equal(
        emb.data, np.array(vecs[3:7], dtype=np.float32)
    )
