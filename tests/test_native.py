"""Native C++ host library tests: byte-identical with the Python oracle."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu.index.ivf import IvfIndex
from pqvector_tpu.io import native
from pqvector_tpu.io.embed import (
    PQ_VECTOR_EMBEDDING_COLUMN_KEY,
    PQ_VECTOR_INDEX_MAGIC,
    PQ_VECTOR_INDEX_OFFSET_KEY,
    read_footer_metadata,
    read_index_from_parquet,
)
from pqvector_tpu.io.thrift import read_key_value_metadata, splice_key_value_metadata
from pqvector_tpu.types import EmbeddingColumn

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable (no g++?)"
)


def tiny_parquet(path, with_kv=None):
    table = pa.table(
        {
            "id": pa.array([0, 1, 2], pa.int32()),
            "vec": pa.array(
                [[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]], pa.list_(pa.float32())
            ),
        }
    )
    if with_kv:
        table = table.replace_schema_metadata(with_kv)
    pq.write_table(table, path)


def test_native_splice_matches_python(tmp_path):
    path = tmp_path / "t.parquet"
    tiny_parquet(path, {"user": "v"})
    meta = read_footer_metadata(path)
    pairs = [("a", "1"), ("b", "2")]
    py = splice_key_value_metadata(meta, pairs, drop_keys={"x"})
    nat = native.splice_key_value_metadata_native(meta, pairs, drop_keys={"x"})
    assert nat == py


def test_native_append_inplace(tmp_path):
    path = tmp_path / "t.parquet"
    tiny_parquet(path)
    index = IvfIndex.from_lists(
        dim=2,
        centroids=np.array([[0.0, 0.0], [1.0, 1.0]], np.float32),
        inverted_lists=[np.array([0, 2], np.uint32), np.array([1], np.uint32)],
    )
    ok = native.append_index_inplace_native(
        str(path),
        index.to_bytes(),
        "vec",
        PQ_VECTOR_INDEX_OFFSET_KEY,
        PQ_VECTOR_EMBEDDING_COLUMN_KEY,
        PQ_VECTOR_INDEX_MAGIC,
    )
    assert ok
    # File is still readable by pyarrow and carries the index.
    table = pq.read_table(path)
    assert table.column("id").to_pylist() == [0, 1, 2]
    restored, column = read_index_from_parquet(path)
    assert str(column) == "vec"
    assert restored.to_bytes() == index.to_bytes()


def test_native_append_twice_strips_old_keys(tmp_path):
    path = tmp_path / "t.parquet"
    tiny_parquet(path, {"keepme": "1"})
    index = IvfIndex.from_lists(
        dim=2,
        centroids=np.zeros((1, 2), np.float32),
        inverted_lists=[np.array([0, 1, 2], np.uint32)],
    )
    for _ in range(2):
        native.append_index_inplace_native(
            str(path),
            index.to_bytes(),
            "vec",
            PQ_VECTOR_INDEX_OFFSET_KEY,
            PQ_VECTOR_EMBEDDING_COLUMN_KEY,
            PQ_VECTOR_INDEX_MAGIC,
        )
    kv = read_key_value_metadata(read_footer_metadata(path))
    keys = [k for k, _ in kv]
    assert keys.count(PQ_VECTOR_INDEX_OFFSET_KEY) == 1
    assert "keepme" in keys
    restored, _ = read_index_from_parquet(path)
    assert restored.n_clusters == 1


def test_native_rejects_encrypted(tmp_path):
    path = tmp_path / "t.parquet"
    tiny_parquet(path)
    raw = path.read_bytes()
    path.write_bytes(raw[:-4] + b"PARE")
    from pqvector_tpu.errors import FormatError

    with pytest.raises(FormatError, match="Encrypted"):
        native.append_index_inplace_native(
            str(path),
            b"\x00" * 16,
            "vec",
            PQ_VECTOR_INDEX_OFFSET_KEY,
            PQ_VECTOR_EMBEDDING_COLUMN_KEY,
            PQ_VECTOR_INDEX_MAGIC,
        )


def test_native_rejects_non_parquet(tmp_path):
    path = tmp_path / "junk.bin"
    path.write_bytes(b"this is not parquet at all")
    from pqvector_tpu.errors import FormatError

    with pytest.raises(FormatError):
        native.append_index_inplace_native(
            str(path),
            b"\x00" * 16,
            "vec",
            PQ_VECTOR_INDEX_OFFSET_KEY,
            PQ_VECTOR_EMBEDDING_COLUMN_KEY,
            PQ_VECTOR_INDEX_MAGIC,
        )


def test_native_chunk_decode_cross_rg_ragged_rejected(tmp_path):
    """Row groups with different uniform dims: the preallocated [rows, dim]
    output is smaller than a later chunk's num_values. The native decoder
    must hit its capacity check (not write past the buffer) and the reader
    must fall back to the canonical ragged-dims validation error."""
    from pqvector_tpu.errors import ValidationError
    from pqvector_tpu.io.reader import read_embedding_column

    path = tmp_path / "ragged_rg.parquet"
    vecs = [[1.0, 2.0]] * 3 + [[1.0, 2.0, 3.0, 4.0]] * 3
    table = pa.table({"vec": pa.array(vecs, pa.list_(pa.float32()))})
    pq.write_table(table, path, row_group_size=3)
    meta = pq.ParquetFile(path).metadata
    assert meta.num_row_groups == 2
    with pytest.raises(ValidationError, match="inconsistent"):
        read_embedding_column(path, EmbeddingColumn("vec"))
