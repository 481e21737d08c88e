"""Page-level selective reader tests: our own Parquet page decode against
pyarrow-written files in multiple codecs/page versions."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu.errors import ExecutionError, ValidationError
from pqvector_tpu.io.pages import PageSelectiveReader, parse_parquet_metadata
from pqvector_tpu.io.embed import read_footer_metadata
from pqvector_tpu.types import EmbeddingColumn


def write_file(path, vecs, dtype=pa.float32(), **writer_kwargs):
    table = pa.table(
        {
            "id": pa.array(range(len(vecs)), pa.int32()),
            "vec": pa.array([list(map(float, v)) for v in vecs], pa.list_(dtype)),
        }
    )
    pq.write_table(table, path, write_page_index=True, **writer_kwargs)
    return table


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(3)
    return rng.standard_normal((500, 12)).astype(np.float32)


@pytest.mark.parametrize("compression", ["snappy", "zstd", "gzip", "none"])
def test_selective_read_codecs(tmp_path, vectors, compression):
    path = tmp_path / f"{compression}.parquet"
    write_file(
        path,
        vectors,
        compression=compression,
        use_dictionary=False,
        row_group_size=200,
    )
    reader = PageSelectiveReader(path, EmbeddingColumn("vec"))
    assert reader.supports_page_reads
    rows = np.array([499, 0, 250, 123, 199, 200, 7])
    got = reader.read_rows(rows, 12)
    np.testing.assert_allclose(got, vectors[rows], rtol=1e-6)


def test_selective_read_small_pages(tmp_path, vectors):
    """Tiny data pages (the reference's 1-row-page layout analog)."""
    path = tmp_path / "tiny.parquet"
    write_file(
        path,
        vectors,
        compression="snappy",
        use_dictionary=False,
        data_page_size=64,
        write_batch_size=16,
    )
    reader = PageSelectiveReader(path, EmbeddingColumn("vec"))
    rows = np.arange(0, 500, 37)
    got = reader.read_rows(rows, 12)
    np.testing.assert_allclose(got, vectors[rows], rtol=1e-6)


def test_selective_read_double_narrowed(tmp_path, vectors):
    path = tmp_path / "f64.parquet"
    write_file(path, vectors.astype(np.float64), dtype=pa.float64(), use_dictionary=False)
    reader = PageSelectiveReader(path, EmbeddingColumn("vec"))
    got = reader.read_rows(np.array([5, 100]), 12)
    np.testing.assert_allclose(got, vectors[[5, 100]], rtol=1e-6)


def test_selective_read_data_page_v2(tmp_path, vectors):
    path = tmp_path / "v2.parquet"
    write_file(
        path,
        vectors,
        compression="zstd",
        use_dictionary=False,
        data_page_version="2.0",
    )
    reader = PageSelectiveReader(path, EmbeddingColumn("vec"))
    rows = np.array([42, 0, 499])
    got = reader.read_rows(rows, 12)
    np.testing.assert_allclose(got, vectors[rows], rtol=1e-6)


def test_out_of_bounds_row(tmp_path, vectors):
    path = tmp_path / "oob.parquet"
    write_file(path, vectors, use_dictionary=False)
    reader = PageSelectiveReader(path, EmbeddingColumn("vec"))
    with pytest.raises(ExecutionError, match="out of bounds"):
        reader.read_rows(np.array([500]), 12)


def test_no_offset_index_detected(tmp_path, vectors):
    path = tmp_path / "noindex.parquet"
    table = pa.table({"vec": pa.array([list(map(float, v)) for v in vectors], pa.list_(pa.float32()))})
    pq.write_table(table, path, write_page_index=False, use_dictionary=False)
    reader = PageSelectiveReader(path, EmbeddingColumn("vec"))
    assert not reader.supports_page_reads


def test_metadata_parse_matches_pyarrow(tmp_path, vectors):
    path = tmp_path / "meta.parquet"
    write_file(path, vectors, row_group_size=128, use_dictionary=False)
    leaves, row_groups = parse_parquet_metadata(read_footer_metadata(path))
    md = pq.ParquetFile(path).metadata
    assert len(row_groups) == md.num_row_groups
    for i, rg in enumerate(row_groups):
        assert rg.num_rows == md.row_group(i).num_rows
    leaf_paths = [leaf.path for leaf in leaves]
    want = [md.schema.column(i).path for i in range(md.num_columns)]
    assert leaf_paths == want
    vec_leaf = [l for l in leaves if l.path.startswith("vec")][0]
    assert vec_leaf.max_rep == 1
    assert vec_leaf.max_def >= 2


def test_native_page_decode_matches_python(tmp_path, vectors):
    """The C++ page decoder must agree with the Python oracle byte-for-byte."""
    from pqvector_tpu.io import native
    from pqvector_tpu.io.pages import decode_data_page
    from pqvector_tpu.io.embed import read_footer_metadata
    from pqvector_tpu.io.pages import (
        PageSelectiveReader,
        parse_offset_index,
        parse_parquet_metadata,
    )

    if native.load() is None:
        pytest.skip("native library unavailable")

    for compression in ("snappy", "zstd", "gzip", "none"):
        path = tmp_path / f"nat_{compression}.parquet"
        write_file(path, vectors, compression=compression, use_dictionary=False)
        reader = PageSelectiveReader(path, EmbeddingColumn("vec"))
        chunk = reader.row_groups[0].chunks[reader.leaf_idx]
        with open(path, "rb") as f:
            f.seek(chunk.offset_index_offset)
            locs = parse_offset_index(f.read(chunk.offset_index_length))
            f.seek(locs[0].offset)
            raw = f.read(locs[0].compressed_page_size)
        py = decode_data_page(raw, chunk.codec, reader.leaf)
        nat = native.decode_data_page_native(
            raw, chunk.codec, reader.leaf.ptype, reader.leaf.max_def,
            reader.leaf.max_rep,
        )
        assert nat is not None
        np.testing.assert_array_equal(nat[0], py.values)
        np.testing.assert_array_equal(nat[1], py.row_lengths)


def test_batched_read_matches_python_fallback(tmp_path, vectors, monkeypatch):
    """read_rows through the batched native decode equals the per-page loop."""
    from pqvector_tpu.io import native

    if native.load() is None:
        pytest.skip("native library unavailable")

    path = tmp_path / "batched.parquet"
    write_file(
        path,
        vectors,
        compression="zstd",
        use_dictionary=False,
        data_page_size=64,
        write_batch_size=16,
        row_group_size=200,
    )
    rng = np.random.default_rng(9)
    rows = rng.integers(0, 500, size=64)
    reader = PageSelectiveReader(path, EmbeddingColumn("vec"))
    with open(path, "rb") as f:
        batched = reader._read_rows_batched(
            np.asarray(rows, np.int64),
            np.searchsorted(reader._rg_starts, rows, side="right") - 1,
            12,
            f,
        )
    assert batched is not None  # the fast path really ran
    got = reader.read_rows(rows, 12)
    np.testing.assert_array_equal(batched, got)

    # Pure-Python fallback agrees bit-for-bit.
    monkeypatch.setattr(
        "pqvector_tpu.io.native.decode_pages_native", lambda *a, **k: None
    )
    fallback = reader.read_rows(rows, 12)
    np.testing.assert_array_equal(got, fallback)
    np.testing.assert_allclose(got, vectors[rows], rtol=1e-6)


def test_native_chunk_reader_plain_and_dict(tmp_path):
    """Full-column native read parity: PLAIN pages and RLE_DICTIONARY pages
    (pyarrow writes float dictionaries for repetitive values) both match
    the pyarrow reader."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pqvector_tpu.io.native import load
    from pqvector_tpu.io.pages import read_embedding_matrix_native
    from pqvector_tpu.io.reader import read_embedding_column

    if load() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(3)
    n, dim = 5000, 16
    # Low-cardinality values force a real dictionary; then a second file
    # with unique values exercises the PLAIN path.
    for tag, x in (
        ("dict", rng.integers(0, 7, (n, dim)).astype(np.float32)),
        ("plain", rng.standard_normal((n, dim)).astype(np.float32)),
    ):
        path = str(tmp_path / f"{tag}.parquet")
        pq.write_table(
            pa.table({"vec": pa.array(list(x), pa.list_(pa.float32()))}),
            path,
            row_group_size=1024,
            use_dictionary=(tag == "dict"),
        )
        if tag == "dict":
            md = pq.ParquetFile(path).metadata.row_group(0).column(0)
            assert md.dictionary_page_offset is not None, (
                "fixture failed to produce a dictionary page"
            )
        m = read_embedding_matrix_native(path, EmbeddingColumn("vec"))
        assert m is not None, f"native path declined for {tag}"
        np.testing.assert_array_equal(m, x)
        emb = read_embedding_column(path, EmbeddingColumn("vec"))
        np.testing.assert_array_equal(emb.data, x)


def test_native_chunk_reader_declines_ragged(tmp_path):
    """Ragged rows must fall back so the canonical validation error fires."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pqvector_tpu.io.reader import read_embedding_column

    path = str(tmp_path / "ragged.parquet")
    vals = [[1.0, 2.0], [3.0], [4.0, 5.0]]
    pq.write_table(
        pa.table({"vec": pa.array(vals, pa.list_(pa.float32()))}), path
    )
    with pytest.raises(ValidationError):
        read_embedding_column(path, EmbeddingColumn("vec"))


def test_native_snappy_copy_fast_paths(tmp_path):
    """The wide-copy snappy decode (round-4: 16-byte chunked copies +
    pattern doubling for offsets < 16) must be byte-exact on data designed
    to hit every tier: constant runs (offset 4 repeats), short cycles
    (offsets 8/12), long-range matches, and incompressible noise."""
    from pqvector_tpu.io.pages import read_embedding_matrix_native

    rng = np.random.default_rng(7)
    dim = 16
    blocks = [
        np.full((64, dim), 1.25, np.float32),  # offset-4 pattern runs
        np.tile(rng.standard_normal((1, dim)).astype(np.float32), (64, 1)),
        np.tile(rng.standard_normal((2, 3)).astype(np.float32), (64, 6))[
            :, :dim
        ],
        rng.standard_normal((64, dim)).astype(np.float32),  # literals
        np.repeat(
            rng.standard_normal((8, dim)).astype(np.float32), 8, axis=0
        ),  # long-range copies
    ]
    x = np.concatenate(blocks)
    path = tmp_path / "rep.parquet"
    pq.write_table(
        pa.table({"embedding": pa.array(list(x), pa.list_(pa.float32()))}),
        path,
        compression="snappy",
        use_dictionary=False,
    )
    mat = read_embedding_matrix_native(str(path), "embedding")
    assert mat is not None
    np.testing.assert_array_equal(mat.data, x)
