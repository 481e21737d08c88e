"""build_new split-write-merge path: per-column layout without file-global
compromises (closes SURVEY component #9's round-2 'partial').

The reference forces 1-row pages / no dict / chunk-stats ONLY on the
embedding column while every other column keeps its source properties
(/root/reference/src/ivf/parquet.rs:324-345, 417-522). pyarrow's page-size
knob is file-global, so the old writer gave ALL columns tiny pages; the
merge path (io/merge.py) writes the embedding column separately and splices
the files byte-for-byte."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.io.merge import merge_parquet_files
from pqvector_tpu.io.pages import (
    PageSelectiveReader,
    parse_offset_index,
    parse_parquet_metadata,
)
from pqvector_tpu.io.embed import read_footer_metadata
from pqvector_tpu.query.search import TopkBuilder
from pqvector_tpu.types import EmbeddingColumn


def _source(path, n=600, dim=64, codec_id="gzip"):
    rng = np.random.default_rng(5)
    x = rng.standard_normal((n, dim)).astype(np.float32)
    table = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "tag": pa.array([f"t{i % 7}" for i in range(n)]),  # dict-friendly
            "vec": pa.array(list(x), pa.list_(pa.float32())),
            "score": pa.array(rng.standard_normal(n), pa.float64()),
        }
    )
    pq.write_table(
        table,
        path,
        row_group_size=256,
        compression={"id": codec_id, "tag": codec_id, "vec": "snappy", "score": "snappy"},
        use_dictionary=["tag"],
    )
    return x


@pytest.fixture()
def built(tmp_path):
    src = str(tmp_path / "src.parquet")
    out = str(tmp_path / "out.parquet")
    x = _source(src)
    IndexBuilder(src, "vec").n_clusters(8).build_new(out)
    return src, out, x


def _pages_per_rg(path, leaf_root):
    meta = read_footer_metadata(path)
    leaves, rgs = parse_parquet_metadata(meta)
    idx = [i for i, lf in enumerate(leaves) if lf.path.split(".")[0] == leaf_root]
    assert len(idx) == 1
    counts = []
    with open(path, "rb") as f:
        for rg in rgs:
            ch = rg.chunks[idx[0]]
            if ch.offset_index_offset is None:
                counts.append(None)
                continue
            f.seek(ch.offset_index_offset)
            locs = parse_offset_index(f.read(ch.offset_index_length))
            counts.append(len(locs))
    return counts


def test_embedding_pages_are_one_row(built):
    _, out, _ = built
    # 256-row groups -> 256 one-row pages per group for the vector column.
    assert _pages_per_rg(out, "vec") == [256, 256, 88]


def test_other_columns_keep_normal_pages(built):
    """THE closed divergence: non-embedding columns must NOT inherit the
    vector column's tiny page size."""
    _, out, _ = built
    for col in ("id", "score"):
        for n_pages in _pages_per_rg(out, col):
            assert n_pages is None or n_pages <= 2, (
                f"{col} got tiny pages: {n_pages} per 256-row group"
            )


def test_column_properties_preserved(built):
    src, out, _ = built
    md_src = pq.ParquetFile(src).metadata.row_group(0)
    md_out = pq.ParquetFile(out).metadata.row_group(0)
    src_cols = {
        md_src.column(i).path_in_schema: md_src.column(i)
        for i in range(md_src.num_columns)
    }
    out_cols = {
        md_out.column(i).path_in_schema: md_out.column(i)
        for i in range(md_out.num_columns)
    }
    assert set(src_cols) == set(out_cols)
    for path, sc in src_cols.items():
        oc = out_cols[path]
        assert oc.compression == sc.compression, path
        if path.startswith("tag"):
            assert any("DICTIONARY" in e for e in oc.encodings)
        if path.startswith("vec"):
            assert not any("DICTIONARY" in e for e in oc.encodings)


def test_column_order_and_data_roundtrip(built):
    src, out, x = built
    t_src = pq.read_table(src)
    t_out = pq.read_table(out)
    assert t_out.column_names == t_src.column_names
    np.testing.assert_array_equal(
        t_out.column("id").to_numpy(), t_src.column("id").to_numpy()
    )
    assert t_out.column("tag").to_pylist() == t_src.column("tag").to_pylist()
    got = np.array(t_out.column("vec").to_pylist(), np.float32)
    np.testing.assert_allclose(got, x)


def test_merged_file_serves_queries(built):
    _, out, x = built
    res = TopkBuilder(out, x[17]).k(3).nprobe(8).search()
    assert res[0].row_idx == 17
    r = PageSelectiveReader(out, EmbeddingColumn("vec"))
    assert r.supports_page_reads
    rows = np.array([1, 300, 599])
    np.testing.assert_allclose(r.read_rows(rows, 64), x[rows], rtol=1e-6)


def test_merge_rejects_misaligned_parts(tmp_path):
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"x": list(range(100))}), a, row_group_size=50)
    pq.write_table(pa.table({"y": list(range(100))}), b, row_group_size=40)
    from pqvector_tpu.errors import ValidationError

    with pytest.raises(ValidationError):
        merge_parquet_files([a, b], str(tmp_path / "m.parquet"))


def test_merge_single_part_roundtrip(tmp_path):
    a = str(tmp_path / "a.parquet")
    out = str(tmp_path / "m.parquet")
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1000, 500)
    pq.write_table(pa.table({"x": vals}), a, row_group_size=128)
    merge_parquet_files([a], out)
    np.testing.assert_array_equal(
        pq.read_table(out).column("x").to_numpy(), vals
    )


def test_merge_many_row_groups_long_list_header(tmp_path):
    """>=15 row groups exercises the compact-protocol long list header."""
    src = str(tmp_path / "src.parquet")
    out = str(tmp_path / "out.parquet")
    rng = np.random.default_rng(9)
    n, dim = 2000, 64
    x = rng.standard_normal((n, dim)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(np.arange(n), pa.int64()),
                "vec": pa.array(list(x), pa.list_(pa.float32())),
            }
        ),
        src,
        row_group_size=100,  # 20 row groups
    )
    IndexBuilder(src, "vec").n_clusters(8).build_new(out)
    md = pq.ParquetFile(out).metadata
    assert md.num_row_groups == 20
    t = pq.read_table(out)
    np.testing.assert_array_equal(t.column("id").to_numpy(), np.arange(n))
    got = np.array(t.column("vec").to_pylist(), np.float32)
    np.testing.assert_allclose(got, x)
    res = TopkBuilder(out, x[55]).k(2).nprobe(8).search()
    assert res[0].row_idx == 55


def test_merge_embedding_first_column(tmp_path):
    """Embedding as the FIRST column: the merge uses (emb, rest) part order
    and must still preserve the original column order."""
    src = str(tmp_path / "src.parquet")
    out = str(tmp_path / "out.parquet")
    rng = np.random.default_rng(4)
    n, dim = 500, 64
    x = rng.standard_normal((n, dim)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec": pa.array(list(x), pa.list_(pa.float32())),
                "id": pa.array(np.arange(n), pa.int64()),
            }
        ),
        src,
        row_group_size=200,
    )
    IndexBuilder(src, "vec").n_clusters(4).build_new(out)
    t = pq.read_table(out)
    assert t.column_names == ["vec", "id"]
    np.testing.assert_array_equal(t.column("id").to_numpy(), np.arange(n))
    assert _pages_per_rg(out, "vec")[0] == 200  # 1-row pages
    for p in _pages_per_rg(out, "id"):
        assert p is None or p <= 2
