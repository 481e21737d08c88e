"""Background chunk prefetch (io/prefetch.py): correctness of the
read-ahead pipeline feeding the native sequential decoder."""

import threading

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu.io.prefetch import iter_prefetched
from pqvector_tpu.io.reader import read_embedding_column


def _write(path, data: bytes) -> str:
    path.write_bytes(data)
    return str(path)


def test_yields_every_span(tmp_path):
    data = bytes(range(256)) * 64
    p = _write(tmp_path / "blob.bin", data)
    spans = [(0, 100), (100, 50), (4096, 1), (len(data) - 7, 7)]
    got = list(iter_prefetched(p, spans, lambda s: s, depth=2))
    assert [item for item, _ in got] == spans
    for (off, ln), buf in got:
        assert buf == data[off : off + ln]


def test_depth_one_and_many_items(tmp_path):
    data = b"x" * 10000
    p = _write(tmp_path / "blob.bin", data)
    spans = [(i * 100, 100) for i in range(100)]
    got = list(iter_prefetched(p, spans, lambda s: s, depth=1))
    assert len(got) == 100
    assert all(buf == b"x" * 100 for _, buf in got)


def test_early_close_stops_reader_thread(tmp_path):
    data = b"y" * 100000
    p = _write(tmp_path / "blob.bin", data)
    spans = [(i * 1000, 1000) for i in range(100)]
    before = threading.active_count()
    gen = iter_prefetched(p, spans, lambda s: s, depth=2)
    next(gen)
    gen.close()
    # The reader thread must exit promptly (close joins with a timeout).
    assert threading.active_count() <= before + 1


def test_short_read_raises(tmp_path):
    p = _write(tmp_path / "blob.bin", b"z" * 100)
    gen = iter_prefetched(p, [(0, 10), (50, 100)], lambda s: s)
    item, buf = next(gen)
    assert buf == b"z" * 10
    with pytest.raises(OSError, match="short read"):
        next(gen)


def test_span_error_propagates(tmp_path):
    p = _write(tmp_path / "blob.bin", b"z" * 100)

    def bad_span(_):
        raise RuntimeError("bad span")

    with pytest.raises(RuntimeError, match="bad span"):
        list(iter_prefetched(p, [(0, 1)], bad_span))


def test_invalid_depth(tmp_path):
    p = _write(tmp_path / "blob.bin", b"z")
    with pytest.raises(ValueError):
        list(iter_prefetched(p, [(0, 1)], lambda s: s, depth=0))


def test_full_column_read_matches_pyarrow(tmp_path):
    # Multi-row-group file: the prefetched native path must equal the
    # pyarrow reference bit-for-bit.
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((300, 16)).astype(np.float32)
    tbl = pa.table(
        {
            "id": np.arange(300, dtype=np.int64),
            "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        }
    )
    path = str(tmp_path / "multi_rg.parquet")
    pq.write_table(tbl, path, row_group_size=64)
    got = read_embedding_column(path, "embedding")
    np.testing.assert_array_equal(np.asarray(got.data), mat)


def test_streaming_batches_match(tmp_path):
    from pqvector_tpu.index.streaming import iter_embedding_batches

    rng = np.random.default_rng(12)
    mat = rng.standard_normal((257, 8)).astype(np.float32)
    tbl = pa.table({"embedding": pa.array(list(mat), pa.list_(pa.float32()))})
    path = str(tmp_path / "stream.parquet")
    pq.write_table(tbl, path, row_group_size=50)
    parts = list(iter_embedding_batches(path, "embedding"))
    np.testing.assert_array_equal(np.concatenate(parts, axis=0), mat)


def test_streaming_early_exit(tmp_path):
    # sample_embeddings_streaming breaks out of the iterator early; the
    # prefetch generator must shut down cleanly (no hang, no thread leak).
    from pqvector_tpu.index.streaming import sample_embeddings_streaming

    rng = np.random.default_rng(13)
    mat = rng.standard_normal((500, 8)).astype(np.float32)
    tbl = pa.table({"embedding": pa.array(list(mat), pa.list_(pa.float32()))})
    path = str(tmp_path / "sample.parquet")
    pq.write_table(tbl, path, row_group_size=50)
    before = threading.active_count()
    out = sample_embeddings_streaming(path, "embedding", 10, 500, seed=3)
    assert out.shape == (10, 8)
    assert threading.active_count() <= before + 1
