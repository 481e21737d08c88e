"""Golden-bytes interop fixture (round-4 VERDICT item 9).

tests/golden/indexed.parquet is a committed, deterministic `build_new`
output (source: seeded 120x6 blobs, uncompressed, no dictionary — so the
vendored reader needs no codecs). Three independent readers must agree on
it: pyarrow, this framework, and tests/minireader.py (from-scratch,
imports neither). The fixture also pins the full wire format — footer KV
keys, payload framing, LE index layout — against silent drift: the bytes
in git ARE the contract (/root/reference/src/ivf/parquet.rs:105-112).
"""

import hashlib
import os
import struct

import numpy as np
import pyarrow.parquet as pq
import pytest

from minireader import MiniParquet

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN = os.path.join(GOLDEN_DIR, "indexed.parquet")
SOURCE = os.path.join(GOLDEN_DIR, "source.parquet")

#: sha256 of the committed fixture — any byte drift is an interop break.
GOLDEN_SHA = "5aabbc827b446406"


def _golden_inputs():
    rng = np.random.default_rng(20260819)
    n, dim = 120, 6
    centers = 8.0 * rng.standard_normal((4, dim)).astype(np.float32)
    x = (centers[rng.integers(0, 4, n)] + rng.standard_normal((n, dim))).astype(
        np.float32
    )
    return x


def test_golden_bytes_pinned():
    data = open(GOLDEN, "rb").read()
    assert hashlib.sha256(data).hexdigest()[:16] == GOLDEN_SHA


def test_golden_still_plain_parquet():
    """pyarrow (the 'third-party engine' stand-in) reads the indexed file
    and sees exactly the source data."""
    t = pq.read_table(GOLDEN)
    x = _golden_inputs()
    assert t.column("id").to_pylist() == list(range(120))
    got = np.array(t.column("vec").to_pylist(), np.float32)
    np.testing.assert_array_equal(got, x)


def test_vendored_reader_agrees():
    """The from-scratch reader decodes data pages AND the embedded index
    without pqvector_tpu or pyarrow."""
    mp = MiniParquet(open(GOLDEN, "rb").read())
    assert mp.num_rows == 120
    x = _golden_inputs()
    rows = mp.read_float_lists("vec")
    np.testing.assert_array_equal(np.array(rows, np.float32), x)
    assert mp.read_int64("id") == list(range(120))
    # footer KV contract
    assert "pq_vector_index_offset" in mp.key_value
    assert mp.key_value["pq_vector_embedding_column"] == "vec"
    col, dim, k, centroids, lists = mp.read_pq_vector_index()
    assert (col, dim, k) == ("vec", 6, 4)
    assert sorted(r for lst in lists for r in lst) == list(range(120))


def test_vendored_reader_matches_framework_index():
    """Our decoder and the independent one produce identical structures."""
    from pqvector_tpu.io.embed import read_index_from_parquet

    index, col = read_index_from_parquet(GOLDEN)
    mp = MiniParquet(open(GOLDEN, "rb").read())
    mcol, dim, k, centroids, lists = mp.read_pq_vector_index()
    assert (mcol, dim, k) == (str(col), index.dim, index.n_clusters)
    np.testing.assert_array_equal(
        np.array(centroids, np.float32).reshape(k, dim), index.centroids
    )
    for c in range(k):
        np.testing.assert_array_equal(
            np.array(lists[c], np.uint32), index.cluster_rows(c)
        )


def test_golden_query_results_pinned():
    """A top-k query against the golden file returns pinned neighbors."""
    from pqvector_tpu import TopkBuilder

    x = _golden_inputs()
    res = TopkBuilder(GOLDEN, x[7]).k(3).nprobe(4).search()
    assert [r.row_idx for r in res][0] == 7
    assert res[0].distance == pytest.approx(0.0, abs=1e-5)
    d = np.sqrt(((x - x[7][None, :]) ** 2).sum(1))
    want = np.argsort(d, kind="stable")[:3]
    assert [r.row_idx for r in res] == want.tolist()


def test_golden_regenerates_byte_identical(tmp_path):
    """build_new is deterministic: regenerating from the seeded inputs
    reproduces the committed bytes exactly (pins writer-property
    preservation + payload + footer rewrite end-to-end). Skips if the
    pyarrow version differs from the fixture's writer."""
    import pyarrow as pa

    if pa.__version__ != "25.0.0":
        pytest.skip(f"fixture written with pyarrow 25.0.0, have {pa.__version__}")
    from pqvector_tpu.builder import IndexBuilder

    x = _golden_inputs()
    src = tmp_path / "s.parquet"
    out = tmp_path / "o.parquet"
    pq.write_table(
        pa.table(
            {
                "id": pa.array(np.arange(120), pa.int64()),
                "vec": pa.array(list(x), pa.list_(pa.float32())),
            }
        ),
        src,
        row_group_size=48,
        use_dictionary=False,
        compression="none",
    )
    assert open(src, "rb").read() == open(SOURCE, "rb").read()
    IndexBuilder(src, "vec").n_clusters(4).build_new(out)
    assert open(out, "rb").read() == open(GOLDEN, "rb").read()


def test_vendored_reader_rejects_unsupported():
    """The oracle must fail loudly outside its subset, not misread."""
    data = bytearray(open(GOLDEN, "rb").read())
    with pytest.raises(ValueError, match="not a parquet file"):
        MiniParquet(bytes(data[4:]))
    mp = MiniParquet(open(GOLDEN, "rb").read())
    with pytest.raises(KeyError):
        mp._leaf("nope")
    # corrupt payload magic
    off = int(mp.key_value["pq_vector_index_offset"])
    data[off] ^= 0xFF
    with pytest.raises(ValueError, match="magic"):
        MiniParquet(bytes(data)).read_pq_vector_index()
