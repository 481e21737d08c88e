"""Cosine metric extension tests (BASELINE.md config 3)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu import IndexBuilder, TopkBuilder, ValidationError
from pqvector_tpu.io.embed import read_index_metric
from pqvector_tpu.query.device import DeviceIvfSearcher


@pytest.fixture()
def cosine_path(tmp_path):
    path = tmp_path / "cos.parquet"
    rng = np.random.default_rng(9)
    # Vectors with very different magnitudes but controlled directions: L2
    # and cosine rankings disagree.
    dirs = rng.standard_normal((200, 8)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    scales = rng.uniform(0.1, 50.0, (200, 1)).astype(np.float32)
    vecs = dirs * scales
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(200), pa.int32()),
                "vec": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        ),
        path,
    )
    IndexBuilder(path, "vec").n_clusters(4).metric("cosine").build_inplace()
    return path, vecs


def cosine_order(vecs, q, k):
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = vn @ qn
    return np.argsort(-sims, kind="stable")[:k]


def test_metric_recorded_in_footer(cosine_path):
    path, _ = cosine_path
    assert read_index_metric(path) == "cosine"
    kv = pq.ParquetFile(path).metadata.metadata
    assert kv[b"pq_vector_metric"] == b"cosine"


def test_standalone_search_uses_cosine(cosine_path):
    path, vecs = cosine_path
    q = vecs[17] * 3.0  # same direction, different magnitude
    results = TopkBuilder(path, q).k(5).nprobe(4).search()
    want = cosine_order(vecs, q, 5)
    assert [r.row_idx for r in results] == want.tolist()
    # Top hit is the same-direction vector, distance ~0 on the unit sphere.
    assert results[0].row_idx == 17
    assert results[0].distance < 1e-3


def test_device_searcher_cosine(cosine_path):
    path, vecs = cosine_path
    searcher = DeviceIvfSearcher.from_parquet(path, row_tile=64)
    assert searcher.metric == "cosine"
    q = vecs[[3, 90]] * np.array([[10.0], [0.01]], np.float32)
    dists, ids = searcher.search(q, k=5, nprobe=4)
    for b in range(2):
        want = cosine_order(vecs, q[b], 5)
        np.testing.assert_array_equal(np.asarray(ids[b]), want)


def test_l2_default_unchanged(tmp_path):
    path = tmp_path / "l2.parquet"
    vecs = np.array([[1.0, 0.0], [10.0, 0.0], [0.0, 1.0]], np.float32)
    pq.write_table(
        pa.table({"vec": pa.array(list(vecs), pa.list_(pa.float32()))}), path
    )
    IndexBuilder(path, "vec").n_clusters(1).build_inplace()
    assert read_index_metric(path) == "l2"
    results = TopkBuilder(path, np.array([2.0, 0.0])).k(1).nprobe(1).search()
    assert results[0].row_idx == 0  # L2 picks the closer point, not same-dir


def test_invalid_metric_rejected(tmp_path):
    with pytest.raises(ValidationError):
        IndexBuilder(tmp_path / "x.parquet", "vec").metric("dot")


def test_engine_probe_uses_cosine_space(tmp_path):
    """On a cosine-indexed file the SQL index probe must normalize the query
    before choosing clusters; otherwise a large-magnitude query lands in the
    wrong clusters entirely."""
    from pqvector_tpu.engine import Session, VectorTopKOptions

    rng = np.random.default_rng(12)
    dirs = rng.standard_normal((120, 6)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    scales = rng.uniform(0.5, 20.0, (120, 1)).astype(np.float32)
    vecs = dirs * scales
    path = tmp_path / "cos.parquet"
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(120), pa.int32()),
                "vec": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        ),
        path,
    )
    IndexBuilder(path, "vec").n_clusters(4).metric("cosine").build_inplace()

    # Query = row 31's direction scaled hugely.
    q = vecs[31] * 100.0
    lit = "[" + ", ".join(str(v) for v in q) + "]"
    session = Session(VectorTopKOptions(nprobe=1))
    session.register_parquet("t", path)
    out = session.sql(
        f"SELECT id FROM t ORDER BY array_distance(vec, {lit}) LIMIT 5"
    ).collect()
    # nprobe=1 on normalized space must surface row 31's cluster; row 31
    # itself is the directionally-identical candidate, so it must appear.
    assert 31 in out.column("id").to_pylist()


def test_rebuild_with_l2_strips_stale_metric_key(cosine_path):
    """Rebuilding an indexed cosine file with the default l2 metric must
    strip the old ``pq_vector_metric`` key (both the native append path and
    the Python fallback drop all pq keys before splicing new ones); a stale
    cosine flag would make every later search normalize queries against an
    L2-built index."""
    path, vecs = cosine_path
    assert read_index_metric(path) == "cosine"
    IndexBuilder(path, "vec").n_clusters(4).build_inplace()  # default l2
    assert read_index_metric(path) == "l2"
    kv = pq.ParquetFile(path).metadata.metadata
    assert b"pq_vector_metric" not in kv
    # And the search surface agrees with L2 again: nearest by raw L2.
    q = vecs[17] * 3.0
    results = TopkBuilder(path, q).k(3).nprobe(4).search()
    d = np.linalg.norm(vecs - q, axis=1)
    assert [r.row_idx for r in results] == np.argsort(d, kind="stable")[:3].tolist()
