"""Standalone TopkBuilder search tests.

Fixture mirrors the reference end-to-end test vectors
(/root/reference/src/df_vector/tests.rs:31-39); semantics per
/root/reference/src/ivf/search.rs:83-142 (sqrt distances, ascending order,
dim checks, k/nprobe validation)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu import ValidationError
from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.query.search import TopkBuilder, topk_batch

VECS = [
    [0.0, 0.0],
    [1.0, 0.0],
    [0.0, 2.0],
    [5.0, 5.0],
    [2.0, 2.0],
    [0.1, 0.1],
]


@pytest.fixture()
def indexed_path(tmp_path):
    path = tmp_path / "data.parquet"
    table = pa.table(
        {
            "id": pa.array(range(6), pa.int32()),
            "vec": pa.array(VECS, pa.list_(pa.float32())),
        }
    )
    pq.write_table(table, path)
    IndexBuilder(path, "vec").n_clusters(2).build_inplace()
    return path


def test_topk_exact_order(indexed_path):
    results = TopkBuilder(indexed_path, np.array([0.0, 0.0])).k(3).nprobe(64).search()
    assert [r.row_idx for r in results] == [0, 5, 1]
    dists = [r.distance for r in results]
    np.testing.assert_allclose(
        dists, [0.0, np.sqrt(0.02), 1.0], rtol=1e-6, atol=1e-7
    )
    assert dists == sorted(dists)


def test_topk_k_larger_than_candidates(indexed_path):
    results = TopkBuilder(indexed_path, np.array([0.0, 0.0])).k(100).nprobe(64).search()
    assert len(results) == 6


def test_dim_mismatch(indexed_path):
    with pytest.raises(ValidationError, match="dimension mismatch"):
        TopkBuilder(indexed_path, np.array([0.0, 0.0, 0.0])).k(1).nprobe(1).search()


def test_k_nprobe_validation(indexed_path):
    with pytest.raises(ValidationError):
        TopkBuilder(indexed_path, np.zeros(2)).k(0)
    with pytest.raises(ValidationError):
        TopkBuilder(indexed_path, np.zeros(2)).nprobe(0)
    with pytest.raises(ValidationError, match="k must be set"):
        TopkBuilder(indexed_path, np.zeros(2)).search()
    with pytest.raises(ValidationError, match="nprobe must be set"):
        TopkBuilder(indexed_path, np.zeros(2)).k(1).search()


def test_nprobe_limits_candidates(indexed_path):
    # nprobe=1 probes only the nearest cluster; results come from it alone.
    results = TopkBuilder(indexed_path, np.array([5.0, 5.0])).k(6).nprobe(1).search()
    assert len(results) < 6
    assert results[0].row_idx == 3


def test_batch_matches_single(indexed_path):
    queries = np.array([[0.0, 0.0], [5.0, 5.0], [0.0, 2.0]], np.float32)
    batched = topk_batch(indexed_path, queries, k=3, nprobe=64)
    for q, got in zip(queries, batched):
        single = TopkBuilder(indexed_path, q).k(3).nprobe(64).search()
        assert [r.row_idx for r in got] == [r.row_idx for r in single]
        np.testing.assert_allclose(
            [r.distance for r in got], [r.distance for r in single], rtol=1e-6
        )


def test_search_on_multi_row_group_file(tmp_path):
    path = tmp_path / "rg.parquet"
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((300, 4)).astype(np.float32)
    table = pa.table(
        {
            "id": pa.array(range(300), pa.int32()),
            "vec": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    pq.write_table(table, path, row_group_size=64)
    IndexBuilder(path, "vec").n_clusters(8).build_inplace()

    q = vecs[123]
    results = TopkBuilder(path, q).k(5).nprobe(8).search()
    # nprobe == n_clusters -> exhaustive: must match brute force exactly.
    d = ((vecs - q) ** 2).sum(1)
    expect = np.argsort(d, kind="stable")[:5]
    assert [r.row_idx for r in results] == expect.tolist()
    np.testing.assert_allclose(
        [r.distance for r in results], np.sqrt(d[expect]), rtol=1e-5
    )


def test_search_on_cluster_sorted_file(tmp_path):
    """cluster_sorted rewrite: candidates are contiguous; results must match
    the unsorted build's results by vector identity."""
    src = tmp_path / "src.parquet"
    dst = tmp_path / "sorted.parquet"
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((400, 8)).astype(np.float32)
    table = pa.table(
        {
            "id": pa.array(range(400), pa.int32()),
            "vec": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    pq.write_table(table, src)
    IndexBuilder(src, "vec").n_clusters(8).cluster_sorted().build_new(dst)

    q = vecs[50]
    results = TopkBuilder(dst, q).k(5).nprobe(8).search()
    # nprobe == n_clusters -> exhaustive; map back through the permutation.
    sorted_ids = pq.read_table(dst).column("id").to_pylist()
    got_original_ids = [sorted_ids[r.row_idx] for r in results]
    d = ((vecs - q) ** 2).sum(1)
    want = np.argsort(d, kind="stable")[:5].tolist()
    assert got_original_ids == want


def test_engine_on_cluster_sorted_file(tmp_path):
    from pqvector_tpu.engine import Session, VectorTopKOptions

    src = tmp_path / "src.parquet"
    dst = tmp_path / "sorted.parquet"
    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((300, 6)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(300), pa.int32()),
                "vec": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        ),
        src,
    )
    IndexBuilder(src, "vec").n_clusters(6).cluster_sorted().build_new(dst)
    session = Session(VectorTopKOptions(nprobe=6))
    session.register_parquet("t", dst)
    q = vecs[123]
    lit = "[" + ", ".join(str(v) for v in q) + "]"
    out = session.sql(
        f"SELECT id FROM t ORDER BY array_distance(vec, {lit}) LIMIT 4"
    ).collect()
    d = ((vecs - q) ** 2).sum(1)
    want = np.argsort(d, kind="stable")[:4].tolist()
    assert out.column("id").to_pylist() == want
