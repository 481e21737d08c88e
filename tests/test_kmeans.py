"""TPU k-means tests (CPU backend in CI; same XLA program).

Mirrors reference behaviors: distance correctness
(/root/reference/src/ivf/index.rs:487-493), determinism per seed (:327),
default cluster count (:163-166), sampling rules (:172-174), empty-cluster
stale centroids (:446-453)."""

import numpy as np
import pytest

from pqvector_tpu import Embeddings, IvfBuildConfig, ValidationError, build_ivf_index
from pqvector_tpu.index.kmeans import (
    KMeansParams,
    assign_clusters,
    default_n_clusters,
    k_means,
    train_sample_size,
)


def make_blobs(n_per, centers, scale=0.05, seed=0):
    rng = np.random.default_rng(seed)
    centers = np.asarray(centers, np.float32)
    parts = [
        c + scale * rng.standard_normal((n_per, centers.shape[1])).astype(np.float32)
        for c in centers
    ]
    return np.concatenate(parts, axis=0)


def test_default_n_clusters():
    assert default_n_clusters(1_000_000) == 1000
    assert default_n_clusters(10) == 4
    assert default_n_clusters(1) == 1


def test_train_sample_size_rules():
    # 5%, capped at 100k, at least n_clusters, at most n.
    assert train_sample_size(1_000_000, 1000) == 50_000
    assert train_sample_size(10_000_000, 1000) == 100_000
    assert train_sample_size(100, 64) == 64
    assert train_sample_size(10, 10) == 10


def test_kmeans_separates_clear_blobs():
    centers = [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]]
    x = make_blobs(50, centers)
    centroids, assign = k_means(x, KMeansParams(n_clusters=4, seed=1))
    assert centroids.shape == (4, 2)
    # Every blob maps to exactly one cluster.
    labels = assign.reshape(4, 50)
    for b in range(4):
        assert len(np.unique(labels[b])) == 1
    assert len(np.unique(labels[:, 0])) == 4
    # Centroids land near the true centers.
    found = sorted(tuple(np.round(c).astype(int)) for c in centroids)
    assert found == sorted(tuple(np.array(c, int)) for c in centers)


def test_kmeans_deterministic_per_seed():
    x = make_blobs(30, [[0, 0], [5, 5], [0, 5]], seed=3)
    c1, a1 = k_means(x, KMeansParams(n_clusters=3, seed=42))
    c2, a2 = k_means(x, KMeansParams(n_clusters=3, seed=42))
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(a1, a2)


def test_assign_clusters_matches_brute_force():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((257, 8)).astype(np.float32)
    centroids = rng.standard_normal((13, 8)).astype(np.float32)
    got = assign_clusters(x, centroids, block_rows=64)
    d = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    want = d.argmin(axis=1)
    np.testing.assert_array_equal(got, want)


def test_build_index_validation():
    with pytest.raises(ValidationError):
        build_ivf_index(Embeddings(np.zeros((0, 2), np.float32), 2))
    with pytest.raises(ValidationError):
        build_ivf_index(
            Embeddings(np.zeros((3, 2), np.float32), 2), IvfBuildConfig(n_clusters=5)
        )
    with pytest.raises(ValidationError):
        IvfBuildConfig(max_iters=0)
    with pytest.raises(ValidationError):
        IvfBuildConfig(n_clusters=0)


def test_build_index_covers_all_rows():
    x = make_blobs(40, [[0, 0], [8, 8]], seed=5)
    index = build_ivf_index(Embeddings(x, 2), IvfBuildConfig(n_clusters=2))
    assert index.total_rows == 80
    all_rows = np.sort(np.concatenate(index.inverted_lists()))
    np.testing.assert_array_equal(all_rows, np.arange(80))


def test_build_index_default_sqrt_clusters():
    x = make_blobs(9, [[0, 0], [5, 5], [9, 0], [0, 9]], seed=2)  # n=36 -> k=6
    index = build_ivf_index(Embeddings(x, 2))
    assert index.n_clusters == 6


def test_empty_cluster_keeps_stale_centroid():
    # Two far duplicated points, 3 clusters: one cluster must end up empty and
    # its centroid must stay where k-means++ seeded it (not NaN/zero).
    x = np.array([[0, 0], [0, 0], [9, 9], [9, 9]], np.float32)
    centroids, assign = k_means(x, KMeansParams(n_clusters=3, seed=0, max_iters=5))
    assert not np.isnan(centroids).any()
    sizes = np.bincount(assign, minlength=3)
    assert (sizes == 0).sum() >= 1
    empty = int(np.argmin(sizes))
    # The stale centroid equals one of the input points (k-means++ seeds from
    # data, and empty clusters are never recomputed).
    assert any(np.allclose(centroids[empty], p) for p in x)
