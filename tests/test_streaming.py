"""Streaming build path tests: batch-at-a-time assignment == in-memory."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu.errors import ValidationError
from pqvector_tpu.index.kmeans import assign_clusters
from pqvector_tpu.index.streaming import (
    assign_clusters_streaming,
    iter_embedding_batches,
    sample_embeddings_streaming,
)
from pqvector_tpu.types import EmbeddingColumn


@pytest.fixture(scope="module")
def parquet_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("stream") / "s.parquet"
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((1000, 8)).astype(np.float32)
    pq.write_table(
        pa.table({"embedding": pa.array(list(vecs), pa.list_(pa.float32()))}),
        path,
        row_group_size=128,
    )
    return path, vecs


def test_iter_batches_covers_all_rows(parquet_path):
    path, vecs = parquet_path
    got = np.concatenate(
        list(iter_embedding_batches(path, EmbeddingColumn("embedding"), 256))
    )
    np.testing.assert_allclose(got, vecs)


def test_streaming_assignment_matches_in_memory(parquet_path):
    path, vecs = parquet_path
    rng = np.random.default_rng(0)
    centroids = rng.standard_normal((7, 8)).astype(np.float32)
    streamed = assign_clusters_streaming(
        path, EmbeddingColumn("embedding"), centroids, batch_rows=200
    )
    full = assign_clusters(vecs, centroids)
    np.testing.assert_array_equal(streamed, full)


def test_streaming_sample_deterministic(parquet_path):
    path, vecs = parquet_path
    a = sample_embeddings_streaming(
        path, EmbeddingColumn("embedding"), 50, 1000, seed=3, batch_rows=128
    )
    b = sample_embeddings_streaming(
        path, EmbeddingColumn("embedding"), 50, 1000, seed=3, batch_rows=333
    )
    np.testing.assert_array_equal(a, b)
    # Every sampled row is a real row.
    assert all(any(np.array_equal(row, v) for v in vecs) for row in a[:5])


def test_streaming_sample_bounds(parquet_path):
    path, _ = parquet_path
    with pytest.raises(ValidationError):
        sample_embeddings_streaming(
            path, EmbeddingColumn("embedding"), 10, 2000, seed=1
        )


def test_builder_streaming_mode(tmp_path):
    from pqvector_tpu.builder import IndexBuilder
    from pqvector_tpu.io.embed import read_index_from_parquet

    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((800, 8)).astype(np.float32)
    for name, streaming in (("a", False), ("b", True)):
        path = tmp_path / f"{name}.parquet"
        pq.write_table(
            pa.table({"embedding": pa.array(list(vecs), pa.list_(pa.float32()))}),
            path,
            row_group_size=100,
        )
        b = IndexBuilder(path, "embedding").n_clusters(8).seed(5)
        if streaming:
            b = b.streaming(batch_rows=150)
        b.build_inplace()
    # The streamed build and in-memory build differ only in the training
    # sample draw (streamed sampling is host-RNG); both must be valid and
    # cover every row.
    for name in ("a", "b"):
        index, _ = read_index_from_parquet(tmp_path / f"{name}.parquet")
        assert index.total_rows == 800
        got = np.sort(np.concatenate(index.inverted_lists()))
        np.testing.assert_array_equal(got, np.arange(800))


def test_bf16_transfer_build_matches_f32_quality(tmp_path):
    """transfer_dtype="bfloat16" ships half the bytes; the index must stay
    structurally valid and cluster ~identically to the f32-wire build (only
    2^-8 input rounding separates them)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pqvector_tpu.builder import IndexBuilder
    from pqvector_tpu.errors import ValidationError
    from pqvector_tpu.index.build import IvfBuildConfig

    rng = np.random.default_rng(33)
    n, d = 3000, 16
    centers = rng.uniform(-4, 4, (8, d)).astype(np.float32)
    x = (centers[rng.integers(0, 8, n)]
         + 0.1 * rng.standard_normal((n, d))).astype(np.float32)
    flat = pa.array(x.reshape(-1), pa.float32())
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * d)
    table = pa.table(
        {"id": pa.array(np.arange(n)),
         "vec": pa.ListArray.from_arrays(offsets, flat)}
    )
    paths = []
    for name in ("f32.parquet", "bf16.parquet"):
        p = str(tmp_path / name)
        pq.write_table(table, p)
        paths.append(p)

    idx_f32 = IndexBuilder(paths[0], "vec").n_clusters(8).seed(3).build_inplace()
    idx_bf16 = (
        IndexBuilder(paths[1], "vec").n_clusters(8).seed(3)
        .transfer_dtype("bfloat16").build_inplace()
    )
    assert idx_bf16.n_clusters == 8
    assert idx_bf16.total_rows == n
    # Same clustering structure up to label permutation: compare
    # co-assignment agreement on a row sample.
    def row_labels(idx):
        lab = np.empty(n, np.int64)
        for c in range(idx.n_clusters):
            lab[idx.cluster_rows(c)] = c
        return lab

    a, b = row_labels(idx_f32), row_labels(idx_bf16)
    sample = rng.integers(0, n, (500, 2))
    same_a = a[sample[:, 0]] == a[sample[:, 1]]
    same_b = b[sample[:, 0]] == b[sample[:, 1]]
    assert (same_a == same_b).mean() >= 0.98

    with pytest.raises(ValidationError, match="transfer_dtype"):
        IvfBuildConfig(transfer_dtype="float16")
    with pytest.raises(ValidationError, match="transfer dtype"):
        IndexBuilder(paths[0], "vec").transfer_dtype("int4")


def test_transfer_dtype_auto_resolution():
    """"auto" (the default) resolves per backend: f32 off-TPU (tests and
    parity comparisons stay exact), bf16 on TPU (transfer-bound builds)."""
    from pqvector_tpu.index.build import IvfBuildConfig, resolve_transfer_dtype

    assert IvfBuildConfig().transfer_dtype == "auto"
    # CPU backend in tests -> exact wire.
    assert resolve_transfer_dtype(IvfBuildConfig()) == "float32"
    assert (
        resolve_transfer_dtype(IvfBuildConfig(transfer_dtype="bfloat16"))
        == "bfloat16"
    )
    assert (
        resolve_transfer_dtype(IvfBuildConfig(transfer_dtype="float32"))
        == "float32"
    )
