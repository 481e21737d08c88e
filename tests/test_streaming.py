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
