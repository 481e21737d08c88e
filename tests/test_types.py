"""Validated-type tests (mirrors reference newtype invariants,
/root/reference/src/ivf/mod.rs:18-102)."""

import numpy as np
import pytest

from pqvector_tpu import EmbeddingColumn, EmbeddingDim, Embeddings, ValidationError


def test_embedding_column_rejects_empty():
    with pytest.raises(ValidationError):
        EmbeddingColumn("")
    with pytest.raises(ValidationError):
        EmbeddingColumn("   ")


def test_embedding_column_accepts_name():
    assert str(EmbeddingColumn("vec")) == "vec"


def test_embedding_dim_rejects_nonpositive():
    with pytest.raises(ValidationError):
        EmbeddingDim(0)
    with pytest.raises(ValidationError):
        EmbeddingDim(-3)


def test_embedding_dim_rejects_overflow():
    with pytest.raises(ValidationError):
        EmbeddingDim(2**32)


def test_embeddings_validates_multiple_of_dim():
    with pytest.raises(ValidationError):
        Embeddings(np.zeros(7, np.float32), 2)


def test_embeddings_flat_and_matrix_forms():
    flat = Embeddings(np.arange(6, dtype=np.float32), 2)
    assert flat.row_count == 3
    assert flat.data.shape == (3, 2)
    mat = Embeddings(np.zeros((4, 3), np.float64), 3)
    assert mat.data.dtype == np.float32
    assert mat.row_count == 4


def test_embeddings_rejects_wrong_width():
    with pytest.raises(ValidationError):
        Embeddings(np.zeros((4, 3), np.float32), 2)


def test_cluster_count_validation():
    from pqvector_tpu import ClusterCount

    assert int(ClusterCount(5)) == 5
    with pytest.raises(ValidationError):
        ClusterCount(0)
    with pytest.raises(ValidationError):
        ClusterCount(-1)
    with pytest.raises(ValidationError):
        ClusterCount(2**32)
