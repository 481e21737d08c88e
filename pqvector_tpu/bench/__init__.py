"""Benchmark harnesses and dataset loaders (reference layer: benches/)."""

from .datasets import (
    random_query,
    read_bvecs,
    read_fvecs,
    read_ivecs,
    synthetic_embeddings,
    write_embedding_parquet,
)

__all__ = [
    "random_query",
    "read_bvecs",
    "read_fvecs",
    "read_ivecs",
    "synthetic_embeddings",
    "write_embedding_parquet",
]
