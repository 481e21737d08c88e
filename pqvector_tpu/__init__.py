"""pqvector-tpu: TPU-native vector similarity search on plain Parquet files.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``XiangpengHao/pq-vector`` (see SURVEY.md): IVF-flat indexes trained on the
MXU, embedded *inside* Parquet files (which stay readable by pandas/pyarrow),
and served through both a standalone top-k API and a SQL-style engine with a
``ORDER BY array_distance(col, [q]) LIMIT k`` rewrite.

Public facade mirrors /root/reference/src/lib.rs:35-38.
"""

from .errors import (
    ExecutionError,
    FormatError,
    PlanError,
    PqVectorError,
    ValidationError,
)
from .index import IvfBuildConfig, IvfIndex, build_ivf_index
from .types import EmbeddingColumn, EmbeddingDim, Embeddings

__version__ = "0.1.0"

__all__ = [
    "EmbeddingColumn",
    "EmbeddingDim",
    "Embeddings",
    "ExecutionError",
    "FormatError",
    "IvfBuildConfig",
    "IvfIndex",
    "PlanError",
    "PqVectorError",
    "ValidationError",
    "build_ivf_index",
    "__version__",
]
