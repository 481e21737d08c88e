"""pqvector-tpu: TPU-native vector similarity search on plain Parquet files.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``XiangpengHao/pq-vector`` (see SURVEY.md): IVF-flat indexes trained on the
MXU, embedded *inside* Parquet files (which stay readable by pandas/pyarrow),
and served through both a standalone top-k API and a SQL-style engine with a
``ORDER BY array_distance(col, [q]) LIMIT k`` rewrite.

Public facade mirrors /root/reference/src/lib.rs:35-38.
"""

from .utils.cache import enable_compilation_cache as _enable_cache

_enable_cache()

from .builder import IndexBuilder
from .errors import (
    ExecutionError,
    FormatError,
    PlanError,
    PqVectorError,
    ValidationError,
)
from .index import IvfBuildConfig, IvfIndex, build_ivf_index
from .io.embed import has_pq_vector_index
from .query import DeviceIvfSearcher, SearchResult, TopkBuilder
from .types import ClusterCount, EmbeddingColumn, EmbeddingDim, Embeddings

__version__ = "0.1.0"

__all__ = [
    "ClusterCount",
    "DeviceIvfSearcher",
    "EmbeddingColumn",
    "EmbeddingDim",
    "Embeddings",
    "ExecutionError",
    "FormatError",
    "IndexBuilder",
    "IvfBuildConfig",
    "IvfIndex",
    "PlanError",
    "PqVectorError",
    "SearchResult",
    "TopkBuilder",
    "ValidationError",
    "build_ivf_index",
    "has_pq_vector_index",
    "__version__",
]
