"""Multi-chip (ICI mesh) execution: shard_map k-means and query fan-out."""

from .build import build_ivf_index_distributed
from .kmeans import distributed_lloyd
from .mesh import DATA_AXIS, make_mesh, replicate, shard_rows
from .search import DistributedExactSearcher, DistributedIvfSearcher

__all__ = [
    "DATA_AXIS",
    "DistributedExactSearcher",
    "build_ivf_index_distributed",
    "DistributedIvfSearcher",
    "distributed_lloyd",
    "make_mesh",
    "replicate",
    "shard_rows",
]
