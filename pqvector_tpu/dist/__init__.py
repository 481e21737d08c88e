"""Multi-chip (ICI mesh) execution: shard_map k-means and query fan-out."""

from .kmeans import distributed_lloyd
from .mesh import DATA_AXIS, make_mesh, replicate, shard_rows
from .search import DistributedExactSearcher, DistributedIvfSearcher

__all__ = [
    "DATA_AXIS",
    "DistributedExactSearcher",
    "DistributedIvfSearcher",
    "distributed_lloyd",
    "make_mesh",
    "replicate",
    "shard_rows",
]
