"""Multi-chip (ICI mesh) execution: shard_map k-means and query fan-out."""

from .build import build_ivf_index_distributed
from .kmeans import distributed_lloyd
from .mesh import (
    CLUSTER_AXIS,
    DATA_AXIS,
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_rows,
)
from .search import (
    DistributedClusterIvfSearcher,
    DistributedExactSearcher,
    DistributedIvfSearcher,
)

__all__ = [
    "CLUSTER_AXIS",
    "DATA_AXIS",
    "DistributedClusterIvfSearcher",
    "DistributedExactSearcher",
    "build_ivf_index_distributed",
    "DistributedIvfSearcher",
    "distributed_lloyd",
    "make_mesh",
    "make_mesh_2d",
    "replicate",
    "shard_rows",
]
