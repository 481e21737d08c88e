"""Distributed index construction over an ICI mesh.

Full multi-chip analog of ``build_ivf_index``
(/root/reference/src/ivf/index.rs:152-214): k-means++ seeding on the
training sample (replicated — the sample is small by construction), Lloyd's
iterations with rows sharded and `psum` reductions, then a row-sharded
assignment pass to build the inverted lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ValidationError
from ..index.build import IvfBuildConfig
from ..index.ivf import IvfIndex
from ..index.kmeans import (
    _kmeans_pp_init,
    default_n_clusters,
    sample_indices_host,
    train_sample_size,
)
from ..types import Embeddings
from .kmeans import distributed_lloyd
from .mesh import make_mesh


def build_ivf_index_distributed(
    embeddings: Embeddings,
    config: IvfBuildConfig | None = None,
    mesh=None,
) -> IvfIndex:
    """Build an IVF index with the training loop sharded over the mesh."""
    config = config or IvfBuildConfig()
    mesh = mesh or make_mesh()
    x = embeddings.data
    n = embeddings.row_count
    if n == 0:
        raise ValidationError("Cannot build IVF index with zero vectors")
    n_clusters = (
        config.n_clusters if config.n_clusters is not None else default_n_clusters(n)
    )
    if n_clusters > n:
        raise ValidationError("n_clusters cannot exceed number of vectors")

    # Training sample (5%/100k rules) — small, so seeded on one device.
    sample_size = train_sample_size(n, n_clusters)
    if sample_size == n:
        sample = jnp.asarray(x)
    else:
        # Host-side index draw (device sampling is pathological on the
        # tunneled backend; see index/kmeans.py:sample_indices_host).
        idx = sample_indices_host(config.seed ^ 0x5A5A5A5A, n, sample_size)
        sample = jnp.asarray(x[idx])

    init_key = jax.random.PRNGKey(config.seed)
    _, pp_key = jax.random.split(init_key)
    centroids0 = np.asarray(_kmeans_pp_init(sample, pp_key, n_clusters))

    # Distributed Lloyd on the sample; assignments come from the final
    # full-data pass (rows sharded too).
    centroids, _ = distributed_lloyd(
        np.asarray(sample), centroids0, config.max_iters, mesh=mesh,
        block_rows=config.block_rows,
    )
    _, assignments = distributed_lloyd(
        x, centroids, max_iters=1, mesh=mesh, block_rows=config.block_rows
    )
    # One Lloyd iteration assigns every row against `centroids` before its
    # centroid update — exactly the reference's final assignment pass
    # (index.rs:193-206); the updated centroids are discarded, the original
    # `centroids` define the index (matching the single-chip builder).
    return IvfIndex.from_assignments(centroids, assignments)
