"""Multi-chip k-means: rows sharded over ICI, psum reductions.

This is the collective re-expression of the reference's thread-level
merge patterns (SURVEY.md §2 parallelism statement): per-thread local
inverted-list/count merges (/root/reference/src/ivf/index.rs:425-430) become
``lax.psum`` of per-shard (sums, counts, changed) inside ``shard_map``.
The result is bit-comparable to the single-chip ``_lloyd`` for the same
initial centroids: every chip assigns its row shard, the centroid update
reduces over the mesh, and the early-exit decision uses the global changed
count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..errors import ValidationError
from .mesh import DATA_AXIS, make_mesh


def _local_assign_and_accumulate(x, w, centroids, block, k):
    """Same tiled assignment + one-hot-matmul accumulate as the single-chip
    path (pqvector_tpu/index/kmeans.py), over this shard's rows."""
    n, d = x.shape
    nb = n // block
    xb = x.reshape(nb, block, d)
    wb = w.reshape(nb, block)
    cluster_iota = jnp.arange(k, dtype=jnp.int32)
    c_norm = jnp.sum(centroids * centroids, axis=1)
    ct = centroids.T

    def step(carry, inputs):
        sums, counts = carry
        xi, wi = inputs
        scores = jnp.dot(xi, ct, preferred_element_type=jnp.float32)
        assign = jnp.argmin(c_norm[None, :] - 2.0 * scores, axis=1).astype(jnp.int32)
        onehot = (assign[:, None] == cluster_iota[None, :]).astype(jnp.float32) * wi[
            :, None
        ]
        sums = sums + jnp.dot(onehot.T, xi, preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=0)
        return (sums, counts), assign

    init = (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32))
    (sums, counts), assign = jax.lax.scan(step, init, (xb, wb))
    return sums, counts, assign.reshape(-1)


def distributed_lloyd(
    x: np.ndarray,
    centroids0: np.ndarray,
    max_iters: int,
    mesh=None,
    block_rows: int = 4096,
):
    """Lloyd's iterations with rows sharded over the mesh's data axis.

    Returns (centroids [k, d], assignments [n]) identical in semantics to the
    single-chip loop: early exit on zero global reassignments, stale
    centroids for empty clusters.
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    x = np.asarray(x, dtype=np.float32)
    n, d = x.shape
    k = centroids0.shape[0]
    if k > n:
        raise ValidationError("n_clusters cannot exceed number of vectors")

    # Pad rows so every shard gets the same number of whole blocks.
    block = min(block_rows, max(8, n))
    per_dev = -(-n // n_dev)
    per_dev = -(-per_dev // block) * block
    n_pad = per_dev * n_dev
    xp = np.zeros((n_pad, d), dtype=np.float32)
    xp[:n] = x
    w = np.zeros((n_pad,), dtype=np.float32)
    w[:n] = 1.0

    xs = jax.device_put(xp, NamedSharding(mesh, P(DATA_AXIS)))
    ws = jax.device_put(w, NamedSharding(mesh, P(DATA_AXIS)))
    c0 = jax.device_put(
        np.asarray(centroids0, np.float32), NamedSharding(mesh, P())
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P(DATA_AXIS)),
        check_vma=False,
    )
    def run(x_local, w_local, centroids):
        n_local = x_local.shape[0]

        def cond(state):
            i, changed, _, _ = state
            return jnp.logical_and(
                i < max_iters, jnp.logical_or(i == 0, changed > 0)
            )

        def body(state):
            i, _, centroids, prev_assign = state
            sums, counts, assign = _local_assign_and_accumulate(
                x_local, w_local, centroids, block, k
            )
            # The collective re-expression of the reference's thread merges.
            sums = jax.lax.psum(sums, DATA_AXIS)
            counts = jax.lax.psum(counts, DATA_AXIS)
            changed_local = jnp.sum(
                jnp.where(w_local > 0, (assign != prev_assign).astype(jnp.int32), 0)
            )
            changed = jax.lax.psum(changed_local, DATA_AXIS)
            new_c = jnp.where(
                counts[:, None] > 0,
                sums / jnp.maximum(counts, 1.0)[:, None],
                centroids,
            )
            centroids = jnp.where(changed > 0, new_c, centroids)
            return i + 1, changed, centroids, assign

        init = (
            jnp.int32(0),
            jnp.int32(1),
            centroids,
            jnp.zeros((n_local,), jnp.int32),
        )
        _, _, centroids, assign = jax.lax.while_loop(cond, body, init)
        return centroids, assign

    centroids, assign = jax.jit(run)(xs, ws, c0)
    return np.asarray(centroids), np.asarray(assign)[:n]
