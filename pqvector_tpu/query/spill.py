"""Spilled (multi-)assignment: boundary rows replicated into their
runner-up cluster to lift IVF probe recall at unchanged nprobe.

The probed modes' residual recall loss is probed-union misses — the true
neighbor's home cluster is not among the query's ``nprobe`` nearest
centroids (measured on DEEP-10M: bincompact recall stuck at 0.9504 under
bin expansion, so collisions are NOT the limiter). Raising nprobe grows
the covered fraction for every query; spilling instead duplicates only
the rows that are nearly equidistant between two centroids — the rows
queries actually miss — into their runner-up cluster. Classic
multi-assignment (the idea behind ScaNN's spilled/SOAR assignment);
the reference's single-assignment IVF (/root/reference/src/ivf/index.rs)
has no equivalent, this is a TPU-framework extension.

TPU-first shape: the runner-up assignment is ONE device dispatch
(``lax.map`` over fixed row blocks, MXU matmuls), and the extended
layout is the same cluster-sorted contiguous-range layout every device
mode already uses — probed modes work unchanged; only the final top-k
needs an id-dedup pass (``DeviceIvfSearcher`` selects ``2k`` and
dedups, since a row appears at most twice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ValidationError
from ..index.ivf import IvfIndex


@functools.partial(jax.jit, static_argnames=("block",))
def _runner_up_blocks(emb, centroids, c_sq, primary, block: int):
    """Per-row runner-up cluster + margin, one dispatch.

    emb [n_pad, d] (padded to a multiple of ``block``; any float dtype —
    bfloat16 halves the host->device ship for this one-shot pass and only
    perturbs WHICH rows sit near the margin threshold, never correctness),
    primary [n_pad] int32. Returns (runner [n_pad] int32, margin [n_pad]
    f32) where margin = d2(runner) - d2(primary) >= 0 (up to float error).
    """
    n_pad, d = emb.shape
    nb = n_pad // block

    def one(args):
        x, prim = args
        # [block, kc] squared-L2 up to the query-norm constant (shared by
        # all clusters, so argmin is unaffected — same trick as assign).
        s = c_sq[None, :] - 2.0 * (
            x @ centroids.astype(x.dtype).T
        ).astype(jnp.float32)
        pd = jnp.take_along_axis(s, prim[:, None], axis=1)[:, 0]
        masked = jnp.where(
            jax.nn.one_hot(prim, s.shape[1], dtype=bool), jnp.inf, s
        )
        r = jnp.argmin(masked, axis=1).astype(jnp.int32)
        rd = jnp.min(masked, axis=1)
        return r, rd - pd

    runner, margin = jax.lax.map(
        one, (emb.reshape(nb, block, d), primary.reshape(nb, block))
    )
    return runner.reshape(-1), margin.reshape(-1)


def dedup_topk_np(
    d: np.ndarray, ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side analog of device.py:_dedup_topk for the distributed
    searchers (their public API returns numpy): collapse duplicate ids in
    ascending-by-distance [B, m] candidates to the k nearest distinct.
    Keep-first rides the stable argsort; invalid slots (id -1, distance
    inf) stay at the tail."""
    m = ids.shape[1]
    if k >= m:
        return d, ids
    order = np.argsort(ids, axis=1, kind="stable")
    ids_s = np.take_along_axis(ids, order, axis=1)
    dup_s = np.zeros_like(ids_s, dtype=bool)
    dup_s[:, 1:] = (ids_s[:, 1:] == ids_s[:, :-1]) & (ids_s[:, 1:] >= 0)
    inv = np.argsort(order, axis=1, kind="stable")
    dup = np.take_along_axis(dup_s, inv, axis=1)
    d_m = np.where(dup, np.inf, d)
    idx = np.argsort(d_m, axis=1, kind="stable")[:, :k]
    return (
        np.take_along_axis(d_m, idx, axis=1),
        np.take_along_axis(np.where(dup, -1, ids), idx, axis=1),
    )


def runner_up_assignment(
    embeddings: np.ndarray,
    index: IvfIndex,
    block: int = 65536,
    assign_dtype=jnp.float32,
) -> tuple[np.ndarray, np.ndarray]:
    """(runner [n] int32, margin [n] f32) for every row of ``embeddings``.

    The primary assignment is taken from the INDEX (not recomputed), so a
    row whose nearest centroid drifted from its stored list still spills
    relative to where searches will actually find it.
    """
    n, d = embeddings.shape
    if n != index.total_rows:
        raise ValidationError(
            f"embeddings rows {n} != index rows {index.total_rows}"
        )
    if index.n_clusters < 2:
        raise ValidationError("spill needs at least 2 clusters")
    primary = np.empty(n, np.int32)
    primary[index.row_ids] = np.repeat(
        np.arange(index.n_clusters, dtype=np.int32), index.cluster_sizes()
    )
    block = max(128, min(block, 1 << 20))
    n_pad = -(-n // block) * block
    emb_p = np.zeros((n_pad, d), jnp.dtype(assign_dtype))
    emb_p[:n] = embeddings
    prim_p = np.zeros(n_pad, np.int32)
    prim_p[:n] = primary
    cents = jnp.asarray(index.centroids, jnp.float32)
    c_sq = jnp.sum(cents * cents, axis=1)
    runner, margin = _runner_up_blocks(
        jnp.asarray(emb_p), cents, c_sq, jnp.asarray(prim_p), block
    )
    return np.asarray(runner)[:n], np.asarray(margin)[:n]


def build_spilled_layout(
    index: IvfIndex,
    embeddings: np.ndarray,
    spill: float,
    block: int = 65536,
    assign_dtype=jnp.float32,
) -> tuple[IvfIndex, np.ndarray, np.ndarray]:
    """Extended cluster-sorted layout with the ``spill`` fraction of rows
    (smallest runner-up margin first) duplicated into their runner-up
    cluster.

    Returns (ext_index, ext_embeddings, gid):
      * ext_index — identity ``row_ids`` over ``n + n_spill`` rows whose
        CSR lists are the contiguous cluster ranges of the sorted layout,
      * ext_embeddings [n + n_spill, d] in that order,
      * gid [n + n_spill] int32 — ORIGINAL row id per extended position
        (spill copies point back at their source row).
    """
    if not 0.0 < spill <= 1.0:
        raise ValidationError(f"spill fraction must be in (0, 1], got {spill}")
    embeddings = np.ascontiguousarray(embeddings, np.float32)
    n = embeddings.shape[0]
    runner, margin = runner_up_assignment(
        embeddings, index, block=block, assign_dtype=assign_dtype
    )
    n_spill = min(n, max(1, int(round(spill * n))))
    spill_rows = np.argpartition(margin, n_spill - 1)[:n_spill].astype(np.int64)

    primary = np.empty(n, np.int32)
    primary[index.row_ids] = np.repeat(
        np.arange(index.n_clusters, dtype=np.int32), index.cluster_sizes()
    )
    ext_orig = np.concatenate([np.arange(n, dtype=np.int64), spill_rows])
    ext_cluster = np.concatenate([primary, runner[spill_rows]])
    order = np.argsort(ext_cluster, kind="stable")
    gid = ext_orig[order].astype(np.int32)
    ext_emb = np.ascontiguousarray(embeddings[ext_orig[order]])

    sizes = np.bincount(ext_cluster, minlength=index.n_clusters)
    offsets = np.zeros(index.n_clusters + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    ext_index = IvfIndex(
        dim=index.dim,
        n_clusters=index.n_clusters,
        centroids=index.centroids,
        list_offsets=offsets,
        row_ids=np.arange(n + n_spill, dtype=np.uint32),
    )
    return ext_index, ext_emb, gid
