"""Pallas TPU kernel: fused (masked) distance scan + per-tile top-k extract.

The XLA masked-scan path writes each ``[B, tile]`` score block to HBM between
the matmul and the top-k merge (~2x the data traffic of the scan itself).
This kernel keeps the block in VMEM and extracts the tile-local top-k by
iterative min-extraction (k passes over the VPU) — writing only ``[B, k]``
winners per tile. A final cross-tile top-k merge runs outside (tiny:
``[B, nt * k]``).

Masking uses the one-hot-matmul trick (``mask_f32 @ (cluster_iota == ct)``)
so no dynamic gather is needed inside the kernel; for the exact scan the
mask input is skipped entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -3.0e38
_POS_INF = 3.0e38


def score_precision(*dtypes):
    """MXU precision for selection-score matmuls.

    TPU ``Precision.DEFAULT`` truncates f32 operands to ONE bf16 pass; the
    resulting score error scales with |q||x| and on tightly clustered data
    exceeds the neighbor spacing, so argmin/bin/ApproxTopK *selection* picks
    wrong rows before any exact re-score can save them (measured on-chip:
    binscan recall@10 0.80 and XLA scan 0.59 on 32-cluster blobs vs 1.0 in
    interpret/CPU — the same failure CLAUDE.md records for bf16 *scores*).
    f32 operands therefore multiply at HIGHEST. bf16 operands keep DEFAULT:
    the MXU multiplies bf16 natively with f32 accumulation, so the only
    error is the storage quantization the caller already chose.
    """
    return (
        jax.lax.Precision.HIGHEST
        if all(jnp.dtype(d) == jnp.float32 for d in dtypes)
        else jax.lax.Precision.DEFAULT
    )


def _extract_topk(partial: jnp.ndarray, base: jnp.ndarray, k: int):
    """Tile-local top-k by iterative min extraction (k small).

    Row ids are ``base + column``, so no gather is needed — only min/argmin
    (f32, Mosaic-supported), iota compares, and selects. Cost: ~3k passes
    over the tile.

    A hierarchical group-min variant (top-k groups by min -> one-hot-matmul
    gather -> tiny exact extraction) was measured at 10.1 ms vs 12.5 ms for
    the exact scan but produced wrong ids under compiled Mosaic (interpret
    mode was exact) — suspect the in-kernel [B,T]->[B,G,S] reshape or the
    batched dot_general lowering. Revisit with a Mosaic-native layout.
    """
    b, t = partial.shape
    out_d = []
    out_i = []
    work = partial
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    for _ in range(k):
        best = jnp.min(work, axis=1)  # [B]
        first = jnp.argmin(work, axis=1).astype(jnp.int32)  # [B], first min
        out_d.append(best)
        out_i.append(base + first)
        work = jnp.where(col_iota == first[:, None], _POS_INF, work)
    return jnp.stack(out_d, axis=1), jnp.stack(out_i, axis=1)  # [B, k]


def _scan_kernel(q_ref, emb_ref, sq_ref, out_d_ref, out_i_ref, *, k, tile):
    i = pl.program_id(0)
    scores = jnp.dot(
        q_ref[:], emb_ref[:].T, preferred_element_type=jnp.float32,
        precision=score_precision(q_ref.dtype, emb_ref.dtype),
    )  # [B, T]
    partial = sq_ref[0] - 2.0 * scores  # sq block is [1, 1, tile] -> [1, T]
    d, idx = _extract_topk(partial, i * tile, k)
    out_d_ref[0] = d
    out_i_ref[0] = idx


def _masked_scan_kernel(
    q_ref, emb_ref, sq_ref, cl_ref, mask_ref, out_d_ref, out_i_ref, *, k, tile, kc
):
    i = pl.program_id(0)
    scores = jnp.dot(
        q_ref[:], emb_ref[:].T, preferred_element_type=jnp.float32,
        precision=score_precision(q_ref.dtype, emb_ref.dtype),
    )  # [B, T]
    partial = sq_ref[0] - 2.0 * scores  # sq block is [1, 1, tile] -> [1, T]
    # probed[b, t] = mask[b, cl[t]] via one-hot matmul (no dynamic gather).
    # Cluster ids ship as f32 (exact below 2^24): int32 (1, 1, tile) blocks
    # mis-lower on this Mosaic version (observed id scrambling on chip).
    onehot = (
        cl_ref[0]  # [1, T] f32
        == jax.lax.broadcasted_iota(jnp.int32, (kc, tile), 0).astype(jnp.float32)
    ).astype(jnp.float32)  # [kc, T]
    probed = (
        jnp.dot(mask_ref[:], onehot, preferred_element_type=jnp.float32) > 0.5
    )  # [B, T]
    partial = jnp.where(probed, partial, _POS_INF)
    d, idx = _extract_topk(partial, i * tile, k)
    out_d_ref[0] = d
    out_i_ref[0] = idx


def _masked_local_scan_kernel(
    q_ref,
    emb_ref,
    sq_ref,
    lcl_ref,
    lmask_ref,
    out_d_ref,
    out_i_ref,
    *,
    k,
    tile,
    cmax,
):
    """Masked scan using per-tile local cluster tables.

    The global one-hot mask matmul costs ``B*kc_pad*tile`` MACs — ~9x the
    scoring matmul at kc=1024, d=128 (measured: masked ran at half the
    exact scan's QPS). With the cluster_sorted layout each tile spans only
    a handful of clusters, so the host passes ``lcl`` (each row's position
    in its tile's distinct-cluster table) and XLA pre-gathers the probe
    mask at each tile's clusters (``lmask`` [nt, B, cmax]); the in-kernel
    mask work is one tiny matmul ([B,cmax]x[cmax,T]). Id operands ship as
    f32 (exact below 2^24; int32 small blocks mis-lower on this Mosaic
    version).
    """
    i = pl.program_id(0)
    scores = jnp.dot(
        q_ref[:], emb_ref[:].T, preferred_element_type=jnp.float32,
        precision=score_precision(q_ref.dtype, emb_ref.dtype),
    )  # [B, T]
    partial = sq_ref[0] - 2.0 * scores
    onehot_l = (
        lcl_ref[0]  # [1, T] f32
        == jax.lax.broadcasted_iota(jnp.int32, (cmax, tile), 0).astype(jnp.float32)
    ).astype(jnp.float32)  # [cmax, T]
    probed = (
        jnp.dot(lmask_ref[0], onehot_l, preferred_element_type=jnp.float32) > 0.5
    )  # [B, T]
    partial = jnp.where(probed, partial, _POS_INF)
    d, idx = _extract_topk(partial, i * tile, k)
    out_d_ref[0] = d
    out_i_ref[0] = idx


def _refine(q, emb, best_d, best_i, out_k=None):
    """Direct-form re-score + stable re-sort of the winners — same
    post-processing as the XLA paths (query/device.py), so rankings agree
    bit-for-bit across implementations. ``out_k``: trim to the k best via
    index-stable ``lax.top_k`` instead of a full argsort over the fetch
    width (identical ranking; measured 2.7 ms/batch cheaper at B=8192 x
    width 20, session r4n)."""
    invalid = best_d >= _POS_INF / 2
    x = emb[jnp.maximum(best_i, 0)].astype(jnp.float32)
    diff = x - q[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(invalid, jnp.inf, d2)
    d2 = jnp.where(jnp.isnan(d2), jnp.inf, d2)
    if out_k is not None and out_k < d2.shape[1]:
        neg, pos = jax.lax.top_k(-d2, out_k)
        return -neg, jnp.take_along_axis(best_i, pos, axis=1)
    order = jnp.argsort(d2, axis=1, stable=True)
    return jnp.take_along_axis(d2, order, axis=1), jnp.take_along_axis(
        best_i, order, axis=1
    )


def _final_merge(tile_d, tile_i, k):
    """[nt, B, k] per-tile winners -> [B, k] global."""
    nt, b, _ = tile_d.shape
    all_d = jnp.transpose(tile_d, (1, 0, 2)).reshape(b, nt * k)
    all_i = jnp.transpose(tile_i, (1, 0, 2)).reshape(b, nt * k)
    neg, pos = jax.lax.top_k(-all_d, k)
    return -neg, jnp.take_along_axis(all_i, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def pallas_exact_topk(
    q: jnp.ndarray,  # [B, d]
    emb: jnp.ndarray,  # [n_pad, d], n_pad % tile == 0
    emb_sq: jnp.ndarray,  # [n_pad] (+big for pad rows; use 3e38, not inf)
    k: int,
    tile: int = 2048,
    interpret: bool = False,
    emb_ref: jnp.ndarray | None = None,  # full-precision re-score rows
    # (selection stays at storage precision in-kernel; returned
    # distances are re-scored against emb_ref when given)
):
    n_pad, d = emb.shape
    b = q.shape[0]
    nt = n_pad // tile
    qf = q.astype(emb.dtype)
    # 1-D operands are passed as [nt, 1, tile] so every block dimension
    # equals the array dimension or indexes the grid — legal for any tile
    # (1-D blocks require 1024-element alignment; (1, tile) blocks fail the
    # sublane-divisibility rule).
    sq2 = emb_sq.reshape(nt, 1, tile)

    tile_d, tile_i = pl.pallas_call(
        functools.partial(_scan_kernel, k=k, tile=tile),
        out_shape=(
            jax.ShapeDtypeStruct((nt, b, k), jnp.float32),
            jax.ShapeDtypeStruct((nt, b, k), jnp.int32),
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qf, emb, sq2)
    best_d, best_i = _final_merge(tile_d, tile_i, k)
    return _refine(q, emb if emb_ref is None else emb_ref, best_d, best_i)


@functools.partial(
    jax.jit, static_argnames=("k", "max_probe", "tile", "cmax", "interpret")
)
def pallas_masked_local_topk(
    q: jnp.ndarray,  # [B, d]
    centroids: jnp.ndarray,  # [kc, d]
    c_sq: jnp.ndarray,  # [kc]
    local_cluster: jnp.ndarray,  # [n_pad] f32: row's position in its tile's tc
    tile_clusters: jnp.ndarray,  # [nt, cmax] i32: distinct cluster ids per tile
    emb: jnp.ndarray,  # [n_pad, d]
    emb_sq: jnp.ndarray,  # [n_pad] (+3e38 pad)
    nprobe: jnp.ndarray,  # traced scalar
    k: int,
    max_probe: int,
    tile: int = 2048,
    cmax: int = 8,
    interpret: bool = False,
    emb_ref: jnp.ndarray | None = None,  # full-precision re-score rows
):
    """Masked IVF scan for cluster_sorted layouts (see _masked_local_scan_kernel)."""
    n_pad, d = emb.shape
    b = q.shape[0]
    kc = centroids.shape[0]
    nt = n_pad // tile

    c_scores = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(-(c_sq[None, :] - 2.0 * c_scores), max_probe)
    in_probe = jnp.arange(max_probe, dtype=jnp.int32)[None, :] < nprobe
    kc_pad = -(-(kc + 1) // 128) * 128
    mask = jnp.zeros((b, kc_pad), jnp.float32)
    mask = mask.at[jnp.arange(b)[:, None], probe].max(in_probe.astype(jnp.float32))

    qf = q.astype(emb.dtype)
    sq2 = emb_sq.reshape(nt, 1, tile)
    lcl2 = local_cluster.reshape(nt, 1, tile)
    # Pre-gather the probe mask at each tile's distinct clusters (tiny:
    # [B, nt, cmax]) so the kernel needs a single small matmul per tile.
    lmask = jnp.transpose(mask[:, tile_clusters], (1, 0, 2))  # [nt, B, cmax]
    tile_d, tile_i = pl.pallas_call(
        functools.partial(_masked_local_scan_kernel, k=k, tile=tile, cmax=cmax),
        out_shape=(
            jax.ShapeDtypeStruct((nt, b, k), jnp.float32),
            jax.ShapeDtypeStruct((nt, b, k), jnp.int32),
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, cmax), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qf, emb, sq2, lcl2, lmask)
    best_d, best_i = _final_merge(tile_d, tile_i, k)
    return _refine(q, emb if emb_ref is None else emb_ref, best_d, best_i)


@functools.partial(jax.jit, static_argnames=("k", "max_probe", "tile", "interpret"))
def pallas_masked_topk(
    q: jnp.ndarray,  # [B, d]
    centroids: jnp.ndarray,  # [kc, d]
    c_sq: jnp.ndarray,  # [kc]
    row_cluster: jnp.ndarray,  # [n_pad] i32 (pad rows = kc)
    emb: jnp.ndarray,  # [n_pad, d]
    emb_sq: jnp.ndarray,  # [n_pad] (+3e38 pad)
    nprobe: jnp.ndarray,  # traced scalar
    k: int,
    max_probe: int,
    tile: int = 2048,
    interpret: bool = False,
    emb_ref: jnp.ndarray | None = None,  # full-precision re-score rows
):
    n_pad, d = emb.shape
    b = q.shape[0]
    kc = centroids.shape[0]
    nt = n_pad // tile

    c_scores = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(-(c_sq[None, :] - 2.0 * c_scores), max_probe)
    in_probe = jnp.arange(max_probe, dtype=jnp.int32)[None, :] < nprobe
    # kc+pad slots so the kernel's one-hot covers pad-row cluster id == kc.
    kc_pad = -(-(kc + 1) // 128) * 128
    mask = jnp.zeros((b, kc_pad), jnp.float32)
    mask = mask.at[jnp.arange(b)[:, None], probe].max(in_probe.astype(jnp.float32))

    qf = q.astype(emb.dtype)
    sq2 = emb_sq.reshape(nt, 1, tile)
    cl2 = row_cluster.astype(jnp.float32).reshape(nt, 1, tile)
    tile_d, tile_i = pl.pallas_call(
        functools.partial(_masked_scan_kernel, k=k, tile=tile, kc=kc_pad),
        out_shape=(
            jax.ShapeDtypeStruct((nt, b, k), jnp.float32),
            jax.ShapeDtypeStruct((nt, b, k), jnp.int32),
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, kc_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qf, emb, sq2, cl2, mask)
    best_d, best_i = _final_merge(tile_d, tile_i, k)
    return _refine(q, emb if emb_ref is None else emb_ref, best_d, best_i)
