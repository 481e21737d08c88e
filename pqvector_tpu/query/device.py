"""HBM-resident batched IVF search (the TPU query centerpiece).

The reference executes one query at a time against disk-resident data
(/root/reference/src/ivf/search.rs). On TPU the winning layout keeps the
embedding matrix resident in HBM (bf16 or f32) and amortizes device launches
over query batches (SURVEY.md §7 step 5, BASELINE config 5). Two paths:

* ``exact`` — streamed brute-force scan: ``lax.scan`` over row tiles, each
  tile one MXU matmul ``[B, T]`` plus a running top-k merge. HBM traffic is
  one pass over the matrix per *batch*, so large batches approach the
  roofline regardless of batch size.
* ``ivf`` — fused probe chain: centroid top-nprobe -> padded cluster table
  lookup -> tiled embedding gather -> distance -> running top-k. Reads only
  ``B * nprobe * Lmax * d`` bytes; wins at small batch / high selectivity.

Ragged inverted lists are handled with the static-shape strategy from
SURVEY.md §7 hard part #2: a ``[k, Lmax]`` cluster table padded with a
sentinel row id ``n`` whose (extra) embedding row has +inf squared norm, so
padding never enters the top-k.
"""

from __future__ import annotations

import functools as _functools


import os

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ValidationError
from ..kernels.binscan import (
    PROVENANCE_BITS_MAX,
    provenance_bits,
    quantize_queries_i8,
)
from ..kernels.scan_topk import score_precision
from ..index.ivf import IvfIndex
from ..io.embed import read_index_from_parquet
from ..io.reader import read_embedding_column

# NOTE: no module-level jnp constants here — they initialize the jax
# backend at import time, which blocks the whole library (host-only I/O
# paths included) for minutes when the TPU tunnel is down.


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _refine_and_sort(q, emb, best_d, best_i, out_k: int | None = None):
    """Recompute the winners' distances with the direct (x - q)^2 form.

    The |x|^2 - 2 x.q matmul form loses ~1e-3 relative precision to
    cancellation; the reference computes direct differences
    (/root/reference/src/ivf/index.rs:461-480), so the k winners are re-scored
    exactly and re-sorted (stable) before returning.

    ``out_k``: trim to the k best during the re-sort via ``lax.top_k``
    instead of a full stable argsort over the fetch width — identical
    results (top_k is index-stable on ties, NaNs are mapped to +inf so
    both paths rank them last) but 2.7 ms/batch cheaper at B=8192 x
    fetch=20 on chip (session r4n: the [B, 20] stable argsort was the
    single largest cost above the matmul+min floor, bigger than the
    re-score gather itself). ``None`` keeps the full-width sorted output.
    """
    x = emb[jnp.maximum(best_i, 0)].astype(jnp.float32)  # [B, F, d]
    diff = x - q[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(jnp.isinf(best_d), jnp.inf, d2)
    d2 = jnp.where(jnp.isnan(d2), jnp.inf, d2)
    if out_k is not None and out_k < d2.shape[1]:
        neg, pos = jax.lax.top_k(-d2, out_k)
        return -neg, jnp.take_along_axis(best_i, pos, axis=1)
    order = jnp.argsort(d2, axis=1, stable=True)
    return jnp.take_along_axis(d2, order, axis=1), jnp.take_along_axis(
        best_i, order, axis=1
    )


def _exact_topk_impl(
    q: jnp.ndarray,  # [B, d] f32
    emb: jnp.ndarray,  # [n_pad, d] (f32 or bf16)
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+inf for pad rows)
    k: int,
    tile: int,
    emb_ref: jnp.ndarray | None = None,  # full-precision re-score rows
):
    """Streaming exact top-k: scan row tiles, merge into a running [B, k].

    ``emb_ref``: on reduced-precision storage, selection scores carry the
    storage rounding (measured on DEEP-10M: bf16-rounded exact selection
    = 0.9527 recall@10 vs f32 truth — real-data neighbor margins sit
    below 2^-8). The widened 2k merge + exact re-score against the f32
    reference recovers 1.0000 (docs/PERFORMANCE.md round-3 item); f32
    storage keeps the original exact-k path.
    """
    b, d = q.shape
    n_pad = emb.shape[0]
    nt = n_pad // tile
    kf = k if emb_ref is None else min(2 * k, n_pad)
    emb_t = emb.reshape(nt, tile, d)
    sq_t = emb_sq.reshape(nt, tile)
    qf = q.astype(emb.dtype)

    def step(carry, inputs):
        best_d, best_i = carry
        ti, (xt, x2t) = inputs
        scores = jnp.dot(
            qf, xt.T, preferred_element_type=jnp.float32,
            precision=score_precision(qf.dtype, xt.dtype),
        )  # [B, T]
        partial = x2t[None, :] - 2.0 * scores
        ids = ti * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        all_d = jnp.concatenate([best_d, partial], axis=1)
        all_i = jnp.concatenate([best_i, ids], axis=1)
        neg, pos = jax.lax.top_k(-all_d, kf)
        return (-neg, jnp.take_along_axis(all_i, pos, axis=1)), None

    init = (
        jnp.full((b, kf), jnp.inf, jnp.float32),
        jnp.full((b, kf), -1, jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(
        step, init, (jnp.arange(nt, dtype=jnp.int32), (emb_t, sq_t))
    )
    d2, ids = _refine_and_sort(
        q, emb if emb_ref is None else emb_ref, best_d, best_i, k
    )
    return d2[:, :k], ids[:, :k]


def _ivf_topk_impl(
    q: jnp.ndarray,  # [B, d] f32
    centroids: jnp.ndarray,  # [kc, d] f32
    c_sq: jnp.ndarray,  # [kc] f32
    clusters: jnp.ndarray,  # [kc, Lmax] i32 (sentinel = n_pad index of inf row)
    emb: jnp.ndarray,  # [n_pad, d]
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+inf at sentinel)
    k: int,
    nprobe: int,
    tile: int,
    emb_ref: jnp.ndarray | None = None,  # full-precision re-score rows
):
    """Fused IVF probe: nprobe clusters -> tiled gather -> running top-k.

    ``emb_ref``: widened 2k merge + f32 re-score on reduced-precision
    storage (see _exact_topk_impl).
    """
    b, d = q.shape
    kf = k if emb_ref is None else 2 * k
    lmax = clusters.shape[1]

    # Probe: same ordering as IvfIndex.find_closest_centroids (stable in the
    # lower index on ties because lax.top_k is index-stable).
    c_scores = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(-(c_sq[None, :] - 2.0 * c_scores), nprobe)  # [B, P]

    cand = clusters[probe].reshape(b, nprobe * lmax)  # [B, C]
    c_total = cand.shape[1]
    c_pad = _round_up(c_total, tile)
    if c_pad != c_total:
        cand = jnp.pad(cand, ((0, 0), (0, c_pad - c_total)), constant_values=emb.shape[0] - 1)
    nt = c_pad // tile
    cand_t = cand.reshape(b, nt, tile).transpose(1, 0, 2)  # [nt, B, tile]
    qf = q.astype(emb.dtype)

    def step(carry, ids_t):
        best_d, best_i = carry
        xt = emb[ids_t]  # [B, tile, d] gather
        scores = jnp.einsum(
            "bd,btd->bt", qf, xt, preferred_element_type=jnp.float32,
            precision=score_precision(qf.dtype, xt.dtype),
        )
        partial = emb_sq[ids_t] - 2.0 * scores
        all_d = jnp.concatenate([best_d, partial], axis=1)
        all_i = jnp.concatenate([best_i, ids_t], axis=1)
        neg, pos = jax.lax.top_k(-all_d, kf)
        return (-neg, jnp.take_along_axis(all_i, pos, axis=1)), None

    init = (
        jnp.full((b, kf), jnp.inf, jnp.float32),
        jnp.full((b, kf), -1, jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(step, init, cand_t)
    d2, ids = _refine_and_sort(
        q, emb if emb_ref is None else emb_ref, best_d, best_i, k
    )
    return d2[:, :k], ids[:, :k]


def _approx_min_k_clamped(partial, k, recall_target):
    """approx_min_k that honors k > width (pads results with +inf / id 0)."""
    width = partial.shape[1]
    kk = min(k, width)
    vals, idx = jax.lax.approx_min_k(partial, kk, recall_target=recall_target)
    if kk < k:
        b = partial.shape[0]
        vals = jnp.concatenate(
            [vals, jnp.full((b, k - kk), jnp.inf, vals.dtype)], axis=1
        )
        idx = jnp.concatenate([idx, jnp.zeros((b, k - kk), idx.dtype)], axis=1)
    return vals, idx


def _approx_scan(q, emb, chunk_topk, operands, k, chunk, out_k=None):
    """Shared chunked-scan scaffolding for the ApproxTopK modes.

    ``operands`` are per-row arrays ([n_pad] or [n_pad, d]) fed to
    ``chunk_topk(slices..., base)`` per chunk; a static tail handles n_pad
    not being a chunk multiple. Winners from all chunks are merged exactly
    and trimmed to ``out_k`` in the refine (see _refine_and_sort).
    """
    b = q.shape[0]
    n_pad = operands[0].shape[0]
    if n_pad <= chunk:
        # Single fused call, no scan scaffold: wrapping the one chunk in
        # lax.scan dynamic-slices the full resident array into the body
        # every rep (measured +4 ms/batch at B=4096 x 1M bf16 vs the
        # direct call — session r4e/r4f), and the merge top_k below would
        # re-sort a width-k result refine re-sorts anyway.
        best_d, best_i = chunk_topk(*operands, 0)
        return _refine_and_sort(q, emb, best_d, best_i, out_k)
    nc = n_pad // chunk
    parts_d = []
    parts_i = []
    if nc:
        chunked = tuple(
            op[: nc * chunk].reshape((nc, chunk) + op.shape[1:])
            for op in operands
        )

        def step(_, inputs):
            ci, slices = inputs
            return None, chunk_topk(*slices, ci * chunk)

        _, (cd, cix) = jax.lax.scan(
            step, None, (jnp.arange(nc, dtype=jnp.int32), chunked)
        )
        parts_d.append(jnp.transpose(cd, (1, 0, 2)).reshape(b, nc * k))
        parts_i.append(jnp.transpose(cix, (1, 0, 2)).reshape(b, nc * k))
    if n_pad > nc * chunk:  # static tail (n_pad is not a chunk multiple)
        td, tix = chunk_topk(*(op[nc * chunk :] for op in operands), nc * chunk)
        parts_d.append(td)
        parts_i.append(tix)

    all_d = jnp.concatenate(parts_d, axis=1)
    all_i = jnp.concatenate(parts_i, axis=1)
    neg, pos = jax.lax.top_k(-all_d, min(k, all_d.shape[1]))
    best_d, best_i = -neg, jnp.take_along_axis(all_i, pos, axis=1)
    return _refine_and_sort(q, emb, best_d, best_i, out_k)


def _exact_approx_topk_impl(
    q: jnp.ndarray,  # [B, d] f32
    emb: jnp.ndarray,  # [n_pad, d]
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+inf pad)
    k: int,
    chunk: int,
    recall_target: float,
    score_dtype=jnp.float32,
    overfetch: int = 0,
    emb_ref: jnp.ndarray | None = None,  # full-precision re-score rows
):
    """Exact scan with hardware ApproxTopK extraction.

    The iterative per-tile extraction in the Pallas kernels costs ~3k VPU
    passes per row tile — the measured bottleneck at B=256 (PERFORMANCE.md).
    TPU's PartialReduce op (``lax.approx_min_k``) extracts candidate minima
    in ~one pass at a configurable recall target; winners are then re-scored
    exactly and re-sorted, so returned distances are exact and only the
    *selection* is approximate (like the IVF probe itself).

    ``score_dtype=bfloat16`` halves the dominant cost: approx_min_k is a
    fusion-barrier custom call, so the [B, chunk] score block materializes
    in HBM (measured roofline-bound on that traffic at B=1024); bf16 scores
    halve it at a ~2^-8 relative selection perturbation (winners are still
    re-scored in f32).

    Over-fetch: approx_min_k's recall_target does not hold tightly at
    either end — 0.77-0.82 recall@100 at rt=0.99 on 1M rows (large k),
    and ~0.95 recall@10 at rt=0.99 measured against a full-precision f32
    ground truth (small k: two true winners sharing one PartialReduce
    block lose one). Fetching max(4k, 64) at small k / 2k at large k and
    keeping the best k after exact re-scoring recovers it; the widened
    reduction output is noise next to the scan itself.
    """
    qf = q.astype(emb.dtype)
    if overfetch:  # explicit serving knob (DeviceIvfSearcher.scan_overfetch)
        k_fetch = max(k, overfetch)
    else:
        k_fetch = max(4 * k, 64) if k <= 32 else 2 * k

    def chunk_topk(x, x2, base):
        scores = jnp.dot(
            qf, x.T, preferred_element_type=score_dtype,
            precision=score_precision(qf.dtype, x.dtype, score_dtype),
        )
        partial = (x2[None, :] - 2.0 * scores.astype(jnp.float32)).astype(
            score_dtype
        )
        vals, idx = _approx_min_k_clamped(partial, k_fetch, recall_target)
        return vals.astype(jnp.float32), base + idx.astype(jnp.int32)

    d2, ids = _approx_scan(
        q, emb if emb_ref is None else emb_ref, chunk_topk, (emb, emb_sq),
        k_fetch, chunk, out_k=k,
    )
    return d2[:, :k], ids[:, :k]


def _xbin_code_bits(n_pad: int, l_bins: int) -> int:
    """Low mantissa bits a packed xbin key spends on the tile code."""
    return max(1, (n_pad // l_bins - 1).bit_length())


def _xbin_bins(n_pad: int, k: int) -> int:
    """Bin count for mode="xbin": the largest lane-aligned (128-multiple)
    divisor of ``n_pad`` that one ``lax.top_k`` call handles (<= 64k
    columns — CLAUDE.md: wide-axis top_k is pathological on this backend)
    AND whose tile code fits the packed key's provenance budget
    (PROVENANCE_BITS_MAX, shared with kernels/binscan.py — beyond it the
    code bits eat too many value mantissa bits for reliable selection).
    0 when ineligible. More bins = fewer collisions among the true top-k
    AND fewer provenance bits spent per key."""
    cap = min(n_pad, 65536)
    best = 0
    for l_bins in range(128, cap + 1, 128):
        if n_pad % l_bins == 0 and \
                _xbin_code_bits(n_pad, l_bins) <= PROVENANCE_BITS_MAX:
            best = l_bins
    if not best:
        # No lane-aligned divisor (tiny or odd shard shapes): any divisor
        # is correct — alignment only affects the bin table's lane packing.
        for l_bins in range(cap, 0, -1):
            if n_pad % l_bins == 0 and \
                    _xbin_code_bits(n_pad, l_bins) <= PROVENANCE_BITS_MAX:
                best = l_bins
                break
    return best if 0 < k <= best else 0


#: Auto-chunk budget for mode="xbin" (bytes). The unchunked form relies on
#: XLA fusing the strided reshape+min epilogue into the scoring dot; if the
#: compiler declines, the full [B, n_pad] f32 score block materializes in
#: HBM (16 GB at B=4096 x 1M — a device OOM). Until that fusion is verified
#: per shape on chip, the auto policy (xbin_chunk_groups=0) only risks an
#: unfused block up to this budget and chunks beyond it.
_XBIN_FUSE_BUDGET = int(
    os.environ.get("PQVECTOR_TPU_XBIN_FUSE_BUDGET", 2 << 30)
)


def _xbin_auto_chunk(b: int, n_pad: int, l_bins: int, chunk_groups: int) -> int:
    """Effective ``chunk_groups`` for _exact_xbin_impl.

    >0 = explicit; -1 = force the one-call fused form (experiments);
    0 = auto: unchunked while a hypothetical unfused [B, n_pad] f32 block
    stays within _XBIN_FUSE_BUDGET, else lax.scan steps sized so the
    per-step [B, g*l_bins] block stays within the budget (min one tile
    group — [B, l_bins] must fit regardless, it is the output table).
    """
    if chunk_groups > 0:
        return int(chunk_groups)
    if chunk_groups < 0 or b * n_pad * 4 <= _XBIN_FUSE_BUDGET:
        return 0
    return max(1, _XBIN_FUSE_BUDGET // max(1, b * l_bins * 4))


def _exact_xbin_impl(
    q: jnp.ndarray,  # [B, d] f32
    emb: jnp.ndarray,  # [n_pad, d]
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+inf pad)
    k: int,
    l_bins: int,
    score_dtype=jnp.float32,
    overfetch: int = 0,
    chunk_groups: int = 0,
    emb_ref: jnp.ndarray | None = None,  # full-precision re-score rows
):
    """Full scan with XLA binned-min extraction (fused-epilogue selection).

    The hardware PartialReduce extraction (mode="scan") is a custom call
    that runs as a serialized pass after the scoring matmul: measured at
    B=4096 x 1M x 128 the matmul+min floor is 8.5 ms/batch while
    matmul+PartialReduce is 13.0 ms (scripts/mfu_push.py). This mode keeps
    selection INSIDE the fusion: each score packs value and provenance
    into one int32 key (IEEE-754 order isomorphism for non-negative f32 —
    the kernels/binscan.py trick), and a reshaped min-reduction folds the
    row axis into ``l_bins`` bins, so XLA emits matmul + elementwise +
    reduce as one fusion with no [B, n] materialization (the same fusion
    the floor measurement relies on). A top-k over the [B, l_bins] table
    plus exact re-score finishes.

    Row r lands in bin ``r % l_bins`` with tile code ``r // l_bins`` in
    the key's low bits. Recall loss is bin collisions among the true
    top-k only (~k^2/2 per l_bins); with l_bins up to 64k the collision
    rate is ~8-32x below the Pallas binscan's tile-bounded table, and the
    code spends ~5-6 bits vs its 13. Like approx/binscan, serve from the
    ORIGINAL row order: on cluster-sorted layouts a cluster spanning two
    tiles puts same-offset rows in the same bin.

    ``chunk_groups`` > 0 switches to a ``lax.scan`` over blocks of that
    many tile groups (clamped to a divisor of nt): per-step matmul+min
    with an int32 key accumulator carried in HBM. Memory is bounded at
    [B, chunk_groups*l_bins] per step even if XLA declines to fuse the
    strided reshape+min into the dot (the unchunked form would then
    materialize the full [B, n] block — 16 GB at B=4096 x 1M f32).

    Reference behavior anchor: exact-selection search over probed lists,
    /root/reference/src/ivf/search.rs:100-127 (nprobe-free serving scan).
    """
    b = q.shape[0]
    n_pad, d = emb.shape
    nt = n_pad // l_bins
    bits = max(1, (nt - 1).bit_length())
    mask = jnp.int32(~((1 << bits) - 1))
    qf = q.astype(emb.dtype)
    qsq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1)  # [B]
    prec = score_precision(qf.dtype, emb.dtype, score_dtype)
    code = jnp.arange(n_pad, dtype=jnp.int32) // l_bins

    def block_keys(e_blk, s_blk, c_blk, g):
        # [B, g*l_bins] scores -> packed keys -> per-bin min over the g
        # local tile groups. True squared distance (>= 0 up to rounding):
        # the rank-neutral |q|^2 is added back so non-negative bitcast
        # ordering holds. A value that rounds slightly negative
        # (exact-duplicate row) bitcasts below every non-negative key and
        # wins its bin — the correct selection.
        scores = jnp.dot(
            qf, e_blk.T, preferred_element_type=score_dtype, precision=prec
        )
        part = (
            s_blk[None, :] - 2.0 * scores.astype(jnp.float32)
            + qsq[:, None]
        )
        keys = jax.lax.bitcast_convert_type(part, jnp.int32)
        keys = (keys & mask) | c_blk[None, :]
        return jnp.min(keys.reshape(b, g, l_bins), axis=1)

    if chunk_groups and chunk_groups < nt:
        g = max(1, min(chunk_groups, nt))
        while nt % g:  # largest divisor of nt <= chunk_groups
            g -= 1
        ngrp = nt // g

        def step(carry, xs):
            e_blk, s_blk, c_blk = xs
            return jnp.minimum(carry, block_keys(e_blk, s_blk, c_blk, g)), None

        binmins, _ = jax.lax.scan(
            step,
            jnp.full((b, l_bins), jnp.int32(2**31 - 1)),
            (
                emb.reshape(ngrp, g * l_bins, d),
                emb_sq.reshape(ngrp, g * l_bins),
                code.reshape(ngrp, g * l_bins),
            ),
        )
    else:
        binmins = block_keys(emb, emb_sq, code, nt)  # [B, l_bins]
    k_fetch = min(
        max(k, overfetch) if overfetch else max(2 * k, 32), l_bins
    )
    neg, bin_idx = jax.lax.top_k(-binmins, k_fetch)
    key_w = -neg
    rows = (key_w & ~mask) * l_bins + bin_idx.astype(jnp.int32)
    # Value part of the key: +inf exactly for pad-only bins (code bits are
    # below the cleared mantissa range), so refine marks them missing.
    val = jax.lax.bitcast_convert_type(key_w & mask, jnp.float32)
    d2, ids = _refine_and_sort(
        q, emb if emb_ref is None else emb_ref, val, rows, k
    )
    return d2[:, :k], ids[:, :k]


@jax.jit
def _quantize_rows_i8(emb):
    """Symmetric per-row int8 quantization: (codes int8, scale f32).

    x ~= scale[r] * codes[r]; zero rows (padding) get scale 1 / codes 0."""
    x = emb.astype(jnp.float32)
    a = jnp.max(jnp.abs(x), axis=1)
    s = jnp.where(a > 0, a / 127.0, 1.0)
    qi = jnp.clip(jnp.round(x / s[:, None]), -127, 127).astype(jnp.int8)
    return qi, s


def _exact_xbin8_impl(
    q: jnp.ndarray,  # [B, d] f32
    emb_i8: jnp.ndarray,  # [n_pad, d] int8 codes
    scale: jnp.ndarray,  # [n_pad] f32 per-row scale
    emb_sq: jnp.ndarray,  # [n_pad] f32 EXACT |x|^2 (+inf pad)
    emb_ref: jnp.ndarray,  # [n_pad, d] full-precision rows (re-score)
    k: int,
    l_bins: int,
    overfetch: int = 0,
    chunk_groups: int = 0,
):
    """Int8 (SQ8) variant of the xbin scan: the scoring matmul runs
    int8 x int8 -> int32 (2x the bf16 MXU rate on v5e; the scan crosses
    HBM at 1/4 the f32 bytes) and the binned-min extraction stays fused,
    so the mode attacks BOTH sides of the measured scan limiter
    (matmul+min floor 62.7-75.3%% of bf16 peak vs 19.7-40.8%% with the
    PartialReduce extraction — scripts/mfu_push.py, bench round 3).

    Selection uses the quantized cross term (exact |x|^2 is kept in f32,
    so the error is only 2 * |q.x - tq*sr*dot| ~ 1%%); winners are
    re-scored exactly against ``emb_ref`` (_refine_and_sort), so returned
    distances keep the library's exactness contract and the quantization
    costs only selection recall, recoverable with ``overfetch``. The
    approximate part is clamped at 0 so the non-negative IEEE bitcast
    ordering of the packed keys holds (a clamped tie means near-duplicate
    candidates — any of them is a correct fetch).
    """
    b = q.shape[0]
    n_pad, d = emb_i8.shape
    nt = n_pad // l_bins
    bits = max(1, (nt - 1).bit_length())
    mask = jnp.int32(~((1 << bits) - 1))
    qi, tq = quantize_queries_i8(q)  # the ONE shared quantizer
    qsq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1)  # [B]
    code = jnp.arange(n_pad, dtype=jnp.int32) // l_bins

    def block_keys(e_blk, sc_blk, s_blk, c_blk, g):
        dots = jnp.dot(qi, e_blk.T, preferred_element_type=jnp.int32)
        part = (
            s_blk[None, :]
            - 2.0 * tq[:, None] * (sc_blk[None, :] * dots.astype(jnp.float32))
            + qsq[:, None]
        )
        part = jnp.maximum(part, 0.0)
        keys = jax.lax.bitcast_convert_type(part, jnp.int32)
        keys = (keys & mask) | c_blk[None, :]
        return jnp.min(keys.reshape(b, g, l_bins), axis=1)

    if chunk_groups and chunk_groups < nt:
        g = max(1, min(chunk_groups, nt))
        while nt % g:
            g -= 1
        ngrp = nt // g

        def step(carry, xs):
            e_blk, sc_blk, s_blk, c_blk = xs
            return (
                jnp.minimum(carry, block_keys(e_blk, sc_blk, s_blk, c_blk, g)),
                None,
            )

        binmins, _ = jax.lax.scan(
            step,
            jnp.full((b, l_bins), jnp.int32(2**31 - 1)),
            (
                emb_i8.reshape(ngrp, g * l_bins, d),
                scale.reshape(ngrp, g * l_bins),
                emb_sq.reshape(ngrp, g * l_bins),
                code.reshape(ngrp, g * l_bins),
            ),
        )
    else:
        binmins = block_keys(emb_i8, scale, emb_sq, code, nt)
    # Quantization perturbs within-bin races on top of collisions: default
    # to a wider fetch than xbin (4k vs 2k) before the exact re-score.
    k_fetch = min(
        max(k, overfetch) if overfetch else max(4 * k, 64), l_bins
    )
    neg, bin_idx = jax.lax.top_k(-binmins, k_fetch)
    key_w = -neg
    rows = (key_w & ~mask) * l_bins + bin_idx.astype(jnp.int32)
    val = jax.lax.bitcast_convert_type(key_w & mask, jnp.float32)
    d2, ids = _refine_and_sort(q, emb_ref, val, rows, k)
    return d2[:, :k], ids[:, :k]


#: Auto-chunk budget for mode="tilescan" (bytes): rows per lax.scan step
#: are sized so even an UNFUSED [B, rows_step] f32 score block stays within
#: it. The floor measurement (scripts/mfu_push.py: matmul + jnp.min over
#: [4096, 1M] = 62-82% of bf16 peak) proves XLA fuses a minor-axis reduce
#: into the scoring dot at full scale, so -1 (force one fused call) is the
#: expected fast path; the auto default stays bounded until each shape is
#: chip-verified (an unfused 16 GB block at B=4096 x 1M is a device OOM).
_TILESCAN_FUSE_BUDGET = int(
    os.environ.get("PQVECTOR_TPU_TILESCAN_FUSE_BUDGET", 2 << 30)
)


def _tilescan_auto_chunk(b: int, n_pad: int, tile: int, chunk_rows: int) -> int:
    """Effective rows-per-step for _exact_tilescan_impl. >0 explicit;
    -1 forces the one-call fused form; 0 = auto by _TILESCAN_FUSE_BUDGET."""
    if chunk_rows > 0:
        return int(chunk_rows)
    if chunk_rows < 0 or b * n_pad * 4 <= _TILESCAN_FUSE_BUDGET:
        return 0
    return max(tile, (_TILESCAN_FUSE_BUDGET // max(1, b * 4)) // tile * tile)


def _tile_min_keys(
    q: jnp.ndarray,  # [B, d] f32
    emb: jnp.ndarray,  # [n_pad, d]
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+inf pad)
    tile: int,  # rows per tile; power of two dividing n_pad
    chunk_rows: int = 0,  # rows per scan step (0 = one fused call)
    high: bool = False,  # f32 matmul at HIGH (bf16_3x) instead of HIGHEST
):
    """[B, n_pad/tile] packed per-tile min keys (shared pass 1 of tilescan
    and cert — see _exact_tilescan_impl for the packing and fusion notes).

    Each int32 key carries the f32 partial distance in its high bits
    (low ``log2(tile)`` mantissa bits cleared — a DOWNWARD rounding for
    the non-negative values, which is what makes the key a LOWER bound
    usable by the cert mode's completeness certificate) and the winning
    row's within-tile offset in the low bits.

    ``high`` drops f32 scoring from HIGHEST (bf16_6x: six MXU passes) to
    HIGH (bf16_3x: three — the lo*lo cross term is dropped, a relative
    error <= ~2^-16 of |q||x|). Only the cert mode may set it: cert's
    pass 1 merely SELECTS tiles, and its completeness certificate carries
    the matching slack term, so tile mis-selection is caught and re-run
    exactly — the 2x pass-1 speedup is certified-safe there, while for
    tilescan (no certificate) the same error would silently leak into
    final selection. No effect on bf16 operands (DEFAULT already).
    """
    b = q.shape[0]
    n_pad, d = emb.shape
    nt = n_pad // tile
    bits = max(1, (tile - 1).bit_length())
    low = jnp.int32((1 << bits) - 1)
    mask = ~low
    # Fold the -2 of |x|^2 - 2 q.x into the query operand: one fewer VPU
    # op per score element in the epilogue that must hide under the MXU.
    qf2 = (-2.0 * q).astype(emb.dtype)
    qsq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1)  # [B]
    prec = score_precision(qf2.dtype, emb.dtype, jnp.float32)
    if high and prec == jax.lax.Precision.HIGHEST:
        prec = jax.lax.Precision.HIGH

    def block_mins(e_blk, s_blk):
        g = e_blk.shape[0] // tile
        scores = jnp.dot(
            qf2, e_blk.T, preferred_element_type=jnp.float32, precision=prec
        )
        # True squared distance (>= 0 up to rounding): non-negative f32
        # bitcasts to order-isomorphic int32. A value rounding slightly
        # negative (duplicate row) wins its tile — correct selection.
        part = s_blk[None, :] + scores + qsq[:, None]
        keys = jax.lax.bitcast_convert_type(part, jnp.int32)
        off = jnp.arange(e_blk.shape[0], dtype=jnp.int32) & low
        keys = (keys & mask) | off[None, :]
        return jnp.min(keys.reshape(b, g, tile), axis=2)  # [b, g]

    step_rows = _tilescan_auto_chunk(b, n_pad, tile, chunk_rows)
    if step_rows and step_rows < n_pad:
        sr = max(tile, step_rows // tile * tile)
        while n_pad % sr:  # largest tile-multiple divisor of n_pad
            sr -= tile
        ns = n_pad // sr

        def step(_, xs):
            e_blk, s_blk = xs
            return None, block_mins(e_blk, s_blk)

        _, ys = jax.lax.scan(
            step, None,
            (emb.reshape(ns, sr, d), emb_sq.reshape(ns, sr)),
        )  # ys [ns, b, sr/tile]
        return jnp.transpose(ys, (1, 0, 2)).reshape(b, nt)
    return block_mins(emb, emb_sq)  # [B, nt]


def _tile_min_vals(
    q: jnp.ndarray,  # [B, d] f32
    emb: jnp.ndarray,  # [n_pad, d]
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+inf pad)
    tile: int,
    chunk_rows: int = 0,
    high: bool = False,
    interpret: bool = False,
):
    """[B, n_pad/tile] f32 per-tile min of ``|x|^2 - 2 q.x`` (VALUE-only
    pass 1 — cert gathers winning tiles whole, so provenance is dead
    weight).

    Formulation matters enormously here (chip session r5f, B=256 on
    1M x 128, same-window floor 180k QPS): reshaping the dot OUTPUT and
    min-reducing the split axis does not fuse — XLA round-trips the
    [B, n] score block through HBM (34k QPS, the xbin failure again) —
    but shaping the dot ITSELF as ``einsum("bd,gtd->bgt")`` leaves the
    tile axis innermost in the dot output and the min fuses like the
    floor's full-row reduce (154k QPS, 86% of floor). The fused Pallas
    kernel (kernels/tilemin.py) serves instead when its Mosaic-legal
    grid exists (nt needs a 128-multiple divisor).
    """
    b = q.shape[0]
    n_pad, d = emb.shape
    nt = n_pad // tile
    if tile % 128 == 0:
        from ..kernels.tilemin import pallas_tile_min, tilemin_params

        esize = jnp.dtype(emb.dtype).itemsize
        if tilemin_params(n_pad, tile, d, esize, b)[0]:
            return pallas_tile_min(
                q, emb, emb_sq, tile, high=high, interpret=interpret
            )
    qf2 = (-2.0 * q).astype(emb.dtype)
    prec = score_precision(qf2.dtype, emb.dtype, jnp.float32)
    if high and prec == jax.lax.Precision.HIGHEST:
        prec = jax.lax.Precision.HIGH

    def block_mins(e_blk, s_blk):
        g = e_blk.shape[0] // tile
        s3 = jnp.einsum(
            "bd,gtd->bgt", qf2, e_blk.reshape(g, tile, d),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return jnp.min(s3 + s_blk.reshape(g, tile)[None], axis=2)

    step_rows = _tilescan_auto_chunk(b, n_pad, tile, chunk_rows)
    if step_rows and step_rows < n_pad:
        sr = max(tile, step_rows // tile * tile)
        while n_pad % sr:
            sr -= tile
        ns = n_pad // sr

        def step(_, xs):
            e_blk, s_blk = xs
            return None, block_mins(e_blk, s_blk)

        _, ys = jax.lax.scan(
            step, None,
            (emb.reshape(ns, sr, d), emb_sq.reshape(ns, sr)),
        )
        return jnp.transpose(ys, (1, 0, 2)).reshape(b, nt)
    return block_mins(emb, emb_sq)


def _exact_tilescan_impl(
    q: jnp.ndarray,  # [B, d] f32
    emb: jnp.ndarray,  # [n_pad, d]
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+inf pad)
    k: int,
    tile: int,  # rows per tile; power of two dividing n_pad
    chunk_rows: int = 0,  # rows per scan step (0 = one fused call)
    overfetch: int = 0,
    emb_ref: jnp.ndarray | None = None,  # full-precision re-score rows
):
    """Full scan with per-tile argmin extraction (the xbin transpose).

    Attacks the measured extraction gap (VERDICT r3 item 1: matmul+min
    floor 76.6-82.5% of bf16 peak vs 35.7% served with PartialReduce,
    BENCH_r03.json) with the cheapest possible selection: scores pack
    value+provenance into one int32 key (the kernels/binscan.py IEEE
    trick) and a reshape+min over the MINOR axis folds each contiguous
    ``tile``-row group to its argmin — the same minor-axis reduce shape
    as the floor measurement itself, so XLA fuses it into the scoring
    matmul. The result table is [B, n/tile] (small — 7.8k columns at 1M
    rows, tile=128), so the final ``lax.top_k`` is noise, unlike xbin's
    [B, 64k] table + wide top_k (measured 30x slower than scan on chip —
    VERDICT r3 weakness 4).

    Differences from xbin (which bins row r by ``r % l_bins`` and reduces
    the OUTER reshape axis): provenance is the within-tile offset
    (``log2(tile)`` low mantissa bits, 7 at tile=128 — a 2^-16 relative
    value quantization, far below real-data neighbor margins); the reduce
    is minor-axis (lane reductions); and the chunked form needs NO carried
    accumulator — tiles are independent, so scan steps just stack their
    [B, g] outputs.

    Recall: a tile contributes only its best row, so two true top-k
    neighbors sharing one tile lose the loser PERMANENTLY (overfetch
    cannot recover it) — with random row order that is ~k^2/2 * tile/n
    per query (0.6% of queries lose 1 of top-10 at 1M rows, tile=128).
    Serve from the ORIGINAL row order, never cluster-sorted layouts.
    Winners are re-scored exactly against ``emb_ref`` (_refine_and_sort).

    Reference behavior anchor: nprobe-free exact-selection serving scan,
    /root/reference/src/ivf/search.rs:100-127.
    """
    b = q.shape[0]
    n_pad = emb.shape[0]
    nt = n_pad // tile
    bits = max(1, (tile - 1).bit_length())
    low = jnp.int32((1 << bits) - 1)
    mask = ~low
    binmins = _tile_min_keys(q, emb, emb_sq, tile, chunk_rows)
    k_fetch = min(
        max(k, overfetch) if overfetch else
        (max(4 * k, 64) if k <= 32 else 2 * k),
        nt,
    )
    neg, tidx = jax.lax.top_k(-binmins, k_fetch)
    key_w = -neg
    rows = tidx.astype(jnp.int32) * tile + (key_w & low)
    # Value part: +inf exactly for pad-only tiles (offset bits sit below
    # the cleared mantissa range), so refine marks them missing.
    val = jax.lax.bitcast_convert_type(key_w & mask, jnp.float32)
    d2, ids = _refine_and_sort(
        q, emb if emb_ref is None else emb_ref, val, rows, k
    )
    return d2[:, :k], ids[:, :k]


def _topk_min_wide(keys: jnp.ndarray, m: int, chunk: int = 65536):
    """Ascending top-m of a key table (int32 packed keys or plain f32
    values — anything lax.top_k orders), chunked to <= ``chunk``
    columns per lax.top_k call (a k=10 top_k over 1M columns hung the
    backend for 20 minutes — CLAUDE.md; 10M rows at tile=128 is a 78k-wide
    table). Returns (keys [B, m] ascending, column indices [B, m])."""
    b, nt = keys.shape
    m = min(m, nt)
    if nt <= chunk:
        neg, idx = jax.lax.top_k(-keys, m)
        return -neg, idx
    parts_v, parts_i = [], []
    for s in range(0, nt, chunk):
        blk = keys[:, s : s + chunk]
        mm = min(m, blk.shape[1])
        neg, idx = jax.lax.top_k(-blk, mm)
        parts_v.append(-neg)
        parts_i.append(idx + s)
    v = jnp.concatenate(parts_v, axis=1)
    i = jnp.concatenate(parts_i, axis=1)
    neg, pos = jax.lax.top_k(-v, m)
    return -neg, jnp.take_along_axis(i, pos, axis=1)


#: One-shot candidate-scoring budget for mode="cert": the fused
#: [B, m*tile] score block (plus its [B, m*tile, d] gather) stays a single
#: einsum while under this many bytes; beyond it the scoring runs as a
#: lax.scan over the selected tiles with a running top-k merge (bounded
#: temps — the B=8192 x 20-tile gather would otherwise stage ~10.7 GB).
_CERT_FUSE_BUDGET = int(
    os.environ.get("PQVECTOR_TPU_CERT_FUSE_BUDGET", 2 << 30)
)


def _exact_cert_impl(
    q: jnp.ndarray,  # [B, d] f32
    emb: jnp.ndarray,  # [n_pad, d] storage (fallback-path scoring)
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+inf pad; norms of the f32 rows)
    k: int,
    tile: int,  # rows per tile; power of two dividing n_pad
    fallback_tile: int,  # XLA-merge tile for the uncertified fallback
    m_tiles: int = 0,  # tiles fetched per query (0 = auto: max(2k, 16))
    chunk_rows: int = 0,
    emb_ref: jnp.ndarray | None = None,  # f32 reference (None: emb is it)
    pass1_high: bool = False,  # pass-1 f32 matmul at HIGH (bf16_3x)
    pass1_storage: bool = False,  # pass-1 over ``emb`` (storage precision)
    diagnostic: bool = False,  # return (d2, ids, certified[B], margin[B])
    interpret: bool = False,  # Pallas pass-1 kernel in interpret mode
    pass2_form: str = "auto",  # "auto" (fuse-budget), "fused", "scan"
):
    """Certified-exact full scan: tile-min lower bounds, whole-tile refine,
    and a completeness certificate with an in-dispatch exact fallback.

    The exact path has been ~flat for three rounds (~30k QPS: one HBM pass
    + running top-k merge) while the near-exact scans serve 5-6x that.
    This mode closes the gap with a provably-complete two-pass:

    1. Pass 1 scores every row at REFERENCE precision (``emb_ref`` when
       held, else ``emb``; f32 operands multiply at HIGHEST — see
       score_precision) and folds each ``tile``-row group to its plain
       f32 min (_tile_min_vals — the fused Pallas kernel
       kernels/tilemin.py when the geometry fits, so the grouped min
       never round-trips HBM; no packed provenance, cert gathers winning
       tiles whole). Each tile's min is a lower bound on the pass-1
       score of every row in the tile up to arithmetic slack.
    2. The m best tiles per query are gathered WHOLE (unlike tilescan,
       which keeps only the argmin — hence no cluster-sorted hazard here;
       co-located neighbors are all in the gathered candidate set), scored
       at reference precision, and the winners f32-refined exactly
       (_refine_and_sort).
    3. Certificate: let T = the (m+1)-th best tile-min value — no row in
       any UNEXAMINED tile can beat T by more than the arithmetic slack E
       (f32/HIGHEST matmul accumulation + key round-down; see below). If
       every query's k-th refined distance <= T - E, the result provably
       equals the full exact top-k; otherwise ONE lax.cond branch re-runs
       the whole batch through the streaming exact merge
       (_exact_topk_impl) — recall 1.0 either way, never silently
       degraded.

    Slack model: pass-1 partials are |x|^2 - 2 q.x + |q|^2 with f32
    accumulation and HIGHEST-precision multiplies, so the error vs the
    refine's direct-difference f32 truth is bounded by ~gamma_d * (|q|^2 +
    max|x|^2) with gamma_d ~ d * 2^-24; E uses max(d, 128) * 2^-21 — a
    >= 8x-headroom envelope that also covers the refine's own rounding
    and the emb_sq summation. When ``emb``
    is reduced-precision WITHOUT a reference (rescore opt-out), pass-1
    mixes f32 norms with storage-precision scores, so E additionally
    carries a 2^-8 * (|q|^2 + max|x|^2) storage term — certificates then
    rarely fire on tightly clustered data; hold a reference for cert.

    ``pass1_storage`` runs pass 1 over ``emb`` (the reduced-precision
    scan array) even when a reference is held: a NATIVE one-pass bf16
    matmul with half the HBM traffic — the same per-rep cost as the
    near-exact scan modes (~12x cheaper than the f32/HIGHEST pass) —
    while candidates still gather from the f32 reference and refine
    exactly. E carries the same 2^-8 storage term, so this trades
    certify rate (how often the fallback re-runs) for pass-1 speed;
    results are exact either way. Whether the trade wins is purely a
    question of the data's tile-min gaps vs 2^-8 * (|q|^2 + max|x|^2) —
    measure with :meth:`DeviceIvfSearcher.cert_probe`.

    m defaults to max(2k, 16): a tile's min beats the true d_k only if
    the tile CONTAINS a row closer than d_k — i.e. at most k tiles (plus
    any rows within E of d_k) can rank above the certificate threshold,
    so 2k tiles certify unless E-neighborhood ties exceed k extra tiles.

    Reference ground-truth role anchor: /root/reference/benches/query.rs:76-103.
    """
    b, d = q.shape
    ref = emb_ref if emb_ref is not None else emb
    n_pad = ref.shape[0]
    nt = n_pad // tile
    m = m_tiles if m_tiles else max(2 * k, 16)
    m = min(m, nt)

    p1_src = emb if pass1_storage else ref
    binvals = _tile_min_vals(q, p1_src, emb_sq, tile, chunk_rows,
                             high=pass1_high, interpret=interpret)
    qsq = jnp.sum(q * q, axis=1)  # [B] f32

    vals, tidx = _topk_min_wide(binvals, m + 1 if m < nt else m)
    if m < nt:
        # True-distance units: the fold omits the rank-neutral |q|^2.
        t_val = vals[:, m] + qsq
        tidx = tidx[:, :m]

    # Gather the m selected tiles whole — TILE-granular: index a
    # [nt, tile, d] view with the [B, m] tile ids, so the gather moves m
    # contiguous tile*d*4-byte slices per query (64 KB at tile=128,
    # d=128) instead of m*tile row-granular (1, d) slices. Session r5g
    # measured the row-granular form at ~27x the same-window floor
    # end-to-end (the per-row descriptor cost dominates pass 2); tile
    # slices are the granularity the certificate selects anyway.
    # Scoring is DIRECT-DIFFERENCE f32 (exact, matches _refine_and_sort's
    # semantics; the einsum form lowers to B tiny [1, d] x [d, m*tile]
    # dots that strand the MXU). Pad rows gathered from a
    # partially-padded tile score |q|^2 in diff form (their ref rows are
    # zeros), so they are re-masked to inf via their emb_sq sentinel
    # before selection.
    kf = min(2 * k, m * tile) if emb_ref is not None else min(k, m * tile)
    ref3 = ref.reshape(nt, tile, d)
    sq3 = emb_sq.reshape(nt, tile)

    def tile_scores(tcol):  # tcol [B, mm] tile ids -> rows/scores [B, mm*tile]
        mm = tcol.shape[1]
        cand = ref3[tcol].astype(jnp.float32)  # [B, mm, tile, d]
        diff = cand - q[:, None, None, :]
        part = jnp.sum(diff * diff, axis=-1).reshape(b, mm * tile)
        x2 = sq3[tcol].reshape(b, mm * tile)
        rows = (
            tcol[:, :, None] * tile
            + jnp.arange(tile, dtype=jnp.int32)[None, None, :]
        ).reshape(b, mm * tile)
        return rows, jnp.where(jnp.isinf(x2), jnp.inf, part)

    fused = b * m * tile * (d + 1) * 4 <= _CERT_FUSE_BUDGET
    if pass2_form != "auto":
        fused = pass2_form == "fused"
    if fused:
        rows, part = tile_scores(tidx)
        neg, pos = jax.lax.top_k(-part, kf)
        best_d = -neg
        best_i = jnp.take_along_axis(rows, pos, axis=1)
    else:

        def step(carry, tcol):  # tcol [B] tile ids
            cd, ci = carry
            rows_t, part = tile_scores(tcol[:, None])
            all_d = jnp.concatenate([cd, part], axis=1)
            all_i = jnp.concatenate([ci, rows_t], axis=1)
            neg, pos = jax.lax.top_k(-all_d, kf)
            return (-neg, jnp.take_along_axis(all_i, pos, axis=1)), None

        init = (
            jnp.full((b, kf), jnp.inf, jnp.float32),
            jnp.full((b, kf), -1, jnp.int32),
        )
        (best_d, best_i), _ = jax.lax.scan(step, init, tidx.T)
    if kf < k:  # k exceeds the candidate width (tiny arrays): inf-pad
        best_d = jnp.concatenate(
            [best_d, jnp.full((b, k - kf), jnp.inf, jnp.float32)], axis=1
        )
        best_i = jnp.concatenate(
            [best_i, jnp.full((b, k - kf), -1, jnp.int32)], axis=1
        )
    d2, ids = _refine_and_sort(q, ref, best_d, best_i, k)
    d2, ids = d2[:, :k], ids[:, :k]
    if m >= nt:
        if diagnostic:
            full = jnp.full((b,), True)
            return d2, ids, full, jnp.full((b,), jnp.inf)
        return d2, ids  # every tile examined: complete by construction

    # Completeness certificate (slack model in the docstring). T = +inf
    # (only padding unexamined) certifies everything, including queries
    # with fewer than k real candidates (inf <= inf).
    max_sq = jnp.max(jnp.where(jnp.isfinite(emb_sq), emb_sq, 0.0))
    c_mm = max(d, 128) * 2.0**-21
    if pass1_high:
        # bf16_3x drops the lo*lo cross term: |error| <= ~2^-16 |q||x|
        # <= 2^-17 (|q|^2 + max|x|^2) per dot, doubled by the -2 factor;
        # 2^-13 is an 8x-headroom envelope. Tile MIS-selection this error
        # causes is exactly what the certificate exists to catch — the
        # fallback re-runs the batch exactly, so correctness is unchanged
        # and only the certify rate (fallback frequency) pays.
        c_mm += 2.0**-13
    if p1_src.dtype != jnp.float32:
        c_mm += 2.0**-8  # storage-precision pass-1 (pass1_storage or
        # rescore opt-out): covers |2 q.(x_f32 - x_stored)|
    margin = (t_val - c_mm * (qsq + max_sq)) - d2[:, k - 1]
    if diagnostic:
        return d2, ids, margin >= 0, margin
    ok = jnp.all(margin >= 0)
    return jax.lax.cond(
        ok,
        lambda: (d2, ids),
        lambda: _exact_topk_impl(
            q, emb, emb_sq, k, fallback_tile, emb_ref=emb_ref
        ),
    )


def _ivf_approx_masked_impl(
    q: jnp.ndarray,  # [B, d] f32
    centroids: jnp.ndarray,  # [kc, d] f32
    c_sq: jnp.ndarray,  # [kc] f32
    row_cluster: jnp.ndarray,  # [n_pad] i32 (kc = pad rows)
    emb: jnp.ndarray,  # [n_pad, d]
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+inf pad)
    nprobe: jnp.ndarray,  # scalar i32
    k: int,
    max_probe: int,
    chunk: int,
    recall_target: float,
    score_dtype=jnp.float32,
    overfetch: int = 0,
    emb_ref: jnp.ndarray | None = None,  # full-precision re-score rows
):
    """Masked IVF scan with ApproxTopK extraction (see _exact_approx_topk)."""
    b = q.shape[0]
    kc = centroids.shape[0]
    qf = q.astype(emb.dtype)

    c_scores = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(-(c_sq[None, :] - 2.0 * c_scores), max_probe)
    in_probe = jnp.arange(max_probe, dtype=jnp.int32)[None, :] < nprobe
    mask = jnp.zeros((b, kc + 1), jnp.bool_)
    mask = mask.at[jnp.arange(b)[:, None], probe].max(in_probe)
    big = jnp.array(jnp.inf, score_dtype)  # bf16 has inf; survives the merge
    if overfetch:  # see _exact_approx_topk_impl
        k_fetch = max(k, overfetch)
    else:
        k_fetch = max(4 * k, 64) if k <= 32 else 2 * k

    def chunk_topk(x, x2, cl, base):
        scores = jnp.dot(
            qf, x.T, preferred_element_type=score_dtype,
            precision=score_precision(qf.dtype, x.dtype, score_dtype),
        )
        partial = (x2[None, :] - 2.0 * scores.astype(jnp.float32)).astype(
            score_dtype
        )
        probed = jnp.take(mask, cl, axis=1)  # [B, C]
        partial = jnp.where(probed, partial, big)
        vals, idx = _approx_min_k_clamped(partial, k_fetch, recall_target)
        return vals.astype(jnp.float32), base + idx.astype(jnp.int32)

    d2, ids = _approx_scan(
        q, emb if emb_ref is None else emb_ref, chunk_topk,
        (emb, emb_sq, row_cluster), k_fetch, chunk, out_k=k,
    )
    return d2[:, :k], ids[:, :k]


def _compact_select(
    q, centroids, c_sq, row_cluster, nprobe, max_probe, ctile, cap_tiles,
    tile_lo, tile_hi, max_cluster_tiles, n_pad,
):
    """Active-tile selection shared by the compact modes: probe the batch,
    rank tiles by popularity, keep the top ``cap_tiles`` tile ids."""
    b = q.shape[0]
    kc = centroids.shape[0]
    nt = n_pad // ctile

    c_scores = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(-(c_sq[None, :] - 2.0 * c_scores), max_probe)
    in_probe = jnp.broadcast_to(
        jnp.arange(max_probe, dtype=jnp.int32)[None, :] < nprobe,
        (b, max_probe),
    )
    counts = jnp.zeros(kc + 1, jnp.int32).at[probe.reshape(-1)].add(
        in_probe.reshape(-1).astype(jnp.int32)
    )
    counts = counts.at[kc].set(0)  # pad rows are never active

    # Tile popularity = most-probed cluster in the tile; active iff > 0.
    if tile_lo is not None:
        # Cluster-sorted layout: cluster c spans tiles tile_lo[c]..tile_hi[c]
        # (host-precomputed); a bounded scatter-max loop replaces the
        # counts[row_cluster-per-row] gather, which XLA scalarizes at ~7 ns
        # per element (measured 72 ms for 10M rows — the whole budget).
        tile_pop = jnp.zeros(nt, jnp.int32)
        cnt = counts[:kc]
        if max_cluster_tiles <= 16:
            for j in range(max_cluster_tiles):
                t = jnp.clip(tile_lo + j, 0, nt - 1)
                val = jnp.where(tile_lo + j <= tile_hi, cnt, 0)
                tile_pop = tile_pop.at[t].max(val)
        else:
            # A skewed index can make one cluster span thousands of tiles;
            # unrolled, each step emits its own scatter-max (HLO size and
            # remote-compile time scale with the span). Roll it instead —
            # identical ops, constant-size graph.
            def _pop_step(j, pop):
                t = jnp.clip(tile_lo + j, 0, nt - 1)
                val = jnp.where(tile_lo + j <= tile_hi, cnt, 0)
                return pop.at[t].max(val)

            tile_pop = jax.lax.fori_loop(
                0, max_cluster_tiles, _pop_step, tile_pop
            )
    else:
        cl_t = row_cluster.reshape(nt, ctile)
        tile_pop = counts[cl_t].max(axis=1)
    # Most popular tiles first (stable -> ascending tile id on ties), so a
    # cap overflow drops the tiles fewest queries probed.
    order = jnp.argsort(
        jnp.where(tile_pop > 0, -tile_pop, jnp.int32(1)), stable=True
    )
    return order[:cap_tiles]


def _ivf_compact_bin_impl(
    q: jnp.ndarray,  # [B, d] f32
    centroids: jnp.ndarray,  # [kc, d] f32
    c_sq: jnp.ndarray,  # [kc] f32
    row_cluster: jnp.ndarray,  # [n_pad] i32 cluster id per row (kc = pad rows)
    emb: jnp.ndarray,  # [n_pad, d]
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+3e38 pad, finite)
    nprobe: jnp.ndarray,  # scalar i32
    k: int,
    max_probe: int,
    ctile: int,  # selection granularity == binscan tile
    cap_tiles: int,  # static selected-tile budget
    interpret: bool = False,
    tile_lo: jnp.ndarray | None = None,
    tile_hi: jnp.ndarray | None = None,
    max_cluster_tiles: int = 0,
    expand: int = 1,
    scale: jnp.ndarray | None = None,
    emb_ref: jnp.ndarray | None = None,
):
    """IVF via probed-union selection + fused binned-min scan IN PLACE.

    mode="compact" gathers the active tiles into a contiguous block and
    then extracts over it — read+write+read of the covered fraction. This
    mode streams the selected tiles straight through the binscan kernel
    (kernels/binscan.py) via a scalar-prefetched index map: the covered
    fraction crosses HBM exactly once and the extraction overlaps the
    scoring matmul. Candidate semantics are identical to compact (the
    batch's probed-tile union, popularity-capped); distances exact.

    mode="bincompact8" passes ``emb`` as int8 codes with per-row ``scale``
    and the full-precision rows as ``emb_ref`` (exact re-score) — the
    covered fraction then crosses HBM at 1/4 the f32 bytes and scores on
    the int8 MXU.
    """
    from ..kernels.binscan import pallas_binned_scan_select

    sel = _compact_select(
        q, centroids, c_sq, row_cluster, nprobe, max_probe, ctile,
        cap_tiles, tile_lo, tile_hi, max_cluster_tiles, emb.shape[0],
    )
    return pallas_binned_scan_select(
        q, emb, emb_sq, sel, k, tile=ctile, cap=cap_tiles, expand=expand,
        interpret=interpret, scale=scale, emb_ref=emb_ref,
    )


def _ivf_compact_approx_impl(
    q: jnp.ndarray,  # [B, d] f32
    centroids: jnp.ndarray,  # [kc, d] f32
    c_sq: jnp.ndarray,  # [kc] f32
    row_cluster: jnp.ndarray,  # [n_pad] i32 cluster id per row (kc = pad rows)
    emb: jnp.ndarray,  # [n_pad, d]
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+inf pad)
    nprobe: jnp.ndarray,  # scalar i32
    k: int,
    max_probe: int,
    ctile: int,  # compaction granularity (rows)
    cap_tiles: int,  # static compacted-tile budget
    chunk: int,  # extraction chunk over the compacted block
    recall_target: float,
    score_dtype=jnp.float32,
    interpret: bool = False,
    tile_lo: jnp.ndarray | None = None,  # [kc] first tile of cluster c
    tile_hi: jnp.ndarray | None = None,  # [kc] last tile of cluster c
    max_cluster_tiles: int = 0,  # static bound on tiles per cluster
    emb_ref: jnp.ndarray | None = None,  # full-precision re-score rows
):
    """IVF via probed-union tile compaction + hardware ApproxTopK.

    The batch's probed clusters cover ``B*nprobe/kc`` of the data in
    expectation (n-sublinear at fixed batch); the full-scan modes still
    touch every row. This mode gathers the ACTIVE row tiles (those holding
    any probed cluster, at ``ctile`` granularity) into a contiguous block
    and runs the PartialReduce extraction over only that block — combining
    the index's traffic win with the hardware extraction that makes scan
    mode fast (VERDICT r2 item 1; the reference's per-query candidate set
    is search.rs:100-127).

    Selection semantics: candidates are the UNION of the batch's probed
    clusters (a superset of each query's own probed set — recall can only
    increase) plus any rows sharing a tile with them. ``cap_tiles`` bounds
    the gather statically; when more tiles are active than the cap, the
    least-popular tiles (fewest probing queries) are dropped — recall is
    gated in the bench exactly like the extraction's own recall_target.
    Distances of returned winners are exact (re-scored f32).
    """
    sel = _compact_select(
        q, centroids, c_sq, row_cluster, nprobe, max_probe, ctile,
        cap_tiles, tile_lo, tile_hi, max_cluster_tiles, emb.shape[0],
    )

    # XLA's dynamic tile gather measures ~100 GB/s on v5e (13% of copy
    # bandwidth); the Pallas scalar-prefetch copy pipeline runs at DMA
    # speed (kernels/compact.py).
    from ..kernels.compact import pallas_tile_gather

    emb_c, sq_c = pallas_tile_gather(
        emb, emb_sq, sel, ctile=ctile, cap=cap_tiles, interpret=interpret
    )
    # On reduced-precision storage fetch 2k from the compacted block (its
    # local re-score sees only the gathered low-precision tiles), then
    # exact-re-score the widened set against the GLOBAL f32 reference —
    # same recovery as _exact_topk_impl's emb_ref path.
    kf = k if emb_ref is None else 2 * k
    d2, lids = _exact_approx_topk_impl(
        q, emb_c, sq_c, kf, chunk=chunk, recall_target=recall_target,
        score_dtype=score_dtype,
    )
    gids = sel[lids // ctile] * ctile + lids % ctile
    ids = jnp.where(lids >= 0, gids.astype(jnp.int32), -1)
    if emb_ref is None:
        return d2, ids
    d2, ids = _refine_and_sort(q, emb_ref, d2, ids, k)
    return d2[:, :k], ids[:, :k]


def _ivf_masked_scan_impl(
    q: jnp.ndarray,  # [B, d] f32
    centroids: jnp.ndarray,  # [kc, d] f32
    c_sq: jnp.ndarray,  # [kc] f32
    row_cluster: jnp.ndarray,  # [n_pad] i32 cluster id per row (kc = pad rows)
    emb: jnp.ndarray,  # [n_pad, d]
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+inf pad)
    nprobe: jnp.ndarray,  # scalar i32, <= max_probe (traced: nprobe sweeps
    #                       reuse one executable)
    k: int,
    max_probe: int,
    tile: int,
    emb_ref: jnp.ndarray | None = None,  # full-precision re-score rows
):
    """IVF top-k as a masked full scan: one HBM pass for the whole batch.

    For a query batch the per-query cluster gather reads
    ``B * nprobe * Lmax * d`` bytes; a full scan reads ``n * d`` once and
    masks rows whose cluster the query did not probe. The scan wins whenever
    ``B * nprobe * Lmax > n`` — i.e. any sizable batch. Results match the
    gather path (same probed clusters, same distances). ``emb_ref``:
    widened 2k merge + f32 re-score on reduced-precision storage (see
    _exact_topk_impl).
    """
    b, d = q.shape
    kc = centroids.shape[0]
    n_pad = emb.shape[0]
    nt = n_pad // tile
    kf = k if emb_ref is None else min(2 * k, n_pad)

    c_scores = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(-(c_sq[None, :] - 2.0 * c_scores), max_probe)  # [B, P]
    # [B, kc+1] probe mask; the extra slot absorbs the pad-row sentinel id.
    # Only the first `nprobe` probed clusters count.
    in_probe = jnp.arange(max_probe, dtype=jnp.int32)[None, :] < nprobe
    mask = jnp.zeros((b, kc + 1), jnp.bool_)
    mask = mask.at[jnp.arange(b)[:, None], probe].max(in_probe)

    emb_t = emb.reshape(nt, tile, d)
    sq_t = emb_sq.reshape(nt, tile)
    cl_t = row_cluster.reshape(nt, tile)
    qf = q.astype(emb.dtype)

    def step(carry, inputs):
        best_d, best_i = carry
        ti, (xt, x2t, ct) = inputs
        scores = jnp.dot(
            qf, xt.T, preferred_element_type=jnp.float32,
            precision=score_precision(qf.dtype, xt.dtype),
        )
        partial = x2t[None, :] - 2.0 * scores
        probed = jnp.take(mask, ct, axis=1)  # [B, T]
        partial = jnp.where(probed, partial, jnp.inf)
        ids = ti * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        all_d = jnp.concatenate([best_d, partial], axis=1)
        all_i = jnp.concatenate([best_i, ids], axis=1)
        neg, pos = jax.lax.top_k(-all_d, kf)
        return (-neg, jnp.take_along_axis(all_i, pos, axis=1)), None

    init = (
        jnp.full((b, kf), jnp.inf, jnp.float32),
        jnp.full((b, kf), -1, jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(
        step, init, (jnp.arange(nt, dtype=jnp.int32), (emb_t, sq_t, cl_t))
    )
    d2, ids = _refine_and_sort(
        q, emb if emb_ref is None else emb_ref, best_d, best_i, k
    )
    return d2[:, :k], ids[:, :k]


def _dedup_topk(d, ids, k: int):
    """Collapse duplicate ids in an ascending-by-distance top-m candidate
    list down to the k nearest DISTINCT ids.

    Spilled layouts (query/spill.py) hold each row at most twice, so a
    top-2k selection always contains the true top-k distinct rows: the
    k-th distinct winner bounds every later entry, and the k-1 nearer rows
    occupy at most 2k-2 slots. Keep-first semantics ride the stable
    argsort — among equal ids the earlier (nearer) slot survives; invalid
    slots (id -1, distance inf) sort to the tail either way.
    """
    m = ids.shape[1]
    if k >= m:
        return d, ids
    order = jnp.argsort(ids, axis=1, stable=True)
    ids_s = jnp.take_along_axis(ids, order, axis=1)
    dup_s = jnp.concatenate(
        [
            jnp.zeros_like(ids_s[:, :1], bool),
            (ids_s[:, 1:] == ids_s[:, :-1]) & (ids_s[:, 1:] >= 0),
        ],
        axis=1,
    )
    inv = jnp.argsort(order, axis=1)
    dup = jnp.take_along_axis(dup_s, inv, axis=1)
    d_m = jnp.where(dup, jnp.inf, d)
    neg, idx = jax.lax.top_k(-d_m, k)
    return -neg, jnp.take_along_axis(jnp.where(dup, -1, ids), idx, axis=1)


def _loop_finalize(d2, ids, n_valid, gid):
    """In-jit tail of the chained-loop paths: sqrt + id mapping.

    The eager equivalents (``jnp.sqrt`` + ``_map_ids`` after the loop
    dispatch) each pay a tunnel round-trip per ``search_loop`` call —
    measured ~4.5 ms/batch of the served scan's 16.9 ms at B=4096,
    reps=25 (session r4d) — so the chained-loop jits finalize inside
    the single dispatch. Semantics identical to ``_map_ids``.
    """
    invalid = jnp.isinf(d2) | (ids >= n_valid) | (ids < 0)
    if gid is not None:
        ids = gid[jnp.clip(ids, 0, n_valid - 1)]
    return jnp.sqrt(d2), jnp.where(invalid, -1, ids)


@_functools.partial(
    jax.jit, static_argnames=("k", "has_deleted", "spill")
)
def _finalize_jit(
    q, d, ids, deleted, delta_emb, delta_sq, delta_ids, k, has_deleted,
    spill,
):
    """Shared search epilogue for dynamic/spilled searchers: tombstone
    filter -> exact delta-buffer merge -> spilled id-dedup -> trim."""
    if has_deleted:
        hit = (ids >= 0) & deleted[jnp.clip(ids, 0, deleted.shape[0] - 1)]
        d = jnp.where(hit, jnp.inf, d)
        ids = jnp.where(hit, -1, ids)
    scores = jnp.dot(
        q, delta_emb.T.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    dd2 = delta_sq[None, :] - 2.0 * scores + jnp.sum(q * q, 1)[:, None]
    kd = min(k, int(delta_emb.shape[0]))
    neg, didx = jax.lax.top_k(-dd2, kd)
    dd = jnp.where(jnp.isinf(-neg), jnp.inf, jnp.sqrt(jnp.maximum(-neg, 0.0)))
    dgi = jnp.where(jnp.isinf(-neg), -1, delta_ids[didx])
    d = jnp.concatenate([d, dd], axis=1)
    ids = jnp.concatenate([ids, dgi], axis=1)
    order = jnp.argsort(d, axis=1, stable=True)
    d = jnp.take_along_axis(d, order, axis=1)
    ids = jnp.take_along_axis(ids, order, axis=1)
    if spill:
        return _dedup_topk(d, ids, k)
    return d[:, :k], ids[:, :k]


class DeviceIvfSearcher:
    """Device-resident searcher over one embedding matrix + its IVF index."""

    def __init__(
        self,
        index: IvfIndex,
        embeddings: np.ndarray,
        dtype: jnp.dtype = jnp.float32,
        row_tile: int = 2048,
        metric: str = "l2",
        cluster_sorted: bool = False,
        rescore_dtype="auto",
    ):
        """``rescore_dtype``: precision of the winner re-score rows.
        "auto" (default) keeps a full f32 copy next to reduced-precision
        storage — selection runs at storage precision but candidates are
        re-scored (and re-ranked, via each mode's widened fetch) against
        f32, which recovers f32-truth recall (measured on DEEP-10M: bf16
        storage alone caps exact selection at 0.9527 recall@10 because
        real-data neighbor margins sit below 2^-8; a 2k bf16 shortlist +
        f32 re-score is 1.0000 — docs/PERFORMANCE.md). Pass ``None`` to
        opt out (halves HBM residency; recall is then storage-bounded).
        f32 storage never keeps a copy."""
        if metric not in ("l2", "cosine"):
            raise ValidationError(f"Unsupported metric '{metric}'")
        self.metric = metric
        if metric == "cosine":
            from ..index.metrics import normalize_rows

            embeddings = normalize_rows(embeddings)

        # North-star resident layout (SURVEY.md §7 step 7): permute rows into
        # cluster order in HBM so each inverted list is a contiguous range —
        # gathers hit consecutive rows and masked scans see runs of equal
        # cluster ids. Returned ids are mapped back to original rows.
        self._gid: np.ndarray | None = None
        # True when the resident layout holds duplicate rows (spilled
        # multi-assignment, query/spill.py): public searches then select
        # 2k and dedup by original id (_dedup_topk).
        self._spill_dups = False
        if cluster_sorted and not np.array_equal(
            index.row_ids, np.arange(index.total_rows, dtype=index.row_ids.dtype)
        ):
            order = np.asarray(index.row_ids, dtype=np.int64)
            self._gid = order.astype(np.int32)
            embeddings = np.ascontiguousarray(embeddings[order])
            index = IvfIndex(
                dim=index.dim,
                n_clusters=index.n_clusters,
                centroids=index.centroids,
                list_offsets=index.list_offsets,
                row_ids=np.arange(index.total_rows, dtype=np.uint32),
            )
        n, d = embeddings.shape
        if d != index.dim:
            raise ValidationError(
                f"Embedding dim {d} does not match index dim {index.dim}"
            )
        self.index = index
        self.n = n
        self.dim = d
        self.row_tile = row_tile
        # Selection recall for the "approx" modes (hardware ApproxTopK
        # extraction). Winners are always re-scored exactly; this bounds only
        # the chance a true winner is missed, like the IVF probe itself.
        self.approx_recall_target = 0.99
        # Score dtype for the approx modes. approx_min_k is a fusion-barrier
        # custom call, so the [B, chunk] score block materializes in HBM and
        # dominates at large B; bfloat16 halves that traffic at a ~2^-8
        # relative selection perturbation (winners are re-scored in f32).
        self.approx_score_dtype = jnp.float32
        # Explicit ApproxTopK fetch width (0 = policy: max(4k, 64) at small
        # k, 2k at large k). A serving knob: wider = higher selection
        # recall, narrower = faster extraction (the PartialReduce cost
        # scales with the fetch width — docs/PERFORMANCE.md).
        self.scan_overfetch = 0
        # Explicit xbin bin count (0 = auto: largest lane-aligned divisor
        # of n_pad <= 64k). Serving/tuning knob: more bins = fewer
        # collisions but a bigger [B, l_bins] table (HBM write+read) and a
        # wider host top_k. Must divide the padded row count.
        self.xbin_bins = 0
        # xbin memory hedge: >0 chunks the scan into lax.scan steps of
        # this many tile groups (see _exact_xbin_impl); -1 forces the
        # one-call fused form; 0 (default) = auto policy: unchunked only
        # while the worst-case unfused score block stays within
        # _XBIN_FUSE_BUDGET (PQVECTOR_TPU_XBIN_FUSE_BUDGET, 2 GiB).
        self.xbin_chunk_groups = 0
        # mode="tilescan" knobs: tile = rows per argmin tile (0 = auto:
        # largest power-of-2 divisor of n_pad capped at 128); chunk_rows
        # chunks the scan into lax.scan steps of that many rows (0 = auto
        # by _TILESCAN_FUSE_BUDGET, -1 forces the one fused call — the
        # floor-shaped fast path).
        self.tilescan_tile = 0
        self.tilescan_chunk_rows = 0
        # mode="cert" knob: tiles gathered WHOLE per query for the
        # certified-exact scan (0 = auto: max(2k, 16)). Wider = stronger
        # certificates (fewer exact-fallback batches) at more gather
        # traffic; the tile size itself reuses tilescan_tile / auto-128.
        self.cert_fetch_tiles = 0
        # mode="cert" pass-1 precision: "highest" (f32 bf16_6x,
        # tightest slack), "high" (bf16_3x — half the MXU passes, slack
        # +2^-13*(|q|^2+max|x|^2)) or "storage" (scan the bf16 storage
        # natively — ~12x cheaper pass 1 at half the HBM traffic, slack
        # +2^-8*(...)). Wider slack only raises how often the exact
        # fallback re-runs; results are exact for every setting.
        self.cert_pass1 = "highest"
        # mode="cert" pass-2 candidate-scoring form: "auto" (one fused
        # gather+score while under _CERT_FUSE_BUDGET, lax.scan over the
        # selected tiles beyond it), or force "fused"/"scan" — a chip
        # measurement knob (the two forms trade one big materialized
        # gather against m smaller per-step ones; identical results).
        self.cert_pass2 = "auto"
        # Where the chained-loop APIs run the f32 re-score when a
        # reference is held: "auto" defers it past the lax.scan body once
        # the body's while-carry copies (storage + reference, doubled —
        # session r4i pinned that donation does not remove them) would
        # crowd HBM; "body" forces the per-rep in-body re-score; "defer"
        # forces the post-scan refine (also a serving experiment knob —
        # it drops the per-rep gather). See _loop_defer_rescore.
        self.loop_rescore = "auto"
        # mode="autoscan" (weather-routed serving scan): how long one
        # probe_weather classification stays valid, and an injectable
        # prober for tests/offline routing.
        self.weather_ttl_s = 300.0
        self.weather_prober = None
        self._weather: tuple | None = None  # (monotonic time, report)

        n_pad = _round_up(n + 1, row_tile)  # +1 sentinel row
        emb = np.zeros((n_pad, d), dtype=np.float32)
        emb[:n] = embeddings
        sq = np.full(n_pad, np.inf, dtype=np.float32)
        sq[:n] = np.einsum("nd,nd->n", embeddings, embeddings)
        self._sentinel = n  # any padded id points here (inf norm)

        # Full-precision re-score reference (see __init__ docstring). None
        # when storage is already f32 (emb IS the reference). When a
        # reference is kept, the f32 array ships ONCE and the storage
        # array is a device-side downcast — through the ~90 MB/s tunnel
        # that's f32 bytes total instead of f32 + bf16.
        self._emb_ref = None
        if rescore_dtype is not None and jnp.dtype(dtype) != jnp.float32:
            self._emb_ref = jnp.asarray(emb)  # f32 padded copy
            self.emb = self._emb_ref.astype(dtype)
        else:
            self.emb = jnp.asarray(emb, dtype=dtype)
        self._gid_dev = None if self._gid is None else jnp.asarray(self._gid)
        self._emb_sq_pallas = None  # lazy: finite-sentinel copy for kernels
        self._emb_i8 = None  # lazy: (codes, scale) for mode="xbin8"
        self._emb_i8_scale = None
        # Dynamic updates (main-index + memtable design; the reference's
        # file-embedded index is rebuild-only): tombstone deletes +
        # delta-buffer appends, merged/filtered in _finalize.
        self._id_domain = n  # original-id space; grows with appends
        self._deleted_host: np.ndarray | None = None  # bool over id domain
        self._deleted_dev = None
        self._delta: tuple | None = None  # (emb [m,d], sq [m], ids [m])
        self._delta_host: list[np.ndarray] = []
        self.emb_sq = jnp.asarray(sq)
        self.centroids = jnp.asarray(index.centroids)
        self.c_sq = jnp.sum(self.centroids * self.centroids, axis=1)

        sizes = index.cluster_sizes()
        lmax = max(1, int(sizes.max()))
        table = np.full((index.n_clusters, lmax), self._sentinel, dtype=np.int32)
        for c in range(index.n_clusters):
            rows = index.cluster_rows(c)
            table[c, : rows.size] = rows
        self.clusters = jnp.asarray(table)

        # Per-row cluster id for the masked-scan path; pad rows use the extra
        # slot (n_clusters) that is never set in the probe mask.
        row_cluster = np.full(n_pad, index.n_clusters, dtype=np.int32)
        row_cluster[index.row_ids] = np.repeat(
            np.arange(index.n_clusters, dtype=np.int32), sizes
        )
        self.row_cluster = jnp.asarray(row_cluster)
        # Sorted cluster ids (cluster_sorted layout, or data already stored
        # in cluster order) let the masked Pallas kernel use per-tile local
        # cluster tables — the mask matmul shrinks from kc to ~tile/avg_size
        # columns. Cache of tile-size -> (local_cluster, tile_clusters, cmax).
        self._row_cluster_host = row_cluster
        self._row_cluster_sorted = bool(np.all(np.diff(row_cluster) >= 0))
        self._tile_tables: dict[int, tuple[jnp.ndarray, jnp.ndarray, int]] = {}
        self._cmax_cache: dict[int, int] = {}

    @classmethod
    def from_parquet(
        cls,
        path: str | os.PathLike,
        dtype: jnp.dtype = jnp.float32,
        row_tile: int = 2048,
        spill: float = 0.0,
        assign_dtype=jnp.float32,
        rescore_dtype="auto",
    ) -> "DeviceIvfSearcher":
        """Resident searcher from an indexed Parquet file. ``spill`` > 0
        builds the spilled multi-assignment layout (see with_spill) — the
        serving knob Session.device_searcher(name, spill=...) forwards."""
        from ..io.embed import read_index_metric

        index, column = read_index_from_parquet(path)
        emb = read_embedding_column(path, column)
        metric = read_index_metric(path)
        if spill:
            searcher = cls.with_spill(
                index,
                emb.data,
                spill=spill,
                assign_dtype=assign_dtype,
                dtype=dtype,
                row_tile=row_tile,
                metric=metric,
                rescore_dtype=rescore_dtype,
            )
        else:
            searcher = cls(
                index,
                emb.data,
                dtype=dtype,
                row_tile=row_tile,
                metric=metric,
                rescore_dtype=rescore_dtype,
            )
        # Provenance for the SQL engine's resident fast path (column-match
        # enforcement mirrors index_exec.rs:123-129; the (size, mtime) key
        # lets the engine reject a searcher built before a re-index).
        searcher.source_path = os.fspath(path)
        searcher.source_column = column.name
        try:
            st = os.stat(path)
            searcher.source_key = (st.st_size, st.st_mtime_ns)
        except OSError:
            searcher.source_key = (-1, -1)
        return searcher

    # ------------------------------------------------------------------

    def _check_queries(self, queries: np.ndarray) -> jnp.ndarray:
        q = jnp.asarray(queries, dtype=jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.ndim != 2 or q.shape[1] != self.dim:
            raise ValidationError(
                f"Query dimension mismatch: expected {self.dim}, got {q.shape}"
            )
        if self.metric == "cosine":
            norms = jnp.sqrt(jnp.sum(q * q, axis=1, keepdims=True))
            q = q / jnp.maximum(norms, 1e-30)
        return q

    def _pallas_tile(
        self, row_tile: int, batch: int, stream: bool = False, k: int = 10
    ) -> int:
        """Largest divisor of ``row_tile`` whose kernel VMEM footprint fits.

        Two constraints against the 16 MB scoped limit:
        * the [B, tile] f32 score block — Mosaic's stack accounting charges
          ~4x it in extraction temporaries (stream merge: ~5x, measured
          21.8 MB at tile=4096 B=256, so stream halves the budget);
        * the double-buffered [subtiles<=2, tile, d] embedding block, which
          scales with the DIMENSION — at d=1024 f32, tile=2048 alone is
          16 MB and OOMs (observed on the reference-default 1M x 1024
          workload); cap it at ~5 MB.
        Must divide ``row_tile`` because the padded row count is a multiple
        of it."""
        # Empirical stack model: tile=4096 at B=256 fits (4 MB scores);
        # B=1024 needs <=2.5 MB (larger q/output/iota blocks eat the rest).
        budget_bytes = 4 * 1024 * 1024 if batch <= 256 else int(2.5 * 1024 * 1024)
        if stream:
            budget_bytes //= 2
        if k > 16:
            # The unrolled extraction passes charge stack per pass: observed
            # ~30.5 MB scoped at k=100, tile=1024, B=256 (vs ~16 MB at k=10,
            # tile=4096) — shrink the tile roughly linearly in k.
            budget_bytes = budget_bytes * 16 // k
        budget = max(budget_bytes // (4 * max(batch, 1)), 128)
        tile = row_tile
        while tile > budget and tile % 2 == 0:
            tile //= 2
        esize = jnp.dtype(self.emb.dtype).itemsize
        # <=2 MB per sub-tile: with double-buffering and up to 2 sub-tiles
        # the emb block stays <=4 MB, leaving room for the merge stack
        # (observed: 8 MB of block -> 17.4 MB scoped > the 16 MB limit).
        while tile > 128 and tile * self.dim * esize > (2 << 20):
            tile //= 2
        return tile

    def _exact_impl(self, queries: np.ndarray, k: int, mode: str = "auto"):
        """Exact brute-force top-k. Returns (sqrt distances [B,k], ids [B,k]);
        missing slots (k > n) have id -1 and distance inf.

        ``mode="pallas"`` routes through the fused scan kernel
        (kernels/scan_topk.py) — the default on TPU (4x+ the XLA merge);
        "auto" picks pallas on TPU and the XLA path elsewhere.
        ``mode="approx"`` extracts winners with the hardware ApproxTopK
        reduction at ``self.approx_recall_target`` selection recall —
        returned distances stay exact (winners are re-scored)."""
        q = self._check_queries(queries)
        if k <= 0:
            raise ValidationError("k must be > 0")
        if mode == "auto":
            if jax.default_backend() == "tpu" and k <= 32:
                # Streaming-threshold kernel (round 2): running top-k carried
                # across tiles, extraction passes gated on actual improvement
                # — measured 2.6x the round-1 per-tile extraction kernel.
                # Beyond k=32 the unrolled extraction passes blow the Mosaic
                # stack regardless of tile (28 MB scoped at k=100, tile=512)
                # — the XLA merge handles any k.
                mode = "stream"
            else:
                mode = "xla"
        if mode == "stream":
            from ..kernels.stream_topk import pallas_stream_exact_topk

            tile_p = self._pallas_tile(self.row_tile, q.shape[0], stream=True, k=k)
            d2, ids = pallas_stream_exact_topk(
                q,
                self.emb,
                self._pallas_emb_sq(),
                k,
                tile=tile_p,
                subtiles=self._stream_subtiles(tile_p),
                interpret=jax.default_backend() != "tpu",
                emb_ref=self._ref(),
            )
        elif mode == "pallas":
            from ..kernels.scan_topk import pallas_exact_topk

            d2, ids = pallas_exact_topk(
                q,
                self.emb,
                self._pallas_emb_sq(),
                k,
                tile=self._pallas_tile(self.row_tile, q.shape[0], k=k),
                interpret=jax.default_backend() != "tpu",
                emb_ref=self._ref(),
            )
        elif mode == "xla":
            d2, ids = _exact_topk(
                q, self.emb, self.emb_sq, k, self.row_tile,
                emb_ref=self._ref(),
            )
        elif mode == "approx":
            d2, ids = _exact_approx_topk(
                q,
                self.emb,
                self.emb_sq,
                k,
                chunk=self._approx_chunk(k=k),
                recall_target=self.approx_recall_target,
                score_dtype=self.approx_score_dtype,
                overfetch=self.scan_overfetch,
                emb_ref=self._ref(),
            )
        elif mode == "binscan":
            from ..kernels.binscan import pallas_binned_scan

            bt_ = self._binscan_tile()
            d2, ids = pallas_binned_scan(
                q,
                self.emb,
                self._pallas_emb_sq(),
                k,
                tile=bt_,
                expand=self._binscan_expand(bt_),
                interpret=jax.default_backend() != "tpu",
                emb_ref=self._ref(),
            )
        elif mode == "binscan8":
            # Int8 fused binned-min scan: quantized scoring on the int8 MXU
            # at 1/4 the f32 HBM bytes AND the in-kernel extraction — both
            # measured scan limiters at once (see _exact_xbin8_impl and
            # kernels/binscan.py). Winners re-scored exactly.
            from ..kernels.binscan import pallas_binned_scan

            e8, sc = self._xbin8_arrays()
            bt_ = self._binscan_tile(esize=1)
            d2, ids = pallas_binned_scan(
                q,
                e8,
                self._pallas_emb_sq(),
                k,
                tile=bt_,
                expand=self._binscan_expand(bt_, esize=1),
                interpret=jax.default_backend() != "tpu",
                scale=sc,
                emb_ref=self._ref_or_emb(),
            )
        elif mode == "xbin":
            d2, ids = _exact_xbin(
                q, self.emb, self.emb_sq, k,
                l_bins=self._xbin_bins_checked(k),
                score_dtype=self.approx_score_dtype,
                overfetch=self.scan_overfetch,
                chunk_groups=_xbin_auto_chunk(
                    q.shape[0], int(self.emb.shape[0]),
                    self._xbin_bins_checked(k), self.xbin_chunk_groups,
                ),
                emb_ref=self._ref(),
            )
        elif mode == "xbin8":
            e8, sc = self._xbin8_arrays()
            d2, ids = _exact_xbin8(
                q, e8, sc, self.emb_sq, self._ref_or_emb(), k,
                l_bins=self._xbin_bins_checked(k),
                overfetch=self.scan_overfetch,
                chunk_groups=_xbin_auto_chunk(
                    q.shape[0], int(self.emb.shape[0]),
                    self._xbin_bins_checked(k), self.xbin_chunk_groups,
                ),
            )
        elif mode == "tilescan":
            d2, ids = _exact_tilescan(
                q, self.emb, self.emb_sq, k,
                tile=self._tilescan_tile_checked(k),
                chunk_rows=self.tilescan_chunk_rows,
                overfetch=self.scan_overfetch,
                emb_ref=self._ref(),
            )
        elif mode == "cert":
            d2, ids = _exact_cert(
                q, self.emb, self.emb_sq, k,
                tile=self._cert_tile_checked(k),
                fallback_tile=self.row_tile,
                m_tiles=self.cert_fetch_tiles,
                chunk_rows=self.tilescan_chunk_rows,
                emb_ref=self._ref(),
                pass1_high=self._cert_pass1_mode()[0],
                pass1_storage=self._cert_pass1_mode()[1],
                pass2_form=self.cert_pass2,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            raise ValidationError(f"Unknown exact mode '{mode}'")
        return jnp.sqrt(d2), self._map_ids(d2, ids)

    def _search_impl(
        self, queries: np.ndarray, k: int, nprobe: int, mode: str = "auto"
    ):
        """IVF top-k. Returns (sqrt distances [B,k], ids [B,k]); slots beyond
        the candidate count have id -1 and distance inf.

        ``mode``: "gather" fetches only probed clusters (low-latency small
        batches — measured 1.0 ms device-side at B=1, 1M x 128); "masked"
        does one masked full HBM pass (wins when
        ``B * nprobe * avg_cluster > n``); "pallas" fuses the masked scan +
        extraction in VMEM (TPU default); "approx" is the masked scan with
        hardware ApproxTopK extraction (selection recall =
        ``self.approx_recall_target``, distances exact); "compact" gathers
        the batch's probed-union row tiles into a contiguous block and runs
        the ApproxTopK extraction over only that block (n-sublinear traffic;
        candidates = the batch union of probed clusters, capped — see
        ``_compact_params``); "scan" is the nprobe-free ApproxTopK full
        scan; "auto" picks pallas on TPU, gather/masked by the traffic
        inequality elsewhere.
        """
        q = self._check_queries(queries)
        if k <= 0:
            raise ValidationError("k must be > 0")
        if nprobe <= 0:
            raise ValidationError("nprobe must be > 0")
        nprobe = min(nprobe, self.index.n_clusters)
        tile = min(self.row_tile, 2048)

        if mode == "auto":
            if jax.default_backend() == "tpu" and k > 32:
                # Unrolled per-pass extraction blows the Mosaic stack at
                # large k (28 MB scoped at k=100 regardless of tile); the
                # XLA masked scan handles any k.
                mode = "masked"
            elif jax.default_backend() == "tpu":
                # Measured routing (docs/PERFORMANCE.md round 2): the
                # local-mask pallas kernel wins while its pre-gathered lmask
                # buffer fits (1M x 128 B=256: 39.8k vs stream 27k QPS);
                # beyond the cap (10M) pallas falls back to the global mask
                # (1.4k QPS) and the stream kernel's compaction + in-kernel
                # mask wins (7.1k). Exact-selection either way; "scan" is
                # opt-in because it changes recall semantics.
                tile_a = self._pallas_tile(self.row_tile, q.shape[0])
                if self._use_local_mask(tile_a, q.shape[0]):
                    mode = "pallas"
                elif self._can_stream_masked(k, q.shape[0]):
                    mode = "stream"
                else:
                    mode = "pallas"
            else:
                lmax = int(self.clusters.shape[1])
                gather_bytes = q.shape[0] * nprobe * lmax
                mode = "masked" if gather_bytes > self.n else "gather"

        if mode == "stream":
            if not self._can_stream_masked(k, q.shape[0]):
                raise ValidationError(
                    "stream mode needs a cluster-sorted layout, k <= 128, and "
                    "a probe mask that fits VMEM (batch * n_clusters)"
                )
            from ..kernels.stream_topk import pallas_stream_masked_topk

            max_probe = self._max_probe_bucket(nprobe)
            tile_p = self._pallas_tile(
                self.row_tile, q.shape[0], stream=True, k=k
            )
            lcl, tc, cmax = self._tile_cluster_table(tile_p)
            d2, ids = pallas_stream_masked_topk(
                q,
                self.centroids,
                self.c_sq,
                lcl,
                tc,
                self.emb,
                self._pallas_emb_sq(),
                jnp.int32(nprobe),
                k,
                max_probe=max_probe,
                tile=tile_p,
                cmax=cmax,
                subtiles=self._stream_subtiles(tile_p),
                interpret=jax.default_backend() != "tpu",
                emb_ref=self._ref(),
            )
        elif mode == "pallas":
            # Fused Pallas kernel: per-tile top-k extracted in VMEM instead
            # of the XLA lax.top_k merge (see kernels/scan_topk.py). With a
            # cluster-sorted layout the mask work runs on per-tile local
            # cluster tables (~100x fewer mask MACs, identical results).
            from ..kernels.scan_topk import (
                pallas_masked_local_topk,
                pallas_masked_topk,
            )

            max_probe = self._max_probe_bucket(nprobe)
            tile_p = self._pallas_tile(self.row_tile, q.shape[0], k=k)
            interpret = jax.default_backend() != "tpu"
            if self._use_local_mask(tile_p, q.shape[0]):
                lcl, tc, cmax = self._tile_cluster_table(tile_p)
                d2, ids = pallas_masked_local_topk(
                    q,
                    self.centroids,
                    self.c_sq,
                    lcl,
                    tc,
                    self.emb,
                    self._pallas_emb_sq(),
                    jnp.int32(nprobe),
                    k,
                    max_probe=max_probe,
                    tile=tile_p,
                    cmax=cmax,
                    interpret=interpret,
                    emb_ref=self._ref(),
                )
            else:
                d2, ids = pallas_masked_topk(
                    q,
                    self.centroids,
                    self.c_sq,
                    self.row_cluster,
                    self.emb,
                    self._pallas_emb_sq(),
                    jnp.int32(nprobe),
                    k,
                    max_probe=max_probe,
                    tile=tile_p,
                    interpret=interpret,
                    emb_ref=self._ref(),
                )
        elif mode == "masked":
            # max_probe buckets (powers of two) so an nprobe sweep shares one
            # compiled executable per bucket.
            max_probe = self._max_probe_bucket(nprobe)
            d2, ids = _ivf_masked_scan(
                q,
                self.centroids,
                self.c_sq,
                self.row_cluster,
                self.emb,
                self.emb_sq,
                jnp.int32(nprobe),
                k=k,
                max_probe=max_probe,
                tile=self.row_tile,
                emb_ref=self._ref(),
            )
        elif mode == "approx":
            max_probe = self._max_probe_bucket(nprobe)
            d2, ids = _ivf_approx_masked(
                q,
                self.centroids,
                self.c_sq,
                self.row_cluster,
                self.emb,
                self.emb_sq,
                jnp.int32(nprobe),
                k=k,
                max_probe=max_probe,
                chunk=self._approx_chunk(masked=True, k=k),
                recall_target=self.approx_recall_target,
                score_dtype=self.approx_score_dtype,
                overfetch=self.scan_overfetch,
                emb_ref=self._ref(),
            )
        elif mode == "compact":
            # Probed-union tile compaction + hardware extraction: reads only
            # the batch's active tiles (n-sublinear at fixed B*nprobe/kc),
            # then PartialReduce over the compacted block (VERDICT r2 #1).
            max_probe = self._compact_probe_bucket(nprobe)
            ctile, cap_tiles, chunk = self._compact_params(
                q.shape[0], nprobe, k
            )
            tlo, thi, span = self._compact_tile_ranges(ctile)
            d2, ids = _ivf_compact_approx(
                q,
                self.centroids,
                self.c_sq,
                self.row_cluster,
                self.emb,
                self.emb_sq,
                jnp.int32(nprobe),
                k=k,
                max_probe=max_probe,
                ctile=ctile,
                cap_tiles=cap_tiles,
                chunk=chunk,
                recall_target=self.approx_recall_target,
                score_dtype=self.approx_score_dtype,
                interpret=jax.default_backend() != "tpu",
                tile_lo=tlo,
                tile_hi=thi,
                max_cluster_tiles=span,
                emb_ref=self._ref(),
            )
        elif mode in ("bincompact", "bincompact8"):
            # Probed-union selection + fused binned-min scan IN PLACE: the
            # covered fraction crosses HBM once and extraction overlaps the
            # matmul (see _ivf_compact_bin_impl). The "8" variant streams
            # int8 codes (1/4 the bytes, int8 MXU) with exact re-score.
            i8 = mode == "bincompact8"
            esz = 1 if i8 else None
            max_probe = self._compact_probe_bucket(nprobe)
            ctile_b, cap_b = self._compact_bin_params(
                q.shape[0], nprobe, k, esize=esz
            )
            if not ctile_b:
                raise ValidationError(
                    f"{mode} ineligible for this shape (provenance bits "
                    "or tile alignment); use compact or scan"
                )
            tlo, thi, span = self._compact_tile_ranges(ctile_b)
            e8, sc = self._xbin8_arrays() if i8 else (None, None)
            d2, ids = _ivf_compact_bin(
                q,
                self.centroids,
                self.c_sq,
                self.row_cluster,
                e8 if i8 else self.emb,
                self._pallas_emb_sq(),
                jnp.int32(nprobe),
                k=k,
                max_probe=max_probe,
                ctile=ctile_b,
                cap_tiles=cap_b,
                interpret=jax.default_backend() != "tpu",
                tile_lo=tlo,
                tile_hi=thi,
                max_cluster_tiles=span,
                expand=self._binscan_expand(ctile_b, cap=cap_b, esize=esz),
                scale=sc,
                emb_ref=self._ref_or_emb() if i8 else self._ref(),
            )
        elif mode == "scan":
            # Serving mode: ApproxTopK full scan, nprobe ignored — recall
            # comes from the extraction recall_target (see search_loop).
            d2, ids = _exact_approx_topk(
                q,
                self.emb,
                self.emb_sq,
                k,
                chunk=self._approx_chunk(k=k),
                recall_target=self.approx_recall_target,
                score_dtype=self.approx_score_dtype,
                overfetch=self.scan_overfetch,
                emb_ref=self._ref(),
            )
        elif mode == "binscan":
            # Serving mode: fused binned-min full scan (kernels/binscan.py),
            # nprobe ignored — the matmul and the candidate extraction
            # overlap in one Pallas kernel instead of paying the serialized
            # PartialReduce pass (the measured B=4096 MFU limiter).
            from ..kernels.binscan import pallas_binned_scan

            bt_ = self._binscan_tile()
            d2, ids = pallas_binned_scan(
                q,
                self.emb,
                self._pallas_emb_sq(),
                k,
                tile=bt_,
                expand=self._binscan_expand(bt_),
                interpret=jax.default_backend() != "tpu",
                emb_ref=self._ref(),
            )
        elif mode == "binscan8":
            # Serving mode: int8 fused binned-min scan, nprobe ignored —
            # int8 MXU scoring at 1/4 the f32 bytes + in-kernel extraction
            # (both measured scan limiters), exact re-score of winners.
            from ..kernels.binscan import pallas_binned_scan

            e8, sc = self._xbin8_arrays()
            bt_ = self._binscan_tile(esize=1)
            d2, ids = pallas_binned_scan(
                q,
                e8,
                self._pallas_emb_sq(),
                k,
                tile=bt_,
                expand=self._binscan_expand(bt_, esize=1),
                interpret=jax.default_backend() != "tpu",
                scale=sc,
                emb_ref=self._ref_or_emb(),
            )
        elif mode == "xbin":
            # Serving mode: XLA binned-min full scan (fused-epilogue
            # selection — see _exact_xbin_impl), nprobe ignored.
            d2, ids = _exact_xbin(
                q, self.emb, self.emb_sq, k,
                l_bins=self._xbin_bins_checked(k),
                score_dtype=self.approx_score_dtype,
                overfetch=self.scan_overfetch,
                chunk_groups=_xbin_auto_chunk(
                    q.shape[0], int(self.emb.shape[0]),
                    self._xbin_bins_checked(k), self.xbin_chunk_groups,
                ),
                emb_ref=self._ref(),
            )
        elif mode == "xbin8":
            # Serving mode: int8 xbin — quantized scoring on the int8 MXU,
            # 1/4 the f32 scan bytes, exact re-score of winners; nprobe
            # ignored (see _exact_xbin8_impl).
            e8, sc = self._xbin8_arrays()
            d2, ids = _exact_xbin8(
                q, e8, sc, self.emb_sq, self._ref_or_emb(), k,
                l_bins=self._xbin_bins_checked(k),
                overfetch=self.scan_overfetch,
                chunk_groups=_xbin_auto_chunk(
                    q.shape[0], int(self.emb.shape[0]),
                    self._xbin_bins_checked(k), self.xbin_chunk_groups,
                ),
            )
        elif mode == "tilescan":
            # Serving mode: per-tile argmin full scan (floor-shaped fused
            # extraction — see _exact_tilescan_impl), nprobe ignored.
            d2, ids = _exact_tilescan(
                q, self.emb, self.emb_sq, k,
                tile=self._tilescan_tile_checked(k),
                chunk_rows=self.tilescan_chunk_rows,
                overfetch=self.scan_overfetch,
                emb_ref=self._ref(),
            )
        elif mode == "cert":
            # Serving mode: certified-exact full scan (recall 1.0 with an
            # in-dispatch fallback — see _exact_cert_impl), nprobe ignored.
            d2, ids = _exact_cert(
                q, self.emb, self.emb_sq, k,
                tile=self._cert_tile_checked(k),
                fallback_tile=self.row_tile,
                m_tiles=self.cert_fetch_tiles,
                chunk_rows=self.tilescan_chunk_rows,
                emb_ref=self._ref(),
                pass1_high=self._cert_pass1_mode()[0],
                pass1_storage=self._cert_pass1_mode()[1],
                pass2_form=self.cert_pass2,
                interpret=jax.default_backend() != "tpu",
            )
        elif mode == "gather":
            d2, ids = _ivf_topk(
                q,
                self.centroids,
                self.c_sq,
                self.clusters,
                self.emb,
                self.emb_sq,
                k,
                nprobe,
                tile,
                emb_ref=self._ref(),
            )
        else:
            raise ValidationError(f"Unknown search mode '{mode}'")
        return jnp.sqrt(d2), self._map_ids(d2, ids)

    def _stream_subtiles(self, tile_p: int) -> int:
        """Sub-tiles per grid step for the stream kernels: capped at 2 (the
        [subtiles, tile, d] emb block is double-buffered; 4 sub-tiles of f32
        measured 18.4 MB of scoped VMEM > the 16 MB limit)."""
        return max(1, min(self.row_tile // tile_p, 2))

    def _can_stream_masked(self, k: int, batch: int) -> bool:
        """Stream masked kernel eligibility: cluster-sorted layout (tile
        tables exist), k fits the 128-lane accumulator, and the resident
        [B, kc_pad] probe mask fits the VMEM budget (~6 MB)."""
        if not self._row_cluster_sorted or k > 128:
            return False
        kc_pad = _round_up(self.index.n_clusters + 1, 128)
        return batch * kc_pad * 4 <= (6 << 20)

    def _use_local_mask(self, tile: int, batch: int) -> bool:
        """Local-mask kernel needs sorted cluster ids AND a bounded lmask
        buffer: the pre-gathered [nt, B, cmax] mask costs
        (n_pad/tile)*B*cmax*4 bytes of HBM — ~10 GB at B=1024 on 10M rows.
        Cap it at 256 MB; beyond that the global-mask kernel wins anyway
        (its extra matmul is batch-linear too, but needs no buffer)."""
        if not self._row_cluster_sorted:
            return False
        nt = self.emb.shape[0] // tile
        cmax = self._cmax_for_tile(tile)
        return nt * batch * cmax * 4 <= (256 << 20)

    def _cmax_for_tile(self, tile: int) -> int:
        """True 128-padded cmax for a tile size, computed without building
        the full tile table (the gate must not guess: a mispredicted cmax
        could admit a surprise multi-GB lmask buffer). For sorted cluster
        ids the per-tile distinct count is run-boundaries-within-tile + 1."""
        cached = self._tile_tables.get(tile)
        if cached is not None:
            return cached[2]
        if tile not in self._cmax_cache:
            parts = self._row_cluster_host.reshape(-1, tile)
            nuniq = int((np.diff(parts, axis=1) != 0).sum(axis=1).max()) + 1
            self._cmax_cache[tile] = max(128, _round_up(nuniq, 128))
        return self._cmax_cache[tile]

    #: Safety factor on the expected probed-union tile count (mode
    #: "compact"): the cap is statically compiled; overflow drops the
    #: least-probed tiles (recall-gated in the bench).
    compact_slack: float = 1.35

    def _compact_params(
        self, batch: int, nprobe: int, k: int
    ) -> tuple[int, int, int]:
        """(ctile, cap_tiles, chunk) for the compact mode.

        cap = expected distinct probed clusters (birthday bound over
        B*nprobe draws) x tiles-per-cluster x slack, clamped to the tile
        count. ctile is the compaction granularity: small enough that tile
        boundary waste stays low, a divisor of row_tile so n_pad splits.
        """
        ctile = self.row_tile
        for cand in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
            if self.row_tile % cand == 0:
                ctile = cand
                break
        n_pad = self.emb.shape[0]
        nt = n_pad // ctile
        kc = max(self.index.n_clusters, 1)
        draws = batch * nprobe
        expected = kc * (1.0 - (1.0 - 1.0 / kc) ** draws)
        tiles_per = (self.n / kc) / ctile + 1.0
        cap = int(min(nt, -(-expected * tiles_per * self.compact_slack // 1)))
        cap = max(cap, 1)
        rows_c = cap * ctile
        # Compacted layout is cluster-run ordered: same large-k bin-collision
        # rule as _approx_chunk (sorted layouts need 64k chunks at k > 32).
        chunk = min(rows_c, 65536) if k > 32 else rows_c
        return ctile, cap, chunk

    def calibrate_bincompact(
        self,
        queries: np.ndarray,
        nprobe: int,
        k: int = 10,
        slack: float = 1.15,
        bucket: int = 128,
        esize: int | None = None,
    ):
        """Pin the bincompact tile budget to the MEASURED probed-union size.

        The static formula in ``_compact_bin_params`` over-budgets on large
        cluster counts (its expected-coverage model ignores probe locality
        — at DEEP-10M shapes it predicts ~60% tile coverage where the real
        union is ~22%). Serving deployments calibrate against a
        representative query batch instead: compute the batch's probed-tile
        union on host (one [B, kc] numpy matmul), add ``slack`` headroom,
        round up to ``bucket`` tiles (bounding recompiles), and use that
        cap for subsequent ``mode="bincompact"`` searches. Returns
        (ctile, cap), or (0, 0) if ineligible (provenance-bit budget,
        unsorted layout). Clear with ``self._bincompact_calibrated = None``.
        """
        self._bincompact_calibrated = None
        if not self._row_cluster_sorted:
            return (0, 0)
        k = self._spill_k(k)  # spilled searches run the impls at 2k
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        nprobe = min(max(1, nprobe), self.index.n_clusters)
        cent = np.asarray(self.index.centroids, np.float32)
        d2 = np.einsum("kd,kd->k", cent, cent)[None, :] - 2.0 * (q @ cent.T)
        kp = min(nprobe, cent.shape[0])
        probe = (
            np.argpartition(d2, kp - 1, axis=1)[:, :kp]
            if kp < cent.shape[0]
            else np.broadcast_to(np.arange(cent.shape[0]), d2.shape)
        )
        active = np.unique(probe)
        n_pad = int(self.emb.shape[0])
        # Prefer the LARGEST eligible tile: bins = ctile, and cross-tile
        # bin collisions are the mode's only recall loss (measured at
        # DEEP-10M B=256: 0.9477 recall at ctile=1024 vs compact's 0.9805
        # same-probe selection) — 2048 bins halve the collision rate.
        for ctile in (2048, 1024, 512):
            if n_pad % ctile or k > ctile:
                continue
            if not self._binscan_vmem_ok(ctile, esize=esize):
                continue
            nt = n_pad // ctile
            lo_j, hi_j, _ = self._compact_tile_ranges(ctile)
            lo = np.asarray(lo_j)[active]
            hi = np.asarray(hi_j)[active]
            # Active-tile count via interval stabbing (clusters sharing a
            # boundary tile must not double-count it).
            mark = np.zeros(nt + 1, np.int64)
            np.add.at(mark, lo, 1)
            np.add.at(mark, hi + 1, -1)
            n_active = int((np.cumsum(mark[:-1]) > 0).sum())
            cap = int(-(-(n_active * slack) // bucket) * bucket)
            cap = max(1, min(nt, cap))
            # Measured caps may use the kernel's full packed-key budget.
            if provenance_bits(cap, ctile) <= PROVENANCE_BITS_MAX:
                # Record the operating point: a later search with a larger
                # batch or nprobe must NOT reuse this cap (its probed union
                # would exceed it — silent recall loss).
                self._bincompact_calibrated = (
                    ctile, cap, nprobe, q.shape[0]
                )
                return (ctile, cap)
        return (0, 0)

    def _compact_bin_params(
        self, batch: int, nprobe: int, k: int, esize: int | None = None
    ):
        """(ctile, cap_tiles) for mode="bincompact", or (0, 0) if the
        provenance bit budget can't cover the predicted active-tile count
        (kernels/binscan.py caps packed keys at 13 provenance bits; we gate
        at 12 to keep selection precision >= 2^-11). A prior
        ``calibrate_bincompact`` measurement overrides the formula.
        ``esize=1`` gates the int8 mode="bincompact8" variant (an
        f32-calibrated point stays valid — the int8 working set is a
        strict subset at the same ctile)."""
        cal = getattr(self, "_bincompact_calibrated", None)
        if cal and k <= cal[0] and nprobe <= cal[2] and batch <= cal[3] \
                and self._binscan_vmem_ok(cal[0], esize=esize):
            # Only within the calibrated operating point: a bigger batch or
            # probe set has a bigger union than the measured cap covers.
            # The vmem re-check matters when the calibration ran at a
            # different element size (an int8-calibrated ctile can exceed
            # the f32 working set).
            return cal[0], cal[1]
        n_pad = int(self.emb.shape[0])
        kc = max(self.index.n_clusters, 1)
        draws = batch * nprobe
        expected = kc * (1.0 - (1.0 - 1.0 / kc) ** draws)
        # Prefer the LARGEST eligible tile: bins = ctile, and cross-tile
        # bin collisions are the mode's only recall loss (measured at
        # DEEP-10M B=256: 0.9477 recall at ctile=1024 vs compact's 0.9805
        # same-probe selection) — 2048 bins halve the collision rate.
        for ctile in (2048, 1024, 512):
            if n_pad % ctile or k > ctile:
                continue
            if not self._binscan_vmem_ok(ctile, esize=esize):
                continue
            nt = n_pad // ctile
            tiles_per = (self.n / kc) / ctile + 1.0
            cap = int(min(nt, -(-expected * tiles_per * self.compact_slack // 1)))
            cap = max(cap, 1)
            # Predicted (unmeasured) caps keep one bit of margin as a
            # selection-precision floor (>= 2^-11 on the packed value).
            if provenance_bits(cap, ctile) <= PROVENANCE_BITS_MAX - 1:
                return ctile, cap
        return 0, 0

    def bincompact_coverage(
        self, batch: int, nprobe: int, k: int = 10, esize: int | None = None
    ) -> float:
        """Predicted fraction of rows mode="bincompact" would read (1.0 when
        ineligible). Unlike compact's 3-pass traffic, bincompact reads the
        covered fraction once, so it pays off up to coverage ~1. Pass
        ``esize=1`` to gate mode="bincompact8" (the int8 working set can
        be eligible at dims where f32 is not)."""
        ctile, cap = self._compact_bin_params(
            batch, nprobe, self._spill_k(k), esize=esize
        )
        if not ctile:
            return 1.0
        return cap / max(int(self.emb.shape[0]) // ctile, 1)

    def compact_coverage(self, batch: int, nprobe: int, k: int = 10) -> float:
        """Predicted fraction of row tiles the compact mode would read for
        this batch shape (cap/nt). Callers can skip compact when this is
        high — above ~1/3 the gather's read+write+read traffic exceeds the
        full scan's single pass."""
        ctile, cap, _ = self._compact_params(batch, nprobe, self._spill_k(k))
        nt = self.emb.shape[0] // ctile
        return cap / max(nt, 1)

    def _compact_probe_bucket(self, nprobe: int) -> int:
        """Small power-of-two probe bucket for compact mode: lax.top_k time
        grows with k (k=128 over kc=4096 measured 6 ms at B=256 — the
        shared _max_probe_bucket minimum); compact compiles per bucket."""
        p = 8
        while p < nprobe:
            p *= 2
        return min(p, self.index.n_clusters)

    def _compact_tile_ranges(self, ctile: int):
        """(tile_lo, tile_hi [kc] device i32, max_cluster_tiles) for the
        cluster-sorted layout, or (None, None, 0) when rows aren't sorted.
        Cached per ctile."""
        if not self._row_cluster_sorted:
            return None, None, 0
        cache = getattr(self, "_tile_range_cache", None)
        if cache is None:
            cache = self._tile_range_cache = {}
        if ctile not in cache:
            rc = self._row_cluster_host
            kc = self.index.n_clusters
            nt = self.emb.shape[0] // ctile
            offsets = np.searchsorted(rc, np.arange(kc + 1), side="left")
            lo = (offsets[:-1] // ctile).astype(np.int32)
            hi = ((np.maximum(offsets[1:], offsets[:-1] + 1) - 1) // ctile
                  ).astype(np.int32)
            hi = np.minimum(hi, nt - 1)
            span = int((hi - lo + 1).max()) if kc else 0
            cache[ctile] = (jnp.asarray(lo), jnp.asarray(hi), span)
        return cache[ctile]

    def _max_probe_bucket(self, nprobe: int) -> int:
        """Power-of-two max_probe bucket (floor 128) so an nprobe sweep
        shares one compiled executable per bucket."""
        max_probe = 1
        while max_probe < nprobe:
            max_probe *= 2
        return min(max(max_probe, min(128, self.index.n_clusters)),
                   self.index.n_clusters)

    def _tile_cluster_table(self, tile: int):
        """(local_cluster [n_pad] f32, tile_clusters [nt, cmax] i32, cmax)
        for the local-mask kernel; requires sorted row_cluster."""
        if tile not in self._tile_tables:
            rc = self._row_cluster_host
            nt = rc.size // tile
            parts = rc.reshape(nt, tile)
            uniques = [np.unique(parts[t]) for t in range(nt)]
            # 128-lane floor: smaller last dims mis-lower under Mosaic
            # (observed id scrambling at cmax=16 on chip).
            cmax = max(128, -(-max(u.size for u in uniques) // 128) * 128)
            # Pad slots point at the sentinel cluster (n_clusters), whose
            # mask bit is never set; no row maps to a pad slot.
            tc = np.full((nt, cmax), self.index.n_clusters, dtype=np.int32)
            lcl = np.empty((nt, tile), dtype=np.float32)
            for t, u in enumerate(uniques):
                tc[t, : u.size] = u
                lcl[t] = np.searchsorted(u, parts[t])
            self._tile_tables[tile] = (
                jnp.asarray(lcl.reshape(-1)),
                jnp.asarray(tc),
                cmax,
            )
        return self._tile_tables[tile]

    def _search_loop_impl(
        self, queries, k: int, nprobe: int, reps: int = 16, mode: str = "auto"
    ):
        """``reps`` data-dependency-chained IVF searches in ONE dispatch.

        Through the axon tunnel every dispatch pays ~15-20 ms of host/
        transport overhead, which floors single-dispatch QPS measurements
        regardless of kernel speed (PERFORMANCE.md). Chaining the batches
        inside one jitted ``lax.scan`` measures true device throughput the
        way a co-located serving loop would see it. Returns the last
        iteration's (sqrt distances, ids); every iteration's winners feed
        the next query, so materializing the result proves all ``reps``
        executed.

        ``mode="scan"`` serves the query with the ApproxTopK full scan and
        IGNORES nprobe: recall comes from the extraction's recall_target
        (~0.99) instead of probe selection — measured both faster AND
        higher-recall than every IVF mode on-chip at B >= 256 (XLA fuses
        the scoring matmul into the PartialReduce custom call, so nothing
        materializes; the masked approx mode pays a [B, chunk] gather).
        """
        q = self._check_queries(queries)
        if k <= 0:
            raise ValidationError("k must be > 0")
        if mode == "xbin8":  # nprobe-free int8 scan: dedicated loop
            return self._xbin8_loop_call(q, k, reps)
        if mode not in ("auto", "stream", "pallas", "masked", "approx",
                        "scan", "compact", "binscan", "bincompact", "xbin",
                        "binscan8", "bincompact8", "tilescan", "cert"):
            # NOT the search() catalogue: "gather" has no chained-loop
            # path — silently running a different kernel here would
            # mis-time it (the autotune/gather lesson).
            raise ValidationError(f"Unknown search_loop mode '{mode}'")
        defer_k = 0
        if self._loop_defer_rescore():
            if mode == "cert":
                raise ValidationError(
                    "mode='cert' needs the f32 reference inside the loop "
                    "body, but this array is in the deferred-re-score "
                    "regime (see exact_loop); use mode='scan'/'binscan' "
                    "or single-dispatch search(mode='cert')"
                )
            # Widened selection at storage precision inside the loop; one
            # f32 refine of the last rep's winners after it (see
            # _loop_defer_rescore — the >=12M while-carry OOM).
            defer_k, k = k, min(2 * k, int(self.emb.shape[0]))
        args, kw = self._search_loop_binding(q, k, nprobe, reps, mode)
        kw["defer_k"] = defer_k
        d, ids = _masked_pallas_loop(*args, **kw)
        return d, ids

    def _search_loop_binding(self, q, k: int, nprobe: int, reps: int,
                             mode: str):
        """Assemble the exact ``_masked_pallas_loop`` call for a resolved
        mode: returns ``(args, kwargs)``. Split from ``_search_loop_impl``
        so AOT tooling (compile-only memory analysis, donation
        experiments — scripts/chip_session_r4h.py) can ``.lower()`` the
        production program without executing it."""
        nprobe = min(max(nprobe, 1), self.index.n_clusters)
        max_probe = self._max_probe_bucket(nprobe)
        interpret = jax.default_backend() != "tpu"
        if mode == "auto":
            # Mirrors search()'s TPU routing on EVERY backend (search()
            # itself routes to masked/gather off-TPU): the loop API is the
            # serving/measurement path, so CPU tests exercise the same
            # interpret-mode Pallas kernels a chip would run. Off-TPU
            # results can therefore differ from search(mode="auto") in
            # bf16 near-ties — same kernels as on-chip, different from
            # the CPU eager route.
            tile_a = self._pallas_tile(self.row_tile, q.shape[0])
            if k > 32:
                mode = "masked"  # Mosaic stack blows up at large k
            elif self._use_local_mask(tile_a, q.shape[0]):
                mode = "pallas"  # measured routing — see search()
            elif self._can_stream_masked(k, q.shape[0]):
                mode = "stream"
            else:
                mode = "pallas"
        use_stream = mode == "stream"
        use_approx = mode == "approx"
        use_scan = mode == "scan"
        use_xla = mode == "masked"
        use_compact = mode == "compact"
        use_binscan = mode in ("binscan", "binscan8")
        use_bincompact = mode in ("bincompact", "bincompact8")
        use_xbin = mode == "xbin"
        use_tilescan = mode == "tilescan"
        use_cert = mode == "cert"
        use_i8 = mode in ("binscan8", "bincompact8")
        esz = 1 if use_i8 else None
        tile_p = self._pallas_tile(
            self.row_tile, q.shape[0], stream=use_stream, k=k
        )
        use_local = (use_stream or self._use_local_mask(tile_p, q.shape[0])) \
            and not (use_approx or use_scan or use_xla or use_compact
                     or use_binscan or use_bincompact or use_xbin
                     or use_tilescan or use_cert)
        if use_local:
            lcl, tc, cmax = self._tile_cluster_table(tile_p)
        else:
            lcl = jnp.zeros(1, jnp.float32)
            tc = jnp.zeros((1, 1), jnp.int32)
            cmax = 1
        if use_compact:
            max_probe = self._compact_probe_bucket(nprobe)
            ctile, cap_tiles, chunk = self._compact_params(
                q.shape[0], nprobe, k
            )
            tlo, thi, span = self._compact_tile_ranges(ctile)
        elif use_bincompact:
            max_probe = self._compact_probe_bucket(nprobe)
            ctile, cap_tiles = self._compact_bin_params(
                q.shape[0], nprobe, k, esize=esz
            )
            if not ctile:
                raise ValidationError(
                    f"{mode} ineligible for this shape (provenance bits "
                    "or tile alignment); use compact or scan"
                )
            chunk = 1
            tlo, thi, span = self._compact_tile_ranges(ctile)
        else:
            ctile, cap_tiles = 1, 1
            chunk = self._approx_chunk(masked=use_approx, k=k)
            tlo = thi = None
            span = 0
        args = (
            q,
            self.centroids,
            self.c_sq,
            self.row_cluster,
            lcl,
            tc,
            self.emb,
            self._pallas_emb_sq()
            if not (use_approx or use_scan or use_xla or use_compact
                    or use_xbin or use_tilescan or use_cert)
            else self.emb_sq,
            jnp.int32(nprobe),
        )
        kw = dict(
            k=k,
            max_probe=max_probe,
            tile=tile_p,
            cmax=cmax,
            reps=reps,
            use_local=use_local,
            use_stream=use_stream,
            use_approx=use_approx,
            use_scan=use_scan,
            use_xla=use_xla,
            use_compact=use_compact,
            use_binscan=use_binscan,
            use_bincompact=use_bincompact,
            binscan_tile=self._binscan_tile(esize=esz) if use_binscan else 0,
            bin_expand=(
                self._binscan_expand(self._binscan_tile(esize=esz), esize=esz)
                if use_binscan
                else self._binscan_expand(ctile, cap=cap_tiles, esize=esz)
                if use_bincompact
                else 1
            ),
            ctile=ctile,
            cap_tiles=cap_tiles,
            tile_lo=tlo,
            tile_hi=thi,
            max_cluster_tiles=span,
            chunk=chunk,
            recall_target=self.approx_recall_target,
            score_dtype=self.approx_score_dtype,
            # Scoped to the fetch-width modes so flipping the knob doesn't
            # invalidate the compiled executables of modes that ignore it.
            overfetch=(
                self.scan_overfetch
                if (use_scan or use_approx or use_xbin or use_tilescan)
                else 0
            ),
            use_xbin=use_xbin,
            xbin_bins=self._xbin_bins_checked(k) if use_xbin else 0,
            xbin_chunk=_xbin_auto_chunk(
                q.shape[0], int(self.emb.shape[0]),
                self._xbin_bins_checked(k), self.xbin_chunk_groups,
            ) if use_xbin else 0,
            use_tilescan=use_tilescan,
            tilescan_tile=(
                self._tilescan_tile_checked(k) if use_tilescan else 0
            ),
            tilescan_chunk=(
                self.tilescan_chunk_rows
                if (use_tilescan or use_cert) else 0
            ),
            use_cert=use_cert,
            cert_tile=self._cert_tile_checked(k) if use_cert else 0,
            cert_m=self.cert_fetch_tiles if use_cert else 0,
            cert_p1h=self._cert_pass1_mode()[0] if use_cert else False,
            cert_p1s=self._cert_pass1_mode()[1] if use_cert else False,
            cert_p2=self.cert_pass2 if use_cert else "auto",
            subtiles=self._stream_subtiles(tile_p),
            interpret=interpret,
            emb_i8=self._xbin8_arrays()[0] if use_i8 else None,
            i8_scale=self._xbin8_arrays()[1] if use_i8 else None,
            emb_ref=self._ref(),
            n_valid=self.n,
            gid=self._gid_dev,
        )
        return args, kw

    def _exact_loop_impl(
        self, queries, k: int, reps: int = 16, mode: str = "auto"
    ):
        """``reps`` chained exact scans in one dispatch (see search_loop)."""
        q = self._check_queries(queries)
        if k <= 0:
            raise ValidationError("k must be > 0")
        if mode == "xbin8":
            return self._xbin8_loop_call(q, k, reps)
        if mode not in ("auto", "stream", "pallas", "xla", "approx",
                        "binscan", "xbin", "binscan8", "tilescan", "cert"):
            raise ValidationError(f"Unknown exact_loop mode '{mode}'")
        defer_k = 0
        if self._loop_defer_rescore():
            if mode == "cert":
                # cert's pass 1 runs ON the f32 reference, which the
                # deferred-re-score regime exists to keep out of the loop
                # body (the >=12M while-carry copy OOM). Refuse clearly
                # rather than compile a guaranteed HBM blowup.
                raise ValidationError(
                    "mode='cert' needs the f32 reference inside the loop "
                    "body, but this array is in the deferred-re-score "
                    "regime (reference held out of the lax.scan carry to "
                    "fit HBM); use mode='xla'/'stream' or single-dispatch "
                    "exact(mode='cert')"
                )
            defer_k, k = k, min(2 * k, int(self.emb.shape[0]))
        if mode == "auto":
            mode = "stream" if k <= 128 else "pallas"
        use_stream = mode == "stream"
        use_approx = mode == "approx"
        use_binscan = mode in ("binscan", "binscan8")
        use_xbin = mode == "xbin"
        use_xla = mode == "xla"
        use_tilescan = mode == "tilescan"
        use_cert = mode == "cert"
        use_i8 = mode == "binscan8"
        esz = 1 if use_i8 else None
        tile_p = self._pallas_tile(
            self.row_tile, q.shape[0], stream=use_stream, k=k
        )
        d, ids = _exact_pallas_loop(
            q,
            self.emb,
            self.emb_sq
            if (use_approx or use_xbin or use_xla or use_tilescan
                or use_cert)
            else self._pallas_emb_sq(),
            k=k,
            tile=tile_p,
            reps=reps,
            use_stream=use_stream,
            use_approx=use_approx,
            use_binscan=use_binscan,
            binscan_tile=self._binscan_tile(esize=esz) if use_binscan else 0,
            bin_expand=(
                self._binscan_expand(self._binscan_tile(esize=esz), esize=esz)
                if use_binscan else 1
            ),
            chunk=self._approx_chunk(k=k),
            recall_target=self.approx_recall_target,
            score_dtype=self.approx_score_dtype,
            overfetch=(
                self.scan_overfetch
                if (use_approx or use_xbin or use_tilescan) else 0
            ),
            use_xbin=use_xbin,
            xbin_bins=self._xbin_bins_checked(k) if use_xbin else 0,
            xbin_chunk=_xbin_auto_chunk(
                q.shape[0], int(self.emb.shape[0]),
                self._xbin_bins_checked(k), self.xbin_chunk_groups,
            ) if use_xbin else 0,
            use_tilescan=use_tilescan,
            tilescan_tile=(
                self._tilescan_tile_checked(k) if use_tilescan else 0
            ),
            tilescan_chunk=(
                self.tilescan_chunk_rows
                if (use_tilescan or use_cert) else 0
            ),
            use_cert=use_cert,
            cert_tile=self._cert_tile_checked(k) if use_cert else 0,
            cert_m=self.cert_fetch_tiles if use_cert else 0,
            cert_p1h=self._cert_pass1_mode()[0] if use_cert else False,
            cert_p1s=self._cert_pass1_mode()[1] if use_cert else False,
            cert_p2=self.cert_pass2 if use_cert else "auto",
            subtiles=self._stream_subtiles(tile_p),
            interpret=jax.default_backend() != "tpu",
            use_xla=use_xla,
            emb_i8=self._xbin8_arrays()[0] if use_i8 else None,
            i8_scale=self._xbin8_arrays()[1] if use_i8 else None,
            emb_ref=self._ref(),
            n_valid=self.n,
            gid=self._gid_dev,
            defer_k=defer_k,
        )
        return d, ids

    def _approx_chunk(self, masked: bool = False, k: int = 10) -> int:
        """Score-chunk rows for the approx modes.

        Unmasked (scan/exact): one chunk = the whole padded array. XLA
        fuses the scoring matmul into the approx_min_k PartialReduce custom
        call (verified up to B=4096 x 1M — a materialized [B, n] block
        would be 16 GB), and the per-call overhead dominates otherwise
        (chunk sweep: 1M x 128 B=1024 bf16 runs 5.65 / 4.19 / 3.08 ms/batch
        at chunk 64k / 256k / 1M — scripts/approx_sweep.py).

        Masked (IVF approx): the probe-mask take() gather DOES materialize
        a [B, chunk] block (10 GB at B=1024 x 10M — observed compile
        failure), so the chunk stays bounded. On CPU (tests) approx_min_k
        falls back to a dense top-k, so small chunks there too.

        Large k on CLUSTER-SORTED layouts: PartialReduce's reduction bins
        are contiguous input segments, so a sorted cluster run (~n/kc rows)
        spans only a couple of bins and its winners collide — measured
        recall@100 = 0.770 over one sorted 1M-row call vs 0.997 unsorted,
        and reduction_input_size_override does not help (0.74-0.76).
        Smaller chunks shrink the segments (64k chunks: 0.963), so k > 32
        on a sorted layout uses 64k-row chunks; unsorted layouts keep the
        single call."""
        if masked or jax.default_backend() != "tpu":
            return min(self.emb.shape[0], 64 * self.row_tile)
        if k > 32 and self._row_cluster_sorted:
            return min(self.emb.shape[0], 65536)
        return self.emb.shape[0]

    def _binscan_vmem_ok(
        self, tile: int, expand: int = 1, esize: int | None = None
    ) -> bool:
        """Whether the binscan kernel's VMEM working set fits scoped vmem
        at this row tile with a query block of at least 256 (the kernel
        re-streams the full array once per query block, so smaller blocks
        multiply HBM traffic — kernels/binscan.py binscan_b_tile models
        the double-buffered emb + bin-accumulator blocks, the charge that
        OOMed expand=2/tile=2048/bt=512 on-chip at 17.02M). ``esize``
        overrides the element size (1 for the int8-code modes)."""
        from ..kernels.binscan import binscan_b_tile

        d = int(self.emb.shape[1])
        if esize is None:
            esize = jnp.dtype(self.emb.dtype).itemsize
        return binscan_b_tile(tile, d, esize, expand) >= 256

    def _binscan_expand(
        self, tile: int, cap: int | None = None, esize: int | None = None
    ) -> int:
        """Largest bin-expansion factor (kernels/binscan.py ``expand``):
        bins = expand*tile at unchanged per-element op count, so cross-tile
        bin collisions — the mode's only recall loss — drop ~1/expand.
        Bounded by the tile count (or the compacted cap) needing to cover
        every slab block, and by the scoped-VMEM accumulator budget."""
        n_lg = tile // 128
        nt = int(self.emb.shape[0]) // tile if cap is None else int(cap)
        for e in (4, 2):
            if nt >= e * n_lg and self._binscan_vmem_ok(
                tile, expand=e, esize=esize
            ):
                return e
        return 1

    def _binscan_tile(self, esize: int | None = None) -> int:
        """Largest lane-aligned row tile dividing the padded rows whose
        working set fits scoped VMEM (dim-scaled — see _binscan_vmem_ok).

        The binscan kernel's bin count equals the tile, so bigger is better
        for recall (cross-tile bin collisions are the only selection loss);
        provenance-bit eligibility is checked separately in can_binscan.
        Int8-code modes pass ``esize=1`` (smaller streamed blocks — a dim
        that forces f32 down a tile can keep the larger one in int8).
        """
        n_pad = int(self.emb.shape[0])
        for t in (2048, 1024, 512, 256, 128):
            if n_pad % t == 0 and self._binscan_vmem_ok(t, esize=esize):
                return t
        raise ValidationError(
            f"padded row count {n_pad} is not lane-aligned for binscan"
        )

    def can_binscan(self, k: int = 10, esize: int | None = None) -> bool:
        """Whether the fused binned-min scan supports this array/k (bin and
        provenance-precision limits — kernels/binscan.py). Pass ``esize=1``
        to gate the int8 mode="binscan8" variant."""
        k = self._spill_k(k)  # spilled searches select 2k for the dedup
        try:
            t = self._binscan_tile(esize=esize)
        except ValidationError:
            return False
        nt = int(self.emb.shape[0]) // t
        return k <= t and provenance_bits(nt, t) <= PROVENANCE_BITS_MAX

    def can_xbin(self, k: int = 10) -> bool:
        """Whether the XLA binned-min scan supports this array/k (the
        padded row count needs a divisor <= 64k bins that is >= k;
        lane-aligned 128-multiples preferred — see _xbin_bins)."""
        return _xbin_bins(int(self.emb.shape[0]), self._spill_k(k)) > 0

    def can_tilescan(self, k: int = 10) -> bool:
        """Whether the per-tile argmin scan supports this array/k (needs a
        power-of-2 tile dividing n_pad with k <= n_pad/tile)."""
        try:
            self._tilescan_tile_checked(self._spill_k(k))
        except ValidationError:
            return False
        return True

    def can_cert(self, k: int = 10) -> bool:
        """Whether the certified-exact scan supports this array/k."""
        try:
            self._cert_tile_checked(self._spill_k(k))
        except ValidationError:
            return False
        return True

    def cert_probe(self, queries, k: int = 10):
        """Certificate diagnosis for the current cert knobs: runs the
        cert pipeline WITHOUT the fallback and returns
        ``(certified_fraction, margins[B])`` — margin >= 0 means the
        query's completeness certificate holds (the fallback would not
        fire). Use on-chip to pick cert_pass1/cert_fetch_tiles for a
        dataset before serving; the margins say how much headroom (in
        squared-distance units) the data's tile-min gaps leave over the
        arithmetic slack."""
        q = self._check_queries(queries)
        k = self._spill_k(k)
        p1h, p1s = self._cert_pass1_mode()
        _, _, okq, margin = _exact_cert(
            q, self.emb, self.emb_sq, k,
            tile=self._cert_tile_checked(k),
            fallback_tile=self.row_tile,
            m_tiles=self.cert_fetch_tiles,
            chunk_rows=self.tilescan_chunk_rows,
            emb_ref=self._ref(),
            pass1_high=p1h, pass1_storage=p1s, diagnostic=True,
            pass2_form=self.cert_pass2,
            interpret=jax.default_backend() != "tpu",
        )
        okq = np.asarray(okq)
        return float(okq.mean()), np.asarray(margin)

    def _cert_pass1_mode(self) -> tuple[bool, bool]:
        """Resolve the cert_pass1 knob (see __init__) to
        (pass1_high, pass1_storage). "high"/"highest" only matter on an
        f32 pass-1 operand; "storage" scans the reduced-precision array
        (2^-8 slack) while candidates still refine against the f32
        reference."""
        if self.cert_pass1 not in ("highest", "high", "storage"):
            raise ValidationError(
                f"cert_pass1 must be 'highest', 'high' or 'storage', "
                f"got {self.cert_pass1!r}"
            )
        return self.cert_pass1 == "high", self.cert_pass1 == "storage"

    def _cert_tile_checked(self, k: int) -> int:
        """Tile size for mode="cert": tilescan's geometry WITHOUT its
        cluster-sorted hazard gate — cert gathers the selected tiles whole,
        so co-located true neighbors all enter the candidate set (a sorted
        layout actually certifies more easily: the top-k rows concentrate
        in fewer tiles)."""
        n_pad = int(self.emb.shape[0])
        t = int(self.tilescan_tile)
        if not t:  # auto: 128, shrunk while k exceeds the tile count
            t = min(n_pad & -n_pad, 128)
            while t > 2 and k > n_pad // t:
                t //= 2
        if t < 2 or n_pad % t or (t & (t - 1)):
            raise ValidationError(
                f"cert tile={t} invalid for n_pad={n_pad}: must be a "
                "power of two >= 2 dividing the padded row count"
            )
        # No provenance cap: cert's pass 1 is a VALUE-only fold
        # (_tile_min_vals) — winning tiles are gathered whole, so no
        # mantissa bits are spent on within-tile offsets.
        return t

    def _tilescan_tile_checked(self, k: int) -> int:
        if self._row_cluster_sorted:
            # Each tile contributes only its argmin, so a cluster-sorted
            # layout (contiguous same-cluster runs spanning whole tiles)
            # permanently loses co-located true neighbors — overfetch
            # cannot recover them. Refuse rather than serve degraded
            # recall that looks right (same hazard binscan designs around
            # with expanded bins).
            raise ValidationError(
                "tilescan is ineligible on cluster-sorted layouts: "
                "contiguous same-cluster neighbors fall into one tile and "
                "only the tile argmin survives; use binscan/scan instead"
            )
        n_pad = int(self.emb.shape[0])
        t = int(self.tilescan_tile)
        if not t:  # auto: 128, shrunk while k exceeds the tile count
            t = min(n_pad & -n_pad, 128)
            while t > 2 and k > n_pad // t:
                t //= 2
        if t < 2 or n_pad % t or (t & (t - 1)):
            raise ValidationError(
                f"tilescan tile={t} invalid for n_pad={n_pad}: must be a "
                "power of two >= 2 dividing the padded row count"
            )
        if (t - 1).bit_length() > PROVENANCE_BITS_MAX:
            raise ValidationError(
                f"tilescan tile={t} spends {(t - 1).bit_length()} "
                f"provenance bits (max {PROVENANCE_BITS_MAX}): too few "
                "value mantissa bits for reliable selection"
            )
        if not 0 < k <= n_pad // t:
            raise ValidationError(
                f"tilescan ineligible: k={k} exceeds the {n_pad // t} "
                "tiles (each contributes one candidate)"
            )
        return t

    def _xbin_bins_checked(self, k: int) -> int:
        n_pad = int(self.emb.shape[0])
        if self.xbin_bins:
            l_bins = int(self.xbin_bins)
            if n_pad % l_bins or not (0 < k <= l_bins) or l_bins > 65536:
                raise ValidationError(
                    f"xbin_bins={l_bins} invalid: must divide n_pad="
                    f"{n_pad}, satisfy k<=bins, and stay <= 65536"
                )
            if _xbin_code_bits(n_pad, l_bins) > PROVENANCE_BITS_MAX:
                raise ValidationError(
                    f"xbin_bins={l_bins} spends "
                    f"{_xbin_code_bits(n_pad, l_bins)} provenance bits at "
                    f"n_pad={n_pad} (max {PROVENANCE_BITS_MAX}): too few "
                    f"value mantissa bits for reliable selection; use more "
                    f"bins"
                )
            return l_bins
        l_bins = _xbin_bins(n_pad, k)
        if not l_bins:
            raise ValidationError(
                f"xbin ineligible for n_pad={n_pad}, k={k}"
            )
        return l_bins

    def _pallas_emb_sq(self):
        if self._emb_sq_pallas is None:
            self._emb_sq_pallas = jnp.where(
                jnp.isinf(self.emb_sq), 3.0e38, self.emb_sq
            )
        return self._emb_sq_pallas

    def _ref(self):
        """Full-precision re-score rows, or None when ``self.emb`` already
        is the reference (f32 storage / rescore opt-out)."""
        return self._emb_ref

    @staticmethod
    def _hbm_bytes() -> int:
        """Device HBM capacity the chained-loop sizing reasons against.

        Deliberately NOT queried from the device: a memory_stats() call
        through the axon tunnel can block for minutes during an outage
        (CLAUDE.md), and the decision must be deterministic for compile
        caching. v5e default; override with PQVECTOR_TPU_HBM_GB."""
        env = os.environ.get("PQVECTOR_TPU_HBM_GB")
        if env:
            return int(float(env) * 2**30)
        return 16 * 2**30

    def _loop_defer_rescore(self) -> bool:
        """Whether search_loop/exact_loop must hold the f32 re-score
        reference out of the lax.scan body.

        TPU while-loops copy scan-visible arrays into the carry, and
        donation does not remove the copies (session r4i: the 12M-row
        DEEP layout compiled a 10.7 GB HLO temp both plain and donated,
        OOMing 16 GB HBM; 10M compiled and served). With a reference in
        the body the live set is ~2x (storage + f32 ref) x n_pad*d; past
        ~3/4 of HBM the loop is compiled bf16-only at a widened k and the
        last rep's winners are re-scored against the reference AFTER the
        scan — the reference then never enters the carry. The round-4
        session hack (``sp._emb_ref = None`` before the loop) measured
        QPS without the re-score; this keeps re-score recall in the same
        served config. The f32-truth recall cost of deferring is the
        2k-trim race only (same widened-fetch + f32-re-score design the
        in-body path uses, applied once instead of per rep)."""
        if self._emb_ref is None:
            return False
        if self.loop_rescore != "auto":
            if self.loop_rescore not in ("body", "defer"):
                raise ValidationError(
                    "loop_rescore must be 'auto', 'body' or 'defer'"
                )
            return self.loop_rescore == "defer"
        n_pad, d = int(self.emb.shape[0]), int(self.emb.shape[1])
        storage = jnp.dtype(self.emb.dtype).itemsize
        live = 2 * n_pad * d * (4 + storage)  # originals + carry copies
        return live > 0.75 * self._hbm_bytes()

    def _ref_or_emb(self):
        """The array exact re-scores must run against."""
        return self._emb_ref if self._emb_ref is not None else self.emb

    def _xbin8_loop_call(self, q, k: int, reps: int):
        """reps-chained mode="xbin8" dispatch (shared by both loop APIs)."""
        e8, sc = self._xbin8_arrays()
        defer_k = 0
        if self._loop_defer_rescore():
            defer_k, k = k, min(2 * k, int(self.emb.shape[0]))
        return _xbin8_loop(
            q, e8, sc, self.emb_sq, self._ref_or_emb(), k,
            l_bins=self._xbin_bins_checked(k),
            overfetch=self.scan_overfetch,
            chunk_groups=_xbin_auto_chunk(
                q.shape[0], int(self.emb.shape[0]),
                self._xbin_bins_checked(k), self.xbin_chunk_groups,
            ),
            reps=reps,
            n_valid=self.n,
            gid=self._gid_dev,
            defer_k=defer_k,
            body_ref=self.emb if defer_k else None,
        )

    def _xbin8_arrays(self):
        """Lazy per-row int8 quantization of the resident array for the
        int8 modes (+25% of the f32 residency; the scan then crosses
        HBM at 1/4 the f32 bytes and the matmul runs on the int8 MXU).
        Codes quantize from the f32 reference when one is held — int8
        from bf16-rounded rows would stack both errors."""
        if self._emb_i8 is None:
            self._emb_i8, self._emb_i8_scale = _quantize_rows_i8(
                self._ref_or_emb()
            )
        return self._emb_i8, self._emb_i8_scale

    def _map_ids(self, d2, ids):
        invalid = jnp.isinf(d2) | (ids >= self.n) | (ids < 0)
        if self._gid_dev is not None:
            ids = self._gid_dev[jnp.clip(ids, 0, self.n - 1)]
        return jnp.where(invalid, -1, ids)

    # ------------------------------------------------------------------
    # Public entry points. The impls select over the STATIC layout; the
    # wrappers finalize: tombstone filtering, delta-buffer merge, spilled
    # id-dedup (impls select 2k on spilled layouts), trim to k.
    # ------------------------------------------------------------------

    def _spill_k(self, k: int) -> int:
        return 2 * k if self._spill_dups and k > 0 else k

    def _plain(self) -> bool:
        return (
            not self._spill_dups
            and self._deleted_dev is None
            and self._delta is None
        )

    def scan_route(
        self, queries: np.ndarray, k: int = 10, *,
        budget_s: float = 1.0, force: bool = False,
    ) -> str:
        """Weather-routed serving scan mode (mode="autoscan" resolves
        through this): "scan" (hardware ApproxTopK extraction) in healthy
        windows, "binscan" (fused binned-min kernel) when the window is
        degraded. Round-3 on-chip finding (docs/PERFORMANCE.md): degraded
        tunnel windows slow PartialReduce ~5x while the matmul+min floor
        holds ~75% MFU and the binned-min family holds ~1.3x — a plan
        calibrated healthy silently loses when the weather turns
        (measured in session r4a: scan 100k QPS vs binscan 145k under a
        healthy 84%-MFU floor). Probes cost two small jits + ~2x
        ``budget_s`` device seconds and are cached for ``weather_ttl_s``;
        ``force=True`` reprobes now. Shapes binscan cannot serve always
        route to "scan"."""
        import time as _time

        if not self.can_binscan(k):
            return "scan"
        now = _time.monotonic()
        if (
            force
            or self._weather is None
            or now - self._weather[0] > self.weather_ttl_s
        ):
            prober = self.weather_prober
            if prober is None:
                from .autotune import probe_weather as prober
            q = np.asarray(queries, np.float32)
            rep = prober(self, q[: min(256, len(q))], k, budget_s=budget_s)
            self._weather = (now, rep)
        return "binscan" if self._weather[1].degraded else "scan"

    def exact(self, queries: np.ndarray, k: int, mode: str = "auto"):
        """Exact brute-force top-k (see ``_exact_impl`` for modes)."""
        if mode == "autoscan":
            mode = self.scan_route(queries, k)
            mode = "approx" if mode == "scan" else mode  # exact-path name
        d, ids = self._exact_impl(queries, self._spill_k(k), mode)
        return (d, ids) if self._plain() else self._finalize(
            queries, d, ids, k
        )

    def search(
        self, queries: np.ndarray, k: int, nprobe: int, mode: str = "auto"
    ):
        """IVF top-k (see ``_search_impl`` for the mode catalogue)."""
        if mode == "autoscan":
            mode = self.scan_route(queries, k)
        d, ids = self._search_impl(queries, self._spill_k(k), nprobe, mode)
        return (d, ids) if self._plain() else self._finalize(
            queries, d, ids, k
        )

    def search_loop(
        self, queries, k: int, nprobe: int, reps: int = 16, mode: str = "auto"
    ):
        """``reps`` chained IVF searches in ONE dispatch (see
        ``_search_loop_impl`` — the honest-throughput measurement path)."""
        if mode == "autoscan":
            mode = self.scan_route(queries, k)
        d, ids = self._search_loop_impl(
            queries, self._spill_k(k), nprobe, reps=reps, mode=mode
        )
        return (d, ids) if self._plain() else self._finalize(
            queries, d, ids, k
        )

    def exact_loop(self, queries, k: int, reps: int = 16, mode: str = "auto"):
        """``reps`` chained exact scans in one dispatch."""
        if mode == "autoscan":
            mode = self.scan_route(queries, k)
            mode = "approx" if mode == "scan" else mode  # exact-path name
        d, ids = self._exact_loop_impl(
            queries, self._spill_k(k), reps=reps, mode=mode
        )
        return (d, ids) if self._plain() else self._finalize(
            queries, d, ids, k
        )

    # ------------------------------------------------------------------
    # Dynamic updates: tombstone deletes + delta-buffer appends. The main
    # layout stays static (XLA-friendly); deletes exclude rows at both the
    # selection (sq -> inf) and the output (id filter), appends live in a
    # side buffer scanned exactly and merged at finalize — the classic
    # main + memtable design. The reference's file-embedded index
    # (parquet.rs) supports neither without a rebuild.
    # ------------------------------------------------------------------

    def delete_rows(self, row_ids) -> None:
        """Tombstone ``row_ids`` (original or appended ids): they stop
        appearing in any mode's results. O(#copies) device scatters."""
        ids = np.unique(np.asarray(row_ids, np.int64).reshape(-1))
        if ids.size == 0:
            return
        if ids.min() < 0 or ids.max() >= self._id_domain:
            raise ValidationError(
                f"delete_rows ids must be in [0, {self._id_domain})"
            )
        if self._deleted_host is None:
            self._deleted_host = np.zeros(self._id_domain, bool)
        elif self._deleted_host.size < self._id_domain:
            grown = np.zeros(self._id_domain, bool)
            grown[: self._deleted_host.size] = self._deleted_host
            self._deleted_host = grown
        self._deleted_host[ids] = True
        self._ship_deleted()
        # Main-layout positions of every copy (spilled rows have two).
        main_ids = ids[ids < (self._gid.max() + 1 if self._gid is not None
                              else self.n)]
        if self._gid is not None:
            pos = np.flatnonzero(np.isin(self._gid, main_ids))
        else:
            pos = main_ids[main_ids < self.n]
        if pos.size:
            self.emb_sq = self.emb_sq.at[jnp.asarray(pos)].set(jnp.inf)
            self._emb_sq_pallas = None  # lazy finite copy rebuilds
        # Delta-buffer copies.
        if self._delta is not None:
            de, se, ge = self._delta
            ge_h = np.asarray(ge)
            dpos = np.flatnonzero(np.isin(ge_h, ids))
            if dpos.size:
                se = se.at[jnp.asarray(dpos)].set(jnp.inf)
                self._delta = (de, se, ge)

    @staticmethod
    def _bucket(n: int, floor: int = 256) -> int:
        cap = floor
        while cap < n:
            cap *= 2
        return cap

    def _ship_deleted(self) -> None:
        """Upload the tombstone bitmap padded to a power-of-two covering
        the WHOLE id domain: stable shapes bound _finalize_jit retraces,
        and an appended id must never clip-alias into a smaller bitmap."""
        cap = self._bucket(self._id_domain)
        padded = np.zeros(cap, bool)
        padded[: self._deleted_host.size] = self._deleted_host
        self._deleted_dev = jnp.asarray(padded)

    def append_rows(self, embeddings: np.ndarray) -> np.ndarray:
        """Append new rows to the delta buffer; returns their ids (the id
        space continues past the original rows). Deltas are scanned
        EXACTLY (one [B, m] matmul at finalize), so appended rows have
        recall 1.0; fold them into the main index with a rebuild when the
        buffer grows large."""
        x = np.ascontiguousarray(embeddings, np.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.ndim != 2 or x.shape[1] != self.dim:
            raise ValidationError(
                f"append_rows expects [m, {self.dim}] embeddings"
            )
        if self.metric == "cosine":
            from ..index.metrics import normalize_rows

            x = normalize_rows(x)
        new_ids = np.arange(
            self._id_domain, self._id_domain + len(x), dtype=np.int32
        )
        self._id_domain += len(x)
        self._delta_host.append(x)
        total = sum(len(a) for a in self._delta_host)
        # Power-of-two capacity with an inf-sq/-1-id tail: shapes only
        # change when the bucket grows, so _finalize_jit retraces (a ~6 s
        # remote compile each through the tunnel) stay O(log appends), and
        # the device upload below is the only per-append transfer.
        cap = self._bucket(total)
        all_x = np.zeros((cap, self.dim), np.float32)
        np.concatenate(self._delta_host, out=all_x[:total])
        sq = np.full(cap, np.inf, np.float32)
        sq[:total] = np.einsum(
            "md,md->m", all_x[:total], all_x[:total]
        )
        first_id = self._id_domain - total
        gids = np.full(cap, -1, np.int32)
        gids[:total] = np.arange(first_id, self._id_domain, dtype=np.int32)
        # Preserve earlier tombstones on re-materialization, and keep the
        # device bitmap sized for the grown id domain (a stale small
        # bitmap would clip-alias appended ids).
        if self._deleted_host is not None:
            dead = np.zeros(total, bool)
            upto = min(self._deleted_host.size - first_id, total)
            if upto > 0:
                dead[:upto] = self._deleted_host[
                    first_id : first_id + upto
                ]
            sq[:total][dead] = np.inf
            self._ship_deleted()
        self._delta = (
            jnp.asarray(all_x, dtype=self.emb.dtype),
            jnp.asarray(sq),
            jnp.asarray(gids),
        )
        return new_ids

    def _finalize(self, queries, d, ids, k: int):
        """Tombstone filter -> delta merge -> spilled dedup -> trim, as ONE
        jitted dispatch (through the tunnel each un-jitted op is its own
        ~30-85 ms round trip)."""
        q = self._check_queries(queries)
        if self._delta is not None:
            de, se, ge = self._delta
        else:
            # 1-row inf sentinel: participates in the merge but never wins.
            de = jnp.zeros((1, self.dim), self.emb.dtype)
            se = jnp.full((1,), jnp.inf)
            ge = jnp.full((1,), -1, jnp.int32)
        deleted = (
            self._deleted_dev
            if self._deleted_dev is not None
            else jnp.zeros((1,), bool)
        )
        return _finalize_jit(
            q, d, ids, deleted, de, se, ge,
            k=k,
            has_deleted=self._deleted_dev is not None,
            spill=self._spill_dups,
        )

    @classmethod
    def with_spill(
        cls,
        index: IvfIndex,
        embeddings: np.ndarray,
        spill: float = 0.2,
        assign_block: int = 65536,
        assign_dtype=jnp.float32,
        **kwargs,
    ) -> "DeviceIvfSearcher":
        """Resident searcher over a SPILLED layout: the ``spill`` fraction
        of rows with the smallest runner-up margin is duplicated into
        their runner-up cluster (query/spill.py), lifting probe recall at
        unchanged nprobe — the probed modes' residual loss is union
        misses, not selection (docs/PERFORMANCE.md, DEEP-10M round 3).

        Wire format is untouched: the spill is a runtime structure built
        from the standard index at load. Costs: device HBM and probed
        traffic grow by ~``spill``; effective k budgets halve (the impls
        select 2k for dedup — e.g. stream mode's k<=128 becomes k<=64).
        ``cluster_sorted`` is implied (the extended layout is sorted).
        """
        from .spill import build_spilled_layout

        kwargs.pop("cluster_sorted", None)
        if kwargs.get("metric") == "cosine":
            # Runner-up margins must be computed in the search metric; the
            # constructor's own normalization is idempotent over this.
            from ..index.metrics import normalize_rows

            embeddings = normalize_rows(np.asarray(embeddings, np.float32))
        ext_index, ext_emb, gid = build_spilled_layout(
            index, embeddings, spill,
            block=assign_block, assign_dtype=assign_dtype,
        )
        searcher = cls(ext_index, ext_emb, **kwargs)
        searcher._gid = gid
        searcher._gid_dev = jnp.asarray(gid)
        searcher._spill_dups = True
        # The public id space is the ORIGINAL rows, not the extended layout
        # (appends/deletes address original ids).
        searcher._id_domain = int(gid.max()) + 1 if gid.size else 0
        return searcher



#: Static argnames of _masked_pallas_loop — ONE list, shared with the
#: compile-only AOT probes (scripts/aot_probe.py re-jits the raw function
#: with donation; a drifted copy there silently turns a new static into a
#: traced arg and the probe stops compiling the production program).
MASKED_LOOP_STATICS = (
    "k", "max_probe", "tile", "cmax", "reps", "use_local", "use_stream",
    "use_approx", "use_scan", "use_xla", "use_compact", "use_binscan",
    "use_bincompact", "binscan_tile", "bin_expand", "ctile",
    "cap_tiles", "max_cluster_tiles", "chunk", "recall_target",
    "score_dtype", "subtiles", "interpret", "overfetch", "use_xbin",
    "xbin_bins", "xbin_chunk", "use_tilescan", "tilescan_tile",
    "tilescan_chunk", "use_cert", "cert_tile", "cert_m", "cert_p1h",
    "cert_p1s", "cert_p2", "n_valid", "defer_k",
)


@_functools.partial(jax.jit, static_argnames=MASKED_LOOP_STATICS)
def _masked_pallas_loop(
    q0, centroids, c_sq, row_cluster, lcl, tc, emb, emb_sq, nprobe,
    k, max_probe, tile, cmax, reps, use_local, use_stream, use_approx,
    use_scan, use_xla, chunk, recall_target, score_dtype, subtiles,
    interpret, use_compact=False, ctile=1, cap_tiles=1, tile_lo=None,
    tile_hi=None, max_cluster_tiles=0, use_binscan=False, binscan_tile=0,
    use_bincompact=False, bin_expand=1, overfetch=0, use_xbin=False,
    xbin_bins=0, xbin_chunk=0, use_tilescan=False, tilescan_tile=0,
    tilescan_chunk=0, use_cert=False, cert_tile=0, cert_m=0,
    cert_p1h=False, cert_p1s=False, cert_p2="auto", emb_i8=None,
    i8_scale=None,
    emb_ref=None,
    n_valid=0, gid=None, defer_k=0,
):
    from ..kernels.scan_topk import pallas_masked_local_topk, pallas_masked_topk
    from ..kernels.stream_topk import pallas_stream_masked_topk

    # ``defer_k`` > 0 holds the f32 re-score reference OUT of the scanned
    # body: TPU while-loops copy scan-visible arrays into the carry
    # (donation does not remove the copies — session r4i), so a >=12M-row
    # reference inside the body adds n_pad*d*4 B of HLO temp on top of
    # the storage copy and OOMs HBM. The body then selects a widened k at
    # storage precision and only the LAST rep's winners are re-scored
    # against the reference after the scan (no carry copy there). See
    # DeviceIvfSearcher._loop_defer_rescore.
    body_ref = None if defer_k else emb_ref
    # The exact re-score reference for the int8 paths must be the f32
    # copy when one is held; else the storage array.
    i8_ref = body_ref if body_ref is not None else emb

    def body(q):
        if use_binscan:
            from ..kernels.binscan import pallas_binned_scan

            # emb_i8 set -> mode="binscan8" (int8 codes + exact re-score).
            return pallas_binned_scan(
                q, emb if emb_i8 is None else emb_i8, emb_sq, k=k,
                tile=binscan_tile, expand=bin_expand, interpret=interpret,
                scale=i8_scale,
                emb_ref=body_ref if emb_i8 is None else i8_ref,
            )
        if use_bincompact:
            return _ivf_compact_bin_impl(
                q, centroids, c_sq, row_cluster,
                emb if emb_i8 is None else emb_i8, emb_sq, nprobe,
                k=k, max_probe=max_probe, ctile=ctile, cap_tiles=cap_tiles,
                interpret=interpret, tile_lo=tile_lo, tile_hi=tile_hi,
                max_cluster_tiles=max_cluster_tiles, expand=bin_expand,
                scale=i8_scale,
                emb_ref=body_ref if emb_i8 is None else i8_ref,
            )
        if use_compact:
            return _ivf_compact_approx_impl(
                q, centroids, c_sq, row_cluster, emb, emb_sq, nprobe,
                k=k, max_probe=max_probe, ctile=ctile, cap_tiles=cap_tiles,
                chunk=chunk, recall_target=recall_target,
                score_dtype=score_dtype, interpret=interpret,
                tile_lo=tile_lo, tile_hi=tile_hi,
                max_cluster_tiles=max_cluster_tiles,
                emb_ref=body_ref,
            )
        if use_xla:
            return _ivf_masked_scan_impl(
                q, centroids, c_sq, row_cluster, emb, emb_sq, nprobe,
                k=k, max_probe=max_probe, tile=tile, emb_ref=body_ref,
            )
        if use_xbin:
            return _exact_xbin_impl(
                q, emb, emb_sq, k=k, l_bins=xbin_bins,
                score_dtype=score_dtype, overfetch=overfetch,
                chunk_groups=xbin_chunk, emb_ref=body_ref,
            )
        if use_tilescan:
            return _exact_tilescan_impl(
                q, emb, emb_sq, k=k, tile=tilescan_tile,
                chunk_rows=tilescan_chunk, overfetch=overfetch,
                emb_ref=body_ref,
            )
        if use_cert:
            return _exact_cert_impl(
                q, emb, emb_sq, k=k, tile=cert_tile, fallback_tile=tile,
                m_tiles=cert_m, chunk_rows=tilescan_chunk,
                emb_ref=body_ref, pass1_high=cert_p1h,
                pass1_storage=cert_p1s, pass2_form=cert_p2,
                interpret=interpret,
            )
        if use_scan:
            return _exact_approx_topk_impl(
                q, emb, emb_sq, k=k, chunk=chunk,
                recall_target=recall_target, score_dtype=score_dtype,
                overfetch=overfetch, emb_ref=body_ref,
            )
        if use_approx:
            return _ivf_approx_masked_impl(
                q, centroids, c_sq, row_cluster, emb, emb_sq, nprobe,
                k=k, max_probe=max_probe, chunk=chunk,
                recall_target=recall_target, score_dtype=score_dtype,
                overfetch=overfetch, emb_ref=body_ref,
            )
        if use_stream:
            return pallas_stream_masked_topk(
                q, centroids, c_sq, lcl, tc, emb, emb_sq, nprobe, k,
                max_probe=max_probe, tile=tile, cmax=cmax, subtiles=subtiles,
                interpret=interpret, emb_ref=body_ref,
            )
        if use_local:
            return pallas_masked_local_topk(
                q, centroids, c_sq, lcl, tc, emb, emb_sq, nprobe, k,
                max_probe=max_probe, tile=tile, cmax=cmax, interpret=interpret,
                emb_ref=body_ref,
            )
        return pallas_masked_topk(
            q, centroids, c_sq, row_cluster, emb, emb_sq, nprobe, k,
            max_probe=max_probe, tile=tile, interpret=interpret,
            emb_ref=body_ref,
        )

    def step(q, _):
        d2, ids = body(q)
        # Next query depends on this iteration's output (forces execution).
        # Non-finite top-1 (no candidates) is zeroed so 0*inf -> NaN cannot
        # poison the chain.
        link = jnp.where(jnp.isfinite(d2[:, :1]), d2[:, :1], 0.0)
        return q0 + 0.0 * link, (d2, ids)

    _, (d2s, idss) = jax.lax.scan(step, q0, None, length=reps)
    d2, ids = d2s[-1], idss[-1]
    if defer_k and emb_ref is not None:
        d2, ids = _refine_and_sort(q0, emb_ref, d2, ids, defer_k)
    return _loop_finalize(d2, ids, n_valid, gid)


@_functools.partial(
    jax.jit,
    static_argnames=("k", "tile", "reps", "use_stream", "use_approx", "chunk",
                     "recall_target", "score_dtype", "subtiles", "interpret",
                     "use_binscan", "binscan_tile", "bin_expand", "overfetch",
                     "use_xbin", "xbin_bins", "xbin_chunk", "use_xla",
                     "use_tilescan", "tilescan_tile", "tilescan_chunk",
                     "use_cert", "cert_tile", "cert_m", "cert_p1h",
                     "cert_p1s", "cert_p2", "n_valid", "defer_k"),
)
def _exact_pallas_loop(
    q0, emb, emb_sq, k, tile, reps, use_stream, use_approx, chunk,
    recall_target, score_dtype, subtiles, interpret, use_binscan=False,
    binscan_tile=0, bin_expand=1, overfetch=0, use_xbin=False, xbin_bins=0,
    xbin_chunk=0, use_xla=False, use_tilescan=False, tilescan_tile=0,
    tilescan_chunk=0, use_cert=False, cert_tile=0, cert_m=0,
    cert_p1h=False, cert_p1s=False, cert_p2="auto", emb_i8=None,
    i8_scale=None,
    emb_ref=None,
    n_valid=0, gid=None, defer_k=0,
):
    from ..kernels.binscan import pallas_binned_scan
    from ..kernels.scan_topk import pallas_exact_topk
    from ..kernels.stream_topk import pallas_stream_exact_topk

    # defer_k: hold the re-score reference out of the scanned body (see
    # _masked_pallas_loop — the TPU while-carry copy OOM at >=12M rows).
    body_ref = None if defer_k else emb_ref
    i8_ref = body_ref if body_ref is not None else emb

    def step(q, _):
        if use_xla:
            d2, ids = _exact_topk_impl(
                q, emb, emb_sq, k=k, tile=tile, emb_ref=body_ref
            )
        elif use_binscan:
            # emb_i8 set -> mode="binscan8": codes stream through the
            # kernel; re-score runs against the f32 reference when held.
            d2, ids = pallas_binned_scan(
                q, emb if emb_i8 is None else emb_i8, emb_sq, k=k,
                tile=binscan_tile, expand=bin_expand, interpret=interpret,
                scale=i8_scale,
                emb_ref=body_ref if emb_i8 is None else i8_ref,
            )
        elif use_xbin:
            d2, ids = _exact_xbin_impl(
                q, emb, emb_sq, k=k, l_bins=xbin_bins,
                score_dtype=score_dtype, overfetch=overfetch,
                chunk_groups=xbin_chunk, emb_ref=body_ref,
            )
        elif use_tilescan:
            d2, ids = _exact_tilescan_impl(
                q, emb, emb_sq, k=k, tile=tilescan_tile,
                chunk_rows=tilescan_chunk, overfetch=overfetch,
                emb_ref=body_ref,
            )
        elif use_cert:
            d2, ids = _exact_cert_impl(
                q, emb, emb_sq, k=k, tile=cert_tile, fallback_tile=tile,
                m_tiles=cert_m, chunk_rows=tilescan_chunk,
                emb_ref=body_ref, pass1_high=cert_p1h,
                pass1_storage=cert_p1s, pass2_form=cert_p2,
                interpret=interpret,
            )
        elif use_approx:
            d2, ids = _exact_approx_topk_impl(
                q, emb, emb_sq, k=k, chunk=chunk,
                recall_target=recall_target, score_dtype=score_dtype,
                overfetch=overfetch, emb_ref=body_ref,
            )
        elif use_stream:
            d2, ids = pallas_stream_exact_topk(
                q, emb, emb_sq, k, tile=tile, subtiles=subtiles,
                interpret=interpret, emb_ref=body_ref,
            )
        else:
            d2, ids = pallas_exact_topk(
                q, emb, emb_sq, k, tile=tile, interpret=interpret,
                emb_ref=body_ref,
            )
        link = jnp.where(jnp.isfinite(d2[:, :1]), d2[:, :1], 0.0)
        return q0 + 0.0 * link, (d2, ids)

    _, (d2s, idss) = jax.lax.scan(step, q0, None, length=reps)
    d2, ids = d2s[-1], idss[-1]
    if defer_k and emb_ref is not None:
        d2, ids = _refine_and_sort(q0, emb_ref, d2, ids, defer_k)
    return _loop_finalize(d2, ids, n_valid, gid)


_exact_topk = jax.jit(_exact_topk_impl, static_argnames=("k", "tile"))
_exact_approx_topk = jax.jit(
    _exact_approx_topk_impl,
    static_argnames=("k", "chunk", "recall_target", "score_dtype", "overfetch"),
)
_exact_xbin = jax.jit(
    _exact_xbin_impl,
    static_argnames=(
        "k", "l_bins", "score_dtype", "overfetch", "chunk_groups"
    ),
)
_exact_xbin8 = jax.jit(
    _exact_xbin8_impl,
    static_argnames=("k", "l_bins", "overfetch", "chunk_groups"),
)
_exact_tilescan = jax.jit(
    _exact_tilescan_impl,
    static_argnames=("k", "tile", "chunk_rows", "overfetch"),
)
_exact_cert = jax.jit(
    _exact_cert_impl,
    static_argnames=("k", "tile", "fallback_tile", "m_tiles", "chunk_rows",
                     "pass1_high", "pass1_storage", "diagnostic",
                     "interpret", "pass2_form"),
)


@_functools.partial(
    jax.jit,
    static_argnames=("k", "l_bins", "overfetch", "chunk_groups", "reps",
                     "n_valid", "defer_k"),
)
def _xbin8_loop(
    q0, emb_i8, scale, emb_sq, emb_ref, k, l_bins, overfetch, chunk_groups,
    reps, n_valid=0, gid=None, defer_k=0, body_ref=None,
):
    """``reps`` chained int8 binned-min scans in one dispatch (the same
    data-dependency chaining as _exact_pallas_loop — honest throughput
    through the tunnel). ``defer_k``: the in-body re-score runs against
    ``body_ref`` (the storage array — must be supplied) and ``emb_ref``
    only refines the last rep's winners after the scan (the while-carry
    copy OOM, see _masked_pallas_loop)."""

    def step(q, _):
        d2, ids = _exact_xbin8_impl(
            q, emb_i8, scale, emb_sq,
            body_ref if defer_k else emb_ref, k=k, l_bins=l_bins,
            overfetch=overfetch, chunk_groups=chunk_groups,
        )
        link = jnp.where(jnp.isfinite(d2[:, :1]), d2[:, :1], 0.0)
        return q0 + 0.0 * link, (d2, ids)

    _, (d2s, idss) = jax.lax.scan(step, q0, None, length=reps)
    d2, ids = d2s[-1], idss[-1]
    if defer_k:
        d2, ids = _refine_and_sort(q0, emb_ref, d2, ids, defer_k)
    return _loop_finalize(d2, ids, n_valid, gid)
_ivf_topk = jax.jit(_ivf_topk_impl, static_argnames=("k", "nprobe", "tile"))
_ivf_compact_approx = jax.jit(
    _ivf_compact_approx_impl,
    static_argnames=(
        "k", "max_probe", "ctile", "cap_tiles", "chunk", "recall_target",
        "score_dtype", "interpret", "max_cluster_tiles",
    ),
)
_ivf_compact_bin = jax.jit(
    _ivf_compact_bin_impl,
    static_argnames=(
        "k", "max_probe", "ctile", "cap_tiles", "interpret",
        "max_cluster_tiles", "expand",
    ),
)
_ivf_masked_scan = jax.jit(
    _ivf_masked_scan_impl, static_argnames=("k", "max_probe", "tile")
)
_ivf_approx_masked = jax.jit(
    _ivf_approx_masked_impl,
    static_argnames=(
        "k", "max_probe", "chunk", "recall_target", "score_dtype", "overfetch"
    ),
)
