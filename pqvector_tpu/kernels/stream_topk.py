"""Pallas TPU kernels: streaming threshold top-k (round-2 extraction redesign).

The round-1 kernels (kernels/scan_topk.py) extract each tile's local top-k by
k iterative min-extractions — ~3k VPU passes over every tile, the measured
bottleneck (~5 ms of the 6.4 ms exact scan at 1M x 128, B=256; VERDICT.md).

This module replaces per-tile extraction with a *running* top-k carried
across the (sequential) TPU grid in the output refs themselves:

* The outputs ``[B, 128]`` use a constant index_map, so Pallas keeps them
  resident in VMEM for the whole grid and copies them out once at the end —
  they act as accumulators, like the K-loop accumulator in a tiled matmul.
* Per tile, the threshold ``tau[b]`` = current worst of row b's top-k.
  Extraction passes run in geometric blocks {1, 2, k-3}, each block gated
  with ``pl.when`` on whether the previous block's last pass still inserted
  anywhere (see ``_merge_tile`` for why: Mosaic scalar checks cost ~1 us
  each, so per-pass gating is counterproductive). Most tiles cost ~3 passes
  instead of k: candidates below the current k-th best become rare as the
  scan proceeds (the classic top-k record argument: expected total inserts
  per row over n rows is k*ln(n/k); measured 2.5 executed passes/tile).
* Selection is EXACT: every element strictly below the running k-th best is
  inserted, which is the same invariant a size-k heap maintains
  (/root/reference/src/ivf/search.rs:112-127 — the reference's "free" CPU
  heap, re-expressed for a vector machine).

The masked (IVF) variant composes two more tricks:

* **In-kernel local mask** — the probe mask ``[B, kc_pad]`` stays resident in
  VMEM; each tile turns its distinct-cluster table (``tc``) into a one-hot
  and contracts ``mask @ onehot_tc -> [B, cmax] @ onehot_lcl -> [B, tile]``
  on the MXU. This removes round 1's pre-gathered ``[nt, B, cmax]`` lmask
  HBM buffer (640 MB at 10M rows, B=256) and its 256 MB gate entirely.
* **Active-tile compaction** — with the cluster-sorted layout, tiles whose
  clusters no query probed are skipped: a scalar-prefetched schedule maps
  grid step i to the i-th ACTIVE tile; padding steps repeat the last active
  tile (same block index -> Pallas skips the DMA) and are compute-gated by
  ``i < n_active``. HBM traffic becomes O(union of probed clusters), the
  n-sublinear serving the IVF index exists for (reference reads only
  candidate rows, src/ivf/search.rs:100-127).

Mosaic constraints honored (see pallas-mosaic-gotchas): cluster ids ship as
f32 (exact below 2^24), no in-kernel reshapes, iota is int32-only, argmin/
argmax run on f32, 1-D operands ride as [nt, 1, tile] blocks, last dims are
128-lane aligned (outputs are [B, 128] regardless of k <= 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan_topk import _refine, score_precision

_NEG_INF = -3.0e38
_POS_INF = 3.0e38
_LANES = 128  # top-k accumulator width (k <= 128; reference default k=100)


def _one_pass(work, accd, acci, valid, lane, col_iota, base_id, k):
    """One extraction+insert pass, all VALUES (no ref round-trips: Mosaic
    fuses value-based unrolled passes; interleaving VMEM ref writes/reads
    was measured ~3x slower — docs/PERFORMANCE.md)."""
    bv = jnp.min(work, axis=1)
    bc = jnp.argmin(work, axis=1).astype(jnp.int32)
    cur = jnp.where(valid, accd, _NEG_INF)  # [B, 128]
    tau = jnp.max(cur, axis=1)  # [B] current k-th best
    # Strict <: ties keep the earlier (lower-id) element — the size-k-heap
    # invariant (/root/reference/src/ivf/search.rs:112-127).
    ins = bv < tau
    worst = jnp.argmax(cur, axis=1).astype(jnp.int32)
    sel = (lane == worst[:, None]) & ins[:, None]
    accd = jnp.where(sel, bv[:, None], accd)
    acci = jnp.where(sel, base_id + bc[:, None], acci)
    work = jnp.where(col_iota == bc[:, None], _POS_INF, work)
    return work, accd, acci, ins


def _merge_tile(partial, base_id, acc_d, acc_i, k):
    """Merge one tile's distances into the running top-k accumulators.

    ``partial``: [B, T] squared distances (masked slots = +3e38).
    ``base_id``: scalar int32 — global row id of the tile's first row.
    ``acc_d``/``acc_i``: VMEM *scratch* accumulators — measured ~3 ms per
    1M-row batch cheaper than accumulating in the output refs directly
    (Pallas re-copies a written output block every grid step even under a
    constant index_map); the kernels copy scratch to the outputs once, at
    the last grid step. Within a tile the accumulators are read ONCE and
    written ONCE; every extraction pass runs on values so Mosaic can fuse
    (v1/v3 interleaved ref traffic per pass and ran slower than their own
    saved work — docs/PERFORMANCE.md).

    Gating: geometric pass blocks {1, 2, k-3} via ``lax.cond`` with value
    carries — a block runs only if the previous block's last pass still
    inserted somewhere (expected executed passes/tile measured at 2.5,
    B=256; the k-record argument in the module docstring).
    """
    b, t = partial.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, _LANES), 1)
    valid = lane < k
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    accd = acc_d[:]
    acci = acc_i[:]

    work, accd, acci, ins1 = _one_pass(
        partial, accd, acci, valid, lane, col_iota, base_id, k
    )

    if k > 1:

        def block2(ops):
            work, accd, acci = ops
            work, accd, acci, ins = _one_pass(
                work, accd, acci, valid, lane, col_iota, base_id, k
            )
            if k > 2:
                work, accd, acci, ins = _one_pass(
                    work, accd, acci, valid, lane, col_iota, base_id, k
                )
            if k > 3:

                def tail(ops):
                    work, accd, acci = ops
                    for _ in range(k - 3):
                        work, accd, acci, _ = _one_pass(
                            work, accd, acci, valid, lane, col_iota, base_id, k
                        )
                    return work, accd, acci

                work, accd, acci = jax.lax.cond(
                    jnp.any(ins), tail, lambda ops: ops, (work, accd, acci)
                )
            return work, accd, acci

        work, accd, acci = jax.lax.cond(
            jnp.any(ins1), block2, lambda ops: ops, (work, accd, acci)
        )

    acc_d[:] = accd
    acc_i[:] = acci


def _init_accumulators(out_d_ref, out_i_ref):
    b = out_d_ref.shape[0]
    out_d_ref[:] = jnp.full((b, _LANES), _POS_INF, jnp.float32)
    out_i_ref[:] = jnp.full((b, _LANES), -1, jnp.int32)


def _exact_kernel(q_ref, emb_ref, sq_ref, out_d_ref, out_i_ref,
                  acc_d, acc_i, *, k, tile, subtiles):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _init_accumulators(acc_d, acc_i)

    # `subtiles` sub-tiles per grid step: the per-step fixed cost (~12 us
    # measured through the grid machinery) dominates the merge compute, so
    # one step DMAs a [subtiles, tile, d] block and runs the merge per
    # sub-tile, amortizing the step overhead without growing the [B, tile]
    # work buffers. Sub-tile operands load via direct ref indexing (value
    # slicing of a loaded row mis-lowers: Mosaic "Invalid input layout" on
    # the subsequent broadcast).
    for f in range(subtiles):
        scores = jnp.dot(
            q_ref[:], emb_ref[0, f].T, preferred_element_type=jnp.float32,
            precision=score_precision(q_ref.dtype, emb_ref.dtype),
        )  # [B, T]
        partial = sq_ref[0, f] - 2.0 * scores  # [1, T] - [B, T]
        _merge_tile(partial, (i * subtiles + f) * tile, acc_d, acc_i, k)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_d_ref[:] = acc_d[:]
        out_i_ref[:] = acc_i[:]


def _masked_kernel(sched_ref, q_ref, emb_ref, sq_ref, lcl_ref, tc_ref,
                   mask_ref, out_d_ref, out_i_ref, acc_d, acc_i,
                   *, k, tile, cmax, kc_pad, subtiles):
    i = pl.program_id(0)
    n_active = sched_ref[0]

    @pl.when(i == 0)
    def _():
        _init_accumulators(acc_d, acc_i)

    @pl.when(i < n_active)
    def _():
        tile_idx = sched_ref[1 + i]
        for f in range(subtiles):
            scores = jnp.dot(
                q_ref[:], emb_ref[0, f].T,
                preferred_element_type=jnp.float32,
                precision=score_precision(q_ref.dtype, emb_ref.dtype),
            )
            partial = sq_ref[0, f] - 2.0 * scores  # [1, T] - [B, T]
            # Local probe mask, built on the MXU from resident operands (no
            # pre-gathered lmask buffer): tc row -> one-hot over clusters,
            # contracted with the [B, kc_pad] mask, then expanded to rows
            # via the local-cluster one-hot (ids ship as f32; int32 small
            # blocks mis-lower on this Mosaic version).
            onehot_tc = (
                jax.lax.broadcasted_iota(jnp.int32, (kc_pad, cmax), 0).astype(
                    jnp.float32
                )
                == tc_ref[0, f]  # [1, cmax] f32
            ).astype(jnp.float32)  # [kc_pad, cmax]
            lmask = jnp.dot(
                mask_ref[:], onehot_tc, preferred_element_type=jnp.float32
            )  # [B, cmax]
            onehot_lcl = (
                lcl_ref[0, f]  # [1, T] f32
                == jax.lax.broadcasted_iota(
                    jnp.int32, (cmax, tile), 0
                ).astype(jnp.float32)
            ).astype(jnp.float32)  # [cmax, T]
            probed = (
                jnp.dot(lmask, onehot_lcl, preferred_element_type=jnp.float32)
                > 0.5
            )  # [B, T]
            part = jnp.where(probed, partial, _POS_INF)
            _merge_tile(
                part, (tile_idx * subtiles + f) * tile, acc_d, acc_i, k
            )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_d_ref[:] = acc_d[:]
        out_i_ref[:] = acc_i[:]


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "subtiles", "interpret")
)
def pallas_stream_exact_topk(
    q: jnp.ndarray,  # [B, d]
    emb: jnp.ndarray,  # [n_pad, d], n_pad % (tile*subtiles) == 0
    emb_sq: jnp.ndarray,  # [n_pad] (+3e38 for pad rows, not inf)
    k: int,
    tile: int = 2048,
    subtiles: int = 1,
    interpret: bool = False,
    emb_ref: jnp.ndarray | None = None,  # full-precision re-score rows
):
    """Exact brute-force top-k with streaming threshold extraction."""
    assert k <= _LANES, f"stream kernel supports k <= {_LANES}"
    n_pad, d = emb.shape
    b = q.shape[0]
    step = tile * subtiles
    nt = n_pad // step
    qf = q.astype(emb.dtype)
    emb4 = emb.reshape(nt, subtiles, tile, d)
    sq2 = emb_sq.reshape(nt, subtiles, 1, tile)

    out_d, out_i = pl.pallas_call(
        functools.partial(_exact_kernel, k=k, tile=tile, subtiles=subtiles),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, subtiles, tile, d), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, subtiles, 1, tile), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((b, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, _LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, _LANES), jnp.float32),
            pltpu.VMEM((b, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(qf, emb4, sq2)
    return _refine(
        q, emb if emb_ref is None else emb_ref, out_d[:, :k], out_i[:, :k]
    )


def _probe_mask(q, centroids, c_sq, nprobe, max_probe, kc_pad):
    """[B, kc_pad] f32 probe mask (first `nprobe` of `max_probe` centroids)."""
    b = q.shape[0]
    c_scores = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(-(c_sq[None, :] - 2.0 * c_scores), max_probe)
    in_probe = jnp.arange(max_probe, dtype=jnp.int32)[None, :] < nprobe
    mask = jnp.zeros((b, kc_pad), jnp.float32)
    return mask.at[jnp.arange(b)[:, None], probe].max(in_probe.astype(jnp.float32))


def _tile_schedule(mask, tc):
    """Compacted schedule [nt + 1] i32: [n_active, active tiles..., pad].

    A tile is active iff any query's mask covers any of its clusters.
    Padding repeats the last active tile so the emb-block index_map returns
    an unchanged index (Pallas then skips the DMA for padding steps).
    """
    nt = tc.shape[0]
    cluster_active = jnp.max(mask, axis=0) > 0.0  # [kc_pad]
    tile_active = jnp.max(
        jnp.where(cluster_active[tc], 1, 0), axis=1
    )  # [nt] i32
    order = jnp.argsort(1 - tile_active, stable=True).astype(jnp.int32)
    n_active = jnp.sum(tile_active, dtype=jnp.int32)
    last = order[jnp.maximum(n_active - 1, 0)]
    idxs = jnp.where(jnp.arange(nt, dtype=jnp.int32) < n_active, order, last)
    return jnp.concatenate([n_active[None], idxs])


@functools.partial(
    jax.jit,
    static_argnames=("k", "max_probe", "tile", "cmax", "subtiles", "interpret"),
)
def pallas_stream_masked_topk(
    q: jnp.ndarray,  # [B, d]
    centroids: jnp.ndarray,  # [kc, d]
    c_sq: jnp.ndarray,  # [kc]
    local_cluster: jnp.ndarray,  # [n_pad] f32: row's slot in its tile's tc
    tile_clusters: jnp.ndarray,  # [nt_sub, cmax] i32 (pad slots = kc sentinel)
    emb: jnp.ndarray,  # [n_pad, d]
    emb_sq: jnp.ndarray,  # [n_pad] (+3e38 pad)
    nprobe: jnp.ndarray,  # traced scalar i32
    k: int,
    max_probe: int,
    tile: int = 2048,
    cmax: int = 128,
    subtiles: int = 1,
    interpret: bool = False,
    emb_ref: jnp.ndarray | None = None,  # full-precision re-score rows
):
    """IVF top-k: masked streaming scan over ACTIVE super-tiles only.

    Active-tile compaction runs at super-tile ([subtiles*tile] rows)
    granularity: a super-tile is scheduled if ANY query probes any cluster
    of any of its sub-tiles.
    """
    assert k <= _LANES, f"stream kernel supports k <= {_LANES}"
    n_pad, d = emb.shape
    b = q.shape[0]
    kc = centroids.shape[0]
    step = tile * subtiles
    nt = n_pad // step
    kc_pad = -(-(kc + 1) // 128) * 128

    mask = _probe_mask(q, centroids, c_sq, nprobe, max_probe, kc_pad)
    sched = _tile_schedule(mask, tile_clusters.reshape(nt, subtiles * cmax))

    qf = q.astype(emb.dtype)
    emb4 = emb.reshape(nt, subtiles, tile, d)
    sq2 = emb_sq.reshape(nt, subtiles, 1, tile)
    lcl2 = local_cluster.reshape(nt, subtiles, 1, tile)
    tc_f = tile_clusters.astype(jnp.float32).reshape(nt, subtiles, 1, cmax)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i, s: (0, 0)),
            pl.BlockSpec(
                (1, subtiles, tile, d), lambda i, s: (s[1 + i], 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, subtiles, 1, tile), lambda i, s: (s[1 + i], 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, subtiles, 1, tile), lambda i, s: (s[1 + i], 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, subtiles, 1, cmax), lambda i, s: (s[1 + i], 0, 0, 0)
            ),
            pl.BlockSpec((b, kc_pad), lambda i, s: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((b, _LANES), lambda i, s: (0, 0)),
            pl.BlockSpec((b, _LANES), lambda i, s: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, _LANES), jnp.float32),
            pltpu.VMEM((b, _LANES), jnp.int32),
        ],
    )
    out_d, out_i = pl.pallas_call(
        functools.partial(
            _masked_kernel, k=k, tile=tile, cmax=cmax, kc_pad=kc_pad,
            subtiles=subtiles,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, _LANES), jnp.int32),
        ),
        interpret=interpret,
    )(sched, qf, emb4, sq2, lcl2, tc_f, mask)
    return _refine(
        q, emb if emb_ref is None else emb_ref, out_d[:, :k], out_i[:, :k]
    )
