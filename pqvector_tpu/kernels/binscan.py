"""Pallas TPU kernel: fused exact scan with binned-min candidate extraction.

The serving scan (``mode="scan"``) extracts candidates with the hardware
ApproxTopK reduction (``lax.approx_min_k``). Measured at B=4096 x 1M x 128
(scripts/mfu_push.py): the raw scoring matmul+min floor runs 8.50 ms/batch
(62.7% of bf16 peak) while matmul+PartialReduce runs 13.04 ms (40.8%) — the
extraction is a serialized ~4.5 ms VPU pass that XLA does not overlap with
the MXU work.

This kernel overlaps them: each grid step scores one row tile on the MXU and
immediately folds the scores into a per-query *bin table* on the VPU while
the next tile's matmul runs. Selection state per query is L = tile bins
(value + provenance packed into ONE int32), so the post-kernel merge is a
tiny ``top_k`` over L columns instead of a PartialReduce over n.

Packed keys. The kernel scores TRUE squared distances (the rank-neutral
|q|^2 term is added back in precisely so the values are non-negative), and
non-negative f32 bits compare like integers (IEEE-754 order isomorphism).
The low ``code_bits`` mantissa bits are replaced with the row's local
provenance::

    key = (bitcast_i32(part) & ~((1 << code_bits) - 1)) | (g3 << tg_bits) | tg

One ``jnp.minimum`` then tracks value AND argmin together — 1 VPU op per
element instead of cmp+select pairs, and half the accumulator VMEM. The
value loses ``code_bits`` low mantissa bits (2^-13 relative at 1M rows —
far above the 2^-8 bf16 level that craters clustered selection); winners are
exactly re-scored afterwards so returned distances are exact. A part that
rounds slightly negative (an exact-duplicate row) bitcasts below every
non-negative key and wins the bin — which is the correct selection.

Bin geometry. A row tile holds ``n_lg = tile/128`` lane groups; bins are
(slab, lane) with ``slab = (t + g3) % n_lg`` — the slab *rotates* per tile so
the 1024 rows of one tile land in 1024 DISTINCT bins. On cluster_sorted
layouts a ~1k-row cluster therefore cannot self-collide within a tile (the
failure mode that caps ApproxTopK's recall on sorted layouts — see
_approx_chunk in query/device.py); collisions only happen across tiles at
~1/L rate. Provenance decodes as::

    t    = tg * n_lg + ((slab - g3) mod n_lg)
    row  = t * tile + g3 * 128 + lane

Reference behavior anchor: exact-selection search over probed lists,
/root/reference/src/ivf/search.rs:100-127 (here: the nprobe-free serving
scan that replaced it on-device; recall comes from bin selection).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan_topk import _refine, score_precision

_POS_INF = 3.0e38

# Packed-key provenance budget: code_bits beyond this eat too many value
# mantissa bits for reliable selection (see module docstring). Every
# eligibility/calibration gate derives from this constant; the formula-based
# bincompact gate (query/device.py:_compact_bin_params) subtracts 1 for a
# precision floor when the tile cap is predicted rather than measured.
PROVENANCE_BITS_MAX = 13


def provenance_split(n_tiles: int, tile: int) -> tuple[int, int]:
    """(tg_bits, g3_bits) a packed key spends addressing ``n_tiles`` tiles
    of ``tile`` rows: tile-group bits + lane-group (slab) bits."""
    n_lg = tile // 128
    tg_bits = max(1, ((n_tiles - 1) // n_lg).bit_length())
    g3_bits = max(1, (n_lg - 1).bit_length())
    return tg_bits, g3_bits


def provenance_bits(n_tiles: int, tile: int) -> int:
    """Total provenance bits for ``n_tiles`` tiles of ``tile`` rows."""
    return sum(provenance_split(n_tiles, tile))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def binscan_b_tile(
    tile: int,
    d: int,
    esize: int,
    expand: int = 1,
    budget: int = 12 * 2**20,
) -> int:
    """Largest query-block size whose VMEM working set fits scoped vmem.

    Mosaic double-buffers BOTH the streamed emb block and the bin
    accumulator output block, so each is charged twice (measured on-chip:
    expand=2 tile=2048 bt=512 OOMs at 17.02M — exactly 2x the 8.39 MB
    accumulator — while the single-buffered model predicted 9.8 MB).
    ``esize == 1`` means the int8-code kernel variant, which streams two
    extra f32 blocks (the qt lane-broadcast [bt,128] and the per-row
    scale [1,1,tile]) — charged double-buffered like the other inputs.
    Returns 0 if even bt=8 does not fit (tile too large for this dim).
    """
    emb_block = 2 * tile * d * esize
    row_extra = 2 * tile * 4 if esize == 1 else 0  # scale block (int8)
    for bt in (512, 256, 128, 64, 32, 16, 8):
        acc = 2 * expand * (tile // 128) * bt * 128 * 4
        q_block = bt * d * esize + bt * 128 * 4
        if esize == 1:  # qt lane-broadcast block (double-buffered)
            q_block += 2 * bt * 128 * 4
        if emb_block + row_extra + acc + q_block <= budget:
            return bt
    return 0


def _binscan_body(
    t, q, qsq, emb_t, sq_t, out_ref, n_lg, tg_bits, code_bits, expand=1,
    qt=None, sr_t=None,
):
    # q is pre-scaled by -2 on the host, so with the query norm added back
    # part = |q|^2 - 2*q.x + |x|^2 = TRUE squared distance. The query-norm
    # term is rank-neutral per query but REQUIRED here: the bitcast key
    # order only matches float order for non-negative values, and
    # |x|^2 - 2*q.x alone goes negative whenever a candidate sits closer
    # than the query's own norm (regression-pinned in tests/test_binscan.py).
    # f32 inputs must multiply at HIGHEST precision: Precision.DEFAULT
    # truncates f32 operands to one bf16 MXU pass, and on tightly clustered
    # data that score error exceeds the neighbor spacing — bin selection
    # picks wrong rows BEFORE the exact re-score (measured on-chip:
    # recall@10 0.80 on 32-cluster blobs vs 1.0 in interpret mode). bf16
    # storage is unaffected (bf16 x bf16 -> f32 accumulate is exact-input).
    if sr_t is not None:
        # Int8 path (mode="binscan8"/"bincompact8"): codes score on the
        # int8 MXU (int32 accumulate is exact), then scale by the
        # per-query x per-row factor qt*sr (qt carries -2*tq, so the sign
        # and the -2 ride the scale). Selection precision ~1% relative
        # (the quantization); winners are exactly re-scored afterwards.
        dots = jnp.dot(q, emb_t.T, preferred_element_type=jnp.int32)
        scores = dots.astype(jnp.float32) * (qt[:, :1] * sr_t)
        # Quantization error can push a true-zero distance slightly
        # negative; clamp so the non-negative bitcast key order holds.
        part = jnp.maximum((scores + sq_t) + qsq[:, :1], 0.0)
    else:
        scores = jnp.dot(
            q, emb_t.T, preferred_element_type=jnp.float32,
            precision=score_precision(q.dtype, emb_t.dtype),
        )
        part = (scores + sq_t) + qsq[:, :1]  # [bt,tile]+[1,tile]+[bt,1]
    hi_mask = jnp.int32(~((1 << code_bits) - 1))
    tg = t // n_lg
    # Bin expansion: rows additionally spread across `expand` slab blocks by
    # tile-group index (tg % expand) — bins = expand * tile at the SAME
    # per-element op count; collisions drop ~1/expand. Every tile touches
    # all n_lg slabs of its block exactly once, so block e's slabs are all
    # first-touched by tile t == e * n_lg: init exactly there (the caller
    # guarantees nt >= expand * n_lg so every block is touched).
    blk = jax.lax.rem(tg, expand) * n_lg if expand > 1 else 0
    is_first = (
        jnp.logical_and(tg < expand, jax.lax.rem(t, n_lg) == 0)
        if expand > 1
        else t == 0
    )
    for g3 in range(n_lg):
        sl = part[:, g3 * 128 : (g3 + 1) * 128]  # [bt, 128] (static slice)
        bits = jax.lax.bitcast_convert_type(sl, jnp.int32)
        keys = (bits & hi_mask) | ((g3 << tg_bits) + tg)
        slab = jax.lax.rem(t + g3, n_lg) + blk
        idx = (pl.dslice(slab, 1), slice(None), slice(None))

        @pl.when(is_first)
        def _init():
            out_ref[idx] = keys[None]

        @pl.when(jnp.logical_not(is_first))
        def _acc():
            out_ref[idx] = jnp.minimum(out_ref[idx], keys[None])


def _binscan_kernel(
    q_ref, qsq_ref, emb_ref, sq_ref, out_ref, *, n_lg, tg_bits, code_bits,
    expand,
):
    _binscan_body(
        pl.program_id(1), q_ref[:], qsq_ref[:], emb_ref[:], sq_ref[0],
        out_ref, n_lg, tg_bits, code_bits, expand,
    )


def _binscan8_kernel(
    q_ref, qt_ref, qsq_ref, emb_ref, sq_ref, sc_ref, out_ref, *, n_lg,
    tg_bits, code_bits, expand,
):
    _binscan_body(
        pl.program_id(1), q_ref[:], qsq_ref[:], emb_ref[:], sq_ref[0],
        out_ref, n_lg, tg_bits, code_bits, expand,
        qt=qt_ref[:], sr_t=sc_ref[0],
    )


def _binscan_select_kernel(
    sel_ref, q_ref, qsq_ref, emb_ref, sq_ref, out_ref, *, n_lg, tg_bits,
    code_bits, expand,
):
    # Identical math; `t` is the COMPACTED tile slot (the grid position),
    # and the emb/sq blocks were fetched at sel[t] by the index maps.
    _binscan_body(
        pl.program_id(1), q_ref[:], qsq_ref[:], emb_ref[0], sq_ref[0],
        out_ref, n_lg, tg_bits, code_bits, expand,
    )


def _binscan8_select_kernel(
    sel_ref, q_ref, qt_ref, qsq_ref, emb_ref, sq_ref, sc_ref, out_ref, *,
    n_lg, tg_bits, code_bits, expand,
):
    _binscan_body(
        pl.program_id(1), q_ref[:], qsq_ref[:], emb_ref[0], sq_ref[0],
        out_ref, n_lg, tg_bits, code_bits, expand,
        qt=qt_ref[:], sr_t=sc_ref[0],
    )


def quantize_queries_i8(q):
    """Symmetric per-query int8 quantization: (codes int8 [B,d], scale
    f32 [B]) with q ~= scale[b] * codes[b]; zero queries get scale 1.

    The SINGLE definition shared by every int8 scoring path (this
    kernel, query/device.py:_exact_xbin8_impl, measurement scripts) —
    the modes' selection behavior only matches while the quantizer is
    numerically identical.
    """
    qa = jnp.max(jnp.abs(q), axis=1)
    tq = jnp.where(qa > 0, qa / 127.0, 1.0)
    qi = jnp.clip(jnp.round(q / tq[:, None]), -127, 127).astype(jnp.int8)
    return qi, tq


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "b_tile", "expand", "interpret")
)
def pallas_binned_scan(
    q: jnp.ndarray,  # [B, d] f32
    emb: jnp.ndarray,  # [n_pad, d], n_pad % tile == 0
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+3e38 pad rows, NOT inf)
    k: int,
    tile: int = 1024,
    b_tile: int = 512,
    expand: int = 1,
    interpret: bool = False,
    scale: jnp.ndarray | None = None,  # [n_pad] f32: emb is int8 codes
    emb_ref: jnp.ndarray | None = None,  # full-precision rows (re-score)
):
    """Exact brute-force top-k via the fused binned-min scan.

    Returns (squared distances [B, k], ids [B, k]) — exact values (winners
    re-scored in f32); selection misses only on cross-tile bin collisions
    (~k/(expand*L) per pair) like the ApproxTopK path's recall_target.
    ``expand`` spreads rows over expand*tile bins (same op count, bigger
    VMEM accumulator); requires nt >= expand * (tile/128).
    """
    n_pad, d = emb.shape
    b = q.shape[0]
    if n_pad % tile or tile % 128:
        raise ValueError(f"n_pad={n_pad} must be a multiple of tile={tile}")
    nt = n_pad // tile
    n_lg = tile // 128
    if expand < 1 or (expand > 1 and nt < expand * n_lg):
        raise ValueError(
            f"expand={expand} needs nt >= expand*n_lg ({nt} < {expand * n_lg})"
        )
    l_bins = expand * tile  # expand * n_lg slabs x 128 lanes
    if k > l_bins:
        raise ValueError(f"binscan requires k <= {l_bins} bins (got k={k})")
    tg_bits, g3_bits = provenance_split(nt, tile)
    code_bits = tg_bits + g3_bits
    if code_bits > PROVENANCE_BITS_MAX:
        raise ValueError(
            f"binscan key precision too low for n_pad={n_pad} at tile={tile} "
            f"({code_bits} provenance bits); chunk the scan or raise tile"
        )

    fit = binscan_b_tile(tile, d, jnp.dtype(emb.dtype).itemsize, expand)
    if not fit:
        raise ValueError(
            f"binscan tile={tile} d={d} expand={expand} exceeds scoped vmem"
        )
    bt = min(b_tile, fit, _round_up(b, 8))
    bp = _round_up(b, bt)
    qsq = jnp.sum(q.astype(jnp.float32) * q.astype(jnp.float32), axis=1)
    if scale is not None:
        qs, tq = quantize_queries_i8(q)
        qt = -2.0 * tq  # the -2 of the cross term rides the query scale
    else:
        qs, qt = (-2.0 * q).astype(emb.dtype), None
    if bp != b:
        qs = jnp.concatenate([qs, jnp.zeros((bp - b, d), qs.dtype)], axis=0)
        qsq = jnp.concatenate([qsq, jnp.zeros((bp - b,), qsq.dtype)])
        if qt is not None:
            qt = jnp.concatenate([qt, jnp.zeros((bp - b,), qt.dtype)])
    # Lane-broadcast copy of |q|^2 (one (bt,128) block per query tile; the
    # kernel reads column 0). Tiny: 4096 queries = 2 MB, loaded once per bq.
    qsq2 = jnp.tile(qsq[:, None], (1, 128))
    sq2 = emb_sq.reshape(nt, 1, tile)

    common = dict(
        out_shape=jax.ShapeDtypeStruct((expand * n_lg, bp, 128), jnp.int32),
        grid=(bp // bt, nt),
        out_specs=pl.BlockSpec(
            (expand * n_lg, bt, 128),
            lambda bq, t: (0, bq, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )
    q_spec = pl.BlockSpec(
        (bt, d), lambda bq, t: (bq, 0), memory_space=pltpu.VMEM
    )
    bcast_spec = pl.BlockSpec(
        (bt, 128), lambda bq, t: (bq, 0), memory_space=pltpu.VMEM
    )
    emb_spec = pl.BlockSpec(
        (tile, d), lambda bq, t: (t, 0), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec(
        (1, 1, tile), lambda bq, t: (t, 0, 0), memory_space=pltpu.VMEM
    )
    if scale is not None:
        qt2 = jnp.tile(qt[:, None], (1, 128))
        sc2 = scale.reshape(nt, 1, tile)
        keys = pl.pallas_call(
            functools.partial(
                _binscan8_kernel, n_lg=n_lg, tg_bits=tg_bits,
                code_bits=code_bits, expand=expand,
            ),
            in_specs=[q_spec, bcast_spec, bcast_spec, emb_spec, row_spec,
                      row_spec],
            **common,
        )(qs, qt2, qsq2, emb, sq2, sc2)
    else:
        keys = pl.pallas_call(
            functools.partial(
                _binscan_kernel, n_lg=n_lg, tg_bits=tg_bits,
                code_bits=code_bits, expand=expand,
            ),
            in_specs=[q_spec, bcast_spec, emb_spec, row_spec],
            **common,
        )(qs, qsq2, emb, sq2)

    return _merge_bins(
        q, emb if emb_ref is None else emb_ref, keys, b, k, tile, n_lg,
        tg_bits, code_bits, sel=None, kf_mult=2 if scale is None else 4,
        kf_floor=0 if scale is None else 32,
    )


def _merge_bins(
    q, emb, keys, b, k, tile, n_lg, tg_bits, code_bits, sel, kf_mult=2,
    kf_floor=0,
):
    """Tiny cross-bin merge + provenance decode + exact re-score.

    top_k over the L bin columns of int keys; bitwise_not is a strictly
    decreasing int map (no -INT_MIN overflow), so max-of-~keys equals
    min-of-keys. ``sel`` maps compacted tile slots back to global tiles
    (None for the full scan). ``keys`` may carry expand*n_lg slabs (bin
    expansion); the block index (slab // n_lg) is redundant with the
    provenance code's tg (it equals tg % expand), so the decode only
    needs the within-block slab. ``kf_mult``/``kf_floor`` widen the
    candidate fetch ahead of the exact re-score — the int8 path uses
    (4, 32): quantization perturbs within-bin races on top of
    collisions, like xbin8's wider default in
    query/device.py:_exact_xbin8_impl. The f32 path keeps exactly 2k
    (its measured baselines predate the knob).
    """
    bp = keys.shape[1]
    n_slabs = keys.shape[0]  # expand * n_lg
    kf = min(max(kf_mult * k, kf_floor), n_slabs * 128)
    flat = jnp.swapaxes(keys, 0, 1).reshape(bp, n_slabs * 128)
    nk, bins = jax.lax.top_k(jnp.bitwise_not(flat), kf)
    key = jnp.bitwise_not(nk)
    code = key & ((1 << code_bits) - 1)
    tg = code & ((1 << tg_bits) - 1)
    g3 = code >> tg_bits
    slab = jnp.mod(bins // 128, n_lg)  # within-block slab
    lane = bins - (bins // 128) * 128
    t_row = tg * n_lg + jnp.mod(slab - g3, n_lg)
    if sel is not None:
        t_row = sel[t_row]
    row = t_row * tile + g3 * 128 + lane
    val = jax.lax.bitcast_convert_type(
        key & jnp.int32(~((1 << code_bits) - 1)), jnp.float32
    )
    d2, ids = _refine(q, emb, val[:b], row[:b], out_k=k)
    return d2[:, :k], ids[:, :k]


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile", "cap", "b_tile", "expand", "interpret"),
)
def pallas_binned_scan_select(
    q: jnp.ndarray,  # [B, d] f32
    emb: jnp.ndarray,  # [n_pad, d], n_pad % tile == 0
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+3e38 pad rows, NOT inf)
    sel: jnp.ndarray,  # [cap] i32 global tile indices to scan
    k: int,
    tile: int = 2048,
    cap: int | None = None,
    b_tile: int = 512,
    expand: int = 1,
    interpret: bool = False,
    scale: jnp.ndarray | None = None,  # [n_pad] f32: emb is int8 codes
    emb_ref: jnp.ndarray | None = None,  # full-precision rows (re-score)
):
    """Binned-min scan over SELECTED row tiles (probed-union IVF serving).

    The compact mode's gather+extract moves read+write+read of the covered
    fraction; this kernel instead streams the selected tiles through the
    fused scan directly — the index map reads a scalar-prefetched tile list,
    so the covered fraction crosses HBM exactly ONCE and the extraction
    rides the matmul. Returns (squared distances [B, k], GLOBAL ids [B, k]).

    Reference behavior anchor: per-query probed-list search,
    /root/reference/src/ivf/search.rs:100-127 (batched: candidates are the
    batch's probed-tile union, like mode="compact").
    """
    n_pad, d = emb.shape
    b = q.shape[0]
    if cap is None:
        cap = int(sel.shape[0])
    if n_pad % tile or tile % 128:
        raise ValueError(f"n_pad={n_pad} must be a multiple of tile={tile}")
    nt = n_pad // tile
    n_lg = tile // 128
    if expand < 1 or (expand > 1 and cap < expand * n_lg):
        raise ValueError(
            f"expand={expand} needs cap >= expand*n_lg ({cap} < {expand * n_lg})"
        )
    if k > expand * tile:
        raise ValueError(
            f"binscan requires k <= {expand * tile} bins (got k={k})"
        )
    tg_bits, g3_bits = provenance_split(cap, tile)
    code_bits = tg_bits + g3_bits
    if code_bits > PROVENANCE_BITS_MAX:
        raise ValueError(
            f"binscan key precision too low for cap={cap} at tile={tile} "
            f"({code_bits} provenance bits); raise tile or lower the cap"
        )

    fit = binscan_b_tile(tile, d, jnp.dtype(emb.dtype).itemsize, expand)
    if not fit:
        raise ValueError(
            f"binscan tile={tile} d={d} expand={expand} exceeds scoped vmem"
        )
    bt = min(b_tile, fit, _round_up(b, 8))
    bp = _round_up(b, bt)
    qsq = jnp.sum(q.astype(jnp.float32) * q.astype(jnp.float32), axis=1)
    if scale is not None:
        qs, tq = quantize_queries_i8(q)
        qt = -2.0 * tq  # the -2 of the cross term rides the query scale
    else:
        qs, qt = (-2.0 * q).astype(emb.dtype), None
    if bp != b:
        qs = jnp.concatenate([qs, jnp.zeros((bp - b, d), qs.dtype)], axis=0)
        qsq = jnp.concatenate([qsq, jnp.zeros((bp - b,), qsq.dtype)])
        if qt is not None:
            qt = jnp.concatenate([qt, jnp.zeros((bp - b,), qt.dtype)])
    qsq2 = jnp.tile(qsq[:, None], (1, 128))
    emb3 = emb.reshape(nt, tile, d)
    sq2 = emb_sq.reshape(nt, 1, tile)
    sel = sel.astype(jnp.int32)

    q_spec = pl.BlockSpec((bt, d), lambda bq, t, s: (bq, 0))
    bcast_spec = pl.BlockSpec((bt, 128), lambda bq, t, s: (bq, 0))
    emb_spec = pl.BlockSpec((1, tile, d), lambda bq, t, s: (s[t], 0, 0))
    row_spec = pl.BlockSpec((1, 1, tile), lambda bq, t, s: (s[t], 0, 0))
    out_spec = pl.BlockSpec(
        (expand * n_lg, bt, 128), lambda bq, t, s: (0, bq, 0)
    )
    if scale is not None:
        qt2 = jnp.tile(qt[:, None], (1, 128))
        sc2 = scale.reshape(nt, 1, tile)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bp // bt, cap),
            in_specs=[q_spec, bcast_spec, bcast_spec, emb_spec, row_spec,
                      row_spec],
            out_specs=out_spec,
        )
        keys = pl.pallas_call(
            functools.partial(
                _binscan8_select_kernel,
                n_lg=n_lg, tg_bits=tg_bits,
                code_bits=code_bits, expand=expand,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (expand * n_lg, bp, 128), jnp.int32
            ),
            interpret=interpret,
        )(sel, qs, qt2, qsq2, emb3, sq2, sc2)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bp // bt, cap),
            in_specs=[q_spec, bcast_spec, emb_spec, row_spec],
            out_specs=out_spec,
        )
        keys = pl.pallas_call(
            functools.partial(
                _binscan_select_kernel,
                n_lg=n_lg,
                tg_bits=tg_bits,
                code_bits=code_bits,
                expand=expand,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (expand * n_lg, bp, 128), jnp.int32
            ),
            interpret=interpret,
        )(sel, qs, qsq2, emb3, sq2)
    return _merge_bins(
        q, emb if emb_ref is None else emb_ref, keys, b, k, tile, n_lg,
        tg_bits, code_bits, sel=sel, kf_mult=2 if scale is None else 4,
        kf_floor=0 if scale is None else 32,
    )
