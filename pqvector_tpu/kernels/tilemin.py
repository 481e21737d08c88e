"""Fused matmul + per-contiguous-tile score minimum (cert pass 1).

The certified-exact scan (query/device.py:_exact_cert_impl) needs the
minimum of ``|x|^2 - 2 q.x`` over every contiguous ``tile``-row group —
a VALUE-only fold (cert gathers winning tiles whole, so per-row
provenance is dead weight). The XLA formulation materializes the [B, n]
score block to HBM because grouped reductions do not fuse into the dot
(chip-measured r5b: 25.3 ms at B=1024 on 1M x 128 against a 4.1 ms
matmul+plain-min floor — the same non-fusion that sank xbin, VERDICT r4
item 4). Here the fold happens in VMEM right after the MXU dot: each
grid step streams a ``ct * tile``-row block, scores it against the
query block, reduces each tile's lane group to its min, and writes one
[bt, ct] f32 block — the score block never leaves VMEM.

Unlike binscan (kernels/binscan.py) there is no cross-step accumulator
(tiles are independent), no packed int32 keys, and no provenance-bit
precision cap — so f32 operands can score at HIGHEST (bf16_6x), the
precision the certificate's tight slack model requires.

Reference behavior anchor: exact-selection serving scan,
/root/reference/src/ivf/search.rs:100-127 (ground-truth role
/root/reference/benches/query.rs:76-103).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan_topk import score_precision

#: Scoped-VMEM working-set budget (the binscan kernel's measured-safe
#: envelope; Mosaic double-buffers streamed inputs and outputs).
_VMEM_BUDGET = 12 * 2**20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def tilemin_params(
    n_pad: int, tile: int, d: int, esize: int, b: int,
    budget: int = _VMEM_BUDGET,
) -> tuple[int, int]:
    """(ct, bt): tiles per grid step and query-block rows, sized so the
    double-buffered emb block + the in-VMEM score block + the output fit
    scoped VMEM. Returns (0, 0) when no divisor of nt fits (caller falls
    back to the XLA fold)."""
    nt = n_pad // tile
    best = (0, 0)
    for bt in (256, 128, 64, 32, 16, 8):
        # Largest MOSAIC-LEGAL divisor of nt at this bt: the output block's
        # minor dim must be a multiple of 128 (or the whole nt) — Mosaic
        # rejects other block shapes (first on-chip run, session r5f).
        for ct in range(min(nt, 512), 0, -1):
            if nt % ct or (ct % 128 and ct != nt):
                continue
            emb_blk = 2 * ct * tile * d * esize  # double-buffered stream
            q_blk = bt * d * esize
            scores = bt * ct * tile * 4  # fold temp (single)
            out_blk = 2 * bt * ct * 4
            sq_blk = 2 * ct * tile * 4
            if emb_blk + q_blk + scores + out_blk + sq_blk <= budget:
                if ct * bt > best[0] * best[1]:
                    best = (ct, bt)
                break
    return best


def _tilemin_kernel(q_ref, emb_ref, sq_ref, out_ref, *, ct, tile, prec):
    # q is pre-scaled by -2 on the host; |q|^2 is rank-neutral per query
    # and re-added by the caller where absolute values matter (the
    # certificate threshold), so part = |x|^2 - 2 q.x here.
    scores = jnp.dot(
        q_ref[:], emb_ref[:].T,
        preferred_element_type=jnp.float32, precision=prec,
    )  # [bt, ct*tile] f32 — lives and dies in VMEM
    part = scores + sq_ref[0]
    bt = part.shape[0]
    out_ref[:] = jnp.min(part.reshape(bt, ct, tile), axis=2)


@functools.partial(
    jax.jit, static_argnames=("tile", "high", "interpret")
)
def pallas_tile_min(
    q: jnp.ndarray,  # [B, d] f32
    emb: jnp.ndarray,  # [n_pad, d]; n_pad % tile == 0
    emb_sq: jnp.ndarray,  # [n_pad] f32 (+3e38 pad rows, NOT inf)
    tile: int,
    high: bool = False,  # f32 dot at HIGH (bf16_3x) instead of HIGHEST
    interpret: bool = False,
):
    """[B, n_pad/tile] f32: min over each contiguous ``tile``-row group of
    ``|x|^2 - 2 q.x`` (add ``|q|^2`` per query for true squared
    distances). Raises ValueError when no grid fits VMEM — the caller
    falls back to the XLA fold."""
    n_pad, d = emb.shape
    b = q.shape[0]
    if n_pad % tile or tile % 128:
        raise ValueError(f"n_pad={n_pad} must be a multiple of tile={tile}")
    nt = n_pad // tile
    esize = jnp.dtype(emb.dtype).itemsize
    ct, bt_fit = tilemin_params(n_pad, tile, d, esize, b)
    if not ct:
        raise ValueError(
            f"tilemin tile={tile} d={d} esize={esize} n_pad={n_pad}: no "
            "Mosaic-legal VMEM-fitting grid (nt needs a 128-multiple "
            "divisor); use the fused XLA dot-shaped fold instead"
        )
    bt = min(bt_fit, _round_up(b, 8))
    bp = _round_up(b, bt)
    prec = score_precision(jnp.float32, emb.dtype, jnp.float32)
    if high and prec == jax.lax.Precision.HIGHEST:
        prec = jax.lax.Precision.HIGH
    qf2 = (-2.0 * q).astype(emb.dtype)
    if bp != b:
        qf2 = jnp.concatenate(
            [qf2, jnp.zeros((bp - b, d), qf2.dtype)], axis=0
        )
    sq2 = emb_sq.reshape(nt // ct, 1, ct * tile)

    out = pl.pallas_call(
        functools.partial(_tilemin_kernel, ct=ct, tile=tile, prec=prec),
        out_shape=jax.ShapeDtypeStruct((bp, nt), jnp.float32),
        grid=(bp // bt, nt // ct),
        in_specs=[
            pl.BlockSpec((bt, d), lambda bq, c: (bq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct * tile, d), lambda bq, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ct * tile), lambda bq, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, ct), lambda bq, c: (bq, c),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf2, emb, sq2)
    return out[:b]
