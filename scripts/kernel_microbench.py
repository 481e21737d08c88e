#!/usr/bin/env python
"""On-chip microbenchmark isolating the top-k extraction kernel cost.

Round-2 finding: the v4 stream kernel (gated ~2.5 extraction passes/tile)
measures SLOWER than the round-1 scan_topk kernel (k unconditional passes)
— 8.2 vs ~6.4 ms/batch exact at 1M x 128, B=256. Algorithmically it should
be ~4x cheaper, so a lowering/pipelining overhead is eating the win. Each
variant here isolates one suspect:

  v0_floor     matmul + running min only (no extraction)  -> per-step floor
  v1_scan      round-1 scan_topk exact                    -> reference
  v2_stream    v4 stream exact as-is                      -> current
  v3_nocond    v4 body, conds stripped, fixed 3 passes    -> lax.cond cost
               (INEXACT results; timing probe only)
  v4_mingate   one min(partial)<tau gate pass; full k-pass
               extraction under a single lax.cond         -> v5 candidate
  v5_mg_warm   v4_mingate but first WARM tiles run the
               extraction unconditionally (pl.when on i)  -> cond frequency

Timing: reps chained inside one lax.scan dispatch, np.asarray round-trip
(CLAUDE.md methodology). Run SOLO on the chip; interpret-validate on CPU
first with --interpret.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import pqvector_tpu  # noqa: F401  (enables persistent compile cache)

_POS_INF = 3.0e38
_NEG_INF = -3.0e38
_LANES = 128


# ---------------------------------------------------------------- v0 floor
def _floor_kernel(q_ref, emb_ref, sq_ref, out_ref, acc, *, tile, subtiles):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.full(acc.shape, _POS_INF, jnp.float32)

    for f in range(subtiles):
        scores = jnp.dot(q_ref[:], emb_ref[0, f].T,
                         preferred_element_type=jnp.float32)
        partial = sq_ref[0, f] - 2.0 * scores
        m = jnp.min(partial, axis=1)  # [B]
        acc[:] = jnp.minimum(acc[:], m[:, None])

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:]


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "subtiles", "interpret"))
def v0_floor(q, emb, emb_sq, k, tile, subtiles, interpret=False):
    n_pad, d = emb.shape
    b = q.shape[0]
    step = tile * subtiles
    nt = n_pad // step
    out = pl.pallas_call(
        functools.partial(_floor_kernel, tile=tile, subtiles=subtiles),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, subtiles, tile, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, subtiles, 1, tile), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, _LANES), jnp.float32)],
        interpret=interpret,
    )(q, emb.reshape(nt, subtiles, tile, d), emb_sq.reshape(nt, subtiles, 1, tile))
    # Shape results like (d2, ids) for the shared loop harness.
    return out[:, :k], jnp.zeros((b, k), jnp.int32)


# ------------------------------------------------------- v3 nocond probe
def _one_pass_values(work, accd, acci, valid, lane, col_iota, base_id, k):
    bv = jnp.min(work, axis=1)
    bc = jnp.argmin(work, axis=1).astype(jnp.int32)
    cur = jnp.where(valid, accd, _NEG_INF)
    tau = jnp.max(cur, axis=1)
    ins = bv < tau
    worst = jnp.argmax(cur, axis=1).astype(jnp.int32)
    sel = (lane == worst[:, None]) & ins[:, None]
    accd = jnp.where(sel, bv[:, None], accd)
    acci = jnp.where(sel, base_id + bc[:, None], acci)
    work = jnp.where(col_iota == bc[:, None], _POS_INF, work)
    return work, accd, acci, ins


def _nocond_kernel(q_ref, emb_ref, sq_ref, out_d_ref, out_i_ref,
                   acc_d, acc_i, *, k, tile, subtiles, passes):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_d[:] = jnp.full(acc_d.shape, _POS_INF, jnp.float32)
        acc_i[:] = jnp.full(acc_i.shape, -1, jnp.int32)

    b = acc_d.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, _LANES), 1)
    valid = lane < k
    for f in range(subtiles):
        scores = jnp.dot(q_ref[:], emb_ref[0, f].T,
                         preferred_element_type=jnp.float32)
        work = sq_ref[0, f] - 2.0 * scores
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        accd = acc_d[:]
        acci = acc_i[:]
        base = (i * subtiles + f) * tile
        for _ in range(passes):
            work, accd, acci, _ = _one_pass_values(
                work, accd, acci, valid, lane, col_iota, base, k)
        acc_d[:] = accd
        acc_i[:] = acci

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_d_ref[:] = acc_d[:]
        out_i_ref[:] = acc_i[:]


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "subtiles", "passes", "interpret"))
def v3_nocond(q, emb, emb_sq, k, tile, subtiles, passes=3, interpret=False):
    n_pad, d = emb.shape
    b = q.shape[0]
    step = tile * subtiles
    nt = n_pad // step
    out_d, out_i = pl.pallas_call(
        functools.partial(_nocond_kernel, k=k, tile=tile, subtiles=subtiles,
                          passes=passes),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, subtiles, tile, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, subtiles, 1, tile), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
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
    )(q, emb.reshape(nt, subtiles, tile, d), emb_sq.reshape(nt, subtiles, 1, tile))
    return out_d[:, :k], out_i[:, :k]


# ------------------------------------------------------- v4 min-gate (v5)
def _mingate_kernel(q_ref, emb_ref, sq_ref, out_d_ref, out_i_ref,
                    acc_d, acc_i, *, k, tile, subtiles, warm):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_d[:] = jnp.full(acc_d.shape, _POS_INF, jnp.float32)
        acc_i[:] = jnp.full(acc_i.shape, -1, jnp.int32)

    b = acc_d.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, _LANES), 1)
    valid = lane < k
    for f in range(subtiles):
        scores = jnp.dot(q_ref[:], emb_ref[0, f].T,
                         preferred_element_type=jnp.float32)
        work0 = sq_ref[0, f] - 2.0 * scores
        base = (i * subtiles + f) * tile
        accd0 = acc_d[:]
        acci0 = acc_i[:]
        cur = jnp.where(valid, accd0, _NEG_INF)
        tau = jnp.max(cur, axis=1)  # [B]
        hit = jnp.any(jnp.min(work0, axis=1) < tau)

        def extract(ops):
            work, accd, acci = ops
            col_iota = jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
            for _ in range(k):
                work, accd, acci, _ = _one_pass_values(
                    work, accd, acci, valid, lane, col_iota, base, k)
            return work, accd, acci

        if warm > 0:
            # Warm tiles (grid-index gate, no vector->scalar reduction):
            # always extract; later tiles gate on the min.
            hit = (i < warm) | hit
        _, accd1, acci1 = jax.lax.cond(
            hit, extract, lambda ops: ops, (work0, accd0, acci0))
        acc_d[:] = accd1
        acc_i[:] = acci1

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_d_ref[:] = acc_d[:]
        out_i_ref[:] = acc_i[:]


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "subtiles", "warm", "interpret"))
def v4_mingate(q, emb, emb_sq, k, tile, subtiles, warm=0, interpret=False):
    n_pad, d = emb.shape
    b = q.shape[0]
    step = tile * subtiles
    nt = n_pad // step
    out_d, out_i = pl.pallas_call(
        functools.partial(_mingate_kernel, k=k, tile=tile, subtiles=subtiles,
                          warm=warm),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, subtiles, tile, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, subtiles, 1, tile), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
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
    )(q, emb.reshape(nt, subtiles, tile, d), emb_sq.reshape(nt, subtiles, 1, tile))
    return out_d[:, :k], out_i[:, :k]


# ----------------------------------------------------------- loop harness
def timed_loop(fn, q0, emb, sq, reps, warm_calls=1, timed_calls=3):
    """reps chained calls in one lax.scan dispatch; returns s/batch.

    ``fn(q, emb, sq)``: emb/sq ride as jit ARGUMENTS — closing over the
    514 MB device array ships it as a remote-compile constant (HTTP 413,
    CLAUDE.md).
    """

    @jax.jit
    def loop(q0, emb, sq):
        def step(q, _):
            d2, ids = fn(q, emb, sq)
            link = jnp.where(jnp.isfinite(d2[:, :1]) & (d2[:, :1] < 1e37),
                             d2[:, :1], 0.0)
            return q0 + 0.0 * link, (d2, ids)

        _, (d2s, idss) = jax.lax.scan(step, q0, None, length=reps)
        return d2s[-1], idss[-1]

    for _ in range(warm_calls):
        np.asarray(loop(q0, emb, sq)[1])
    t0 = time.perf_counter()
    for _ in range(timed_calls):
        np.asarray(loop(q0, emb, sq)[1])
    dt = time.perf_counter() - t0
    return dt / (timed_calls * reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=25)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        args.rows = min(args.rows, 20_000)
        args.reps = 2

    from pqvector_tpu.kernels.scan_topk import pallas_exact_topk
    from pqvector_tpu.kernels.stream_topk import pallas_stream_exact_topk

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    n_pad = -(-args.rows // 8192) * 8192  # divisible by every variant's step
    emb = np.zeros((n_pad, args.dim), np.float32)
    emb[: args.rows] = rng.standard_normal((args.rows, args.dim), dtype=np.float32)
    sq = np.full(n_pad, _POS_INF, np.float32)
    sq[: args.rows] = np.einsum("nd,nd->n", emb[: args.rows], emb[: args.rows])
    t0 = time.perf_counter()
    q0 = jnp.asarray(rng.standard_normal((args.batch, args.dim), dtype=np.float32))
    embj = jnp.asarray(emb)
    sqj = jnp.asarray(sq)
    jax.block_until_ready((q0, embj, sqj))
    log(f"device_put {emb.nbytes / 1e6:.0f} MB: {time.perf_counter() - t0:.1f}s")
    interp = args.interpret

    def truth():
        # Chunked exact scan (one [B, 64k] block at a time): a single
        # [B, 1M] top_k is pathological on this backend (CLAUDE.md).
        t0 = time.perf_counter()
        chunk = 1 << 16
        parts_d, parts_i = [], []

        @jax.jit
        def block(x, s, base):
            d = s[None, :] - 2.0 * q0 @ x.T
            neg, idx = jax.lax.top_k(-d, args.k)
            return -neg, base + idx

        for s0 in range(0, n_pad, chunk):
            d, ix = block(embj[s0 : s0 + chunk], sqj[s0 : s0 + chunk], s0)
            parts_d.append(d)
            parts_i.append(ix)
        all_d = jnp.concatenate(parts_d, axis=1)
        all_i = jnp.concatenate(parts_i, axis=1)
        _, pos = jax.lax.top_k(-all_d, args.k)
        out = np.asarray(jnp.take_along_axis(all_i, pos, axis=1))
        log(f"truth: {time.perf_counter() - t0:.1f}s")
        return out

    from pqvector_tpu.query.device import _exact_approx_topk

    embh = embj.astype(jnp.bfloat16)  # bf16 storage variant
    sq_inf = jnp.where(sqj >= _POS_INF / 2, jnp.inf, sqj)  # approx path wants inf
    qb1024 = jnp.asarray(
        rng.standard_normal((1024, args.dim), dtype=np.float32))
    chunk = min(n_pad, 64 * 4096)

    def approx(q, e, s, dt):
        d2, ids = _exact_approx_topk(
            q, e, s, args.k, chunk=chunk, recall_target=0.99, score_dtype=dt)
        return d2, ids

    # name -> (batch_queries, emb, sq, fn)
    bf16 = jnp.bfloat16
    f32 = jnp.float32
    variants = {
        "v0_floor": (q0, embj, sqj, lambda q, e, s: v0_floor(
            q, e, s, args.k, 2048, 2, interpret=interp)),
        "v0_floor_t4096": (q0, embj, sqj, lambda q, e, s: v0_floor(
            q, e, s, args.k, 4096, 1, interpret=interp)),
        "v0_floor_bf16": (q0, embh, sqj, lambda q, e, s: v0_floor(
            q, e, s, args.k, 2048, 2, interpret=interp)),
        "v1_scan": (q0, embj, sqj, lambda q, e, s: pallas_exact_topk(
            q, e, s, args.k, tile=4096, interpret=interp)),
        "v1_scan_bf16": (q0, embh, sqj, lambda q, e, s: pallas_exact_topk(
            q, e, s, args.k, tile=4096, interpret=interp)),
        "v2_stream": (q0, embj, sqj, lambda q, e, s: pallas_stream_exact_topk(
            q, e, s, args.k, tile=2048, subtiles=2, interpret=interp)),
        "v2_stream_bf16": (q0, embh, sqj,
                           lambda q, e, s: pallas_stream_exact_topk(
                               q, e, s, args.k, tile=2048, subtiles=2,
                               interpret=interp)),
        "v2_bf16_sub4": (q0, embh, sqj,
                         lambda q, e, s: pallas_stream_exact_topk(
                             q, e, s, args.k, tile=2048, subtiles=4,
                             interpret=interp)),
        "v3_nocond": (q0, embj, sqj, lambda q, e, s: v3_nocond(
            q, e, s, args.k, 2048, 2, passes=3, interpret=interp)),
        "v3_nocond_p10": (q0, embj, sqj, lambda q, e, s: v3_nocond(
            q, e, s, args.k, 2048, 2, passes=args.k, interpret=interp)),
        "v4_mingate": (q0, embj, sqj, lambda q, e, s: v4_mingate(
            q, e, s, args.k, 2048, 2, warm=0, interpret=interp)),
        "v4_mingate_w32": (q0, embj, sqj, lambda q, e, s: v4_mingate(
            q, e, s, args.k, 2048, 2, warm=32, interpret=interp)),
        "apx256_f32": (q0, embj, sq_inf,
                       lambda q, e, s: approx(q, e, s, f32)),
        "apx256_sbf16": (q0, embj, sq_inf,
                         lambda q, e, s: approx(q, e, s, bf16)),
        "apx256_all16": (q0, embh, sq_inf,
                         lambda q, e, s: approx(q, e, s, bf16)),
        "apx1024_f32": (qb1024, embj, sq_inf,
                        lambda q, e, s: approx(q, e, s, f32)),
        "apx1024_sbf16": (qb1024, embj, sq_inf,
                          lambda q, e, s: approx(q, e, s, bf16)),
        "apx1024_all16": (qb1024, embh, sq_inf,
                          lambda q, e, s: approx(q, e, s, bf16)),
    }
    pick = args.variants.split(",") if args.variants else list(variants)

    tids = truth()
    for name in pick:
        qv, ev, sv, fn = variants[name]
        bsz = qv.shape[0]
        t0 = time.perf_counter()
        d2, ids = fn(qv, ev, sv)
        ids_np = np.asarray(ids)
        compile_s = time.perf_counter() - t0
        if name.startswith(("v1", "v2", "v4", "apx")) and bsz == args.batch:
            agree = float(np.mean([
                len(set(ids_np[b].tolist()) & set(tids[b].tolist())) / args.k
                for b in range(args.batch)
            ]))
        else:
            agree = float("nan")
        per_batch = timed_loop(fn, qv, ev, sv, args.reps)
        print(
            f"{name:16s} {per_batch * 1e3:8.2f} ms/batch  "
            f"{bsz / per_batch:9.0f} QPS  agree={agree:.4f}  "
            f"(first-call {compile_s:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
