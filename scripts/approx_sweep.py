#!/usr/bin/env python
"""Sweep (batch, chunk, dtype) for the ApproxTopK scan path.

The scan mode measures far off roofline (1M f32 B=1024: 4.5 ms vs 0.63 ms
roofline; 10M bf16 B=1024: 33 ms vs 2.3), suggesting per-chunk custom-call
overhead or partial materialization. This sweeps the knobs on the 1M bench
shapes. SOLO on chip; chained-loop timing.
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import pqvector_tpu  # noqa: F401  (compile cache)
from pqvector_tpu.query.device import _exact_approx_topk_impl

_POS_INF = 3.0e38


def timed_loop(fn, q0, emb, sq, reps=25, timed_calls=3):
    @jax.jit
    def loop(q0, emb, sq):
        def step(q, _):
            d2, ids = fn(q, emb, sq)
            link = jnp.where(jnp.isfinite(d2[:, :1]), d2[:, :1], 0.0)
            return q0 + 0.0 * link, (d2, ids)

        _, (d2s, idss) = jax.lax.scan(step, q0, None, length=reps)
        return d2s[-1], idss[-1]

    np.asarray(loop(q0, emb, sq)[1])
    t0 = time.perf_counter()
    for _ in range(timed_calls):
        np.asarray(loop(q0, emb, sq)[1])
    return (time.perf_counter() - t0) / (timed_calls * reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n_pad = -(-args.rows // 8192) * 8192
    emb = np.zeros((n_pad, args.dim), np.float32)
    emb[: args.rows] = rng.standard_normal(
        (args.rows, args.dim), dtype=np.float32)
    sq = np.full(n_pad, np.inf, np.float32)
    sq[: args.rows] = np.einsum(
        "nd,nd->n", emb[: args.rows], emb[: args.rows])
    embj = jnp.asarray(emb)
    embh = embj.astype(jnp.bfloat16)
    sqj = jnp.asarray(sq)
    qs = {
        b: jnp.asarray(rng.standard_normal((b, args.dim), dtype=np.float32))
        for b in (256, 1024, 4096)
    }

    for b in (256, 1024, 4096):
        for store, ej in (("f32", embj), ("bf16", embh)):
            for chunk in (65536, 262144, 1048576, n_pad):
                if chunk > n_pad:
                    continue

                def fn(q, e, s, _c=chunk):
                    return _exact_approx_topk_impl(
                        q, e, s, k=args.k, chunk=_c, recall_target=0.99)

                try:
                    dt = timed_loop(fn, qs[b], ej, sqj)
                except Exception as ex:
                    print(f"B={b} {store} chunk={chunk}: FAIL "
                          f"{type(ex).__name__}", flush=True)
                    continue
                print(
                    f"B={b:5d} {store:4s} chunk={chunk:8d}: "
                    f"{dt*1e3:7.2f} ms/batch {b/dt:9.0f} QPS",
                    flush=True,
                )


if __name__ == "__main__":
    main()
