"""Chip session r4g: bisect the last ~1.9 ms between probe and served scan.

r4f at B=4096 (rt=0.9, fetch=20): probe raw+refine = 8.51 ms but the
served search_loop scan = 10.44 ms. Ladder from probe-form to served-
form, all in one window:

  V0  probe raw+refine                       (r4f baseline)
  V1  probe chain calling the REAL _exact_approx_topk_impl
      (isolates impl internals: clamped min_k, astype casts, where,
       argsort+two takes, [:, :k] slices)
  V2  V1 + served-loop scaffolding (q carry, link chain, stacked
      (d2, ids) outputs, _loop_finalize)     (isolates the loop shell)
  V3  full served search_loop                (r4f: 10.44 ms)

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r4g.py 1800
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import ensure_bench_dataset, log, watchdog  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402

watchdog(600.0)
log(f"device alive ({jax.devices()})")

import functools  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from pqvector_tpu.io.embed import read_index_from_parquet  # noqa: E402
from pqvector_tpu.io.reader import read_embedding_column  # noqa: E402
from pqvector_tpu.query.device import (  # noqa: E402
    DeviceIvfSearcher, _exact_approx_topk_impl, _loop_finalize,
)
from bench import measure_floor_qps  # noqa: E402

path = "/root/repo/data/bench_1000000x128.parquet"
ensure_bench_dataset(path)
index, col = read_index_from_parquet(path)
emb_np = read_embedding_column(path, col).data
n, d = emb_np.shape
rng = np.random.default_rng(3)
q_np = (emb_np[rng.integers(0, n, 4096)]
        + 0.05 * rng.standard_normal((4096, d))).astype(np.float32)
s = DeviceIvfSearcher(index, emb_np, row_tile=4096, dtype=jnp.bfloat16)
del emb_np
log("resident")

RT, KF, K = 0.9, 20, 10
results = {}


def timed(label, call, b, budget=5.0, reps=25):
    try:
        call()
        t0 = time.perf_counter()
        nn = 0
        while time.perf_counter() - t0 < budget and nn < 16 * reps:
            call()
            nn += reps
        qps = nn * b / (time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001
        log(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return None
    results[label] = qps
    log(f"{label}: {b/qps*1e3:7.2f} ms/batch {qps:9.0f} QPS")
    return qps


@functools.partial(jax.jit, static_argnames=("reps",))
def v0_loop(q0, e, s_, ref, reps):
    def step(carry, _):
        qf = (q0 + 0.0 * carry).astype(e.dtype)
        part = s_[None, :] - 2.0 * jnp.dot(
            qf, e.T, preferred_element_type=jnp.float32
        )
        vals, idx = jax.lax.approx_min_k(part, KF, recall_target=RT)
        x = ref[jnp.maximum(idx, 0)].astype(jnp.float32)
        d2 = jnp.sum((x - q0[:, None, :]) ** 2, axis=-1)
        order = jnp.argsort(d2, axis=1, stable=True)
        d2 = jnp.take_along_axis(d2, order, axis=1)[:, :K]
        return carry + 0.0 * jnp.sum(d2), d2[:1, :1]

    c, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
    return ys[-1]


@functools.partial(jax.jit, static_argnames=("reps",))
def v1_loop(q0, e, s_, ref, reps):
    def step(carry, _):
        q = q0 + 0.0 * carry
        d2, ids = _exact_approx_topk_impl(
            q, e, s_, k=K, chunk=e.shape[0], recall_target=RT,
            score_dtype=jnp.float32, overfetch=KF, emb_ref=ref,
        )
        return carry + 0.0 * (jnp.sum(d2) + jnp.sum(ids.astype(d2.dtype))), \
            d2[:1, :1]

    c, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
    return ys[-1]


@functools.partial(jax.jit, static_argnames=("reps", "n_valid"))
def v2_loop(q0, e, s_, ref, reps, n_valid):
    def step(q, _):
        d2, ids = _exact_approx_topk_impl(
            q, e, s_, k=K, chunk=e.shape[0], recall_target=RT,
            score_dtype=jnp.float32, overfetch=KF, emb_ref=ref,
        )
        link = jnp.where(jnp.isfinite(d2[:, :1]), d2[:, :1], 0.0)
        return q0 + 0.0 * link, (d2, ids)

    _, (d2s, idss) = jax.lax.scan(step, q0, None, length=reps)
    return _loop_finalize(d2s[-1], idss[-1], n_valid, None)


B = 4096
qb = jax.device_put(q_np[:B])
floor4 = measure_floor_qps(jax, s, q_np[:B])
log(f"honest floor@B4096: {floor4:.0f} QPS")

ref = s._ref_or_emb()
timed("V0 probe raw+refine", lambda: np.asarray(
    v0_loop(qb, s.emb, s.emb_sq, ref, 25)), B)
timed("V1 probe+real impl", lambda: np.asarray(
    v1_loop(qb, s.emb, s.emb_sq, ref, 25)), B)
timed("V2 +loop scaffolding", lambda: np.asarray(
    v2_loop(qb, s.emb, s.emb_sq, ref, 25, s.n)[1]), B)


def serve():
    s.approx_recall_target = RT
    s.scan_overfetch = KF
    _, ids = s.search_loop(qb, K, 8, reps=25, mode="scan")
    np.asarray(ids)


timed("V3 served search_loop", serve, B)
log(f"summary: {sorted(results.items(), key=lambda kv: -kv[1])}")
log("session r4g done")
