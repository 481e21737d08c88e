"""Chip session r4n: decompose the refine (re-score) cost at B=8192.

r4g at B=4096 pinned the scan residual over the floor as +1.43 ms
"re-score gather" + ~1.7 ms plumbing, but never split the refine into
its parts. At B=8192 the served 448k runs ~5.4 ms over the 12.9 ms
floor — if most of that is the refine, a cheaper refine is the next
(and only) lever. Ladder, all in one window, all DCE-chained:

  FLOOR  matmul+min (bench.measure_floor_qps)
  R0     matmul + approx_min_k(fetch) only        (raw extraction)
  R1     R0 + f32 ref gather (sum-chained)        (isolates the gather)
  R2     R1 + diff-form d2 (no sort)              (isolates the [B,F,d] pass)
  R3     R2 + stable argsort + takes == probe raw+refine (r4g V0)
  R4     refine via dot-form d2 = x2g - 2 x.q + q2 (no [B,F,d] diff temp;
         x2g/x.q fused into the gather pass)      (cheaper refine?)
  R5     R3 with lax.top_k(k) instead of full argsort(fetch)
  SERVED full search_loop mode=scan               (the headline path)

Plus a (rt, fetch) recall spot-check at fetch=16 (current serving: 20)
because the refine cost scales with fetch.

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r4n.py 1800
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
from pqvector_tpu.query.device import DeviceIvfSearcher  # noqa: E402
from bench import measure_floor_qps  # noqa: E402

path = "/root/repo/data/bench_1000000x128.parquet"
ensure_bench_dataset(path)
index, col = read_index_from_parquet(path)
emb_np = read_embedding_column(path, col).data
n, d = emb_np.shape
rng = np.random.default_rng(3)
q_np = (emb_np[rng.integers(0, n, 8192)]
        + 0.05 * rng.standard_normal((8192, d))).astype(np.float32)
s = DeviceIvfSearcher(index, emb_np, row_tile=4096, dtype=jnp.bfloat16)

# f32 exact truth @ k=10 for the fetch recall spot-check (CPU, chunked).
K = 10
truth = np.empty((256, K), np.int64)
qt = q_np[:256]
scores = -2.0 * (qt @ emb_np.T) + (emb_np * emb_np).sum(1)[None, :]
truth = np.argpartition(scores, K, axis=1)[:, :K]
truth = [set(row.tolist()) for row in truth]
del scores, emb_np
log("resident + truth ready")

RT, KF = 0.9, 20
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


def make_loop(stage):
    """stage(q0, e, s_, ref) -> scalar-chainable output per rep."""

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(q0, e, s_, ref, reps):
        def step(carry, _):
            out = stage(q0 + 0.0 * carry, e, s_, ref)
            return carry + 0.0 * out, out[None]

        c, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
        return ys[-1]

    return loop


def raw(q0, e, s_, ref):
    qf = q0.astype(e.dtype)
    part = s_[None, :] - 2.0 * jnp.dot(
        qf, e.T, preferred_element_type=jnp.float32
    )
    vals, idx = jax.lax.approx_min_k(part, KF, recall_target=RT)
    return vals, idx


def r0(q0, e, s_, ref):
    vals, idx = raw(q0, e, s_, ref)
    return jnp.sum(vals) + jnp.sum(idx.astype(jnp.float32))


def r1(q0, e, s_, ref):
    vals, idx = raw(q0, e, s_, ref)
    x = ref[jnp.maximum(idx, 0)].astype(jnp.float32)  # [B, F, d]
    return jnp.sum(x) + jnp.sum(vals)


def _diff_d2(q0, x):
    diff = x - q0[:, None, :]
    return jnp.sum(diff * diff, axis=-1)  # [B, F]


def r2(q0, e, s_, ref):
    vals, idx = raw(q0, e, s_, ref)
    x = ref[jnp.maximum(idx, 0)].astype(jnp.float32)
    return jnp.sum(_diff_d2(q0, x)) + jnp.sum(vals)


def r3(q0, e, s_, ref):
    vals, idx = raw(q0, e, s_, ref)
    x = ref[jnp.maximum(idx, 0)].astype(jnp.float32)
    d2 = _diff_d2(q0, x)
    order = jnp.argsort(d2, axis=1, stable=True)
    d2s = jnp.take_along_axis(d2, order, axis=1)[:, :K]
    ids = jnp.take_along_axis(idx, order, axis=1)[:, :K]
    return jnp.sum(d2s) + jnp.sum(ids.astype(jnp.float32))


def r4(q0, e, s_, ref):
    vals, idx = raw(q0, e, s_, ref)
    x = ref[jnp.maximum(idx, 0)].astype(jnp.float32)
    # dot-form: fuses into the gather pass, no [B,F,d] diff temp. The
    # |x|^2 - 2 x.q cancellation (~1e-3 rel) only reorders near-ties
    # among the fetched candidates.
    x2 = jnp.sum(x * x, axis=-1)
    xq = jnp.einsum("bfd,bd->bf", x, q0)
    d2 = x2 - 2.0 * xq + jnp.sum(q0 * q0, axis=-1)[:, None]
    order = jnp.argsort(d2, axis=1, stable=True)
    d2s = jnp.take_along_axis(d2, order, axis=1)[:, :K]
    ids = jnp.take_along_axis(idx, order, axis=1)[:, :K]
    return jnp.sum(d2s) + jnp.sum(ids.astype(jnp.float32))


def r5(q0, e, s_, ref):
    vals, idx = raw(q0, e, s_, ref)
    x = ref[jnp.maximum(idx, 0)].astype(jnp.float32)
    d2 = _diff_d2(q0, x)
    neg, pos = jax.lax.top_k(-d2, K)
    ids = jnp.take_along_axis(idx, pos, axis=1)
    return jnp.sum(-neg) + jnp.sum(ids.astype(jnp.float32))


LOOPS = {
    "R0 raw extraction": make_loop(r0),
    "R1 +gather": make_loop(r1),
    "R2 +diff d2": make_loop(r2),
    "R3 +argsort (refine)": make_loop(r3),
    "R4 dot-form refine": make_loop(r4),
    "R5 top_k refine": make_loop(r5),
}

ref = s._ref_or_emb()
for B in (8192, 4096):
    qb = jax.device_put(q_np[:B])
    floor = measure_floor_qps(jax, s, q_np[:B])
    log(f"honest floor@B{B}: {floor:.0f} QPS ({B/floor*1e3:.2f} ms)")
    for label, loop in LOOPS.items():
        timed(f"B{B} {label}", lambda L=loop: np.asarray(
            L(qb, s.emb, s.emb_sq, ref, 25)), B)

    def serve(qq=qb):
        s.approx_recall_target = RT
        s.scan_overfetch = KF
        _, ids = s.search_loop(qq, K, 8, reps=25, mode="scan")
        np.asarray(ids)

    timed(f"B{B} SERVED search_loop", serve, B)

# (rt, fetch) recall spot-check at fetch=16/20 (f32 truth, B=256).
qt_dev = jax.device_put(qt)
for kf in (16, 20):
    s.approx_recall_target = RT
    s.scan_overfetch = kf
    _, ids = s.search_loop(qt_dev, K, 8, reps=1, mode="scan")
    ids = np.asarray(ids)
    rec = np.mean([len(set(row.tolist()) & t) / K
                   for row, t in zip(ids, truth)])
    log(f"recall@10 rt={RT} fetch={kf}: {rec:.4f}")

log(f"summary: {sorted(results.items(), key=lambda kv: -kv[1])}")
log("session r4n done")
