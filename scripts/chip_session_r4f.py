"""Chip session r4f: validate the _approx_scan single-call fast path.

r4e (post in-jit finalize): served scan(0.95,40) = 16.48 ms at B=4096 —
still ~4 ms over the r4d probe's raw+refine (12.36 ms). Suspect: the
lax.scan-over-one-chunk scaffold dynamic-slices the 256 MB resident
array into the body every rep, plus a redundant width-k top_k merge.
This session re-times the served configs after the direct-call rewrite
and decomposes the remaining refine cost at fetch=20.

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r4f.py 1800
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
del emb_np
log("resident")

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


def serve(qb_dev, rt, fetch, reps=25):
    s.approx_recall_target = rt
    s.scan_overfetch = fetch

    def call():
        _, ids = s.search_loop(qb_dev, 10, 8, reps=reps, mode="scan")
        np.asarray(ids)

    return call


# ---- probe rungs (raw / raw+refine at fetch=20) ----
@functools.partial(jax.jit, static_argnames=("reps", "refine", "rt", "kf"))
def probe_loop(q0, e, s_, ref, reps, refine, rt=0.9, kf=20):
    def step(carry, _):
        qf = (q0 + 0.0 * carry).astype(e.dtype)
        part = s_[None, :] - 2.0 * jnp.dot(
            qf, e.T, preferred_element_type=jnp.float32
        )
        vals, idx = jax.lax.approx_min_k(part, kf, recall_target=rt)
        if refine:
            x = ref[jnp.maximum(idx, 0)].astype(jnp.float32)
            d2 = jnp.sum((x - q0[:, None, :]) ** 2, axis=-1)
            order = jnp.argsort(d2, axis=1, stable=True)
            d2 = jnp.take_along_axis(d2, order, axis=1)[:, :10]
            out = d2
        else:
            out = vals
        return carry + 0.0 * jnp.sum(out), out[:1, :1]

    c, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
    return ys[-1]


B = 4096
qb = jax.device_put(q_np[:B])
floor4 = measure_floor_qps(jax, s, q_np[:B])
log(f"honest floor@B4096: {floor4:.0f} QPS")

ref = s._ref_or_emb()
timed("raw(0.9,20)@B4096",
      lambda: np.asarray(probe_loop(qb, s.emb, s.emb_sq, ref, 25, False)), B)
timed("raw+refine(0.9,20)@B4096",
      lambda: np.asarray(probe_loop(qb, s.emb, s.emb_sq, ref, 25, True)), B)

timed("loop scan(0.95,40)@B4096", serve(qb, 0.95, 40), B)
timed("loop scan(0.95,20)@B4096", serve(qb, 0.95, 20), B)
timed("loop scan(0.9,20)@B4096", serve(qb, 0.9, 20), B)

qb8 = jax.device_put(q_np[:8192])
floor8 = measure_floor_qps(jax, s, q_np[:8192])
log(f"honest floor@B8192: {floor8:.0f} QPS")
timed("loop scan(0.9,20)@B8192", serve(qb8, 0.9, 20), 8192)
timed("loop scan(0.85,20)@B8192", serve(qb8, 0.85, 20), 8192)

log(f"summary: {sorted(results.items(), key=lambda kv: -kv[1])}")
log("session r4f done")
