"""Chip session C: binscan kernel validation + timing vs the scan mode.

Measures (VERDICT r2 item 6 follow-up): does the fused binned-min kernel
(kernels/binscan.py) close the PartialReduce extraction gap at B=4096
(floor 8.50 ms / scan 13.04 ms, scripts/mfu_push.py)?

Run SOLO: timeout 1800 python -u scripts/chip_session_r3c.py > log 2>&1
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] == {m}", flush=True)


import numpy as np


def watchdog(timeout_s=240.0):
    import threading

    done = threading.Event()

    def probe():
        import jax.numpy as jnp

        np.asarray(jnp.ones((8, 128)) + 1.0)
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        log(f"FATAL: device unresponsive after {timeout_s:.0f}s")
        os._exit(3)


import jax

watchdog()
log(f"device alive ({jax.devices()})")

import functools

import jax.numpy as jnp

from pqvector_tpu.kernels.binscan import pallas_binned_scan
from pqvector_tpu.query.device import (
    _exact_approx_topk_impl,
    _exact_topk_impl,
)

# ---- 1. Raw kernel timing at 1M x 128 --------------------------------
n, d, k = 1_048_576, 128, 10
PEAK_BF16 = 197e12

key = jax.random.PRNGKey(0)
emb_f32 = jax.random.normal(key, (n, d), dtype=jnp.float32)
emb = emb_f32.astype(jnp.bfloat16)
sq = jnp.sum(emb_f32 * emb_f32, axis=1)
log("data resident (bf16)")


@functools.partial(jax.jit, static_argnames=("reps", "b"))
def loop_floor(q0, e, s, reps, b):
    qf0 = q0.astype(jnp.bfloat16)

    def step(carry, _):
        scores = jnp.dot(qf0, e.T, preferred_element_type=jnp.float32)
        m = jnp.min(s[None, :] - 2.0 * scores, axis=1)
        return carry + 0.0 * m[0], m[:1]

    c, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
    return ys[-1]


@functools.partial(jax.jit, static_argnames=("reps", "b"))
def loop_scan(q0, e, s, reps, b):
    def step(q, _):
        d2, ids = _exact_approx_topk_impl(
            q, e, s, k=k, chunk=n, recall_target=0.99,
            score_dtype=jnp.float32,
        )
        link = jnp.where(jnp.isfinite(d2[:, :1]), d2[:, :1], 0.0)
        return q0 + 0.0 * link, d2[:1, :1]

    c, ys = jax.lax.scan(step, q0, None, length=reps)
    return ys[-1]


@functools.partial(jax.jit, static_argnames=("reps", "b"))
def loop_binscan(q0, e, s, reps, b):
    def step(q, _):
        d2, ids = pallas_binned_scan(q, e, s, k, tile=1024)
        link = jnp.where(jnp.isfinite(d2[:, :1]), d2[:, :1], 0.0)
        return q0 + 0.0 * link, d2[:1, :1]

    c, ys = jax.lax.scan(step, q0, None, length=reps)
    return ys[-1]


def timed(fn, label, b, reps=4, budget=8.0):
    q = jax.random.normal(jax.random.PRNGKey(b), (b, d), dtype=jnp.float32)
    np.asarray(fn(q, emb, sq, reps, b))  # compile + warm (same static reps)
    t0 = time.perf_counter()
    calls = 0
    while time.perf_counter() - t0 < budget and calls < 6:
        np.asarray(fn(q, emb, sq, reps, b))
        calls += 1
    dt = (time.perf_counter() - t0) / (calls * reps)
    qps = b / dt
    flops = 2.0 * n * d * qps
    log(
        f"{label} B={b}: {dt*1e3:7.2f} ms/batch {qps:9.0f} QPS "
        f"{flops/1e12:6.1f} TFLOP/s ({flops/PEAK_BF16:5.1%} bf16 peak)"
    )
    return dt


for b in (4096, 1024, 256):
    timed(loop_floor, "floor ", b)
    timed(loop_scan, "scan  ", b)
    timed(loop_binscan, "binscan", b)

# Selection quality on-chip (compiled Mosaic vs exact merge), B=256.
qb = jax.random.normal(jax.random.PRNGKey(9), (256, d), dtype=jnp.float32)
ex_d, ex_i = jax.jit(
    functools.partial(_exact_topk_impl, k=k, tile=2048)
)(qb, emb, sq)
ex_i = np.asarray(ex_i)
bs_d, bs_i = jax.jit(
    functools.partial(pallas_binned_scan, k=k, tile=1024)
)(qb, emb, sq)
bs_i = np.asarray(bs_i)
hits = sum(len(set(a.tolist()) & set(bb.tolist())) for a, bb in zip(bs_i, ex_i))
log(f"binscan on-chip recall@{k} vs exact: {hits/(256*k):.4f}")
err = float(jnp.max(jnp.abs(jnp.sqrt(bs_d) - jnp.sqrt(np.asarray(ex_d)))
                    * (bs_i == ex_i)))
log(f"matched-slot distance err: {err:.3e}")

# ---- 2. Searcher-level integration on-chip (clustered data) ----------
from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index
from pqvector_tpu.query.device import DeviceIvfSearcher

rng = np.random.default_rng(0)
n2, b2 = 200_000, 256
modes = rng.uniform(-1, 1, (64, d)).astype(np.float32)
emb2 = (modes[rng.integers(0, 64, n2)]
        + 0.15 * rng.standard_normal((n2, d))).astype(np.float32)
index = build_ivf_index(Embeddings(emb2, d), IvfBuildConfig(n_clusters=128, seed=1))
s2 = DeviceIvfSearcher(index, emb2, cluster_sorted=True)
qrows = rng.integers(0, n2, b2)
q2 = (emb2[qrows] + 0.05 * rng.standard_normal((b2, d))).astype(np.float32)
_, ix = s2.exact(q2, k, mode="xla")
ix = np.asarray(ix)
db, ib = s2.exact(q2, k, mode="binscan")
ib = np.asarray(ib)
hits = sum(len(set(a.tolist()) & set(bb.tolist())) for a, bb in zip(ib, ix))
log(f"searcher binscan recall vs exact (clustered, sorted): {hits/(b2*k):.4f}")
log(f"top-1 source-row rate: {float((ib[:, 0] == qrows).mean()):.4f}")
ld, li = s2.search_loop(q2, k, nprobe=4, reps=3, mode="binscan")
log(f"search_loop agreement: {float((np.asarray(li) == ib).mean()):.4f}")

# ---- 3. bench.py --smoke (full driver flow incl. binscan sweep) ------
log("START bench.py --smoke")
src = open("/root/repo/bench.py").read()
sys.argv = ["bench.py", "--smoke"]
g = {"__name__": "__main__", "__file__": "bench.py"}
try:
    exec(compile(src, "bench.py", "exec"), g)
except SystemExit as e:
    log(f"bench exit {e.code}")
log("DONE bench.py --smoke")
log("session complete")
