"""Quick on-chip check: mode="compact" + small-batch gather latency (1M set).

Run SOLO: timeout 1500 python -u scripts/compact_1m_check.py > log 2>&1
"""
import os, sys, time

sys.path.insert(0, "/root/repo")
t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)


import numpy as np
import jax


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


watchdog()
log(f"device alive ({jax.devices()})")

import jax.numpy as jnp
from pqvector_tpu.io.embed import read_index_from_parquet
from pqvector_tpu.io.reader import read_embedding_column
from pqvector_tpu.query.device import DeviceIvfSearcher

path = "/root/repo/data/bench_1000000x128.parquet"
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
log(f"loaded {emb.shape}")

rng = np.random.default_rng(7)
q = emb[rng.integers(0, len(emb), 256)] + 0.05 * rng.standard_normal(
    (256, 128)
).astype(np.float32)

s = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=True
)
truth = DeviceIvfSearcher(index, emb, row_tile=4096, cluster_sorted=True)
_, tids = truth.exact(q, 10)
tids = np.asarray(tids)
log("truth done")
del truth


def recall(ids):
    hits = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(ids), tids)
    )
    return hits / (len(tids) * 10)


ctile, cap, chunk = s._compact_params(256, 4, 10)
nt = s.emb.shape[0] // ctile
log(f"compact params: ctile={ctile} cap={cap}/{nt} ({cap/nt:.0%}) chunk={chunk}")

for mode in ("compact", "scan"):
    t0 = time.time()
    _, ids = s.search(q, 10, 4, mode=mode)
    ids = np.asarray(ids)
    log(f"mode={mode}: recall@10={recall(ids):.4f} (first call {time.time()-t0:.1f}s)")


def measure(mode, reps=10, budget_s=6.0):
    np.asarray(s.search_loop(q, 10, 4, reps=reps, mode=mode)[1])
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 8 * reps:
        _, ids = s.search_loop(q, 10, 4, reps=reps, mode=mode)
        np.asarray(ids)
        n += reps
    qps = n * 256 / (time.perf_counter() - t0)
    log(f"mode={mode} B=256: {qps:.0f} QPS ({256/qps*1e3:.2f} ms/batch)")


for mode in ("compact", "scan", "pallas"):
    measure(mode)

# ---- small-batch latency (VERDICT r2 item 2 baseline) ----------------
# Chained loop of single-batch searches in ONE dispatch: per-iteration
# device time = batch latency without the ~30 ms tunnel floor.
import functools
from pqvector_tpu.query.device import _ivf_topk_impl


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "tile", "reps"))
def gather_loop(q0, centroids, c_sq, clusters, embd, emb_sq, k, nprobe, tile, reps):
    def step(qq, _):
        d2, ids = _ivf_topk_impl(qq, centroids, c_sq, clusters, embd, emb_sq, k, nprobe, tile)
        link = jnp.where(jnp.isfinite(d2[:, :1]), d2[:, :1], 0.0)
        return q0 + 0.0 * link, (d2, ids)

    _, (d2s, idss) = jax.lax.scan(step, q0, None, length=reps)
    return d2s[-1], idss[-1]


for b in (1, 4, 16):
    qb = jnp.asarray(q[:b])
    reps = 50
    args = (qb, s.centroids, s.c_sq, s.clusters, s.emb, s.emb_sq)
    np.asarray(gather_loop(*args, k=10, nprobe=4, tile=2048, reps=reps)[1])
    t0 = time.perf_counter()
    calls = 0
    while time.perf_counter() - t0 < 5.0 and calls < 8:
        _, ids = gather_loop(*args, k=10, nprobe=4, tile=2048, reps=reps)
        np.asarray(ids)
        calls += 1
    dt = (time.perf_counter() - t0) / (calls * reps)
    log(f"gather B={b}: {dt*1e3:.2f} ms/batch device-side ({b/dt:.0f} QPS)")
log("done")
