"""DEEP-10M round-3: compact mode (probed-union compaction + PartialReduce)
vs stream/scan at B=256/1024 (VERDICT r3 item 1 target: compact >= scan).

Run SOLO: timeout 3000 python -u scripts/deep10m_r3.py > log 2>&1
"""
import os, sys, time, gc

sys.path.insert(0, "/root/repo")
t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


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

path = "/root/repo/data/deep10m_96.parquet"
index, col = read_index_from_parquet(path)
log(f"index k={index.n_clusters} rows={index.total_rows}")
emb = read_embedding_column(path, col).data
log("embeddings loaded")

rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, len(emb), 1024)] + 0.05 * rng.standard_normal(
    (1024, 96)
).astype(np.float32)

truth = DeviceIvfSearcher(index, emb, row_tile=4096)  # f32, unsorted
t0 = time.time()
_, tids = truth.exact(q_all[:256], 10)
tids = np.asarray(tids)
log(f"truth exact 256q: {time.time()-t0:.1f}s")
del truth
gc.collect()

s16 = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=True
)
del emb
gc.collect()
log("bf16 cluster-sorted searcher resident")


def recall(ids):
    hits = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(ids), tids)
    )
    return hits / (len(tids) * 10)


nprobe = 4  # round-2 recall at nprobe=4 was 0.9918

ctile, cap, chunk = s16._compact_params(256, nprobe, 10)
nt = s16.emb.shape[0] // ctile
log(f"compact params B=256: ctile={ctile} cap={cap}/{nt} ({cap/nt:.0%}) chunk={chunk}")

for mode in ("compact", "scan"):
    t0 = time.time()
    _, ids = s16.search(q_all[:256], 10, nprobe, mode=mode)
    r = recall(ids)
    log(f"mode={mode}: recall@10={r:.4f} (first call {time.time()-t0:.1f}s)")


def measure(mode, b, reps=10, budget_s=8.0):
    qb = q_all[:b]
    try:
        np.asarray(s16.search_loop(qb, 10, nprobe, reps=reps, mode=mode)[1])
    except Exception as e:
        log(f"mode={mode} B={b}: failed ({type(e).__name__}: {e})")
        return None
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 8 * reps:
        _, ids = s16.search_loop(qb, 10, nprobe, reps=reps, mode=mode)
        np.asarray(ids)
        n += reps
    qps = n * b / (time.perf_counter() - t0)
    log(f"mode={mode} B={b}: {qps:.0f} QPS ({b/qps*1e3:.1f} ms/batch)")
    return qps


for mode in ("compact", "scan", "stream"):
    measure(mode, 256)
for mode in ("compact", "scan"):
    measure(mode, 1024)

# Small-batch regime: the union shrinks with B, so compact's n-sublinear
# traffic should win where scan stays ~flat per batch.
for b in (16, 64, 128):
    ctile_b, cap_b, _ = s16._compact_params(b, nprobe, 10)
    log(f"B={b}: compact cap={cap_b}/{nt} ({cap_b/nt:.0%})")
    for mode in ("compact", "scan"):
        measure(mode, b, budget_s=5.0)
log("done")
