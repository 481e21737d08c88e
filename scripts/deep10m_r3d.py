"""DEEP-10M: bincompact (probed-union selection + fused binned-min scan
in place) vs compact/scan (VERDICT r2 item 1: exact-selection IVF must beat
the brute ApproxTopK scan at B=256, >= ~28k QPS at recall >= 0.95).

Round-3 state: compact = 13.7 ms/batch at B=256 (gather+extract, 3 HBM
passes over the covered fraction), scan = 8.7 ms (full-array ApproxTopK).
bincompact streams the selected tiles through the binscan kernel once, so
predicted time ~ coverage * binscan-full-scan time + selection overhead.

Run SOLO: bash scripts/tpu_run.sh scripts/deep10m_r3d.py 2400
"""
import gc
import os
import sys
import time

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


def recall(ids, nq=256):
    hits = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(ids), tids[:nq])
    )
    return hits / (nq * 10)


nprobe = 4  # round-2 recall at nprobe=4 was 0.9918

for b in (256, 64, 16):
    ctile_f, cap_f = s16._compact_bin_params(b, nprobe, 10)
    ctile_b, cap_b = s16.calibrate_bincompact(q_all[:b], nprobe, 10)
    if ctile_b:
        nt_b = int(s16.emb.shape[0]) // ctile_b
        log(
            f"bincompact B={b}: calibrated ctile={ctile_b} cap={cap_b}/{nt_b} "
            f"({cap_b/nt_b:.0%}); formula said "
            f"{cap_f}/{int(s16.emb.shape[0])//ctile_f if ctile_f else 0}"
        )
    else:
        log(f"bincompact B={b}: INELIGIBLE")
s16.calibrate_bincompact(q_all[:256], nprobe, 10)

# Recall first (one dispatch each), then loop throughput.
for mode in ("bincompact", "compact", "scan"):
    t0 = time.time()
    try:
        _, ids = s16.search(q_all[:256], 10, nprobe, mode=mode)
        r = recall(ids)
        log(f"mode={mode}: recall@10={r:.4f} (first call {time.time()-t0:.1f}s)")
    except Exception as e:
        log(f"mode={mode}: FAILED {type(e).__name__}: {e}")


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
    log(f"mode={mode} B={b}: {qps:.0f} QPS ({b/qps*1e3:.2f} ms/batch)")
    return qps


results = {}
for b in (256, 1024, 64, 16):
    s16.calibrate_bincompact(q_all[:b], nprobe, 10)
    for mode in ("bincompact", "compact", "scan"):
        results[(mode, b)] = measure(mode, b, budget_s=8.0 if b >= 256 else 5.0)

win = results.get(("bincompact", 256)) or 0
sc = results.get(("scan", 256)) or 1
log(f"VERDICT-1 check: bincompact/scan at B=256 = {win/sc:.2f}x")
log("done")
