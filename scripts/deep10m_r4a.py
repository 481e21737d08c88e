"""DEEP-10M: lift bincompact recall past 0.9504 via the nprobe knob.

Session G showed the residual bincompact recall loss is probed-union
misses, not bin collisions (unchanged under bin expansion). The union
grows sublinearly with nprobe at fixed B, so a higher nprobe should buy
recall at modest coverage growth. Sweep nprobe in {4, 6, 8, 12}:
recall@10, calibrated coverage, and same-window QPS vs scan at B=256/64.

Also reads the scan-mode fetch-width tradeoff on DEEP-10M (k_fetch 20
vs 40 vs policy 64) to confirm the 1M-set tuning transfers.

Run SOLO: bash scripts/tpu_run.sh scripts/deep10m_r4a.py 2400
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
truth_path = "/root/repo/data/deep10m_96.truth_seed7_b256.npy"
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
log("embeddings loaded")

rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, len(emb), 4096)] + 0.05 * rng.standard_normal(
    (4096, 96)
).astype(np.float32)

tids = np.load(truth_path)
log("truth loaded from cache")

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


def measure(mode, b, nprobe, reps=10, budget_s=6.0):
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
    log(f"  mode={mode} B={b} nprobe={nprobe}: {qps:.0f} QPS "
        f"({b/qps*1e3:.2f} ms/batch)")
    return qps


# ---- scan reference (nprobe-free) + (rt, fetch) tradeoff ----
# The 1M finding (r4e/r4f): narrow fetch + lower rt runs the fused
# extraction at the matmul+min floor; check the tradeoff transfers to
# 10M real-margin data (bf16 selection + f32 re-score reference).
for rt, kf in ((0.9, 20), (0.95, 20), (0.99, 20), (0.99, 40), (0.99, 0)):
    s16.approx_recall_target = rt
    s16.scan_overfetch = kf
    _, ids = s16.search(q_all[:256], 10, 4, mode="scan")
    log(f"scan rt={rt} kf={kf or 'policy'}: recall@10={recall(ids):.4f}")
    measure("scan", 256, 4, budget_s=6.0)
# Large-batch scan at the narrow operating point (round-2 best:
# 51.8k QPS @ B=4096; the 10M bf16 floor is ~100k at this shape).
s16.approx_recall_target = 0.9
s16.scan_overfetch = 20
measure("scan", 4096, 4, budget_s=8.0)
s16.approx_recall_target = 0.99
s16.scan_overfetch = 0

# ---- bincompact nprobe sweep ----
for nprobe in (4, 6, 8, 12):
    ct, cp = s16.calibrate_bincompact(q_all[:256], nprobe, 10)
    nt = int(s16.emb.shape[0]) // ct if ct else 0
    if not ct:
        log(f"nprobe={nprobe}: bincompact ineligible")
        continue
    log(f"nprobe={nprobe}: ctile={ct} cap={cp}/{nt} ({cp/max(nt,1):.0%})")
    _, ids = s16.search(q_all[:256], 10, nprobe, mode="bincompact")
    log(f"  bincompact recall@10: {recall(ids):.4f}")
    measure("bincompact", 256, nprobe)

# small-batch check at the best recall point
for b in (64,):
    for nprobe in (8,):
        s16.calibrate_bincompact(q_all[:b], nprobe, 10)
        _, ids = s16.search(q_all[:b], 10, nprobe, mode="bincompact")
        log(f"B={b} nprobe={nprobe} bincompact recall@10: "
            f"{recall(ids, nq=b):.4f}")
        measure("bincompact", b, nprobe, budget_s=5.0)
        measure("scan", b, nprobe, budget_s=5.0)

log("done")
