"""Session r5d — BASELINE config 6 re-measured on the round-4/5 stack
(VERDICT r4 item 4): the reference-default workload, 1M x 1024-d,
K=100, NPROBE=16 (/root/reference/benches/query.rs:27-31). The round-2
numbers (405 QPS exact-selection / 1,761 approx) predate the entire
round-4 serving stack; K=100 routes around the fused Pallas paths
(k>32 -> XLA merge), so nothing after round 2 ever measured this shape.

Measures: recall@100 vs on-chip f32 exact truth, then QPS for
masked / scan (fetch >= K) at B=256/1024/4096 on the bf16 searcher,
against a same-window d=1024 matmul+min floor per batch size.

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r5d.py 3000
"""
import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import log, watchdog  # noqa: E402

import numpy as np  # noqa: E402

watchdog(600.0)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

log(f"device alive ({jax.devices()})")

from bench import measure_floor_qps, recall_at_k  # noqa: E402
from pqvector_tpu.io.embed import read_index_from_parquet  # noqa: E402
from pqvector_tpu.io.reader import read_embedding_column  # noqa: E402
from pqvector_tpu.query.device import DeviceIvfSearcher  # noqa: E402

K, NPROBE = 100, 16
path = "/root/repo/data/refdefault_1m_1024.parquet"
t0 = time.time()
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
rows, dim = emb.shape
log(f"decoded {rows}x{dim} in {time.time()-t0:.1f}s "
    f"(k={index.n_clusters})")

rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, rows, 4096)] + 0.05 * rng.standard_normal(
    (4096, dim)
).astype(np.float32)

# f32 exact ground truth at K=100 (one searcher at a time: 4 GB each).
# Cached to disk: a retried session must not pay the 331 s again.
truth_path = "/root/repo/data/refdefault_truth_seed7_k100_b256.npy"
if os.path.exists(truth_path):
    truth_ids = np.load(truth_path)
    log(f"f32 exact truth loaded from cache ({truth_ids.shape})")
else:
    watchdog(600.0)
    t0 = time.time()
    truth_s = DeviceIvfSearcher(index, emb, row_tile=4096, cluster_sorted=True)
    _, truth_ids = truth_s.exact(q_all[:256], K, mode="xla")
    truth_ids = np.asarray(truth_ids)
    log(f"f32 exact truth (256 queries, K={K}) in {time.time()-t0:.1f}s")
    np.save(truth_path, truth_ids)
    del truth_s
    gc.collect()

watchdog(600.0)
t0 = time.time()
s = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=True
)
log(f"bf16 searcher resident in {time.time()-t0:.1f}s "
    f"(f32 ref held: {s._emb_ref is not None})")

# Recall at the reference's own operating point.
for mode, npb in (("masked", NPROBE), ("scan", 1)):
    watchdog(300.0)
    try:
        _, ids = s.search(q_all[:256], K, npb, mode=mode)
        r = recall_at_k(truth_ids, np.asarray(ids))
        log(f"mode={mode} nprobe={npb}: recall@{K}={r:.4f}")
    except Exception as e:  # noqa: BLE001
        log(f"mode={mode} recall FAILED: {type(e).__name__}: {str(e)[:200]}")

# Scan with widened fetch if default recall missed (fetch >= K policy).
# First run measured rt=0.95/fetch=200 at 0.8254 (the clamped ApproxTopK
# fetch is too narrow for K=100 at d=1024) — probe wider fetches.
for rt, fetch in ((0.95, 200), (0.99, 400), (0.99, 800)):
    try:
        s.approx_recall_target = rt
        s.scan_overfetch = fetch
        _, ids = s.search(q_all[:256], K, 1, mode="scan")
        r_scan = recall_at_k(truth_ids, np.asarray(ids))
        log(f"mode=scan rt={rt} fetch={fetch}: recall@{K}={r_scan:.4f}")
        if r_scan >= 0.99:
            break
    except Exception as e:  # noqa: BLE001
        log(f"scan fetch={fetch} FAILED: {type(e).__name__}: {str(e)[:160]}")


def measure(mode, b, nprobe, reps=10, budget_s=6.0):
    qb = jax.device_put(np.ascontiguousarray(q_all[:b], np.float32))
    try:
        np.asarray(s.search_loop(qb, K, nprobe, reps=reps, mode=mode)[1])
    except Exception as e:  # noqa: BLE001
        log(f"mode={mode} B={b}: FAILED "
            f"({type(e).__name__}: {str(e)[:200]})")
        return None
    n = 0
    t1 = time.perf_counter()
    while time.perf_counter() - t1 < budget_s and n < 8 * reps:
        _, ids = s.search_loop(qb, K, nprobe, reps=reps, mode=mode)
        np.asarray(ids)
        n += reps
    qps = n * b / (time.perf_counter() - t1)
    log(f"mode={mode} B={b} nprobe={nprobe}: {qps:,.0f} QPS "
        f"({b/qps*1e3:.2f} ms/batch)")
    return qps


rng_f = np.random.default_rng(17)
for b in (256, 1024, 4096):
    watchdog(300.0)
    fq = emb[rng_f.integers(0, rows, b)].astype(np.float32)
    try:
        f = measure_floor_qps(jax, s, fq)
        log(f"B={b}: same-window d=1024 matmul+min floor = {f:,.0f} QPS")
    except Exception as e:  # noqa: BLE001
        log(f"B={b} floor FAILED: {type(e).__name__}: {str(e)[:160]}")
        log("worker presumably crashed; ending session with partial data")
        break
    measure("scan", b, 1)
    if b <= 256:
        # masked at B=1024 CRASHED the TPU worker on the first run
        # (10:05: per-chunk [B, chunk] score+mask temps at d=1024; the
        # whole later session died with it) — B=256 measured 225 QPS, so
        # nothing above B=256 is worth a worker.
        measure("masked", b, NPROBE)

# The round-2 comparison row: approx (ApproxTopK chunked) at B=256.
watchdog(300.0)
measure("approx", 256, NPROBE)
log("session r5d complete")
