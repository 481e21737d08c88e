"""Chip session r4e: measure the in-jit loop finalize + tune (rt, fetch).

r4d decomposed the served scan at B=4096: raw matmul+approx(0.95,40)
9.20 ms, +refine 12.36 ms, full search_loop 16.89 ms — ~4.5 ms of
wrapper overhead (eager sqrt/map dispatches + per-call query upload).
Commit e4ac888 moved the finalize inside the loop jit and ships queries
once. This session:

1. honest floor @B4096/@B8192 (window health).
2. served search_loop scan(0.95,40) — the r4d config, expect ~12.4 ms.
3. (rt, fetch) ladder at B=4096: (0.85,20) (0.9,20) (0.95,20) (0.95,40)
   — refine gather scales with fetch; PartialReduce with rt.
4. the best two configs at B=8192.
5. f32-truth recall at B=256 for the cheap configs (r4d measured
   rt=0.9/20 -> 0.9793, rt=0.95/20 -> 0.9879; adds the missing 0.85).

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r4e.py 2400
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

import jax.numpy as jnp  # noqa: E402
from pqvector_tpu.io.embed import read_index_from_parquet  # noqa: E402
from pqvector_tpu.io.reader import read_embedding_column  # noqa: E402
from pqvector_tpu.query.device import DeviceIvfSearcher  # noqa: E402
from bench import measure_floor_qps, recall_at_k  # noqa: E402

path = "/root/repo/data/bench_1000000x128.parquet"
ensure_bench_dataset(path)
index, col = read_index_from_parquet(path)
emb_np = read_embedding_column(path, col).data
n, d = emb_np.shape
rng = np.random.default_rng(3)
q_np = (emb_np[rng.integers(0, n, 8192)]
        + 0.05 * rng.standard_normal((8192, d))).astype(np.float32)

s32 = DeviceIvfSearcher(index, emb_np, row_tile=4096)
s = DeviceIvfSearcher(index, emb_np, row_tile=4096, dtype=jnp.bfloat16)
del emb_np
qr = q_np[:256]
_, tids = s32.exact(qr, k=10)
truth = np.asarray(tids).tolist()
log("f32 exact truth ready")

# ---- recall at the candidate operating points (f32 truth, B=256) ----
for rt, fetch in ((0.85, 20), (0.9, 20), (0.95, 20), (0.95, 40)):
    s.approx_recall_target = rt
    s.scan_overfetch = fetch
    _, ids_m = s.search(qr, 10, 8, mode="scan")
    rec = recall_at_k(truth, np.asarray(ids_m).tolist())
    log(f"recall rt={rt} fetch={fetch}: {rec:.4f}")

results = {}


def timed_loop(label, searcher, qb_dev, rt, fetch, budget=5.0, reps=25):
    b = int(qb_dev.shape[0])
    searcher.approx_recall_target = rt
    searcher.scan_overfetch = fetch

    def call():
        _, ids = searcher.search_loop(qb_dev, 10, 8, reps=reps, mode="scan")
        np.asarray(ids)

    try:
        call()  # compile + warm at the SAME static reps
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


B = 4096
qb = jax.device_put(q_np[:B])
floor4096 = measure_floor_qps(jax, s, q_np[:B])
log(f"honest floor@B4096: {floor4096:.0f} QPS")

timed_loop("loop scan(0.95,40)@B4096", s, qb, 0.95, 40)
timed_loop("loop scan(0.95,20)@B4096", s, qb, 0.95, 20)
timed_loop("loop scan(0.9,20)@B4096", s, qb, 0.9, 20)
timed_loop("loop scan(0.85,20)@B4096", s, qb, 0.85, 20)

qb8 = jax.device_put(q_np[:8192])
floor8192 = measure_floor_qps(jax, s, q_np[:8192])
log(f"honest floor@B8192: {floor8192:.0f} QPS")
best = sorted(results.items(), key=lambda kv: -kv[1])[:2]
for label, _ in best:
    rt = float(label.split("(")[1].split(",")[0])
    fetch = int(label.split(",")[1].split(")")[0])
    timed_loop(f"loop scan({rt},{fetch})@B8192", s, qb8, rt, fetch)

log(f"summary: {sorted(results.items(), key=lambda kv: -kv[1])}")
log("session r4e done")
