"""Chip session r4o: validate the top_k refine on the served scan path.

r4n pinned the [B, fetch] stable argsort in _refine_and_sort as the
single largest cost over the matmul+min floor (+2.7 ms at B=8192 vs
+0.7 ms for index-stable lax.top_k). The refine now trims to k via
top_k (out_k). Expected: served search_loop scan ~18.5 -> ~16.5 ms at
B=8192 (~490k QPS) in an r4n-class window.

Measures: floor, served scan at B=4096/8192, binscan at B=4096
(the degraded-window route also got the trim), recall@10 vs f32 truth.

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r4o.py 1800
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

K = 10
qt = q_np[:256]
scores = -2.0 * (qt @ emb_np.T) + (emb_np * emb_np).sum(1)[None, :]
truth = [set(row.tolist())
         for row in np.argpartition(scores, K, axis=1)[:, :K]]
del scores, emb_np
log("resident + truth ready")

RT, KF = 0.9, 20
s.approx_recall_target = RT
s.scan_overfetch = KF
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


for B in (8192, 4096):
    qb = jax.device_put(q_np[:B])
    floor = measure_floor_qps(jax, s, q_np[:B])
    log(f"honest floor@B{B}: {floor:.0f} QPS ({B/floor*1e3:.2f} ms)")

    def serve(mode, qq=qb):
        _, ids = s.search_loop(qq, K, 8, reps=25, mode=mode)
        np.asarray(ids)

    timed(f"B{B} served scan", lambda: serve("scan"), B)
    if B == 4096:
        timed(f"B{B} served binscan", lambda: serve("binscan"), B)

# recall + id sanity vs f32 truth
qt_dev = jax.device_put(qt)
for mode in ("scan", "binscan"):
    _, ids = s.search_loop(qt_dev, K, 8, reps=1, mode=mode)
    ids = np.asarray(ids)
    rec = np.mean([len(set(r.tolist()) & t) / K for r, t in zip(ids, truth)])
    log(f"recall@10 {mode} (rt={RT}, fetch={KF}): {rec:.4f}")

log(f"summary: {sorted(results.items(), key=lambda kv: -kv[1])}")
log("session r4o done")
