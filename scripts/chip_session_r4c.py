"""Chip session r4c: close the (honest) extraction gap in the SERVED scan.

Session r4b re-based the problem: the true floor is 464k/571k QPS at
B=4096/8192 (60.5/74.4% MFU — the old 589-635k floors were DCE-inflated),
key-packing is free, every grouped-output epilogue crashes the backend
compiler, and a raw fused approx_min_k(rt=0.95, k=64) runs 389k/426k —
within ~16% of the floor. The served scan's remaining gap is therefore
recall_target=0.99 + fetch width + plumbing. Ladder, same-window:

  honest floor -> scan(rt in {0.85, 0.95, 0.99}) at B=4096
  -> best rt with fetch 40 -> B=8192 for the winners -> binscan ref
  with recall@10 vs device-exact per config (256-query sample).

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r4c.py 2400
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
s = DeviceIvfSearcher(index, emb_np, row_tile=4096, dtype=jnp.bfloat16)
del emb_np
log(f"resident (bf16 + f32 ref); n_pad={int(s.emb.shape[0])}")

REPS = 25
PEAK = 197e12
results = {}

qr = q_np[:256]
_, ids_t = s.exact(qr, k=10)
truth = np.asarray(ids_t).tolist()
log("device-exact truth ready (B=256)")


def qps_of(mode, qb, budget=5.0):
    b = qb.shape[0]
    np.asarray(s.search_loop(qb, 10, 8, reps=REPS, mode=mode)[1])
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < budget and reps < 16 * REPS:
        _, ids = s.search_loop(qb, 10, 8, reps=REPS, mode=mode)
        np.asarray(ids)
        reps += REPS
    return reps * b / (time.perf_counter() - t0)


def measure(label, mode, qb):
    try:
        qps = qps_of(mode, qb)
    except Exception as e:  # noqa: BLE001
        log(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return None
    mfu = 2.0 * n * d * qps / PEAK
    results[label] = qps
    log(f"{label}: {qb.shape[0]/qps*1e3:7.2f} ms/batch {qps:9.0f} QPS "
        f"(MFU {mfu:5.1%})")
    return qps


for B in (4096, 8192):
    fq = q_np[:B]
    floor = measure_floor_qps(jax, s, fq)
    log(f"honest floor@B{B}: {floor:.0f} QPS "
        f"(MFU {2.0*n*d*floor/PEAK:5.1%})")
    results[f"floor@B{B}"] = floor

grid = [(0.85, 0), (0.95, 0), (0.99, 0), (0.85, 40), (0.95, 40)]
best = (None, -1.0)
for rt, fetch in grid:
    s.approx_recall_target = rt
    s.scan_overfetch = fetch
    _, ids_m = s.search(qr, 10, 8, mode="scan")
    rec = recall_at_k(truth, np.asarray(ids_m).tolist())
    qps = measure(f"scan rt={rt} fetch={fetch or 'policy'}@B4096",
                  "scan", q_np[:4096])
    log(f"  recall@10={rec:.4f}")
    if qps and rec >= 0.95 and qps > best[1]:
        best = ((rt, fetch), qps)

if best[0]:
    rt, fetch = best[0]
    s.approx_recall_target = rt
    s.scan_overfetch = fetch
    measure(f"scan rt={rt} fetch={fetch or 'policy'}@B8192",
            "scan", q_np[:8192])
s.approx_recall_target = 0.99
s.scan_overfetch = 0
measure("binscan@B4096", "binscan", q_np[:4096])
measure("binscan@B8192", "binscan", q_np[:8192])

# autoscan routing sanity in this window
try:
    route = s.scan_route(qr, 10, budget_s=1.0, force=True)
    rep = s._weather[1]
    log(f"autoscan route: {route} (floor={rep.floor_qps:.0f}, "
        f"extract={rep.extract_qps:.0f}, frac={rep.extract_frac:.2f})")
except Exception as e:  # noqa: BLE001
    log(f"autoscan probe FAILED: {e}")

log(f"summary: {sorted(results.items(), key=lambda kv: -kv[1])}")
log(f"best gated scan config: {best}")
log("session r4c done")
