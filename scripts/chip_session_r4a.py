"""Chip session r4a: validate + ladder mode="tilescan" (VERDICT r4 item 1).

The round-3 verdict: scan serves 35.7% MFU while the same-window
matmul+min floor runs 76.6-82.5% — extraction is the gap. tilescan folds
each contiguous tile of rows to its argmin (packed int32 keys) with a
minor-axis reduce — the SAME fused shape as the floor — leaving only a
[B, n/tile] top_k. Ladder (all same-window, chained-loop timing):

  floor -> tilescan (auto-chunk / forced-fused / tile 128/256/512)
        -> scan -> binscan, at B=4096 then B=8192 (VERDICT item 6).

Plus an on-chip recall check vs the device-exact truth. A fully clean
run persists scripts/.tilescan_validated (admits the mode to bench auto).

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r4a.py 1800
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
from bench import recall_at_k  # noqa: E402

path = "/root/repo/data/bench_1000000x128.parquet"
ensure_bench_dataset(path)
index, col = read_index_from_parquet(path)
emb_np = read_embedding_column(path, col).data
rng = np.random.default_rng(3)
q_np = (emb_np[rng.integers(0, len(emb_np), 8192)]
        + 0.05 * rng.standard_normal((8192, 128))).astype(np.float32)
s = DeviceIvfSearcher(index, emb_np, row_tile=4096, dtype=jnp.bfloat16)
del emb_np
log(f"resident (bf16 + f32 ref, orig order); n_pad={int(s.emb.shape[0])}")

REPS = 25
PEAK_BF16 = 197e12
n, d = 1_000_000, 128
results = {}
failures = []


def timed(label, fn, qb, budget=6.0):
    """Chained-loop timing (bench.py methodology): warm with the SAME
    reps, then sustained batches/second over a wall budget."""
    b = qb.shape[0]
    try:
        np.asarray(fn(qb, REPS)[1])  # compile + warm
        t0 = time.perf_counter()
        reps = 0
        while time.perf_counter() - t0 < budget and reps < 16 * REPS:
            _, ids = fn(qb, REPS)
            np.asarray(ids)
            reps += REPS
        qps = reps * b / (time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001 — keep laddering
        log(f"{label}: FAILED {type(e).__name__}: {e}")
        failures.append(label)
        return None
    mfu = 2.0 * n * d * qps / PEAK_BF16
    log(f"{label}: {b / qps * 1e3:7.2f} ms/batch  {qps:9.0f} QPS  "
        f"(MFU {mfu:5.1%})")
    results[label] = qps
    return qps


@functools.partial(jax.jit, static_argnames=("reps",))
def floor_loop(q0, e, sq, reps):
    qf0 = q0.astype(e.dtype)

    def step(carry, _):
        scores = jnp.dot(qf0, e.T, preferred_element_type=jnp.float32)
        part = sq[None, :] - 2.0 * scores
        m = jnp.min(part, axis=1)
        return carry + 0.0 * m[0], m[:1]

    c, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
    return ys[-1], ys[-1]


def mode_loop(mode):
    def fn(qb, r):
        return s.search_loop(qb, 10, 8, reps=r, mode=mode)

    return fn


# ---- recall first (B=256; cheap, proves correctness on hardware) ----
qr = q_np[:256]
_, ids_t = s.exact(qr, k=10)  # device-exact truth (stream kernel)
truth = np.asarray(ids_t)
_, ids_m = s.search(qr, k=10, nprobe=8, mode="tilescan")
rec = recall_at_k(truth.tolist(), np.asarray(ids_m).tolist())
log(f"tilescan recall@10 vs device-exact (B=256): {rec:.4f}")

# ---- B=4096 ladder ----
for B in (4096, 8192):
    qb = q_np[:B]
    timed(f"floor@B{B}", lambda q0, r: floor_loop(q0, s.emb, s.emb_sq, r),
          qb)
    s.tilescan_chunk_rows = 0  # auto (2 GiB budget -> lax.scan steps)
    s.tilescan_tile = 0  # auto 128
    timed(f"tilescan-auto-t128@B{B}", mode_loop("tilescan"), qb)
    s.tilescan_chunk_rows = -1  # forced one fused call (floor-shaped)
    timed(f"tilescan-fused-t128@B{B}", mode_loop("tilescan"), qb)
    for t in (256, 512):
        s.tilescan_tile = t
        timed(f"tilescan-fused-t{t}@B{B}", mode_loop("tilescan"), qb)
    s.tilescan_tile = 0
    s.tilescan_chunk_rows = 0
    timed(f"scan@B{B}", mode_loop("scan"), qb)
    if B == 4096:
        timed(f"binscan@B{B}", mode_loop("binscan"), qb)

best_t = {k: v for k, v in results.items() if k.startswith("tilescan")}
log(f"summary: {sorted(results.items(), key=lambda kv: -kv[1])}")

ok = rec >= 0.95 and best_t and not any(
    f.startswith("tilescan-auto") or f.startswith("tilescan-fused-t128")
    for f in failures
)
if ok:
    marker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".tilescan_validated")
    with open(marker, "w") as f:
        f.write(
            f"validated {time.strftime('%Y-%m-%d %H:%M:%S')} on "
            f"{jax.devices()} recall={rec:.4f} "
            f"best={max(best_t, key=best_t.get)}\n"
        )
    log(f"marker written: {marker}")
else:
    log(f"NOT validated (recall={rec:.4f}, failures={failures})")
log("session r4a done")
