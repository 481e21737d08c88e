"""Chip session r4d: decompose the served scan's overhead + honest recall.

r4c: tuned scan (rt=0.95, fetch=40) = 254k/261k QPS at B=4096/8192 under
a 583k/643k floor — but its recall ladder compared bf16-selection scan
against a bf16-selection 'exact' truth (both ~5% off f32 truth in
DIFFERENT ways), underestimating recall. And the served path runs ~2x
the raw fused extraction cost. This session:

1. f32-truth recall ladder: rt x fetch on B=256 vs an f32 searcher.
2. Same-window cost decomposition at B=4096:
     raw matmul+approx_min_k(rt,k)           (extraction only)
   + gather+re-score+argsort (refine)        (the recall recovery)
   = serving-equivalent, vs the full search_loop scan.
3. gather source A/B: re-score rows from f32 ref vs bf16 storage.

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r4d.py 2400
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
from bench import measure_floor_qps, recall_at_k  # noqa: E402

path = "/root/repo/data/bench_1000000x128.parquet"
ensure_bench_dataset(path)
index, col = read_index_from_parquet(path)
emb_np = read_embedding_column(path, col).data
n, d = emb_np.shape
rng = np.random.default_rng(3)
q_np = (emb_np[rng.integers(0, n, 4096)]
        + 0.05 * rng.standard_normal((4096, d))).astype(np.float32)

# f32 TRUTH searcher (recall oracle) + bf16 serving searcher.
s32 = DeviceIvfSearcher(index, emb_np, row_tile=4096)
s = DeviceIvfSearcher(index, emb_np, row_tile=4096, dtype=jnp.bfloat16)
del emb_np
qr = q_np[:256]
_, tids = s32.exact(qr, k=10)
truth = np.asarray(tids).tolist()
log("f32 exact truth ready")

# ---- 1. honest recall ladder (f32 truth) ----
for rt in (0.9, 0.95, 0.99):
    for fetch in (20, 40, 64):
        s.approx_recall_target = rt
        s.scan_overfetch = fetch
        _, ids_m = s.search(qr, 10, 8, mode="scan")
        rec = recall_at_k(truth, np.asarray(ids_m).tolist())
        log(f"recall rt={rt} fetch={fetch}: {rec:.4f}")
# f32-storage scan at the same configs (is bf16 storage the recall cap?)
for rt in (0.95,):
    for fetch in (20, 40):
        s32.approx_recall_target = rt
        s32.scan_overfetch = fetch
        _, ids_m = s32.search(qr, 10, 8, mode="scan")
        rec = recall_at_k(truth, np.asarray(ids_m).tolist())
        log(f"recall f32-storage rt={rt} fetch={fetch}: {rec:.4f}")

# ---- 2. cost decomposition at B=4096 ----
B = 4096
qb = q_np[:B]
results = {}


def timed(label, fn, args, budget=5.0, reps=25):
    try:
        np.asarray(fn(*args, reps))
        t0 = time.perf_counter()
        nn = 0
        while time.perf_counter() - t0 < budget and nn < 16 * reps:
            np.asarray(fn(*args, reps))
            nn += reps
        qps = nn * B / (time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001
        log(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return None
    results[label] = qps
    log(f"{label}: {B/qps*1e3:7.2f} ms/batch {qps:9.0f} QPS")
    return qps


K_FETCH = 40


@functools.partial(jax.jit, static_argnames=("reps", "refine", "rt"))
def probe_loop(q0, e, s_, ref, reps, refine, rt=0.95):
    def step(carry, _):
        qf = (q0 + 0.0 * carry).astype(e.dtype)
        part = s_[None, :] - 2.0 * jnp.dot(
            qf, e.T, preferred_element_type=jnp.float32
        )
        vals, idx = jax.lax.approx_min_k(part, K_FETCH, recall_target=rt)
        if refine:
            x = ref[jnp.maximum(idx, 0)].astype(jnp.float32)
            d2 = jnp.sum((x - q0[:, None, :]) ** 2, axis=-1)
            order = jnp.argsort(d2, axis=1, stable=True)
            d2 = jnp.take_along_axis(d2, order, axis=1)[:, :10]
            out = d2
        else:
            out = vals
        return carry + 0.0 * jnp.sum(out), out[:1, :1]

    c, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
    return ys[-1]


floor = measure_floor_qps(jax, s, qb)
log(f"honest floor@B4096: {floor:.0f} QPS")


def raw(q0, e, s_, ref, reps):
    return probe_loop(q0, e, s_, ref, reps, False)


def refined_f32(q0, e, s_, ref, reps):
    return probe_loop(q0, e, s_, ref, reps, True)


def refined_bf16(q0, e, s_, ref, reps):
    return probe_loop(q0, e, s_, e, reps, True)


timed("raw matmul+approx(0.95,40)", raw, (qb, s.emb, s.emb_sq, s.emb_sq))
timed("raw+refine(f32 ref)", refined_f32,
      (qb, s.emb, s.emb_sq, s._ref_or_emb()))
timed("raw+refine(bf16 rows)", refined_bf16,
      (qb, s.emb, s.emb_sq, s.emb_sq))


def serving(q0, _e, _s, _r, reps):
    return s.search_loop(q0, 10, 8, reps=reps, mode="scan")[0]


s.approx_recall_target = 0.95
s.scan_overfetch = 40
timed("full search_loop scan(0.95,40)", serving, (qb, None, None, None))

log(f"summary: {sorted(results.items(), key=lambda kv: -kv[1])}")
log("session r4d done")
