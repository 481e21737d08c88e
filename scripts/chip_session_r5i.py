"""Session r5i — reworked cert pass-2 (tile-granular gathers) end-to-end.

r5g measured the row-granular pass-2 at ~27x the same-window floor
(cert(high) B=1024 = 924 QPS vs a 25.5k floor, SLOWER than plain exact in
the same window). Commit 0b23453 reworks pass-2 to gather whole tiles as
(1, tile, d) slices. This session re-validates identity on chip, then
attributes the loop cost: same-window floor, pass-1-only chained loop
(tile-min fold + top-m selection — the part r5f measured at 86% of
floor single-dispatch), full cert loop, and plain exact, at B=256/1024.

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r5i.py 2400
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import log, watchdog, ensure_bench_dataset  # noqa: E402

import numpy as np  # noqa: E402

watchdog(900.0)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

log(f"device alive ({jax.devices()})")

from bench import measure_floor_qps  # noqa: E402
from pqvector_tpu.io.embed import read_index_from_parquet  # noqa: E402
from pqvector_tpu.io.reader import read_embedding_column  # noqa: E402
from pqvector_tpu.query import device as dev  # noqa: E402
from pqvector_tpu.query.device import DeviceIvfSearcher  # noqa: E402

path = ensure_bench_dataset("/root/repo/data/bench_1000000x128.parquet")
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
rows, dim = emb.shape
log(f"embeddings loaded ({rows}x{dim})")

rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, rows, 1024)] + 0.05 * rng.standard_normal(
    (1024, dim)
).astype(np.float32)

s = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=True
)
n_pad = int(s.emb.shape[0])
tile = s._cert_tile_checked(10)
m = max(2 * 10, 16)
log(f"bf16 searcher resident (n_pad={n_pad}, cert tile={tile}, m={m})")


def timed(fn_reps, qb, reps=25, budget_s=5.0, tag=""):
    try:
        np.asarray(fn_reps(qb, reps))
    except Exception as e:  # noqa: BLE001
        log(f"{tag}: FAILED ({type(e).__name__}: {str(e)[:200]})")
        return None
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 16 * reps:
        np.asarray(fn_reps(qb, reps))
        n += reps
    b = qb.shape[0]
    qps = n * b / (time.perf_counter() - t0)
    log(f"{tag}: {qps:,.0f} QPS ({b / qps * 1e3:.3f} ms/batch)")
    return qps


# ---- identity + certify rates (tile-granular pass-2) -------------------
watchdog(600.0)
de, ie = s.exact(q_all[:256], 10, mode="xla")
ie = np.asarray(ie)
for p1 in ("highest", "high"):
    s.cert_pass1 = p1
    dc, ic = s.exact(q_all[:256], 10, mode="cert")
    same = np.array_equal(np.asarray(ic), ie)
    log(f"identity cert({p1}) vs xla: ids_equal={same}")
    rate, margins = s.cert_probe(q_all[:256], 10)
    log(f"cert_probe({p1}): rate={rate:.4f} "
        f"min_margin={float(np.min(margins)):.4f}")

# ---- m sweep: smaller fetch-tile budgets cut pass-2's gather bytes ------
# proportionally; the certificate (threshold = (m+1)-th tile-min) still
# guarantees exactness — only the fallback rate pays if m is too greedy.
s.cert_pass1 = "high"
m_pick = 0  # 0 = auto (max(2k, 16) = 20)
for m_try in (8, 12, 16):
    s.cert_fetch_tiles = m_try
    rate, margins = s.cert_probe(q_all[:256], 10)
    log(f"cert_probe(high, m={m_try}): rate={rate:.4f} "
        f"min_margin={float(np.min(margins)):.4f}")
    if rate == 1.0 and m_pick == 0:
        m_pick = m_try
s.cert_fetch_tiles = 0


# ---- pass-1-only chained loop (attribution) -----------------------------
@functools.partial(jax.jit, static_argnames=("tile", "m", "reps", "high"))
def pass1_loop(q0, ref, emb_sq, tile, m, reps, high):
    def step(q, _):
        bv = dev._tile_min_vals(q, ref, emb_sq, tile, 0, high=high)
        vals, tidx = dev._topk_min_wide(bv, m + 1)
        return q0 + 0.0 * vals[:, :1], (vals[:, m], tidx[:, 0])

    _, (tv, ti) = jax.lax.scan(step, q0, None, length=reps)
    return tv[-1] + 0.0 * ti[-1].astype(jnp.float32)


# ---- QPS: floor / pass1 / cert / auto, same window ----------------------
results = {}
for b in (256, 1024):
    watchdog(600.0)
    floor = measure_floor_qps(jax, s, q_all[:b])
    log(f"B={b}: same-window matmul+min floor = {floor:,.0f} QPS")
    qb = jax.device_put(np.ascontiguousarray(q_all[:b], np.float32))
    timed(
        lambda qq, r: pass1_loop(qq, s._emb_ref, s.emb_sq, tile, m, r, True),
        qb, tag=f"pass1-only(high) loop B={b}",
    )
    for p1 in ("high", "highest"):
        s.cert_pass1 = p1
        q = timed(
            lambda qq, r: s.exact_loop(qq, 10, reps=r, mode="cert")[1],
            qb, tag=f"exact_loop cert({p1}) B={b}",
        )
        results[(b, p1)] = q
    s.cert_pass1 = "high"
    s.cert_pass2 = "scan"  # contest the bounded-temp per-tile-step form
    q = timed(
        lambda qq, r: s.exact_loop(qq, 10, reps=r, mode="cert")[1],
        qb, tag=f"exact_loop cert(high, pass2=scan) B={b}",
    )
    results[(b, "scan2")] = q
    s.cert_pass2 = "auto"
    if m_pick:
        s.cert_fetch_tiles = m_pick
        q = timed(
            lambda qq, r: s.exact_loop(qq, 10, reps=r, mode="cert")[1],
            qb, tag=f"exact_loop cert(high, m={m_pick}) B={b}",
        )
        results[(b, f"m{m_pick}")] = q
        s.cert_fetch_tiles = 0
    timed(
        lambda qq, r: s.exact_loop(qq, 10, reps=r, mode="auto")[1],
        qb, tag=f"exact_loop auto B={b}",
    )

best1024 = max(
    (v for (b, _), v in results.items() if b == 1024 and v), default=0.0
)
log(f"B=1024 best cert exact: {best1024:,.0f} QPS (target >=60k: "
    f"{best1024 >= 60000})")
log("session r5i complete")
