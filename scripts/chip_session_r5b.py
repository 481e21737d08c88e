"""Session r5b — cert cost-structure profiling + storage pass-1 at the
bench shape, and per-batch small-batch floors (VERDICT r5 items 1 and 5).

r5a measured cert(highest) at 13.2k QPS @B1024 against a ~79k pass-1-only
roofline — a 6x gap with unknown attribution (and "auto" at 5.5k suggests
a degraded window). This session times each cert stage separately:
  pass1       = _tile_min_keys only (the 1M-row matmul + fused tile fold)
  pass1+topk  = + _topk_min_wide (the [B, 7813] wide top-(m+1))
  full cert   = exact_loop mode="cert"
for cert_pass1 in (highest, storage), next to the same-window matmul+min
floor at each batch size. Also probes certify rates (cert_probe) and the
m_tiles knob, and measures the scan serving point per batch for the
small-batch floor fractions.

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r5b.py 2400
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import log, watchdog, ensure_bench_dataset  # noqa: E402

import numpy as np  # noqa: E402

watchdog(600.0)
import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

log(f"device alive ({jax.devices()})")

from pqvector_tpu.io.embed import read_index_from_parquet  # noqa: E402
from pqvector_tpu.io.reader import read_embedding_column  # noqa: E402
from pqvector_tpu.query.device import (  # noqa: E402
    DeviceIvfSearcher,
    _tile_min_keys,
    _topk_min_wide,
)

path = ensure_bench_dataset("/root/repo/data/bench_1000000x128.parquet")
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
rows, dim = emb.shape
log(f"embeddings loaded ({rows}x{dim})")

rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, rows, 4096)] + 0.05 * rng.standard_normal(
    (4096, dim)
).astype(np.float32)

s = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=True
)
log("bf16 searcher resident")


def timed_loop(fn_reps, qb, reps=25, budget_s=5.0, tag=""):
    """fn_reps(q, reps) -> array; chained inside one dispatch."""
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


@functools.partial(jax.jit, static_argnames=("reps", "tile", "m", "topk"))
def pass1_loop(q0, src, sq, reps, tile, m, topk):
    def step(carry, _):
        qf = q0 + carry
        keys = _tile_min_keys(qf, src, sq, tile, 0)
        if topk:
            kv, _ = _topk_min_wide(keys, m + 1)
            link = kv[:, 0].astype(jnp.float32) * 0.0
        else:
            link = keys[:, 0].astype(jnp.float32) * 0.0
        return jnp.sum(link) * 0.0, link[:1]

    _, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
    return ys[-1]


from bench import measure_floor_qps  # noqa: E402

ref = s._ref()
for b in (256, 1024):
    watchdog(300.0)
    qb = jax.device_put(np.ascontiguousarray(q_all[:b]))
    fq = emb[rng.integers(0, rows, b)].astype(np.float32)
    f = measure_floor_qps(jax, s, fq)
    log(f"B={b}: same-window matmul+min floor = {f:,.0f} QPS")
    # pass 1 over the f32 reference (HIGHEST) vs bf16 storage (DEFAULT).
    timed_loop(
        lambda q, r: pass1_loop(q, ref, s.emb_sq, r, 128, 20, False),
        qb, tag=f"B={b} pass1(f32 HIGHEST)",
    )
    timed_loop(
        lambda q, r: pass1_loop(q, s.emb, s.emb_sq, r, 128, 20, False),
        qb, tag=f"B={b} pass1(bf16 storage)",
    )
    timed_loop(
        lambda q, r: pass1_loop(q, s.emb, s.emb_sq, r, 128, 20, True),
        qb, tag=f"B={b} pass1+widetopk(bf16)",
    )

# Certify rates for each pass-1 mode (single dispatch, 256 queries).
watchdog(300.0)
for p1 in ("highest", "high", "storage"):
    s.cert_pass1 = p1
    try:
        rate, margins = s.cert_probe(q_all[:256], 10)
        log(f"cert_probe({p1}): rate={rate:.4f} "
            f"margin[min/med]={margins.min():.3f}/{np.median(margins):.3f}")
    except Exception as e:  # noqa: BLE001
        log(f"cert_probe({p1}) FAILED: {type(e).__name__}: {str(e)[:200]}")

# Full cert serving: storage pass-1 vs highest, m sweep at B=1024.
for b in (256, 1024, 4096):
    watchdog(300.0)
    qb = jax.device_put(np.ascontiguousarray(q_all[:b]))
    for p1 in ("storage", "highest"):
        s.cert_pass1 = p1
        timed_loop(
            lambda q, r: s.exact_loop(q, 10, reps=r, mode="cert")[1],
            qb, tag=f"B={b} cert({p1}, m=auto)",
        )
    s.cert_pass1 = "storage"
    for m in (12, 32):
        s.cert_fetch_tiles = m
        timed_loop(
            lambda q, r: s.exact_loop(q, 10, reps=r, mode="cert")[1],
            qb, tag=f"B={b} cert(storage, m={m})",
        )
    s.cert_fetch_tiles = 0

# Identity check for the storage pass-1 on chip (the new code path).
watchdog(300.0)
s.cert_pass1 = "storage"
de, ie = s.exact(q_all[:256], 10, mode="xla")
dc, ic = s.exact(q_all[:256], 10, mode="cert")
same = np.array_equal(np.asarray(ic), np.asarray(ie))
log(f"identity cert(storage) vs xla: ids_equal={same}")

# Scan serving point per batch (small-batch fractions vs floors above).
s_scan = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=False
)
s_scan.approx_recall_target = 0.9
s_scan.scan_overfetch = 20
for b in (256, 1024):
    watchdog(300.0)
    qb = jax.device_put(np.ascontiguousarray(q_all[:b]))
    timed_loop(
        lambda q, r: s_scan.search_loop(q, 10, 1, reps=r, mode="scan")[1],
        qb, tag=f"B={b} scan(rt=0.9,fetch=20)",
    )
log("session r5b complete")
