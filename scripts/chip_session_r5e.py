"""Session r5e — BASELINE config 3 re-measured on the round-4/5 stack
(VERDICT r4 item 4): GloVe-shaped cosine, 1.2M x 100, IVF-2048,
normalized vectors. The standing numbers (285k QPS @B4096) are round-2
measurements that predate the tuned scan knobs (rt=0.9, fetch=2k), the
in-jit finalize, binscan and the per-batch floor discipline.

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r5e.py 3000
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

from bench import measure_floor_qps  # noqa: E402
from pqvector_tpu.bench.datasets import (  # noqa: E402
    synthetic_embeddings,
    write_embedding_parquet,
)
from pqvector_tpu.builder import IndexBuilder, has_pq_vector_index  # noqa: E402
from pqvector_tpu.io.embed import read_index_from_parquet  # noqa: E402
from pqvector_tpu.io.reader import read_embedding_column  # noqa: E402
from pqvector_tpu.query.device import DeviceIvfSearcher  # noqa: E402

path = "/root/repo/data/glove_1p2m_100.parquet"
if not os.path.exists(path):
    log("generating 1.2M x 100 (GloVe-shaped, r2 params: seed 55, 512 modes)")
    emb = synthetic_embeddings(1_200_000, 100, seed=55, n_modes=512)
    write_embedding_parquet(path, emb, row_group_size=200_000)
    del emb
    gc.collect()
if not has_pq_vector_index(path):
    log("building IVF-2048 cosine (in-place)")
    t0 = time.time()
    IndexBuilder(path, "embedding").n_clusters(2048).metric(
        "cosine"
    ).build_inplace()
    log(f"build: {time.time()-t0:.1f}s")
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
rows, dim = emb.shape
log(f"loaded {rows}x{dim}")

s = DeviceIvfSearcher(
    index, emb, row_tile=4096, metric="cosine", cluster_sorted=True,
    dtype=jnp.bfloat16,
)
# Full scans serve from the original row order (sorted-layout collisions).
s_scan = DeviceIvfSearcher(
    index, emb, row_tile=4096, metric="cosine", cluster_sorted=False,
    dtype=jnp.bfloat16,
)
truth = DeviceIvfSearcher(index, emb, row_tile=4096, metric="cosine")
rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, rows, 8192)] * rng.uniform(
    0.2, 5.0, (8192, 1)
).astype(np.float32)
q = q_all[:256]
watchdog(300.0)
t0 = time.time()
_, tids = truth.exact(q, 10)
tids = np.asarray(tids)
log(f"truth exact (f32 cosine): {time.time()-t0:.1f}s")
del truth
gc.collect()


def recall(ids):
    hits = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(ids), tids)
    )
    return hits / (10 * len(tids))


watchdog(300.0)
chosen = None
for nprobe in (4, 8, 16):
    _, ids = s.search(q, 10, nprobe, mode="masked")
    r = recall(ids)
    log(f"nprobe={nprobe}: cosine recall@10={r:.4f}")
    if r >= 0.95:
        chosen = nprobe
        break
chosen = chosen or 16

# Tuned scan knobs (the round-4 serving point) + binscan, recall-gated.
s_scan.approx_recall_target = 0.9
s_scan.scan_overfetch = 20
for mode, sm in (("scan", s_scan), ("binscan", s_scan), ("cert", s_scan)):
    watchdog(300.0)
    try:
        if mode == "cert":
            sm.cert_pass1 = "storage"
        _, ids = sm.search(q, 10, chosen, mode=mode)
        log(f"mode={mode}: recall@10={recall(ids):.4f}")
    except Exception as e:  # noqa: BLE001
        log(f"mode={mode} recall FAILED: {type(e).__name__}: {str(e)[:200]}")


def measure(sm, mode, b, reps=25, budget_s=6.0):
    qb = jax.device_put(np.ascontiguousarray(q_all[:b], np.float32))
    try:
        np.asarray(sm.search_loop(qb, 10, chosen, reps=reps, mode=mode)[1])
    except Exception as e:  # noqa: BLE001
        log(f"mode={mode} B={b}: FAILED "
            f"({type(e).__name__}: {str(e)[:200]})")
        return
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 16 * reps:
        _, ids = sm.search_loop(qb, 10, chosen, reps=reps, mode=mode)
        np.asarray(ids)
        n += reps
    qps = n * b / (time.perf_counter() - t0)
    log(f"mode={mode} B={b}: {qps:,.0f} QPS ({b/qps*1e3:.2f} ms/batch)")


rng_f = np.random.default_rng(17)
for b in (256, 1024, 4096, 8192):
    watchdog(300.0)
    fq = emb[rng_f.integers(0, rows, b)].astype(np.float32)
    fq /= np.linalg.norm(fq, axis=1, keepdims=True)
    f = measure_floor_qps(jax, s_scan, fq)
    log(f"B={b}: same-window floor = {f:,.0f} QPS")
    measure(s_scan, "scan", b)
    measure(s_scan, "binscan", b)
    if b <= 1024:
        measure(s, "pallas", b)
# Exact rung on the cosine shape.
watchdog(300.0)
s_scan.cert_pass1 = "storage"
for b in (256, 1024):
    qb = jax.device_put(np.ascontiguousarray(q_all[:b], np.float32))
    for em in ("auto", "cert"):
        try:
            np.asarray(s_scan.exact_loop(qb, 10, reps=25, mode=em)[1])
            n = 0
            t0 = time.perf_counter()
            while time.perf_counter() - t0 < 5.0 and n < 16 * 25:
                _, ids = s_scan.exact_loop(qb, 10, reps=25, mode=em)
                np.asarray(ids)
                n += 25
            qps = n * b / (time.perf_counter() - t0)
            log(f"exact mode={em} B={b}: {qps:,.0f} QPS")
        except Exception as e:  # noqa: BLE001
            log(f"exact mode={em} B={b}: FAILED "
                f"({type(e).__name__}: {str(e)[:200]})")
log("session r5e complete")
