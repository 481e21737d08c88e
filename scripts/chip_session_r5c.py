"""Session r5c — 12M-row (spilled DEEP-10M) serving WITH the f32 re-score
via the library's deferred-loop-re-score (VERDICT r4 item 2 "done"
criteria: AOT compile-only at the 12M shape passes under HBM, plus one
chip session where a spilled 12M searcher serves search_loop QPS *with*
re-score and recall measured on the SAME config — r4 could only measure
QPS with the reference dropped, a different configuration).

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r5c.py 2400
"""
import gc
import json
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

import aot_probe  # noqa: E402
from pqvector_tpu.io.embed import read_index_from_parquet  # noqa: E402
from pqvector_tpu.io.reader import read_embedding_column  # noqa: E402
from pqvector_tpu.query.device import DeviceIvfSearcher  # noqa: E402

path = "/root/repo/data/deep10m_96.parquet"
truth_path = "/root/repo/data/deep10m_96.truth_seed7_b256.npy"
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
log(f"embeddings loaded (k={index.n_clusters} rows={index.total_rows})")

# EXACT prep draw (scripts/deep10m_prep.py): 4096 queries, seed 7.
rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, len(emb), 4096)] + 0.05 * rng.standard_normal(
    (4096, 96)
).astype(np.float32)
tids = np.load(truth_path)
log("truth loaded (4096-draw, first 256 cached)")


def recall(ids, nq=256):
    hits = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(ids)[:nq], tids[:nq])
    )
    return hits / (nq * 10)


watchdog(300.0)
t0 = time.time()
sp = DeviceIvfSearcher.with_spill(
    index, emb, spill=0.2,
    assign_dtype=jnp.bfloat16, row_tile=4096, dtype=jnp.bfloat16,
)
n_pad = int(sp.emb.shape[0])
log(f"spill=0.2 searcher resident in {time.time()-t0:.1f}s "
    f"(n_pad={n_pad}, ref held: {sp._emb_ref is not None})")
assert sp._loop_defer_rescore(), "12M shape must auto-defer"
log("auto policy: deferred loop re-score ACTIVE (reference out of the "
    "lax.scan carry)")

# AOT compile-only at the exact r3m OOM shape, defer resolved as
# production would (the r4i plain loop compiled 10.7 GB of while temps).
watchdog(300.0)
for mode in ("bincompact", "scan"):
    try:
        r = aot_probe.probe_loop(sp, q_all[:256], 10, 4, 10, mode)
        log(f"AOT {mode}: {json.dumps(r)[:500]}")
    except Exception as e:  # noqa: BLE001
        log(f"AOT {mode} FAILED: {type(e).__name__}: {str(e)[:300]}")


def measure(s, mode, b, nprobe, reps=10, budget_s=8.0):
    qb = jax.device_put(np.ascontiguousarray(q_all[:b], np.float32))
    try:
        _, ids0 = s.search_loop(qb, 10, nprobe, reps=reps, mode=mode)
        ids0 = np.asarray(ids0)
    except Exception as e:  # noqa: BLE001
        log(f"mode={mode} B={b} nprobe={nprobe}: FAILED "
            f"({type(e).__name__}: {str(e)[:200]})")
        return None, None
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 8 * reps:
        _, ids = s.search_loop(qb, 10, nprobe, reps=reps, mode=mode)
        np.asarray(ids)
        n += reps
    qps = n * b / (time.perf_counter() - t0)
    r = recall(ids0) if b >= 256 else None
    log(f"mode={mode} B={b} nprobe={nprobe}: {qps:,.0f} QPS "
        f"({b/qps*1e3:.2f} ms/batch)"
        + (f" recall@10={r:.4f} [SAME config]" if r is not None else ""))
    return qps, r


# Serving WITH the deferred f32 re-score: recall comes from the very same
# search_loop outputs that are timed — one config, both numbers.
for nprobe in (4, 6):
    watchdog(300.0)
    ct, cp = sp.calibrate_bincompact(q_all[:256], nprobe, 10)
    if ct:
        nt = n_pad // ct
        log(f"bincompact nprobe={nprobe}: ctile={ct} cap={cp}/{nt} "
            f"({cp/max(nt,1):.0%} coverage)")
        measure(sp, "bincompact", 256, nprobe)
watchdog(300.0)
measure(sp, "scan", 256, 1)
measure(sp, "bincompact", 1024, 4)

# Cross-check: single-dispatch search() recall (in-body re-score) must
# match the deferred-loop recall.
watchdog(300.0)
_, ids_s = sp.search(q_all[:256], 10, 4, mode="bincompact")
log(f"single-dispatch bincompact nprobe=4 recall@10={recall(ids_s):.4f} "
    f"(in-body re-score reference)")
log("session r5c complete")
