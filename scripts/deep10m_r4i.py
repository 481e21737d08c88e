"""DEEP-10M spill A/B, corrected (supersedes deep10m_r3m).

r3m's two defects (scripts/deep10m_r3m.log, BASELINE.md round-4 table):
 1. Stale truth: it drew 1024 queries where deep10m_prep's cached truth
    came from a 4096-draw with the same seed — different streams, recall
    meaningless (even exact search scored 0.56). This session reproduces
    the prep draw EXACTLY.
 2. search_loop on a 12M-row re-score searcher OOMs HBM: the TPU while
    allocator copies the scan-const f32 reference + bf16 storage into
    the loop carry (10.7 G of temps). Here: recall is measured with
    search() (single dispatch — no while carry), then the f32 reference
    is dropped before the QPS loop (refine runs vs bf16; identical
    program shape/cost, so the timing stays honest). Compile-only
    aot_probe runs at the exact OOM shape pin whether the
    donate+passthrough idiom fits where the plain loop cannot.

Win condition (docs/ROUND3.md): spill@nprobe=4 recall >= base@6 recall
at lower covered traffic.

Run SOLO: bash scripts/tpu_run.sh scripts/deep10m_r4i.py 2400
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


def measure(s, mode, b, nprobe, reps=10, budget_s=8.0):
    qb = q_all[:b]
    try:
        np.asarray(s.search_loop(qb, 10, nprobe, reps=reps, mode=mode)[1])
    except Exception as e:  # noqa: BLE001
        log(f"mode={mode} B={b} nprobe={nprobe}: failed "
            f"({type(e).__name__}: {str(e)[:200]})")
        return None
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 8 * reps:
        _, ids = s.search_loop(qb, 10, nprobe, reps=reps, mode=mode)
        np.asarray(ids)
        n += reps
    qps = n * b / (time.perf_counter() - t0)
    log(f"mode={mode} B={b} nprobe={nprobe}: {qps:.0f} QPS "
        f"({b/qps*1e3:.2f} ms/batch)")
    return qps


def drive(s, tag, nprobes=(4, 6), qps=True):
    for nprobe in nprobes:
        watchdog(180.0)
        ct, cp = s.calibrate_bincompact(q_all[:256], nprobe, 10)
        if not ct:
            log(f"{tag} nprobe={nprobe}: bincompact ineligible")
            continue
        nt = int(s.emb.shape[0]) // ct
        _, ids = s.search(q_all[:256], 10, nprobe, mode="bincompact")
        r = recall(ids)
        log(f"{tag} bincompact nprobe={nprobe}: recall@10={r:.4f} "
            f"(ctile={ct} cap={cp}/{nt} = {cp/max(nt,1):.0%})")
        if qps:
            measure(s, "bincompact", 256, nprobe)


# ---- baseline ------------------------------------------------------
base = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=True
)
log(f"baseline searcher resident (n_pad={int(base.emb.shape[0])})")
drive(base, "base")
del base
gc.collect()

# ---- spill=0.2 -----------------------------------------------------
watchdog(240.0)
t0 = time.time()
sp = DeviceIvfSearcher.with_spill(
    index, emb, spill=0.2,
    assign_dtype=jnp.bfloat16, row_tile=4096, dtype=jnp.bfloat16,
)
log(f"spill=0.2 searcher resident in {time.time()-t0:.1f}s "
    f"(n_pad={int(sp.emb.shape[0])})")

# compile-only probes at the exact r3m OOM shape (never executed)
for donated in (False, True):
    watchdog(240.0)
    r = aot_probe.probe_loop(sp, q_all[:256], 10, 4, 10, "bincompact",
                             donated=donated)
    log(f"A: {json.dumps(r)[:600]}")

# recall with the f32 re-score (search(): single dispatch, fits)
drive(sp, "spill0.2+rescore", qps=False)

# exactness sanity with the reference still held
_, ide = sp.exact(q_all[:64], 10, mode="approx")
log(f"spill exact-approx recall@10 (vs truth): {recall(ide, nq=64):.4f}")

# QPS loop without the f32 carry: drop the reference (refine then runs
# against bf16 storage — same program shape and cost, honest timing)
sp._emb_ref = None
gc.collect()
drive(sp, "spill0.2", qps=True)
del sp
gc.collect()

# ---- spill=0.4 (recall only) ----------------------------------------
watchdog(240.0)
sp4 = DeviceIvfSearcher.with_spill(
    index, emb, spill=0.4,
    assign_dtype=jnp.bfloat16, row_tile=4096, dtype=jnp.bfloat16,
)
log(f"spill=0.4 searcher resident (n_pad={int(sp4.emb.shape[0])})")
drive(sp4, "spill0.4+rescore", nprobes=(4,), qps=False)
sp4._emb_ref = None
gc.collect()
drive(sp4, "spill0.4", nprobes=(4,), qps=True)
log("session r4i complete")
