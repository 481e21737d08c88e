"""DEEP-10M session K: xbin at 10M scale + bincompact recall lift.

Round-3 leads this session attacks (docs/ROUND3.md, memory):
1. mode="xbin" (XLA binned-min scan) at 10M x 96: recall + QPS vs scan
   at B in {256, 1024, 4096}, auto and reduced bin counts, plus the
   chunked memory-hedge variant.
2. bincompact residual recall (0.9504 at nprobe=4) is probed-union
   misses, not collisions — sweep nprobe {4, 6, 8, 12} for the
   recall/QPS trade; scan recall is nprobe-free so one number.

Run SOLO: bash scripts/tpu_run.sh scripts/deep10m_r3k.py 2400
"""
import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")
t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import numpy as np
import jax


def watchdog(timeout_s=240.0):
    import threading

    done = threading.Event()

    def probe():
        import jax.numpy as jnp

        np.asarray(jnp.ones((8, 128)) + 1.0)
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        log(f"FATAL: device unresponsive after {timeout_s:.0f}s")
        os._exit(3)


watchdog()
log(f"device alive ({jax.devices()})")

import jax.numpy as jnp
from pqvector_tpu.io.embed import read_index_from_parquet
from pqvector_tpu.io.reader import read_embedding_column
from pqvector_tpu.query.device import DeviceIvfSearcher

path = "/root/repo/data/deep10m_96.parquet"
truth_path = "/root/repo/data/deep10m_96.truth_seed7_b256.npy"
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
log("embeddings loaded")

rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, len(emb), 4096)] + 0.05 * rng.standard_normal(
    (4096, 96)
).astype(np.float32)

tids = np.load(truth_path)
log("truth loaded from cache")

# ORIGINAL row order: xbin/scan full-scan modes collide on cluster-sorted
# layouts (CLAUDE.md); bincompact needs cluster_sorted. Two searchers
# would double residency (10M x 96 bf16 = 1.9 GB each — fits), but keep
# peak host RSS low: run the xbin block first, drop, then bincompact.
s_orig = DeviceIvfSearcher(index, emb, row_tile=4096, dtype=jnp.bfloat16)
log(f"orig-order searcher resident (n_pad={int(s_orig.emb.shape[0])})")


def recall(ids, nq=256):
    hits = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(ids)[:nq], tids[:nq])
    )
    return hits / (nq * 10)


def measure(s, mode, b, nprobe=4, reps=10, budget_s=8.0):
    qb = q_all[:b]
    try:
        np.asarray(s.search_loop(qb, 10, nprobe, reps=reps, mode=mode)[1])
    except Exception as e:
        log(f"mode={mode} B={b}: failed ({type(e).__name__}: {e})")
        return None
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 8 * reps:
        _, ids = s.search_loop(qb, 10, nprobe, reps=reps, mode=mode)
        np.asarray(ids)
        n += reps
    qps = n * b / (time.perf_counter() - t0)
    log(f"mode={mode} B={b}: {qps:.0f} QPS ({b/qps*1e3:.2f} ms/batch)")
    return qps


# ---- 1. xbin at 10M ------------------------------------------------
if s_orig.can_xbin(10):
    auto = s_orig._xbin_bins_checked(10)
    log(f"xbin auto bins={auto} (nt={int(s_orig.emb.shape[0])//auto})")
    _, ids = s_orig.search(q_all[:256], 10, 4, mode="xbin")
    log(f"xbin recall@10: {recall(ids):.4f}")
    _, ids = s_orig.search(q_all[:256], 10, 4, mode="scan")
    log(f"scan recall@10: {recall(ids):.4f}")
    for b in (256, 1024, 4096):
        measure(s_orig, "xbin", b)
        measure(s_orig, "scan", b)
    # Reduced bins: smaller [B, bins] table; recall cost = collisions.
    n_pad = int(s_orig.emb.shape[0])
    for lb in (auto // 4, auto // 16):
        if lb < 10 or n_pad % lb:
            continue
        s_orig.xbin_bins = lb
        _, ids = s_orig.search(q_all[:256], 10, 4, mode="xbin")
        log(f"xbin bins={lb}: recall@10={recall(ids):.4f}")
        measure(s_orig, "xbin", 4096)
    s_orig.xbin_bins = 0
    # Chunked hedge at the full batch.
    s_orig.xbin_chunk_groups = 16
    measure(s_orig, "xbin", 4096)
    s_orig.xbin_chunk_groups = 0
    # int8 variant: 1/4 the f32 scan bytes + int8 MXU rate; winners
    # re-scored exactly (see _exact_xbin8_impl). At 10M the int8 codes
    # add ~1 GB next to the bf16 residency.
    try:
        _, ids = s_orig.search(q_all[:256], 10, 4, mode="xbin8")
        log(f"xbin8 recall@10: {recall(ids):.4f}")
        for b in (256, 1024, 4096):
            measure(s_orig, "xbin8", b)
    except Exception as e:
        log(f"xbin8 block failed ({type(e).__name__}: {str(e)[:200]})")
else:
    log("xbin ineligible at this n_pad")

del s_orig
gc.collect()

# ---- 2. bincompact nprobe sweep ------------------------------------
s16 = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=True
)
del emb
gc.collect()
log("bf16 cluster-sorted searcher resident")

for nprobe in (4, 6, 8, 12):
    ct, cp = s16.calibrate_bincompact(q_all[:256], nprobe, 10)
    nt = int(s16.emb.shape[0]) // ct if ct else 0
    cov = cp / max(nt, 1)
    _, ids = s16.search(q_all[:256], 10, nprobe, mode="bincompact")
    r = recall(ids)
    log(
        f"bincompact nprobe={nprobe}: recall@10={r:.4f} "
        f"(ctile={ct} cap={cp}/{nt} = {cov:.0%})"
    )
    if cov < 0.9:
        measure(s16, "bincompact", 256, nprobe=nprobe)
    else:
        log(f"  coverage {cov:.0%} — compaction pointless, skip timing")
log("done")
