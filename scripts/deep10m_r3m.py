"""DEEP-10M session M: spilled multi-assignment recall lift (round-3).

Round-3 finding (docs/ROUND3.md): bincompact's residual recall at
nprobe=4 (0.9504) is probed-union misses, not bin collisions. Session K
sweeps nprobe (query-side fix: covered traffic grows for EVERY query);
this session measures the row-side fix — DeviceIvfSearcher.with_spill
duplicates the spill fraction of smallest-margin rows into their
runner-up cluster, so only boundary rows cost extra traffic.

Same-window comparison grid at B=256, k=10:
  baseline   bincompact nprobe=4, 6
  spill=0.2  bincompact nprobe=4, 6
Win condition: spill@4 recall >= baseline@6 recall at lower coverage.

Run SOLO: bash scripts/tpu_run.sh scripts/deep10m_r3m.py 2400
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
log(f"embeddings loaded (k={index.n_clusters} rows={index.total_rows})")

rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, len(emb), 1024)] + 0.05 * rng.standard_normal(
    (1024, 96)
).astype(np.float32)
tids = np.load(truth_path)
log("truth loaded from cache")


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
    except Exception as e:
        log(f"mode={mode} B={b} nprobe={nprobe}: failed "
            f"({type(e).__name__}: {e})")
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


def drive(s, tag, nprobes=(4, 6)):
    for nprobe in nprobes:
        watchdog(180.0)
        ct, cp = s.calibrate_bincompact(q_all[:256], nprobe, 10)
        if not ct:
            log(f"{tag} nprobe={nprobe}: bincompact ineligible")
            continue
        nt = int(s.emb.shape[0]) // ct
        cov = cp / max(nt, 1)
        _, ids = s.search(q_all[:256], 10, nprobe, mode="bincompact")
        r = recall(ids)
        log(f"{tag} bincompact nprobe={nprobe}: recall@10={r:.4f} "
            f"(ctile={ct} cap={cp}/{nt} = {cov:.0%})")
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
watchdog(180.0)
t0 = time.time()
sp = DeviceIvfSearcher.with_spill(
    index, emb, spill=0.2,
    assign_dtype=jnp.bfloat16, row_tile=4096, dtype=jnp.bfloat16,
)
log(f"spill=0.2 searcher resident in {time.time()-t0:.1f}s "
    f"(n_pad={int(sp.emb.shape[0])})")
drive(sp, "spill0.2")

# gather-path sanity: spilled exactness at small batch
_, ide = sp.exact(q_all[:64], 10, mode="approx")
log(f"spill exact-approx recall@10 (vs truth): {recall(ide, nq=64):.4f}")
del sp
gc.collect()

# ---- spill=0.4 (if the window is still healthy) ---------------------
watchdog(180.0)
sp4 = DeviceIvfSearcher.with_spill(
    index, emb, spill=0.4,
    assign_dtype=jnp.bfloat16, row_tile=4096, dtype=jnp.bfloat16,
)
log(f"spill=0.4 searcher resident (n_pad={int(sp4.emb.shape[0])})")
drive(sp4, "spill0.4", nprobes=(4,))
log("session complete")
