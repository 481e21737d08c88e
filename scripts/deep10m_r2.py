"""DEEP-10M round-2 measurement: n-sublinear serving via stream compaction
vs the ApproxTopK scan, loop-API timing (BASELINE config 5, VERDICT item 1).

Run SOLO on the chip: `timeout 3600 python -u scripts/deep10m_r2.py > log 2>&1`.
"""
import sys, os, time, gc

sys.path.insert(0, "/root/repo")
t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import numpy as np
import jax
import jax.numpy as jnp
from pqvector_tpu.bench.datasets import synthetic_embeddings, write_embedding_parquet
from pqvector_tpu.builder import IndexBuilder, has_pq_vector_index
from pqvector_tpu.io.embed import read_index_from_parquet
from pqvector_tpu.io.reader import read_embedding_column
from pqvector_tpu.query.device import DeviceIvfSearcher

path = "/root/repo/data/deep10m_96.parquet"
if not os.path.exists(path):
    log("generating 10M x 96")
    emb = synthetic_embeddings(10_000_000, 96, seed=77, n_modes=1024)
    write_embedding_parquet(path, emb, row_group_size=1_000_000)
    del emb
    gc.collect()
    log(f"wrote {os.path.getsize(path)/1e9:.2f} GB")
if not has_pq_vector_index(path):
    log("building IVF-4096 (streaming)")
    t0 = time.time()
    IndexBuilder(path, "embedding").n_clusters(4096).streaming(
        batch_rows=1_000_000
    ).build_inplace()
    log(f"build: {time.time()-t0:.1f}s  (VERDICT target <= 600s)")
index, col = read_index_from_parquet(path)
log(f"index k={index.n_clusters} rows={index.total_rows}")
emb = read_embedding_column(path, col).data
log("embeddings loaded")

rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, len(emb), 4096)] + 0.05 * rng.standard_normal(
    (4096, 96)
).astype(np.float32)

truth = DeviceIvfSearcher(index, emb, row_tile=4096)  # f32, unsorted
t0 = time.time()
_, tids = truth.exact(q_all[:256], 10)
tids = np.asarray(tids)
log(f"truth exact 256q: {time.time()-t0:.1f}s")
del truth
gc.collect()

s16 = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=True
)
del emb
gc.collect()
log("bf16 cluster-sorted searcher resident")


def recall(ids):
    hits = sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(np.asarray(ids), tids)
    )
    return hits / (len(tids) * 10)


chosen = None
for nprobe in (4, 8, 16, 32):
    t0 = time.time()
    _, ids = s16.search(q_all[:256], 10, nprobe, mode="pallas")
    r = recall(ids)
    log(f"nprobe={nprobe}: recall@10={r:.4f} ({time.time()-t0:.1f}s)")
    if r >= 0.95:
        chosen = nprobe
        break
chosen = chosen or 32

# Recall gates for the approximate-selection modes.
for mode in ("approx", "scan"):
    t0 = time.time()
    _, ids = s16.search(q_all[:256], 10, chosen, mode=mode)
    log(f"mode={mode}: recall@10={recall(ids):.4f} ({time.time()-t0:.1f}s)")


def measure(mode, b, reps=10, budget_s=8.0):
    qb = q_all[:b]
    try:
        np.asarray(s16.search_loop(qb, 10, chosen, reps=reps, mode=mode)[1])
    except Exception as e:
        log(f"mode={mode} B={b}: failed ({type(e).__name__}: {e})")
        return
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 8 * reps:
        _, ids = s16.search_loop(qb, 10, chosen, reps=reps, mode=mode)
        np.asarray(ids)
        n += reps
    qps = n * b / (time.perf_counter() - t0)
    log(f"mode={mode} B={b}: {qps:.0f} QPS ({b/qps*1e3:.1f} ms/batch)")


for mode in ("stream", "approx", "scan"):
    measure(mode, 256)
for mode in ("approx", "scan"):
    measure(mode, 1024)
measure("scan", 4096)
log("done")
