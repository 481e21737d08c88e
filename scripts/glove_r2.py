"""GloVe-cosine round-2 measurement: scan/IVF modes, loop timing (BASELINE
config 3). Run SOLO on the chip."""
import sys, os, time

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

path = "/root/repo/data/glove_1p2m_100.parquet"
if not os.path.exists(path):
    log("generating 1.2M x 100 (GloVe-shaped)")
    emb = synthetic_embeddings(1_200_000, 100, seed=55, n_modes=512)
    write_embedding_parquet(path, emb, row_group_size=200_000)
    del emb
if not has_pq_vector_index(path):
    log("building IVF-2048 cosine")
    t0 = time.time()
    IndexBuilder(path, "embedding").n_clusters(2048).metric("cosine").build_inplace()
    log(f"build: {time.time()-t0:.1f}s")
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
s = DeviceIvfSearcher(
    index, emb, row_tile=4096, metric="cosine", cluster_sorted=True,
    dtype=jnp.bfloat16,
)
truth = DeviceIvfSearcher(index, emb, row_tile=4096, metric="cosine")
rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, len(emb), 4096)] * rng.uniform(
    0.2, 5.0, (4096, 1)
).astype(np.float32)
q = q_all[:256]
t0 = time.time()
_, tids = truth.exact(q, 10)
tids = np.asarray(tids)
log(f"truth exact (f32): {time.time()-t0:.1f}s")
del truth
import gc

gc.collect()


def recall(ids):
    hits = sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(np.asarray(ids), tids)
    )
    return hits / (10 * len(tids))


chosen = None
for nprobe in (4, 8, 16, 32, 64):
    _, ids = s.search(q, 10, nprobe, mode="pallas")
    r = recall(ids)
    log(f"nprobe={nprobe}: cosine recall@10={r:.4f}")
    if r >= 0.95:
        chosen = nprobe
        break
chosen = chosen or 64
for mode in ("approx", "scan"):
    _, ids = s.search(q, 10, chosen, mode=mode)
    log(f"mode={mode}: recall@10={recall(ids):.4f}")


def measure(mode, b, reps=25, budget_s=6.0):
    qb = q_all[:b]
    np.asarray(s.search_loop(qb, 10, chosen, reps=reps, mode=mode)[1])
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 16 * reps:
        _, ids = s.search_loop(qb, 10, chosen, reps=reps, mode=mode)
        np.asarray(ids)
        n += reps
    qps = n * b / (time.perf_counter() - t0)
    log(f"mode={mode} B={b}: {qps:.0f} QPS ({b/qps*1e3:.2f} ms/batch)")


for mode in ("stream", "pallas", "scan"):
    measure(mode, 256)
for mode in ("scan",):
    measure(mode, 1024)
    measure(mode, 4096)
log("done")
