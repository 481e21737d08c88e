"""Reference-default workload: 1M x 1024-d synthetic, n_clusters=sqrt(n)
(auto), K=100, NPROBE=16 — the defaults of /root/reference/benches/query.rs
(ROWS=1M, DIM=1024, K=100, NPROBE=16) and index_build.rs. Loop timing.
Run SOLO on the chip."""
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

K = 100
path = "/root/repo/data/refdefault_1m_1024.parquet"
if not os.path.exists(path):
    log("generating 1M x 1024")
    emb = synthetic_embeddings(1_000_000, 1024, seed=42, n_modes=512)
    write_embedding_parquet(path, emb, row_group_size=250_000)
    del emb
    gc.collect()
    log(f"wrote {os.path.getsize(path)/1e9:.2f} GB")
if not has_pq_vector_index(path):
    log("building index (defaults: n_clusters=sqrt(n)=1000, max_iters=20)")
    t0 = time.time()
    IndexBuilder(path, "embedding").build_inplace()
    log(
        f"build: {time.time()-t0:.1f}s, overhead "
        f"{(os.path.getsize(path)) / 1e9:.2f} GB total "
        f"(reference benches/index_build.rs workload)"
    )
index, col = read_index_from_parquet(path)
log(f"index k={index.n_clusters} rows={index.total_rows}")
emb = read_embedding_column(path, col).data
log("embeddings loaded")

rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, len(emb), 1024)] + 0.05 * rng.standard_normal(
    (1024, 1024)
).astype(np.float32)

tcache = path + f".truth_k{K}.npy"
if os.path.exists(tcache):
    tids = np.load(tcache)
    log("truth loaded from cache")
else:
    truth = DeviceIvfSearcher(index, emb, row_tile=4096)
    t0 = time.time()
    _, tids = truth.exact(q_all[:256], K)
    tids = np.asarray(tids)
    np.save(tcache, tids)
    log(f"truth exact 256q (k={K}): {time.time()-t0:.1f}s")
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
    return hits / (len(tids) * K)


chosen = 16  # reference default NPROBE
for mode in ("masked", "approx", "scan"):
    t0 = time.time()
    _, ids = s16.search(q_all[:256], K, chosen, mode=mode)
    log(f"mode={mode}: recall@{K}={recall(ids):.4f} ({time.time()-t0:.1f}s)")


def measure(mode, b, reps=10, budget_s=8.0):
    qb = q_all[:b]
    try:
        np.asarray(s16.search_loop(qb, K, chosen, reps=reps, mode=mode)[1])
    except Exception as e:
        log(f"mode={mode} B={b}: failed ({type(e).__name__})")
        return
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 8 * reps:
        _, ids = s16.search_loop(qb, K, chosen, reps=reps, mode=mode)
        np.asarray(ids)
        n += reps
    qps = n * b / (time.perf_counter() - t0)
    log(f"mode={mode} B={b}: {qps:.0f} QPS ({b/qps*1e3:.1f} ms/batch)")


for mode in ("masked", "approx", "scan"):
    measure(mode, 256)
measure("scan", 1024)

# Reference-loop CPU baseline at the same operating point.
idx2, _ = read_index_from_parquet(path)
emb2 = read_embedding_column(path, col).data


def cpu_loop(budget_s=5.0):
    centroids = idx2.centroids
    done = 0
    start = time.perf_counter()
    for q in q_all[:64]:
        diff = centroids - q[None, :]
        cd = np.einsum("kd,kd->k", diff, diff)
        probe = np.argpartition(cd, min(chosen, len(cd) - 1))[:chosen]
        rows = np.concatenate([idx2.cluster_rows(int(c)) for c in probe])
        cand = emb2[rows]
        d = np.einsum("nd,nd->n", cand, cand) - 2.0 * cand @ q + q @ q
        top = np.argpartition(d, K - 1)[:K]
        _ = rows[top[np.argsort(d[top])]]
        done += 1
        if time.perf_counter() - start > budget_s:
            break
    return done / (time.perf_counter() - start)


log(f"cpu single-core reference loop: {cpu_loop():.1f} QPS")
log("done")
