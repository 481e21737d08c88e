import sys, os, time; sys.path.insert(0, "/root/repo")
t00=time.time()
def log(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
import numpy as np, jax, jax.numpy as jnp
from pqvector_tpu.bench.datasets import synthetic_embeddings, write_embedding_parquet
from pqvector_tpu.builder import IndexBuilder, has_pq_vector_index
from pqvector_tpu.io.embed import read_index_from_parquet
from pqvector_tpu.io.reader import read_embedding_column
from pqvector_tpu.query.device import DeviceIvfSearcher
from pqvector_tpu.index.metrics import normalize_rows

path = "/root/repo/data/glove_1p2m_100.parquet"
if not os.path.exists(path):
    log("generating 1.2M x 100 (GloVe-shaped)")
    emb = synthetic_embeddings(1_200_000, 100, seed=55, n_modes=512)
    write_embedding_parquet(path, emb, row_group_size=200_000)
    del emb
if not has_pq_vector_index(path):
    log("building IVF-2048 cosine")
    t0=time.time()
    IndexBuilder(path, "embedding").n_clusters(2048).metric("cosine").build_inplace()
    log(f"build: {time.time()-t0:.1f}s")
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
s = DeviceIvfSearcher.from_parquet(path, row_tile=4096)
assert s.metric == "cosine"
rng = np.random.default_rng(7)
B = 256
q = emb[rng.integers(0, len(emb), B)] * rng.uniform(0.2, 5.0, (B,1)).astype(np.float32)
# ground truth: cosine ordering = L2 on normalized (exact scan on the same searcher)
t0=time.time(); _, tids = s.exact(q, 10); tids = np.asarray(tids); log(f"truth exact: {time.time()-t0:.1f}s")
for nprobe in (4, 8, 16, 32, 64):
    _, ids = s.search(q, 10, nprobe)
    ids = np.asarray(ids)
    hits = sum(len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, tids))
    log(f"nprobe={nprobe}: cosine recall@10={hits/(10*B):.4f}")
    if hits/(10*B) >= 0.95:
        break
qj = jnp.asarray(q)
out = s.search(qj, 10, nprobe); _ = np.asarray(out[1])
t0=time.perf_counter(); reps=0; last=None
while time.perf_counter()-t0 < 5 and reps < 300:
    last = s.search(qj, 10, nprobe); reps += 1
_ = np.asarray(last[1])
log(f"GloVe-shaped cosine IVF QPS @ nprobe={nprobe}, B=256: {reps*B/(time.perf_counter()-t0):.0f}")
