import sys, os, time; sys.path.insert(0, "/root/repo")
t00=time.time()
def log(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
import numpy as np, jax, jax.numpy as jnp
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
    log(f"wrote {os.path.getsize(path)/1e9:.2f} GB")
if not has_pq_vector_index(path):
    log("building IVF-4096 (streaming)")
    t0=time.time()
    IndexBuilder(path, "embedding").n_clusters(4096).streaming(batch_rows=1_000_000).build_inplace()
    log(f"build: {time.time()-t0:.1f}s")
index, col = read_index_from_parquet(path)
log(f"index k={index.n_clusters} rows={index.total_rows}")
emb = read_embedding_column(path, col).data
log("embeddings loaded")
truth = DeviceIvfSearcher(index, emb, row_tile=4096)  # f32
rng = np.random.default_rng(7)
B = 1024
q = emb[rng.integers(0, len(emb), B)] + 0.05*rng.standard_normal((B, 96)).astype(np.float32)
t0=time.time(); _, tids = truth.exact(q[:256], 10); tids = np.asarray(tids); log(f"truth exact 256q: {time.time()-t0:.1f}s")
del truth
import gc; gc.collect()
s16 = DeviceIvfSearcher(index, emb, row_tile=4096, dtype=jnp.bfloat16)
del emb
gc.collect()
for nprobe in (4, 8, 16, 32):
    t0=time.time()
    _, ids = s16.search(q[:256], 10, nprobe)
    ids = np.asarray(ids)
    hits = sum(len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, tids))
    log(f"nprobe={nprobe}: recall@10={hits/2560:.4f} ({time.time()-t0:.1f}s)")
    if hits/2560 >= 0.95:
        break
# sustained QPS (B=256; B=1024 is extraction-bound and OOMs the merge at 10M)
qb = jnp.asarray(q[:256])
out = s16.search(qb, 10, nprobe); jax.block_until_ready(out[1]); _ = np.asarray(out[1])
t0=time.perf_counter(); reps=0; last=None
while time.perf_counter()-t0 < 6 and reps < 200:
    last = s16.search(qb, 10, nprobe); reps += 1
_ = np.asarray(last[1])
log(f"DEEP-10M bf16 IVF QPS @ nprobe={nprobe}, B=256: {reps*256/(time.perf_counter()-t0):.0f}")
