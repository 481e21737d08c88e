"""Regenerate every round-5 dataset cache on the HOST (CPU jax backend).

The 05:44 VM reboot wiped /root/repo/data and the jax compile cache, so
the queued round-5 chip sessions (r5g/r5h/r5c/r5d/r5e + bench.py) have
nothing to read. This prep rebuilds all four caches without touching the
TPU tunnel (CPU platform forced before any device op, the
tests/conftest.py pattern), so it can run while chip sessions are queued.

Index builds on CPU are numerically equivalent to the chip's host-assign
default (f32 matmul assignment); recall is re-measured by every consumer.

Run: python -u scripts/regen_datasets_r5.py > scripts/regen_datasets_r5.log 2>&1
"""
import gc
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

t00 = time.time()


def log(m):
    print(f"[{time.time() - t00:7.1f}s] {m}", flush=True)


import numpy as np  # noqa: E402

from pqvector_tpu.bench.datasets import (  # noqa: E402
    synthetic_embeddings,
    write_embedding_parquet,
)
from pqvector_tpu.builder import IndexBuilder  # noqa: E402
from pqvector_tpu.io.embed import has_pq_vector_index  # noqa: E402

DATA = "/root/repo/data"
os.makedirs(DATA, exist_ok=True)
log(f"jax platform: {jax.devices()}")

# 1. bench 1M x 128 (bench.py generator params: seed 1234, 256 modes).
path = f"{DATA}/bench_1000000x128.parquet"
if not os.path.exists(path):
    from bench import generate_dataset

    log("generating bench 1Mx128")
    generate_dataset(path, 1_000_000, 128)
    log(f"wrote {os.path.getsize(path)/1e9:.2f} GB")
if not has_pq_vector_index(path):
    t0 = time.time()
    IndexBuilder(path, "embedding").n_clusters(1024).build_inplace()
    log(f"bench index (k=1024) built in {time.time()-t0:.1f}s")
gc.collect()

# 2. reference-default 1M x 1024 (refdefault_r2.py params).
path = f"{DATA}/refdefault_1m_1024.parquet"
if not os.path.exists(path):
    log("generating refdefault 1Mx1024")
    emb = synthetic_embeddings(1_000_000, 1024, seed=42, n_modes=512)
    write_embedding_parquet(path, emb, row_group_size=250_000)
    del emb
    gc.collect()
    log(f"wrote {os.path.getsize(path)/1e9:.2f} GB")
if not has_pq_vector_index(path):
    t0 = time.time()
    IndexBuilder(path, "embedding").n_clusters(1000).build_inplace()
    log(f"refdefault index (k=1000) built in {time.time()-t0:.1f}s")
gc.collect()

# 3. GloVe-shaped 1.2M x 100 cosine (glove_r2.py params).
path = f"{DATA}/glove_1p2m_100.parquet"
if not os.path.exists(path):
    log("generating glove 1.2Mx100")
    emb = synthetic_embeddings(1_200_000, 100, seed=55, n_modes=512)
    write_embedding_parquet(path, emb, row_group_size=200_000)
    del emb
    gc.collect()
    log(f"wrote {os.path.getsize(path)/1e9:.2f} GB")
if not has_pq_vector_index(path):
    t0 = time.time()
    IndexBuilder(path, "embedding").n_clusters(2048).metric(
        "cosine"
    ).build_inplace()
    log(f"glove cosine index (k=2048) built in {time.time()-t0:.1f}s")
gc.collect()

# 4. DEEP-10M 10M x 96 + streaming IVF-4096 + exact truth
#    (deep10m_prep.py params).
path = f"{DATA}/deep10m_96.parquet"
truth_path = f"{DATA}/deep10m_96.truth_seed7_b256.npy"
if not os.path.exists(path):
    log("generating deep10m 10Mx96")
    emb = synthetic_embeddings(10_000_000, 96, seed=77, n_modes=1024)
    write_embedding_parquet(path, emb, row_group_size=1_000_000)
    del emb
    gc.collect()
    log(f"wrote {os.path.getsize(path)/1e9:.2f} GB")
if not has_pq_vector_index(path):
    t0 = time.time()
    IndexBuilder(path, "embedding").n_clusters(4096).streaming(
        batch_rows=1_000_000
    ).build_inplace()
    log(f"deep10m streaming index (k=4096) built in {time.time()-t0:.1f}s")
gc.collect()

if not os.path.exists(truth_path):
    from pqvector_tpu.io.embed import read_index_from_parquet
    from pqvector_tpu.io.reader import read_embedding_column
    from pqvector_tpu.query.device import DeviceIvfSearcher

    log("computing deep10m f32 exact truth (256 queries, k=10)")
    index, col = read_index_from_parquet(path)
    emb = read_embedding_column(path, col).data
    rng = np.random.default_rng(7)
    q_all = emb[rng.integers(0, len(emb), 4096)] + 0.05 * rng.standard_normal(
        (4096, 96)
    ).astype(np.float32)
    truth = DeviceIvfSearcher(index, emb, row_tile=4096)  # f32, unsorted
    del emb
    gc.collect()
    t0 = time.time()
    _, tids = truth.exact(q_all[:256], 10)
    np.save(truth_path, np.asarray(tids))
    log(f"exact truth cached in {time.time()-t0:.1f}s: {truth_path}")

log("regen_datasets_r5 done")
