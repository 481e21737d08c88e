"""Regenerate the DEEP-10M cache: parquet + IVF-4096 + exact truth.

Sessions K/M (deep10m_r3k/r3m/r4a) need /root/repo/data/deep10m_96.parquet
and the cached B=256 exact ground truth; both die with fresh VMs. This
prep generates the data on host (CPU), builds the streaming index and the
f32 exact truth on chip, and caches the truth npy. ~10-15 min.

Run SOLO: bash scripts/tpu_run.sh scripts/deep10m_prep.py 2400
"""
import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import log, watchdog  # noqa: E402

import numpy as np  # noqa: E402

path = "/root/repo/data/deep10m_96.parquet"
truth_path = "/root/repo/data/deep10m_96.truth_seed7_b256.npy"

from pqvector_tpu.bench.datasets import (  # noqa: E402
    synthetic_embeddings, write_embedding_parquet,
)
from pqvector_tpu.builder import IndexBuilder  # noqa: E402
from pqvector_tpu.io.embed import has_pq_vector_index  # noqa: E402

if not os.path.exists(path):
    log("generating 10M x 96 (host)")
    emb = synthetic_embeddings(10_000_000, 96, seed=77, n_modes=1024)
    write_embedding_parquet(path, emb, row_group_size=1_000_000)
    del emb
    gc.collect()
    log(f"wrote {os.path.getsize(path)/1e9:.2f} GB")

import jax  # noqa: E402

watchdog(600.0)
log(f"device alive ({jax.devices()})")

if not has_pq_vector_index(path):
    log("building IVF-4096 (streaming, on chip)")
    t0 = time.time()
    IndexBuilder(path, "embedding").n_clusters(4096).streaming(
        batch_rows=1_000_000
    ).build_inplace()
    log(f"build: {time.time()-t0:.1f}s")

if not os.path.exists(truth_path):
    from pqvector_tpu.io.embed import read_index_from_parquet
    from pqvector_tpu.io.reader import read_embedding_column
    from pqvector_tpu.query.device import DeviceIvfSearcher

    index, col = read_index_from_parquet(path)
    emb = read_embedding_column(path, col).data
    rng = np.random.default_rng(7)
    q_all = emb[rng.integers(0, len(emb), 4096)] + 0.05 * rng.standard_normal(
        (4096, 96)
    ).astype(np.float32)
    truth = DeviceIvfSearcher(index, emb, row_tile=4096)  # f32, unsorted
    del emb
    gc.collect()
    _, tids = truth.exact(q_all[:256], k=10)
    tids = np.asarray(tids)
    np.save(truth_path, tids)
    log(f"exact truth cached: {truth_path}")
log("deep10m prep done")
