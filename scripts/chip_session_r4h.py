"""Session r4h: (A) while-carry copy probe, (B) build-stage attribution.

A. The deep10m_r3m OOM dump shows the TPU while-loop allocator COPIES the
   scan-invariant resident arrays (bf16 storage + f32 re-score reference)
   into the loop carry — 10.7 G of HLO temps at 12M rows. Compile-only
   probes (scripts/aot_probe.py) on the 1M×128 headline searcher answer:
   (1) does the healthy headline program carry the same copies, (2) does
   the donate+passthrough idiom remove them, (3) does reps=1 vs 25 matter.

B. refdefault build stage attribution: the staged build's
   "decode+transfer" only times the ENQUEUE; the 2 GB wire tail lands in
   build.train's first blocking op (72+74 s first vs 43+111 s warm — same
   total). Time every sub-stage with explicit np.asarray round-trips:
   decode, host bf16 cast, sample-first transfer, k-means (pp-init/Lloyd
   split, cold+warm), bulk transfer, assign — then measure the proposed
   overlapped flow (train while the bulk streams).

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r4h.py 2400
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import log, watchdog, ensure_bench_dataset  # noqa: E402

import numpy as np  # noqa: E402

watchdog(600.0)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

log(f"device alive ({jax.devices()})")

# ---------------- A: carry-copy AOT probes (1M×128) -------------------
import aot_probe  # noqa: E402
from pqvector_tpu.io.embed import read_index_from_parquet  # noqa: E402
from pqvector_tpu.io.reader import read_embedding_column  # noqa: E402
from pqvector_tpu.query.device import DeviceIvfSearcher  # noqa: E402

path = ensure_bench_dataset("/root/repo/data/bench_1000000x128.parquet")
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
s = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=True
)
log(f"1M searcher resident (n_pad={int(s.emb.shape[0])}, rescore ref held)")
q = emb[:4096]

for mode in ("scan", "binscan"):
    for reps, donated in ((25, False), (25, True), (1, False)):
        watchdog(240.0)
        r = aot_probe.probe_loop(s, q, 10, 8, reps, mode, donated=donated)
        log(f"A: {json.dumps(r)[:600]}")

# ---------------- B: build stage attribution (1M×1024) ----------------
del s, emb, index
import gc  # noqa: E402

gc.collect()
watchdog(240.0)

import ml_dtypes  # noqa: E402
from pqvector_tpu.index.kmeans import (  # noqa: E402
    KMeansParams, _kmeans_pp_init, _lloyd, _pad_rows, assign_clusters,
    k_means, sample_indices_host,
)
from pqvector_tpu.index.streaming import iter_embedding_batches  # noqa: E402

bpath = "/root/repo/data/refdefault_1m_1024.parquet"
if not os.path.exists(bpath):
    log("refdefault cache absent; skipping part B")
    sys.exit(0)

t0 = time.time()
parts = []
rows = 0
for part in iter_embedding_batches(bpath, "embedding", 131072):
    rows += len(part)
    parts.append(part)
t_decode = time.time() - t0
log(f"B: decode {rows} rows: {t_decode:.1f}s")

t0 = time.time()
data = np.concatenate(parts)
t_concat_host = time.time() - t0
del parts
gc.collect()

t0 = time.time()
data16 = data.astype(ml_dtypes.bfloat16)
t_cast = time.time() - t0
log(f"B: host concat {t_concat_host:.1f}s, bf16 cast {t_cast:.1f}s")

n, d = data.shape
params = KMeansParams(n_clusters=1000, max_iters=20, seed=42,
                      block_rows=8192)
idx = sample_indices_host(42 ^ 0x5A5A5A5A, n, 100_000)

# sample-first transfer + train (cold, then warm)
watchdog(240.0)
t0 = time.time()
sample_dev = jnp.asarray(data16[idx]).astype(jnp.float32)
float(jnp.sum(sample_dev))  # block: scalar round-trip proves arrival
t_sample = time.time() - t0
log(f"B: sample gather+transfer (100k x 1024 bf16 wire): {t_sample:.1f}s")

t0 = time.time()
c0 = _kmeans_pp_init(sample_dev[:50_000], jax.random.split(
    jax.random.PRNGKey(42), 3)[1], 1000)
np.asarray(c0[0, :1])
t_init_cold = time.time() - t0
t0 = time.time()
x_pad, w = _pad_rows(sample_dev, 8192)
cent, assign = _lloyd(x_pad, w, c0, 20, 8192, 1000)
np.asarray(cent[0, :1])
t_lloyd_cold = time.time() - t0
log(f"B: pp-init {t_init_cold:.1f}s cold, lloyd {t_lloyd_cold:.1f}s cold")

watchdog(240.0)
t0 = time.time()
cent2, _ = k_means(sample_dev, params)
t_train_warm = time.time() - t0
log(f"B: k_means warm (pp-init + lloyd, same executables): "
    f"{t_train_warm:.1f}s")

# bulk transfer (blocked), then assign
watchdog(600.0)
t0 = time.time()
chunks = [
    jax.device_put(data16[i:i + 131072]) for i in range(0, n, 131072)
]
x = jnp.concatenate(chunks, axis=0).astype(jnp.float32)
del chunks
float(jnp.sum(x))  # block on the whole 2 GB wire + concat + upcast
t_bulk = time.time() - t0
log(f"B: bulk transfer+concat+f32 (2 GB bf16 wire, blocked): {t_bulk:.1f}s")

t0 = time.time()
a = assign_clusters(x, cent2, 8192)
t_assign = time.time() - t0
log(f"B: assign (cold): {t_assign:.1f}s")

# proposed overlapped flow, warm: enqueue bulk, train while it streams
watchdog(600.0)
del x
gc.collect()
t0 = time.time()
chunks = [
    jax.device_put(data16[i:i + 131072]) for i in range(0, n, 131072)
]
x = jnp.concatenate(chunks, axis=0).astype(jnp.float32)
del chunks
t_enqueue = time.time() - t0
cent3, _ = k_means(sample_dev, params)  # returns np = blocks on train
t_train_pt = time.time() - t0
a = assign_clusters(x, cent3, 8192)  # blocks on bulk + assign
t_total = time.time() - t0
log(f"B overlap: enqueue {t_enqueue:.1f}s, train-done {t_train_pt:.1f}s, "
    f"train+bulk+assign total {t_total:.1f}s")
log(f"B summary: decode {t_decode:.1f} cast {t_cast:.1f} "
    f"sample {t_sample:.1f} train_warm {t_train_warm:.1f} "
    f"bulk {t_bulk:.1f} assign {t_assign:.1f} "
    f"overlapped(train+bulk+assign) {t_total:.1f}")
log("session r4h done")
