"""Chip session G: pending round-3 measurements in ONE process.

1. bf16 wire build (refdefault 1M x 1024, warm) vs the 73.6 s f32 warm
   baseline — the staged build is tunnel-transfer-bound (~50 MB/s), so
   halving wire bytes should cut ~40 s.
2. B=8192 scan ceiling on 1M x 128 (does QPS/batch keep scaling?).
3. Bin expansion (expand=2) on 1M x 128: searcher binscan recall + QPS
   (collision rate should ~halve vs the 0.9508 measured at 4096 bins).
4. DEEP-10M bincompact with expand=2: recall (was 0.9504 at ctile=2048)
   + same-window scan comparison.

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r3g.py 2400
"""
import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")
t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] == {m}", flush=True)


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

# ---- 1. bf16 wire build (warm executables from prior sessions) ----
import shutil

from pqvector_tpu.builder import IndexBuilder

src = "/root/repo/data/refdefault_1m_1024.parquet"
tmp = "/tmp/refdefault_bf16wire.parquet"
log("copying refdefault file for bf16-wire build")
shutil.copyfile(src, tmp)
t0 = time.time()
IndexBuilder(tmp, "embedding").n_clusters(1000).transfer_dtype(
    "bfloat16"
).build_inplace()
log(f"bf16-wire build (1Mx1024): {time.time()-t0:.1f}s "
    f"(f32 warm baseline 73.6s)")
os.remove(tmp)

# ---- 2+3. 1M x 128 scan ceiling + binscan expand ----
path = "/root/repo/data/bench_1000000x128.parquet"
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
rng = np.random.default_rng(3)
q_all = (emb[rng.integers(0, len(emb), 8192)]
         + 0.05 * rng.standard_normal((8192, 128))).astype(np.float32)
s = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=True
)
truth = DeviceIvfSearcher(index, emb, row_tile=4096)
_, tids = truth.exact(q_all[:256], 10)
tids = np.asarray(tids)
del truth, emb
gc.collect()
log("1M x 128 resident (bf16) + exact truth for 256q")


def recall(ids, nq=256):
    hits = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(ids)[:nq], tids[:nq])
    )
    return hits / (nq * 10)


bt = s._binscan_tile()
ex = s._binscan_expand(bt)
log(f"binscan tile={bt} expand={ex} (bins={ex*bt})")
_, ids = s.search(q_all[:256], 10, 4, mode="binscan")
log(f"binscan recall@10 (expanded bins): {recall(ids):.4f} (was 0.9508 "
    f"at 4096 bins r3c)")
_, ids = s.search(q_all[:256], 10, 4, mode="scan")
log(f"scan recall@10: {recall(ids):.4f}")


def measure(mode, b, reps=10, budget_s=8.0, search=True):
    qb = q_all[:b]
    fn = (lambda: s.search_loop(qb, 10, 4, reps=reps, mode=mode)) if search \
        else (lambda: s.exact_loop(qb, 10, reps=reps, mode=mode))
    try:
        np.asarray(fn()[1])
    except Exception as e:
        log(f"mode={mode} B={b}: failed ({type(e).__name__}: {e})")
        return None
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 8 * reps:
        np.asarray(fn()[1])
        n += reps
    qps = n * b / (time.perf_counter() - t0)
    log(f"mode={mode} B={b}: {qps:.0f} QPS ({b/qps*1e3:.2f} ms/batch)")
    return qps


for b in (4096, 8192):
    for mode in ("scan", "binscan"):
        measure(mode, b, reps=6, budget_s=8.0)
del s
gc.collect()

# ---- 4. DEEP-10M bincompact with expand ----
path = "/root/repo/data/deep10m_96.parquet"
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
log("DEEP-10M embeddings loaded")
tids = np.load("/root/repo/data/deep10m_96.truth_seed7_b256.npy")
rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, len(emb), 1024)] + 0.05 * rng.standard_normal(
    (1024, 96)
).astype(np.float32)
s = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=True
)
del emb
gc.collect()
log("DEEP-10M resident (bf16, cluster-sorted)")

ct, cp = s.calibrate_bincompact(q_all[:256], 4, 10)
ex = s._binscan_expand(ct, cap=cp) if ct else 0
log(f"calibrated ctile={ct} cap={cp} expand={ex} (bins={ex*ct})")
_, ids = s.search(q_all[:256], 10, 4, mode="bincompact")
log(f"bincompact recall@10 (expanded): {recall(ids):.4f} (was 0.9504)")
_, ids = s.search(q_all[:256], 10, 4, mode="scan")
log(f"scan recall@10: {recall(ids):.4f}")

res = {}
for b in (256, 64):
    s.calibrate_bincompact(q_all[:b], 4, 10)
    for mode in ("bincompact", "scan"):
        res[(mode, b)] = measure(mode, b, budget_s=8.0 if b >= 256 else 5.0)
win = res.get(("bincompact", 256)) or 0
sc = res.get(("scan", 256)) or 1
log(f"bincompact/scan at B=256 = {win/sc:.2f}x")
log("session complete")
