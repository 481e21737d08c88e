"""On-chip verification of the mode="xbin" auto-chunk policy.

Small (20k x 64) end-to-end drive on the REAL TPU: build an IVF index,
search with mode="xbin" under (a) the default auto policy, (b) a tiny
PQVECTOR_TPU_XBIN_FUSE_BUDGET that forces the auto policy to chunk, and
(c) forced-unchunked (-1) — all three must match the exact scan.

Run SOLO: bash scripts/tpu_run.sh scripts/verify_xbin.py 600
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] == {m}", flush=True)


import numpy as np


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


watchdog(600.0)  # backend init alone takes ~140 s on a fresh VM
import jax

log(f"device alive ({jax.devices()})")

from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index
from pqvector_tpu.query import device as dev
from pqvector_tpu.query.device import DeviceIvfSearcher

rng = np.random.default_rng(7)
n, d = 20_000, 64
x = rng.standard_normal((n, d)).astype(np.float32)
index = build_ivf_index(Embeddings(x, d), IvfBuildConfig(n_clusters=64, seed=0))
s = DeviceIvfSearcher(index, x, row_tile=2048)
q = (x[rng.integers(0, n, 64)]
     + 0.05 * rng.standard_normal((64, d))).astype(np.float32)
log(f"built index; can_xbin={s.can_xbin(10)} "
    f"bins={s._xbin_bins_checked(10)}")

_, ie = s.exact(q, 10)
ie = np.asarray(ie)


def check(tag):
    _, i1 = s.search(q, 10, 4, mode="xbin")
    _, il = s.search_loop(q, 10, 4, reps=3, mode="xbin")
    ok1 = np.array_equal(np.asarray(i1), ie)
    ok2 = np.array_equal(np.asarray(il), ie)
    log(f"{tag}: search={'OK' if ok1 else 'MISMATCH'} "
        f"loop={'OK' if ok2 else 'MISMATCH'}")
    return ok1 and ok2


ok = check("auto (in budget -> unchunked)")
dev._XBIN_FUSE_BUDGET = 1024  # force the auto policy to chunk on-chip
g = dev._xbin_auto_chunk(64, int(s.emb.shape[0]), s._xbin_bins_checked(10), 0)
log(f"budget=1KB -> auto chunk_groups={g}")
ok &= check("auto (tiny budget -> chunked)")
s.xbin_chunk_groups = -1
ok &= check("forced unchunked (-1)")
s.xbin_chunk_groups = 0
log("VERIFY PASS" if ok else "VERIFY FAIL")
sys.exit(0 if ok else 1)
