"""Chip session H: settle the measurements session G left confounded.

1. SAME-WINDOW f32 vs bf16 wire build (refdefault 1M x 1024, both warm
   after one throwaway stage) — session G read bf16=98.7s in a degraded
   window against a healthy-window f32=73.6s baseline, which is not a
   comparison.
2. DEEP-10M B=256 bincompact vs scan re-read (session G: 0.96x in the
   same degraded window; B=64 bincompact won 1.40x).

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r3h.py 2400
(then run `python bench.py` separately for the full-sweep pre-validation).
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

import shutil

import jax.numpy as jnp
from pqvector_tpu.builder import IndexBuilder

src = "/root/repo/data/refdefault_1m_1024.parquet"


def timed_build(tag, **cfg):
    tmp = f"/tmp/refdefault_{tag}.parquet"
    shutil.copyfile(src, tmp)
    b = IndexBuilder(tmp, "embedding").n_clusters(1000)
    if cfg.get("bf16"):
        b = b.transfer_dtype("bfloat16")
    t0 = time.time()
    b.build_inplace()
    dt = time.time() - t0
    os.remove(tmp)
    log(f"build {tag}: {dt:.1f}s")
    return dt

# Alternate so window drift hits both arms; first pair is the warm-up
# (compiles both paths), the second pair is the measurement.
f1 = timed_build("f32_warmup")
b1 = timed_build("bf16_warmup", bf16=True)
f2 = timed_build("f32")
b2 = timed_build("bf16", bf16=True)
log(f"SAME-WINDOW pair: f32 {f2:.1f}s vs bf16 {b2:.1f}s "
    f"(warm-up pair {f1:.1f}/{b1:.1f})")
gc.collect()

# ---- DEEP-10M B=256 re-read ----
from pqvector_tpu.io.embed import read_index_from_parquet
from pqvector_tpu.io.reader import read_embedding_column
from pqvector_tpu.query.device import DeviceIvfSearcher

path = "/root/repo/data/deep10m_96.parquet"
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
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


def measure(mode, b, reps=10, budget_s=8.0):
    qb = q_all[:b]
    fn = lambda: s.search_loop(qb, 10, 4, reps=reps, mode=mode)
    np.asarray(fn()[1])
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 8 * reps:
        np.asarray(fn()[1])
        n += reps
    qps = n * b / (time.perf_counter() - t0)
    log(f"mode={mode} B={b}: {qps:.0f} QPS ({b/qps*1e3:.2f} ms/batch)")
    return qps


res = {}
for b in (256, 64):
    s.calibrate_bincompact(q_all[:b], 4, 10)
    for mode in ("bincompact", "scan"):
        res[(mode, b)] = measure(mode, b, budget_s=8.0 if b >= 256 else 5.0)
for b in (256, 64):
    log(
        f"bincompact/scan at B={b} = "
        f"{res[('bincompact', b)] / res[('scan', b)]:.2f}x"
    )
log("session complete")
