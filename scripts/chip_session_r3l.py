"""Chip session L: large-batch scaling with fused-epilogue selection.

Round-3 lead: scan@B=8192 does not scale past B=4096 (104 ms/batch) —
suspected PartialReduce extraction cost growing with B. If xbin holds
its per-batch cost near the matmul+min floor, B=8192 should nearly
double headline QPS. Ladder: floor at B in {4096, 8192} -> xbin at the
session-J-best bin count -> scan for the same-window comparison.

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r3l.py 1500
"""
import functools
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


watchdog(600.0)  # backend init alone takes ~140 s on a fresh VM
log(f"device alive ({jax.devices()})")

import jax.numpy as jnp
from pqvector_tpu.io.embed import read_index_from_parquet
from pqvector_tpu.io.reader import read_embedding_column
from pqvector_tpu.query.device import DeviceIvfSearcher

path = "/root/repo/data/bench_1000000x128.parquet"
from _common import ensure_bench_dataset

ensure_bench_dataset(path)
index, col = read_index_from_parquet(path)
emb_np = read_embedding_column(path, col).data
rng = np.random.default_rng(3)
q_np = (emb_np[rng.integers(0, len(emb_np), 8192)]
        + 0.05 * rng.standard_normal((8192, 128))).astype(np.float32)
s = DeviceIvfSearcher(index, emb_np, row_tile=4096, dtype=jnp.bfloat16)
emb, sq = s.emb, s._pallas_emb_sq()
del emb_np
log("resident (bf16, orig order)")

# Overridden by session-J findings if a different bin count wins.
XBIN_BINS = int(os.environ.get("XBIN_BINS", "0")) or None

REPS = 25


@functools.partial(jax.jit, static_argnames=("reps",))
def floor_loop(q0, e, s_, reps):
    def step(carry, _):
        qf = (q0 + carry).astype(e.dtype)
        scores = jnp.dot(qf, e.T, preferred_element_type=jnp.float32)
        m = jnp.min(s_[None, :] - 2.0 * scores, axis=1)
        return 0.0 * m[0], m[:1]

    _, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
    return ys[-1]


def timeit(tag, fn, b, budget_s=5.0):
    np.asarray(fn())
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 8 * REPS:
        np.asarray(fn())
        n += REPS
    dt = (time.perf_counter() - t0) / n
    mfu = 2.0 * 1e6 * 128 * b / dt / 197e12
    log(f"{tag}: {dt*1e3:.2f} ms/batch  {b/dt:.0f} QPS  ({mfu:.1%} bf16 peak)")
    return dt


for b in (4096, 8192):
    q = jnp.asarray(q_np[:b])
    timeit(f"floor matmul+min  B={b}", lambda: floor_loop(q, emb, sq, REPS), b)
    if XBIN_BINS:
        s.xbin_bins = XBIN_BINS
    timeit(
        f"xbin (bins={s._xbin_bins_checked(10)}) B={b}",
        lambda: s.search_loop(q, 10, 4, reps=REPS, mode="xbin")[1], b,
    )
    timeit(f"scan (kf policy)  B={b}",
           lambda: s.search_loop(q, 10, 4, reps=REPS, mode="scan")[1], b)
log("session complete")
