"""Chip session J: decompose the scan-mode gap against the healthy floor.

bench run 5 measured floor (matmul+min) = 579k QPS / 75.3% MFU in the
SAME window where scan@4096 ran 148k (20%) — the window is healthy, the
serving path is slow. Ladder: floor -> +approx_min_k at k_fetch in
{10, 32, 64} -> +refine (full mode) to find where the time goes, and
whether the new small-k over-fetch (kf=64) is the main regression.

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r3j.py 1800
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
B = 4096
q_np = (emb_np[rng.integers(0, len(emb_np), B)]
        + 0.05 * rng.standard_normal((B, 128))).astype(np.float32)
s = DeviceIvfSearcher(index, emb_np, row_tile=4096, dtype=jnp.bfloat16)
emb, sq = s.emb, s._pallas_emb_sq()
q = jnp.asarray(q_np)
del emb_np
log("resident (bf16, orig order)")

REPS = 25


@functools.partial(jax.jit, static_argnames=("reps", "kind", "kf", "rt"))
def ladder(q0, e, s_, reps, kind, kf=10, rt=0.99):
    def step(carry, _):
        qf = (q0 + carry).astype(e.dtype)
        scores = jnp.dot(qf, e.T, preferred_element_type=jnp.float32)
        part = s_[None, :] - 2.0 * scores
        if kind == "min":
            m = jnp.min(part, axis=1)
            return 0.0 * m[0], m[:1]
        vals, idx = jax.lax.approx_min_k(part, kf, recall_target=rt)
        return 0.0 * vals[0, 0], vals[:1, :1]

    _, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
    return ys[-1]


def timeit(tag, fn, budget_s=5.0):
    # Fault-isolate each step: an OOM/compile failure in one variant (the
    # unchunked xbin epilogue is a known 16 GB risk at B=4096) must not
    # abort the session and burn the healthy window for the other steps.
    try:
        np.asarray(fn())
    except Exception as e:
        log(f"{tag}: FAILED ({type(e).__name__}: {str(e)[:200]})")
        return None
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 8 * REPS:
        np.asarray(fn())
        n += REPS
    dt = (time.perf_counter() - t0) / n
    mfu = 2.0 * 1e6 * 128 * B / dt / 197e12
    log(f"{tag}: {dt*1e3:.2f} ms/batch  {B/dt:.0f} QPS  ({mfu:.1%} bf16 peak)")
    return dt


timeit("floor matmul+min        ", lambda: ladder(q, emb, sq, REPS, "min"))


# int8 floor: the ceiling mode="xbin8" chases (int8 MXU = 2x bf16 on
# v5e; the scan reads 1/4 the f32 bytes). Quantize once on device.
@functools.partial(jax.jit, static_argnames=("reps",))
def ladder_i8(q0, e8, sc, s_, reps):
    qa = jnp.max(jnp.abs(q0), axis=1)
    tq = jnp.where(qa > 0, qa / 127.0, 1.0)

    def step(carry, _):
        # carry feeds the quantized query BEFORE the matmul (same trick as
        # the bf16 ladder) so XLA cannot hoist the loop's dot as invariant
        # — a hoisted [B, n] int32 dots block would both invalidate the
        # timing and OOM at 16 GB.
        qi = jnp.clip(
            jnp.round((q0 + carry) / tq[:, None]), -127, 127
        ).astype(jnp.int8)
        dots = jnp.dot(qi, e8.T, preferred_element_type=jnp.int32)
        part = s_[None, :] - 2.0 * tq[:, None] * (
            sc[None, :] * dots.astype(jnp.float32)
        )
        m = jnp.min(part, axis=1)
        return 0.0 * m[0], m[:1]

    _, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
    return ys[-1]


from pqvector_tpu.query.device import _quantize_rows_i8

e8_f, sc_f = _quantize_rows_i8(s.emb)
timeit("floor int8 matmul+min   ",
       lambda: ladder_i8(q, e8_f, sc_f, sq, REPS))
for kf in (10, 32, 64):
    timeit(f"matmul+approx kf={kf:<3} rt=.99",
           lambda kf=kf: ladder(q, emb, sq, REPS, "approx", kf, 0.99))
timeit("matmul+approx kf=64 rt=.95",
       lambda: ladder(q, emb, sq, REPS, "approx", 64, 0.95))
timeit("full scan mode (kf=64)  ",
       lambda: s.search_loop(q, 10, 4, reps=REPS, mode="scan")[1])
timeit("full binscan mode       ",
       lambda: s.search_loop(q, 10, 4, reps=REPS, mode="binscan")[1])

# ---- recall + QPS vs explicit fetch width (scan_overfetch knob) ----
# Truth = exact selection on the SAME bf16 array, isolating the
# extraction's selection loss from storage rounding.
_, tids = s.exact(q[:512], 10)
tids = np.asarray(tids)


def recall(ids):
    return sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(ids)[:512], tids)
    ) / 5120.0


for kf in (16, 32, 48, 64):
    s.scan_overfetch = kf
    _, ids = s.search(q_np[:512], 10, 4, mode="scan")
    r = recall(ids)
    dt = timeit(f"scan kf={kf:<3}            ",
                lambda: s.search_loop(q, 10, 4, reps=REPS, mode="scan")[1])
    log(f"  scan kf={kf}: recall@10(bf16-exact)={r:.4f}")
s.scan_overfetch = 48
_, ids = s.search(q_np[:512], 10, 8, mode="approx")
log(f"  approx kf=48 nprobe=8: recall@10(bf16-exact)={recall(ids):.4f}")
s.scan_overfetch = 0

# ---- XLA binned-min scan (mode="xbin": fused-epilogue selection) ----
# Sweep the bin count: more bins = fewer collisions but a bigger
# [B, l_bins] table (HBM write+read) + wider top_k. n_pad = 1,003,520 =
# 4096 x 245; lane-aligned divisor candidates below.
if s.can_xbin(10):
    # Force the one-call fused form (-1): the default 0 is now an
    # auto-chunk policy that would chunk at B=4096 x 1M; this session's
    # whole point is to measure whether XLA fuses the unchunked epilogue.
    s.xbin_chunk_groups = -1
    for lb in (0, 31360, 15680, 7840, 3584):
        if lb and int(s.emb.shape[0]) % lb:
            continue
        s.xbin_bins = lb
        try:
            _, ids = s.search(q_np[:512], 10, 4, mode="xbin")
            r = recall(ids)
        except Exception as e:
            log(f"xbin bins={lb}: recall probe FAILED "
                f"({type(e).__name__}: {str(e)[:200]})")
            continue
        timeit(f"xbin bins={s._xbin_bins_checked(10):<6}       ",
               lambda: s.search_loop(q, 10, 4, reps=REPS, mode="xbin")[1])
        log(f"  xbin bins={s._xbin_bins_checked(10)}: "
            f"recall@10(bf16-exact)={r:.4f}")
    # Chunked variant (memory hedge): same keys via lax.scan accumulator.
    s.xbin_bins = 7840
    s.xbin_chunk_groups = 16
    timeit("xbin bins=7840 chunk=16 ",
           lambda: s.search_loop(q, 10, 4, reps=REPS, mode="xbin")[1])
    s.xbin_chunk_groups = 0
    s.xbin_bins = 0

    # ---- int8 xbin (mode="xbin8"): quantized scoring on the int8 MXU,
    # 1/4 the f32 scan bytes, exact re-score. Attacks BOTH sides of the
    # limiter this session decomposes (the floor's matmul rate and the
    # scan traffic). Same fused-epilogue question as xbin, so measure
    # both the forced-unfused (-1) and the bounded chunked form.
    watchdog(180.0)
    for chunk in (-1, 16):
        s.xbin_chunk_groups = chunk
        try:
            _, ids = s.search(q_np[:512], 10, 4, mode="xbin8")
            r = recall(ids)
        except Exception as e:
            log(f"xbin8 chunk={chunk}: recall probe FAILED "
                f"({type(e).__name__}: {str(e)[:200]})")
            continue
        timeit(f"xbin8 chunk={chunk:<4}        ",
               lambda: s.search_loop(q, 10, 4, reps=REPS, mode="xbin8")[1])
        log(f"  xbin8 chunk={chunk}: recall@10(bf16-exact)={r:.4f}")
    s.xbin_chunk_groups = 0
else:
    log("xbin ineligible")
log("session complete")
