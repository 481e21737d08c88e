"""Chip session r4b: WHY doesn't the tile-argmin epilogue fuse?

Session r4a: the one-call tilescan materializes the full [B, n] int32
key array (32 GB compile OOM at B=8192 — 'output of fusion.22'), and the
chunked lax.scan form is HBM-bound (31.9k QPS). The floor loop also had
a DCE hole (chained only m[0], so XLA could slice the batch — the 134%
'MFU' at B=8192). This probe separates the variables with pure-jnp
variants, each chained on its FULL output, each compile-checked with
memory_analysis() BEFORE execution (skip if temps would OOM):

  A   matmul + min axis=1            -> [B]      (the honest floor)
  B   + reshape (B,nT,T) min axis=2  -> [B,nT]   (grouped, minor axis)
  B2  + reduce_window (1,T)/(1,T)    -> [B,nT]   (grouped, pooling form)
  B3  + reshape (B,T,nT) min axis=1  -> [B,nT]   (grouped, major axis)
  C   + pack(bitcast,and,or) min ax1 -> [B]      (does packing break it?)
  D   pack + B-grouping              -> [B,nT]
  D3  pack + B3-grouping             -> [B,nT]
  G   grouped min AND argmin (B3)    -> [B,nT]x2 (variadic reduce form)
  S   scan (approx_min_k) reference  ->           (window health ref)

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r4b.py 1800
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import ensure_bench_dataset, log, watchdog  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402

watchdog(600.0)
log(f"device alive ({jax.devices()})")

import functools  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from pqvector_tpu.io.embed import read_index_from_parquet  # noqa: E402
from pqvector_tpu.io.reader import read_embedding_column  # noqa: E402

path = "/root/repo/data/bench_1000000x128.parquet"
ensure_bench_dataset(path)
index, col = read_index_from_parquet(path)
emb_np = read_embedding_column(path, col).data
n, d = emb_np.shape
T = 128
n_pad = -(-(n + 1) // 4096) * 4096  # 1003520: divisible by 128 and 4096
pad = np.zeros((n_pad, d), np.float32)
pad[:n] = emb_np
sq_np = np.full(n_pad, np.float32(3e38))
sq_np[:n] = np.einsum("nd,nd->n", emb_np, emb_np)
emb = jnp.asarray(pad).astype(jnp.bfloat16)
sq = jnp.asarray(sq_np)
rng = np.random.default_rng(3)
q_np = (emb_np[rng.integers(0, n, 8192)]
        + 0.05 * rng.standard_normal((8192, d))).astype(np.float32)
del emb_np, pad
nT = n_pad // T
log(f"resident bf16 [{n_pad},{d}], nT={nT}")

REPS = 10
PEAK = 197e12
HBM = 16 * (1 << 30)


def pack(part, code):
    keys = jax.lax.bitcast_convert_type(part, jnp.int32)
    return (keys & jnp.int32(~0x7F)) | code


def chain(out_fn):
    """reps-chained loop whose carry depends on EVERY output element."""

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(q0, e, s, reps):
        def step(carry, _):
            qf = (q0 + carry).astype(e.dtype)
            outs = out_fn(qf, e, s)
            link = jnp.float32(0)
            for o in outs:
                link += jnp.sum(o.astype(jnp.float32)) * 0.0
            return carry + link, outs[0].reshape(-1)[:1]

        c, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
        return ys[-1]

    return loop


def score(qf, e, s):
    sc = jnp.dot(qf, e.T, preferred_element_type=jnp.float32)
    return s[None, :] - 2.0 * sc


CODE_ROW = jnp.arange(n_pad, dtype=jnp.int32) & 0x7F  # r % 128 (B-orient)


def v_A(qf, e, s):
    return (jnp.min(score(qf, e, s), axis=1),)


def v_B(qf, e, s):
    b = qf.shape[0]
    return (jnp.min(score(qf, e, s).reshape(b, nT, T), axis=2),)


def v_B2(qf, e, s):
    part = score(qf, e, s)
    return (jax.lax.reduce_window(
        part, jnp.float32(np.inf), jax.lax.min,
        window_dimensions=(1, T), window_strides=(1, T), padding="VALID",
    ),)


def v_B3(qf, e, s):
    b = qf.shape[0]
    return (jnp.min(score(qf, e, s).reshape(b, T, nT), axis=1),)


def v_C(qf, e, s):
    return (jnp.min(pack(score(qf, e, s), CODE_ROW[None, :]), axis=1),)


def v_D(qf, e, s):
    b = qf.shape[0]
    return (jnp.min(
        pack(score(qf, e, s), CODE_ROW[None, :]).reshape(b, nT, T), axis=2
    ),)


CODE_STRIDE = (jnp.arange(n_pad, dtype=jnp.int32) // nT) & 0x7F


def v_D3(qf, e, s):
    b = qf.shape[0]
    return (jnp.min(
        pack(score(qf, e, s), CODE_STRIDE[None, :]).reshape(b, T, nT),
        axis=1,
    ),)


def v_G(qf, e, s):
    b = qf.shape[0]
    part = score(qf, e, s).reshape(b, T, nT)
    return jnp.min(part, axis=1), jnp.argmin(part, axis=1)


def v_S(qf, e, s):
    part = score(qf, e, s)
    vals, idx = jax.lax.approx_min_k(part, 64, recall_target=0.95)
    return vals, idx


VARIANTS = [
    ("A floor", v_A), ("B grouped-minor", v_B), ("B2 reduce_window", v_B2),
    ("B3 grouped-major", v_B3), ("C packed-flat", v_C),
    ("D packed-minor", v_D), ("D3 packed-major", v_D3),
    ("G min+argmin", v_G), ("S approx_min_k", v_S),
]

for B in (4096, 8192):
    qb = jnp.asarray(q_np[:B])
    log(f"---- B={B} ----")
    for name, fn in VARIANTS:
        loop = chain(fn)
        try:
            lowered = loop.lower(qb, emb, sq, reps=REPS)
            compiled = lowered.compile()
            ma = compiled.memory_analysis()
            temp = getattr(ma, "temp_size_in_bytes", -1)
            log(f"{name}: temp={temp/1e9:.2f} GB")
            if temp > 0.8 * HBM:
                log(f"{name}: SKIPPED (temps would OOM)")
                continue
            np.asarray(compiled(qb, emb, sq))  # warm
            t0 = time.perf_counter()
            calls = 0
            while time.perf_counter() - t0 < 5.0 and calls < 8:
                np.asarray(compiled(qb, emb, sq))
                calls += 1
            dt = (time.perf_counter() - t0) / (calls * REPS)
            qps = B / dt
            mfu = 2.0 * n_pad * d * qps / PEAK
            log(f"{name}: {dt*1e3:7.2f} ms/batch {qps:9.0f} QPS "
                f"(MFU {mfu:5.1%})")
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
log("session r4b done")
