"""Chip session r4h: bf16-wire auto build + pipelined-refine probe.

1. Reference-default (1M x 1024) build_inplace twice with the new
   transfer_dtype="auto" default (bf16 wire on TPU): the r4 runner
   measured f32 wire at decode+transfer 43-72 s; bf16 wire halves the
   tunnel bytes (round-3 same-window pair: 45.7 vs 111.6 s total).
   Target: warm build <= 45 s (VERDICT item 5).
2. Software-pipelined refine probe at B=4096 (rt=0.9, fetch=20): the
   serving loop refines candidates AFTER the extraction that produced
   them — a 1-deep pipeline refines iteration i-1's candidates while
   iteration i's matmul runs, giving XLA's scheduler freedom to overlap
   the gather (VPU/DMA) with the MXU matmul. If the overlap is real,
   raw+refine (8.5 ms) approaches raw (7.0 ms).

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r4h.py 2400
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

# ---- 1. bf16-wire auto builds ----
from pqvector_tpu.builder import IndexBuilder  # noqa: E402
from pqvector_tpu.index.build import (  # noqa: E402
    IvfBuildConfig, resolve_transfer_dtype,
)
from pqvector_tpu.utils.profiling import drain_stages  # noqa: E402

assert resolve_transfer_dtype(IvfBuildConfig()) == "bfloat16", \
    "auto must resolve to bf16 on TPU"
ref_path = "/root/repo/data/refdefault_1m_1024.parquet"
if os.path.exists(ref_path):
    for label in ("first", "warm"):
        drain_stages()
        t0 = time.time()
        IndexBuilder(ref_path, "embedding").n_clusters(1000).build_inplace()
        total = time.time() - t0
        log(f"bf16-auto build_inplace ({label}): {total:.1f}s")
        for name, secs in drain_stages():
            log(f"  {name}: {secs:.1f}s")
else:
    log("refdefault cache absent; skipping build rung")

# Sanity: the freshly built index still serves correct neighbors.
from pqvector_tpu.io.embed import read_index_from_parquet  # noqa: E402
from pqvector_tpu.io.reader import read_embedding_column  # noqa: E402
from pqvector_tpu.query.device import DeviceIvfSearcher  # noqa: E402

if os.path.exists(ref_path):
    index_r, col_r = read_index_from_parquet(ref_path)
    emb_r = read_embedding_column(ref_path, col_r).data
    sr = DeviceIvfSearcher(index_r, emb_r, row_tile=4096,
                           dtype=jnp.bfloat16)
    rngr = np.random.default_rng(5)
    pick = rngr.integers(0, len(emb_r), 64)
    qs = emb_r[pick].copy()
    del emb_r
    # Queries drawn FROM the data: top-1 must be the row itself at ~0.
    d0, i0 = sr.search(qs, 1, 16, mode="scan")
    d0 = np.asarray(d0)[:, 0]
    hit = float(np.mean(np.asarray(i0)[:, 0] == pick))
    log(f"bf16-auto build sanity: self-hit={hit:.3f} "
        f"max self-distance={d0.max():.4f}")
    del sr
    import gc
    gc.collect()

# ---- 2. pipelined refine probe ----
path = "/root/repo/data/bench_1000000x128.parquet"
ensure_bench_dataset(path)
index, col = read_index_from_parquet(path)
emb_np = read_embedding_column(path, col).data
n, d = emb_np.shape
rng = np.random.default_rng(3)
q_np = (emb_np[rng.integers(0, n, 4096)]
        + 0.05 * rng.standard_normal((4096, d))).astype(np.float32)
s = DeviceIvfSearcher(index, emb_np, row_tile=4096, dtype=jnp.bfloat16)
del emb_np
from bench import measure_floor_qps  # noqa: E402

RT, KF, K = 0.9, 20, 10
results = {}


def timed(label, call, b, budget=5.0, reps=25):
    try:
        call()
        t0 = time.perf_counter()
        nn = 0
        while time.perf_counter() - t0 < budget and nn < 16 * reps:
            call()
            nn += reps
        qps = nn * b / (time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001
        log(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return None
    results[label] = qps
    log(f"{label}: {b/qps*1e3:7.2f} ms/batch {qps:9.0f} QPS")
    return qps


@functools.partial(jax.jit, static_argnames=("reps",))
def serial_loop(q0, e, s_, ref, reps):
    """Extraction and refine of the SAME iteration (current serving)."""
    def step(carry, _):
        qf = (q0 + 0.0 * carry).astype(e.dtype)
        part = s_[None, :] - 2.0 * jnp.dot(
            qf, e.T, preferred_element_type=jnp.float32
        )
        vals, idx = jax.lax.approx_min_k(part, KF, recall_target=RT)
        x = ref[jnp.maximum(idx, 0)].astype(jnp.float32)
        d2 = jnp.sum((x - q0[:, None, :]) ** 2, axis=-1)
        neg, pos = jax.lax.top_k(-d2, K)
        return carry + 0.0 * jnp.sum(-neg), (-neg)[:1, :1]

    c, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
    return ys[-1]


@functools.partial(jax.jit, static_argnames=("reps",))
def pipelined_loop(q0, e, s_, ref, reps):
    """1-deep pipeline: refine iteration i-1's candidates while the
    iteration-i matmul runs (independent HLOs; XLA may overlap the
    gather with the MXU). The refined output still accumulates into the
    carry so no iteration's work is DCE-able."""
    def step(carry, _):
        acc, pending = carry  # pending: [B, KF] candidate ids from i-1
        qf = (q0 + 0.0 * acc).astype(e.dtype)
        part = s_[None, :] - 2.0 * jnp.dot(
            qf, e.T, preferred_element_type=jnp.float32
        )
        vals, idx = jax.lax.approx_min_k(part, KF, recall_target=RT)
        # refine of the PREVIOUS iteration's candidates (no dependency
        # on this iteration's matmul)
        x = ref[jnp.maximum(pending, 0)].astype(jnp.float32)
        d2 = jnp.sum((x - q0[:, None, :]) ** 2, axis=-1)
        neg, pos = jax.lax.top_k(-d2, K)
        acc = acc + 0.0 * (jnp.sum(-neg) + jnp.sum(vals))
        return (acc, idx), (-neg)[:1, :1]

    init = (jnp.float32(0), jnp.zeros((q0.shape[0], KF), jnp.int32))
    c, ys = jax.lax.scan(step, init, None, length=reps)
    return ys[-1]


B = 4096
qb = jax.device_put(q_np[:B])
floor4 = measure_floor_qps(jax, s, q_np[:B])
log(f"honest floor@B4096: {floor4:.0f} QPS")
ref = s._ref_or_emb()
timed("serial refine", lambda: np.asarray(
    serial_loop(qb, s.emb, s.emb_sq, ref, 25)), B)
timed("pipelined refine", lambda: np.asarray(
    pipelined_loop(qb, s.emb, s.emb_sq, ref, 25)), B)


def serve():
    s.approx_recall_target = RT
    s.scan_overfetch = KF
    _, ids = s.search_loop(qb, K, 8, reps=25, mode="scan")
    np.asarray(ids)


timed("served search_loop", serve, B)
log(f"summary: {sorted(results.items(), key=lambda kv: -kv[1])}")
log("session r4h done")
