"""Session r5f — cert pass-1 formulation experiments at the bench shape.

r5b attributed cert's cost: the packed tile-min epilogue runs at 25ms
@B1024 while the same-window matmul+plain-min floor is 4ms — the grouped
min does NOT fuse into the scoring matmul (the xbin non-fusion, again).
Candidates (timed here as raw chained loops, library untouched):

  A. value-only fold: drop the int32 key packing (cert gathers tiles
     whole, so pass-1 provenance is dead weight) — part.reshape(b,g,t)
     .min(2) on plain f32.
  B. dot-shaped fold: einsum "bd,gtd->bgt" + min over the LAST axis —
     the reduce is innermost over the dot output, the exact shape the
     floor's fused min(axis=1) has.
  C. hardware PartialReduce segment-min: approx_min_k(part, k,
     aggregate_to_topk=False) — per-contiguous-segment mins fused into
     the matmul by the hardware (the fastest known extraction on this
     chip). + a layout probe pinning that segments are contiguous
     ascending (the soundness precondition for a certificate built on
     segment mins).
  P. the new fused Pallas kernel (kernels/tilemin.py): MXU dot + in-VMEM
     grouped min, at bf16 / f32-HIGH / f32-HIGHEST — first on-chip run
     (Mosaic validation in a dedicated solo process, the round-1 rule),
     followed by the rebuilt mode="cert" end-to-end (identity + QPS).

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r5f.py 2400
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import log, watchdog, ensure_bench_dataset  # noqa: E402

import numpy as np  # noqa: E402

watchdog(900.0)
import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

log(f"device alive ({jax.devices()})")

from bench import measure_floor_qps  # noqa: E402
from pqvector_tpu.io.embed import read_index_from_parquet  # noqa: E402
from pqvector_tpu.io.reader import read_embedding_column  # noqa: E402
from pqvector_tpu.query.device import DeviceIvfSearcher  # noqa: E402

path = ensure_bench_dataset("/root/repo/data/bench_1000000x128.parquet")
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
rows, dim = emb.shape
log(f"embeddings loaded ({rows}x{dim})")

rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, rows, 1024)] + 0.05 * rng.standard_normal(
    (1024, dim)
).astype(np.float32)

s = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=True
)
n_pad = int(s.emb.shape[0])
TILE = 128
NT = n_pad // TILE
log(f"bf16 searcher resident (n_pad={n_pad}, nt={NT})")


def timed(fn_reps, qb, reps=25, budget_s=5.0, tag=""):
    try:
        np.asarray(fn_reps(qb, reps))
    except Exception as e:  # noqa: BLE001
        log(f"{tag}: FAILED ({type(e).__name__}: {str(e)[:200]})")
        return None
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 16 * reps:
        np.asarray(fn_reps(qb, reps))
        n += reps
    b = qb.shape[0]
    qps = n * b / (time.perf_counter() - t0)
    log(f"{tag}: {qps:,.0f} QPS ({b / qps * 1e3:.3f} ms/batch)")
    return qps


@functools.partial(jax.jit, static_argnames=("reps", "variant"))
def pass1_loop(q0, e, sq, reps, variant):
    b = q0.shape[0]

    def fold(qf):
        qf2 = (-2.0 * qf).astype(e.dtype)
        if variant == "A":  # value-only reshape fold
            scores = jnp.dot(qf2, e.T, preferred_element_type=jnp.float32)
            part = sq[None, :] + scores
            return jnp.min(part.reshape(b, NT, TILE), axis=2)
        if variant == "B":  # dot-shaped fold (reduce innermost)
            e3 = e.reshape(NT, TILE, e.shape[1])
            s3 = jnp.einsum(
                "bd,gtd->bgt", qf2, e3, preferred_element_type=jnp.float32
            )
            return jnp.min(s3 + sq.reshape(NT, TILE)[None], axis=2)
        if variant == "C":  # hardware PartialReduce segment mins
            scores = jnp.dot(qf2, e.T, preferred_element_type=jnp.float32)
            part = sq[None, :] + scores
            v, i = jax.lax.approx_min_k(
                part, 10, recall_target=0.95, aggregate_to_topk=False
            )
            return v
        raise ValueError(variant)

    def step(carry, _):
        m = fold(q0 + carry)
        return 0.0 * jnp.sum(m[:, :1]), m[:1, :1]

    _, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
    return ys[-1]


# Layout probe for C: segments must be contiguous ascending runs.
watchdog(300.0)
n_probe = 1 << 20
asc = jnp.arange(n_probe, dtype=jnp.float32)[None, :]
v, i = jax.lax.approx_min_k(
    asc, 10, recall_target=0.95, aggregate_to_topk=False
)
v, i = np.asarray(v)[0], np.asarray(i)[0]
l_segs = v.shape[0]
seg = n_probe // l_segs
contiguous = bool(
    np.all(v == np.arange(l_segs, dtype=np.float32) * seg)
    and np.all(i == np.arange(l_segs) * seg)
)
log(f"PartialReduce layout probe: l={l_segs} seg={seg} "
    f"contiguous_ascending={contiguous}")
# Descending probe: min of segment s sits at its LAST element.
desc = jnp.arange(n_probe, 0, -1, dtype=jnp.float32)[None, :]
v2, i2 = jax.lax.approx_min_k(
    desc, 10, recall_target=0.95, aggregate_to_topk=False
)
v2, i2 = np.asarray(v2)[0], np.asarray(i2)[0]
contig2 = bool(
    np.all(i2 == np.arange(1, l_segs + 1) * seg - 1)
    and np.all(v2 == n_probe - i2)
)
log(f"PartialReduce descending probe: contiguous={contig2}")

for b in (256, 1024):
    watchdog(300.0)
    qb = jax.device_put(np.ascontiguousarray(q_all[:b]))
    fq = emb[rng.integers(0, rows, b)].astype(np.float32)
    f = measure_floor_qps(jax, s, fq)
    log(f"B={b}: same-window floor = {f:,.0f} QPS "
        f"({b / f * 1e3:.3f} ms/batch)")
    for variant in ("A", "B", "C"):
        timed(
            lambda q, r, _v=variant: pass1_loop(q, s.emb, s.emb_sq, r, _v),
            qb, tag=f"B={b} pass1 variant {_v if False else variant}(bf16)",
        )
    # f32-reference operand for the certified-tight slack variants.
    timed(
        lambda q, r: pass1_loop(q, s._ref(), s.emb_sq, r, "C"),
        qb, tag=f"B={b} pass1 variant C(f32)",
    )

# ---- P: the production pass-1 dispatcher (_tile_min_vals: Pallas when
# a Mosaic-legal grid exists, fused einsum fold otherwise — at the bench
# shape nt=7840 has no 128-multiple divisor, so this times the einsum
# path at cert's ACTUAL precisions).
from pqvector_tpu.query.device import _tile_min_vals  # noqa: E402

watchdog(300.0)
qs = jnp.asarray(q_all[:8])
xla_vals = np.asarray(
    jnp.min(
        (s.emb_sq[None, :] - 2.0 * jnp.dot(
            qs, s._ref().T, precision=jax.lax.Precision.HIGHEST
        )).reshape(8, NT, TILE),
        axis=2,
    )
)
p_vals = np.asarray(_tile_min_vals(qs, s._ref(), s.emb_sq, TILE))
err = np.abs(p_vals - xla_vals)[np.isfinite(xla_vals)]
log(f"_tile_min_vals(f32 HIGHEST) vs reshape fold: max|err|={err.max():.3e}")


@functools.partial(jax.jit, static_argnames=("reps", "high"))
def p1_loop(q0, e, sq, reps, high):
    def step(carry, _):
        m = _tile_min_vals(q0 + carry, e, sq, TILE, high=high)
        return 0.0 * jnp.sum(m[:, :1]), m[:1, :1]

    _, ys = jax.lax.scan(step, jnp.float32(0), None, length=reps)
    return ys[-1]


for b in (256, 1024):
    watchdog(300.0)
    qb = jax.device_put(np.ascontiguousarray(q_all[:b]))
    timed(
        lambda q, r: p1_loop(q, s.emb, s.emb_sq, r, False),
        qb, tag=f"B={b} pass1 P(bf16)",
    )
    timed(
        lambda q, r: p1_loop(q, s._ref(), s.emb_sq, r, False),
        qb, tag=f"B={b} pass1 P(f32 HIGHEST)",
    )
    timed(
        lambda q, r: p1_loop(q, s._ref(), s.emb_sq, r, True),
        qb, tag=f"B={b} pass1 P(f32 HIGH)",
    )

# ---- rebuilt mode="cert" end-to-end (value-only pass 1 via P) ---------
watchdog(300.0)
de, ie = s.exact(q_all[:256], 10, mode="xla")
for p1 in ("highest", "high"):
    s.cert_pass1 = p1
    dc, ic = s.exact(q_all[:256], 10, mode="cert")
    same = np.array_equal(np.asarray(ic), np.asarray(ie))
    log(f"identity cert({p1}, pallas pass1) vs xla: ids_equal={same}")
    rate, margins = s.cert_probe(q_all[:256], 10)
    log(f"cert_probe({p1}): rate={rate:.4f} min_margin={margins.min():.3f}")
for b in (256, 1024):
    watchdog(300.0)
    qb = jax.device_put(np.ascontiguousarray(q_all[:b]))
    for p1 in ("high", "highest"):
        s.cert_pass1 = p1
        timed(
            lambda q, r: s.exact_loop(q, 10, reps=r, mode="cert")[1],
            qb, tag=f"B={b} cert({p1}, pallas pass1)",
        )
log("session r5f complete")
