"""Session r5g — rebuilt mode="cert" end-to-end QPS (the r5f tail that the
tunnel outage cut off at [151.8s]).

r5f validated identity of the rebuilt cert (value-only pass-1: einsum
fold / fused Pallas tilemin) against exact(mode="xla") on chip; what
never got measured is the END-TO-END certified-exact serving rate —
the VERDICT r4 item 5 "done" criterion (exact_qps >= 60k @B1024, vs
the 13.4k the packed-key cert served in r5a and the ~31k/5.5k plain
exact). Measures cert_probe rates, exact_loop QPS at B=256/1024 for
cert(high/highest) vs auto, and the same-window matmul+min floor.

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r5g.py 2400
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import log, watchdog, ensure_bench_dataset  # noqa: E402

import numpy as np  # noqa: E402

watchdog(900.0)
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
log(f"bf16 searcher resident (n_pad={n_pad})")


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


# ---- identity + certify rates (rebuilt pass-1) ------------------------
watchdog(600.0)
de, ie = s.exact(q_all[:256], 10, mode="xla")
ie = np.asarray(ie)
for p1 in ("highest", "high"):
    s.cert_pass1 = p1
    dc, ic = s.exact(q_all[:256], 10, mode="cert")
    same = np.array_equal(np.asarray(ic), ie)
    log(f"identity cert({p1}) vs xla: ids_equal={same}")
    rate, margins = s.cert_probe(q_all[:256], 10)
    log(f"cert_probe({p1}): rate={rate:.4f} min_margin={float(np.min(margins)):.4f}")

# ---- QPS: cert vs auto, against the same-window floor -----------------
results = {}
for b in (256, 1024):
    watchdog(600.0)
    floor = measure_floor_qps(jax, s, q_all[:b])
    log(f"B={b}: same-window matmul+min floor = {floor:,.0f} QPS")
    qb = jax.device_put(np.ascontiguousarray(q_all[:b], np.float32))
    for p1 in ("high", "highest"):
        s.cert_pass1 = p1
        q = timed(
            lambda qq, r: s.exact_loop(qq, 10, reps=r, mode="cert")[1],
            qb, tag=f"exact_loop cert({p1}) B={b}",
        )
        results[(b, p1)] = q
    timed(
        lambda qq, r: s.exact_loop(qq, 10, reps=r, mode="auto")[1],
        qb, tag=f"exact_loop auto B={b}",
    )

best1024 = max(
    (v for (b, _), v in results.items() if b == 1024 and v), default=0.0
)
log(f"B=1024 best cert exact: {best1024:,.0f} QPS (target >=60k: "
    f"{best1024 >= 60000})")
log("session r5g complete")
