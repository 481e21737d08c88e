"""Session r5a — mode="cert" validation at the bench shape (VERDICT r4
item 5: build a fast exact rung; done = exact_qps >= 60k @B1024 with an
on-chip identity check vs the current exact path).

Stages (each fault-isolated):
  1. identity: exact(cert) == exact(xla) at B=256 on the bf16 searcher
     (bench exact config: cluster_sorted=True, f32 re-score reference),
     both for cert_pass1 = highest and high.
  2. exact_loop contest at B=256 / 1024 / 4096: auto (the three-rounds-
     flat merge) vs cert(highest) vs cert(high).
  3. certify-rate probe: cert with a starved fetch (m=1) times the
     fallback path; cert-default >> cert-starved implies certificates
     fire (the fallback runs the full exact merge on top of pass 1).
On success writes scripts/.cert_validated (device-stamped) so bench.py's
exact contest may include cert (the tilescan-marker pattern).

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r5a.py 2400
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import log, watchdog, ensure_bench_dataset  # noqa: E402

import numpy as np  # noqa: E402

watchdog(600.0)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

log(f"device alive ({jax.devices()})")

from pqvector_tpu.io.embed import read_index_from_parquet  # noqa: E402
from pqvector_tpu.io.reader import read_embedding_column  # noqa: E402
from pqvector_tpu.query.device import DeviceIvfSearcher  # noqa: E402

path = ensure_bench_dataset("/root/repo/data/bench_1000000x128.parquet")
index, col = read_index_from_parquet(path)
emb = read_embedding_column(path, col).data
rows, dim = emb.shape
log(f"embeddings loaded ({rows}x{dim})")

rng = np.random.default_rng(7)
q_all = emb[rng.integers(0, rows, 4096)] + 0.05 * rng.standard_normal(
    (4096, dim)
).astype(np.float32)

s = DeviceIvfSearcher(
    index, emb, row_tile=4096, dtype=jnp.bfloat16, cluster_sorted=True
)
log("bf16 searcher resident (cluster_sorted, f32 re-score ref)")

ok_all = True

# ---- stage 1: identity at B=256 -------------------------------------
watchdog(300.0)
q256 = q_all[:256]
try:
    de, ie = s.exact(q256, 10, mode="xla")
    de, ie = np.asarray(de), np.asarray(ie)
    log("exact(xla) B=256 done")
    for p1 in ("highest", "high"):
        s.cert_pass1 = p1
        t0 = time.perf_counter()
        dc, ic = s.exact(q256, 10, mode="cert")
        dc, ic = np.asarray(dc), np.asarray(ic)
        same = np.array_equal(ic, ie)
        dmax = float(np.max(np.abs(dc - de)))
        log(f"identity cert({p1}) vs xla: ids_equal={same} "
            f"max|d-d|={dmax:.3e} ({time.perf_counter()-t0:.1f}s)")
        ok_all &= same and dmax < 1e-4
except Exception as e:  # noqa: BLE001
    log(f"stage 1 FAILED: {type(e).__name__}: {str(e)[:300]}")
    ok_all = False


def measure_exact(mode, b, p1="highest", reps=25, budget_s=6.0):
    qb = jax.device_put(np.ascontiguousarray(q_all[:b], dtype=np.float32))
    s.cert_pass1 = p1
    tag = f"{mode}({p1})" if mode == "cert" else mode
    try:
        np.asarray(s.exact_loop(qb, 10, reps=reps, mode=mode)[1])
    except Exception as e:  # noqa: BLE001
        log(f"exact_loop {tag} B={b}: FAILED "
            f"({type(e).__name__}: {str(e)[:200]})")
        return None
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_s and n < 16 * reps:
        _, ids = s.exact_loop(qb, 10, reps=reps, mode=mode)
        np.asarray(ids)
        n += reps
    qps = n * b / (time.perf_counter() - t0)
    log(f"exact_loop {tag} B={b}: {qps:,.0f} QPS ({b/qps*1e3:.2f} ms/batch)")
    return qps


# ---- stage 2: exact contest ------------------------------------------
results = {}
for b in (256, 1024, 4096):
    watchdog(300.0)
    results[("auto", b)] = measure_exact("auto", b)
    results[("cert", b)] = measure_exact("cert", b, "highest")
    results[("cert_high", b)] = measure_exact("cert", b, "high")

# ---- stage 3: certify-rate probe (B=1024) ----------------------------
watchdog(300.0)
s.cert_pass1 = "highest"
s.cert_fetch_tiles = 1  # starve -> certificate must fail -> fallback path
starved = measure_exact("cert", 1024)
s.cert_fetch_tiles = 0
if starved and results.get(("cert", 1024)):
    ratio = results[("cert", 1024)] / starved
    log(f"certify-rate probe: default/starved = {ratio:.2f}x "
        f"(>1.5x implies certificates fire; starved times the fallback)")
    ok_all &= ratio > 1.5

best1024 = max(
    (v for (m, b), v in results.items() if b == 1024 and v), default=0
)
target = best1024 and best1024 >= 60_000
log(f"B=1024 best exact: {best1024:,.0f} QPS (target >=60k: {target})")

if ok_all and results.get(("cert", 256)) and results.get(("cert", 1024)):
    marker = "/root/repo/scripts/.cert_validated"
    with open(marker, "w") as f:
        f.write(
            f"validated {time.strftime('%Y-%m-%d %H:%M:%S')} on "
            f"{jax.devices()}\nidentity ok; B=1024 best "
            f"{best1024:.0f} QPS\n"
        )
    log(f"marker written: {marker}")
else:
    log("NOT writing marker (a stage failed)")
log("session r5a complete")
