"""End-to-end verify on the real TPU: parquet build -> query -> binscan
family (new tile selection + expand kernel). Run via scripts/tpu_run.sh.
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
import pyarrow as pa
import pyarrow.parquet as pq

from pqvector_tpu import (
    IndexBuilder, TopkBuilder, has_pq_vector_index,
)
from pqvector_tpu.io.embed import read_index_from_parquet
from pqvector_tpu.io.reader import read_embedding_column
from pqvector_tpu.query.device import DeviceIvfSearcher

rng = np.random.default_rng(0)
n, d, k = 20000, 64, 10
centers = rng.uniform(-4, 4, (32, d)).astype(np.float32)
emb = (centers[rng.integers(0, 32, n)]
       + 0.15 * rng.standard_normal((n, d))).astype(np.float32)
path = "/tmp/verify_session.parquet"
pq.write_table(
    pa.table({"id": np.arange(n), "vec": pa.array(list(emb))}), path
)
t0 = time.time()
IndexBuilder(path, "vec").n_clusters(32).build_inplace()
assert has_pq_vector_index(path)
log(f"build_inplace: {time.time()-t0:.1f}s; index present")
assert pq.read_table(path).num_rows == n

q = (emb[rng.integers(0, n, 16)]
     + 0.05 * rng.standard_normal((16, d))).astype(np.float32)
res = TopkBuilder(path, q[0]).k(k).nprobe(4).search()
dists = np.array([r.distance for r in res])
assert np.all(np.diff(dists) >= -1e-6), "distances not ascending"
exact = np.sqrt(((q[0][None] - emb) ** 2).sum(-1))
want = set(np.argsort(exact)[:k].tolist())
got = {r.row_idx for r in res}
log(f"TopkBuilder recall@10: {len(want & got)/k:.2f}")
assert len(want & got) / k >= 0.9

index, col = read_index_from_parquet(path)
s = DeviceIvfSearcher(index, emb, cluster_sorted=True)
tids = np.argsort(((q[:, None, :] - emb[None]) ** 2).sum(-1), axis=1)[:, :k]


def recall(ids):
    return sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(ids), tids)
    ) / (16 * k)


log(f"binscan tile selected: {s._binscan_tile()}")
for mode in ("binscan", "bincompact"):
    _, ids = s.search(q, k, nprobe=4, mode=mode)
    r = recall(ids)
    log(f"mode={mode}: recall@10={r:.4f}")
    assert r >= 0.9, mode

# mode="scan" (ApproxTopK) diagnostics: on this adversarial tiny layout
# (20k rows, all k winners adjacent in one cluster run) run 3 of the
# previous session measured 0.5875. Discriminate adjacency collapse vs a
# numeric bug: the SAME data queried through an unsorted-layout searcher
# spreads winners across the array, so PartialReduce groups no longer
# collide. Report both; assert only the unsorted one.
_, ids = s.search(q, k, nprobe=4, mode="scan")
r_sorted = recall(ids)
log(f"mode=scan (cluster-sorted layout): recall@10={r_sorted:.4f}")
s_unsorted = DeviceIvfSearcher(index, emb, cluster_sorted=False)
_, ids = s_unsorted.search(q, k, nprobe=4, mode="scan")
r_unsorted = recall(ids)
log(f"mode=scan (original row order):   recall@10={r_unsorted:.4f}")
assert r_unsorted >= 0.9, "scan on unsorted layout"
# Third probe: sorted layout with 2x over-fetch through a smaller chunk
# (the documented mitigation for adjacency collisions).
s.approx_recall_target = 0.999
_, ids = s.search(q, 2 * k, nprobe=4, mode="scan")
r_of = sum(
    len(set(a.tolist()[: 2 * k]) & set(b.tolist()))
    for a, b in zip(np.asarray(ids), tids)
) / (16 * k)
log(f"mode=scan sorted, rt=0.999 k=2k over-fetch: recall@10={r_of:.4f}")
s.approx_recall_target = 0.99
ld, li = s.search_loop(q, k, nprobe=4, reps=3, mode="binscan")
np.asarray(li)
log("search_loop(binscan) ok")

# New expand path on real hardware (not just interpret mode).
from pqvector_tpu.kernels.binscan import pallas_binned_scan

n_pad = -(-n // 512) * 512
e = np.zeros((n_pad, d), np.float32)
e[:n] = emb
sq = np.full(n_pad, 3.0e38, np.float32)
sq[:n] = np.einsum("nd,nd->n", emb, emb)
d2, ids = pallas_binned_scan(jnp.asarray(q), jnp.asarray(e),
                             jnp.asarray(sq), k, tile=512, expand=2)
r = recall(ids)
log(f"pallas_binned_scan expand=2 on-chip recall: {r:.4f}")
assert r >= 0.9
werr = float(np.abs(
    np.asarray(d2) - ((q[:, None, :] - emb[np.asarray(ids)]) ** 2).sum(-1)
).max())
log(f"expand=2 exact re-score max err: {werr:.2e}")
assert werr < 1e-2
log("verify session complete")
