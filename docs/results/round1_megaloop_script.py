import os, time, threading, functools, numpy as np
import jax, jax.numpy as jnp

def watchdog(timeout=300):
    done = threading.Event()
    def probe():
        np.asarray(jnp.ones((8, 128)) + 1.0); done.set()
    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout):
        print("FATAL: device unresponsive", flush=True); os._exit(3)
watchdog()

from pqvector_tpu.io.embed import read_index_from_parquet
from pqvector_tpu.io.reader import read_embedding_column
from pqvector_tpu.query.device import DeviceIvfSearcher
from pqvector_tpu.kernels.scan_topk import (
    pallas_masked_topk, pallas_masked_local_topk, pallas_exact_topk)

path = "/root/repo/data/bench_1000000x128.parquet"
index, column = read_index_from_parquet(path)
emb = read_embedding_column(path, column).data
s = DeviceIvfSearcher(index, emb, row_tile=4096, cluster_sorted=True)
rng = np.random.default_rng(7)
B, k, NPROBE, REPS = 256, 10, 4, 16
q_rows = rng.integers(0, emb.shape[0], B)
queries = jnp.asarray(emb[q_rows] + 0.05 * rng.standard_normal((B, 128)).astype(np.float32))

tile_p = s._pallas_tile(4096, B)
lcl, tc, cmax = s._tile_cluster_table(tile_p)

def body_local(q):
    return pallas_masked_local_topk(q, s.centroids, s.c_sq, lcl, tc, s.emb,
        s._pallas_emb_sq(), jnp.int32(NPROBE), k, max_probe=128, tile=tile_p, cmax=cmax)
def body_global(q):
    return pallas_masked_topk(q, s.centroids, s.c_sq, s.row_cluster, s.emb,
        s._pallas_emb_sq(), jnp.int32(NPROBE), k, max_probe=128, tile=tile_p)
def body_exact(q):
    return pallas_exact_topk(q, s.emb, s._pallas_emb_sq(), k, tile=tile_p)

def mega(kind):
    @functools.partial(jax.jit, static_argnames=("kind",))
    def run(q0, emb, emb_sq, centroids, c_sq, row_cluster, lcl, tc, kind):
        def body(q):
            if kind == "local":
                return pallas_masked_local_topk(q, centroids, c_sq, lcl, tc,
                    emb, emb_sq, jnp.int32(NPROBE), k, max_probe=128,
                    tile=tile_p, cmax=cmax)
            if kind == "global":
                return pallas_masked_topk(q, centroids, c_sq, row_cluster,
                    emb, emb_sq, jnp.int32(NPROBE), k, max_probe=128, tile=tile_p)
            return pallas_exact_topk(q, emb, emb_sq, k, tile=tile_p)
        def step(q, _):
            d, i = body(q)
            return q0 + 0.0 * d[:, :1], i
        _, ids = jax.lax.scan(step, q0, None, length=REPS)
        return ids[-1]
    return lambda q: run(q, s.emb, s._pallas_emb_sq(), s.centroids, s.c_sq,
                         s.row_cluster, lcl, tc, kind)

for rnd in range(2):
    for name in ("local", "global", "exact"):
        fn = mega(name)
        np.asarray(fn(queries))  # compile+warm
        t0 = time.perf_counter()
        np.asarray(fn(queries))
        dt = time.perf_counter() - t0
        print(f"round{rnd} {name}: {dt/REPS*1e3:.2f} ms/batch  ({REPS*B/dt:.0f} QPS)", flush=True)
print("DONE", flush=True)
