"""Reference-default build (1M x 1024) stage breakdown (VERDICT r3 item 4).

Run SOLO: timeout 2400 python -u scripts/build_breakdown.py > log 2>&1
"""
import os, sys, time

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

from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.utils.profiling import drain_stages

path = "/root/repo/data/refdefault_1m_1024.parquet"
log(f"file: {os.path.getsize(path)/1e9:.2f} GB")

# Sub-stage decomposition first: decode-only vs decode+transfer.
from pqvector_tpu.index.streaming import iter_embedding_batches
from pqvector_tpu.types import EmbeddingColumn

t0 = time.time()
rows = 0
for part in iter_embedding_batches(path, EmbeddingColumn("embedding"), 131072):
    rows += len(part)
decode_s = time.time() - t0
log(f"decode only: {decode_s:.1f}s ({rows} rows, "
    f"{rows*1024*4/decode_s/1e6:.0f} MB/s f32)")

import jax.numpy as jnp

t0 = time.time()
chunks = []
for part in iter_embedding_batches(path, EmbeddingColumn("embedding"), 131072):
    chunks.append(jax.device_put(part))
x = jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]
x = jax.block_until_ready(x)
xfer_s = time.time() - t0
log(f"decode+transfer: {xfer_s:.1f}s "
    f"({rows*1024*4/xfer_s/1e6:.0f} MB/s effective)")
np.asarray(x[0, :1])
del x, chunks

# Full build with stage timers.
drain_stages()
t0 = time.time()
IndexBuilder(path, "embedding").n_clusters(1000).build_inplace()
total = time.time() - t0
log(f"TOTAL build_inplace: {total:.1f}s")
for name, secs in drain_stages():
    log(f"  {name}: {secs:.1f}s")
log("done")
