"""Chip session E: full bench (binscan in the auto sweep) + bf16-wire build.

1. Full bench.py run — the headline sweep now includes mode="binscan"
   (kernels/binscan.py); records whether the fused binned-min scan beats
   the ApproxTopK scan at B=4096 end to end.
2. Reference-default (1M x 1024) warm build twice: transfer_dtype=float32
   vs bfloat16 — the tunnel-bound decode+transfer stage should drop ~2x
   on the wire bytes (measured ~50 MB/s tunnel).

Run SOLO: bash scripts/tpu_run.sh scripts/chip_session_r3e.py 2400
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:7.1f}s] == {m}", flush=True)


import numpy as np


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


import jax

watchdog()
log(f"device alive ({jax.devices()})")

# ---- 1. Full bench ----------------------------------------------------
log("START bench.py (full)")
src = open("/root/repo/bench.py").read()
sys.argv = ["bench.py"]
g = {"__name__": "__main__", "__file__": "bench.py"}
try:
    exec(compile(src, "bench.py", "exec"), g)
except SystemExit as e:
    log(f"bench exit {e.code}")
log("DONE bench.py")

# ---- 2. Warm builds: f32 vs bf16 wire --------------------------------
from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.utils.profiling import drain_stages

path = "/root/repo/data/refdefault_1m_1024.parquet"
log(f"build file: {os.path.getsize(path)/1e9:.2f} GB")

for wire in ("float32", "bfloat16"):
    drain_stages()
    t0 = time.time()
    b = IndexBuilder(path, "embedding").n_clusters(1024).seed(7)
    if wire != "float32":
        b = b.transfer_dtype(wire)
    index = b.build_inplace()
    wall = time.time() - t0
    stages = drain_stages()
    log(f"build wire={wire}: {wall:.1f}s total; k={index.n_clusters}")
    for name, secs in stages:
        log(f"  {name}: {secs:.1f}s")

log("session complete")
