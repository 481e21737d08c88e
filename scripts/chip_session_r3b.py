"""Chip session B: warm-build timing (compile vs steady-state split) and a
full bench.py validation with the round-3 mode sweep.

Run SOLO: timeout 3600 python -u scripts/chip_session_r3b.py > log 2>&1
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

# 1. Full bench (default args) in-process — the driver runs this at round
#    end, so validating the round-3 sweep (compact gating, roofline) comes
#    first in case the alive-window is short.
log("START bench.py")
src = open("/root/repo/bench.py").read()
sys.argv = ["bench.py"]
g = {"__name__": "__main__", "__file__": "bench.py"}
try:
    exec(compile(src, "bench.py", "exec"), g)
except SystemExit as e:
    log(f"bench exit {e.code}")
log("DONE bench.py")

# 2. Reference-default build, twice in one process: run 1 pays any remote
#    compiles; run 2 is the steady state.
from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.utils.profiling import drain_stages

path = "/root/repo/data/refdefault_1m_1024.parquet"
for run in (1, 2):
    drain_stages()
    t0 = time.time()
    IndexBuilder(path, "embedding").n_clusters(1000).build_inplace()
    total = time.time() - t0
    log(f"build run {run}: {total:.1f}s")
    for name, secs in drain_stages():
        log(f"  {name}: {secs:.1f}s")
log("session complete")
