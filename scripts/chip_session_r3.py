"""One-window chip session: every pending round-3 measurement in one
process (the tunnel wedges between process startups, so batching the
measurements into one session minimizes exposure).

Order: DEEP-10M compact/scan/stream sweep -> reference-default build
breakdown -> B=4096 MFU push. Each section is independent; a failure in
one does not stop the next.

Run SOLO: timeout 5400 python -u scripts/chip_session_r3.py > log 2>&1
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

for script, budget in (
    ("scripts/deep10m_r3.py", 2400),
    ("scripts/build_breakdown.py", 1800),
    ("scripts/mfu_push.py", 1200),
):
    log(f"START {script}")
    # Same process would be ideal, but the scripts are written as mains;
    # exec them in-process so the TPU client/session is shared (no fresh
    # tunnel grant per section).
    src = open(os.path.join("/root/repo", script)).read()
    # Strip their own watchdogs' os._exit so a hang doesn't kill the whole
    # session silently mid-way (the outer timeout still bounds us).
    g = {"__name__": "__main__", "__file__": script}
    try:
        exec(compile(src, script, "exec"), g)
        log(f"DONE {script}")
    except SystemExit as e:
        log(f"EXIT {script}: {e.code}")
        if e.code == 3:
            os._exit(3)
    except Exception as e:
        import traceback

        traceback.print_exc()
        log(f"FAILED {script}: {type(e).__name__}: {e}")
log("session complete")
