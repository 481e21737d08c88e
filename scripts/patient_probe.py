"""Patient chip probe: wait for the device WITHOUT ever being killed.

Hypothesis (Aug 18, after a 9 h 'wedge'): the 3-minute probe loop was
perpetuating the wedge — every probe was timeout-killed mid-dispatch,
and CLAUDE.md documents that killing a process mid-execution holds the
relay grant for minutes, i.e. each killed probe re-wedged the tunnel
for the next one. This probe is the counter-experiment: after a long
all-quiet period it dispatches ONCE and waits as long as it takes,
logging progress, and exits CLEANLY only after the dispatch completes
(or after a very generous internal deadline, at a safe point).

Run UNKILLED: nohup python -u scripts/patient_probe.py > scripts/patient_probe.log 2>&1 &
"""
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
t00 = time.time()


def log(m):
    print(f"[{time.time()-t00:8.1f}s] {m}", flush=True)


log("importing jax (tunnel session opens lazily)")
import numpy as np
import jax
import jax.numpy as jnp

log(f"devices: {jax.devices()}")

done = threading.Event()
result = {}


def dispatch():
    try:
        t0 = time.time()
        out = np.asarray(jnp.ones((8, 128)) + 1.0)
        result["dt"] = time.time() - t0
        result["ok"] = bool((out == 2.0).all())
    except Exception as e:  # noqa: BLE001
        result["err"] = f"{type(e).__name__}: {e}"
    done.set()


threading.Thread(target=dispatch, daemon=True).start()
# Backend init surfaces a clean UNAVAILABLE on its own (observed ~25-30
# min into an outage), so prefer waiting it out: exiting here would
# abandon the in-flight dispatch — the very mid-dispatch kill this
# script exists to avoid — and confound the experiment. The 2 h bound
# exists only so a silent hang cannot absorb the whole round.
deadline = t00 + 7200.0
while not done.wait(60.0):
    log("still waiting on the dispatch...")
    if time.time() > deadline:
        log("giving up after 2 h (exiting; dispatch thread abandoned — "
            "treat any follow-on wedge as possibly self-inflicted)")
        sys.exit(3)
if "err" in result:
    log(f"dispatch FAILED: {result['err']}")
    sys.exit(1)
log(f"dispatch completed in {result['dt']:.1f}s ok={result['ok']}")
log("CHIP RESPONSIVE")
