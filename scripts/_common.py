"""Shared helpers for the chip-session scripts.

Round-3 advisor finding: the dataset-regeneration block was copy-pasted
into three sessions and had already started to diverge. Every session
now imports from here instead.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

_T0 = time.time()


def log(m: str) -> None:
    print(f"[{time.time()-_T0:7.1f}s] == {m}", flush=True)


def watchdog(timeout_s: float = 600.0) -> None:
    """Fail fast (exit 3) if the first device dispatch never returns —
    a wedged tunnel otherwise blocks the session forever. Backend init
    alone takes ~140 s on a fresh VM, hence the generous default."""
    import threading

    done = threading.Event()

    def probe():
        import jax.numpy as jnp
        import numpy as np

        np.asarray(jnp.ones((8, 128)) + 1.0)
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        log(f"FATAL: device unresponsive after {timeout_s:.0f}s")
        os._exit(3)


def ensure_bench_dataset(path: str, rows: int = 1_000_000, dim: int = 128,
                         n_clusters: int = 1024) -> str:
    """Regenerate the bench parquet + in-place index iff absent.

    Single source of truth for the cache params (bench.py generator
    defaults: seed 1234, 256-mode gaussian mixture, snappy)."""
    if os.path.exists(path):
        return path
    log(f"bench cache absent; regenerating {rows}x{dim} (bench.py generator)")
    from bench import generate_dataset
    from pqvector_tpu.builder import IndexBuilder

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    generate_dataset(path, rows, dim)
    t0 = time.time()
    IndexBuilder(path, "embedding").n_clusters(n_clusters).build_inplace()
    log(f"index build: {time.time()-t0:.1f}s")
    return path
