"""Reference-default (1M x 1024) build wall-clock, session r4k (VERDICT #5, threaded wire).

Post-r4h state: staged build streams wire-dtype chunks (decode overlaps
the transfer), `build.transfer_drain` blocks so stages report honestly,
and transfer_dtype="int8" quarters the wire bytes (the build's floor —
2 GB bf16 at the tunnel's 20-80 MB/s was 25-100 s window-dependent).
Target: warm reference-default build <= 45 s.

Two builds per wire mode (bf16 = the TPU default via "auto", then int8);
the first pays remote-compile misses, the second is the honest warm
number. Same window => comparable.

Run SOLO: bash scripts/tpu_run.sh scripts/refdefault_build_r4k.py 2400
"""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import log, watchdog  # noqa: E402

import jax  # noqa: E402

watchdog(600.0)
log(f"device alive ({jax.devices()})")

from pqvector_tpu.builder import IndexBuilder  # noqa: E402
from pqvector_tpu.utils.profiling import drain_stages  # noqa: E402

src = "/root/repo/data/refdefault_1m_1024.parquet"
if not os.path.exists(src):
    log("dataset absent; run the generator first")
    sys.exit(2)
log(f"file: {os.path.getsize(src)/1e9:.2f} GB")

for wire in ("auto", "int8"):
    # build_inplace appends; work on a scratch copy per mode so every
    # build starts from the same un-indexed bytes.
    tmp = f"/tmp/refdefault_{wire}.parquet"
    log(f"copying source for wire={wire}")
    shutil.copyfile(src, tmp)
    for label in ("first", "warm"):
        drain_stages()
        t0 = time.time()
        (
            IndexBuilder(tmp, "embedding")
            .n_clusters(1000)
            .transfer_dtype(wire)
            .build_inplace()
        )
        total = time.time() - t0
        log(f"build_inplace wire={wire} ({label}): {total:.1f}s")
        for name, secs in drain_stages():
            log(f"  {name}: {secs:.1f}s")
    os.remove(tmp)
log("session refdefault_build_r4k done")
