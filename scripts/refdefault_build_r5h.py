"""Reference-default (1M x 1024) build wall-clock, session r5h (VERDICT r4
item 6: warm default-settings build <= 40 s).

Same protocol as r4m (two builds per wire mode; second = honest warm
number) but with the round-5 fault-aware decode: `utils/alloc.populate`
batch-faults each row-group's output slice before the native decoder
writes it (MADV_POPULATE_WRITE, 2.9 GB/s vs 0.16-0.2 GB/s first-touch).
Solo host profiling measured the decode at 10.3 s warm (was ~22 s), so
the projected warm build is ~42 s bf16 / ~34 s int8 vs r4m's 54.1/45.8.

Run SOLO: bash scripts/tpu_run.sh scripts/refdefault_build_r5h.py 2400
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
        watchdog(600.0)
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
log("session refdefault_build_r5h done")
