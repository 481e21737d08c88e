"""Reference-default (1M x 1024) build wall-clock, session r5j: the
certified-bf16 AMX host assign (commit b80325b) on top of r5h's
fault-aware decode.

r5h measured warm 44.7 s (bf16 wire) / 43.5 s (int8) with assign the
largest stage (21-23 s, f32 sgemm at the AVX-512 f32 peak). The AMX
path measured 2.75x on the assign GEMM+epilogue at exact-f32 partitions,
projecting warm ~32-34 s — under the VERDICT r4 item-6 <=40 s-at-default
target. Same two-builds-per-wire protocol as r4m/r5h (second = honest
warm number).

Run SOLO: bash scripts/tpu_run.sh scripts/refdefault_build_r5j.py 2400
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
from pqvector_tpu.index.build import (  # noqa: E402
    _host_amx_bf16,
    resolve_host_gemm,
)
from pqvector_tpu.utils.profiling import drain_stages  # noqa: E402

src = "/root/repo/data/refdefault_1m_1024.parquet"
if not os.path.exists(src):
    log("dataset absent; run the generator first")
    sys.exit(2)
log(f"file: {os.path.getsize(src)/1e9:.2f} GB")
log(f"amx_bf16={_host_amx_bf16()} resolved host_gemm(auto-wire)="
    f"{resolve_host_gemm('bfloat16')}")

for wire in ("auto", "int8"):
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
log("session refdefault_build_r5j done")
