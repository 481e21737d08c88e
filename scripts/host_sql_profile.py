"""Profile the host (disk) SQL top-k path on the 1M build_new file.

VERDICT r2 item 3: host SQL serving was 214 ms/query; find where it goes.
Runs entirely on CPU (no TPU contention): the host path never dispatches.

Usage: python -u scripts/host_sql_profile.py [path]
"""

import cProfile
import io
import pstats
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pyarrow.parquet as pq

from pqvector_tpu.engine.options import VectorTopKOptions
from pqvector_tpu.engine.session import Session
from pqvector_tpu.utils.profiling import drain_stages

path = sys.argv[1] if len(sys.argv) > 1 else "data/bench_1m_pagelayout.parquet"

pf = pq.ParquetFile(path)
print("file:", path)
print("row groups:", pf.metadata.num_row_groups, "rows:", pf.metadata.num_rows)
rg = pf.metadata.row_group(0)
print("cols:", [rg.column(i).path_in_schema for i in range(rg.num_columns)])

rng = np.random.default_rng(7)
qs = rng.standard_normal((6, 128)).astype(np.float32)

s = Session(VectorTopKOptions(nprobe=16))
s.register_parquet("t", path)


def run(q, where="WHERE id >= 100"):
    lit = "[" + ",".join(f"{v:.6f}" for v in q) + "]"
    sql = f"SELECT id FROM t {where} ORDER BY array_distance(embedding, {lit}) LIMIT 5"
    df = s.sql(sql)
    t = df.collect()
    return t


# Warm-up (caches: footer metadata, index decode, page readers)
t0 = time.time()
run(qs[0])
print(f"cold query: {time.time()-t0:.3f}s")
drain_stages()

t0 = time.time()
run(qs[1])
dt = time.time() - t0
print(f"warm query: {dt*1000:.1f} ms")
for name, secs in drain_stages():
    print(f"  {name}: {secs*1000:.1f} ms")

# cProfile over 4 warm queries
pr = cProfile.Profile()
t0 = time.time()
pr.enable()
for q in qs[2:6]:
    run(q)
pr.disable()
dt = (time.time() - t0) / 4
print(f"warm avg over 4: {dt*1000:.1f} ms/query")
for name, secs in drain_stages():
    print(f"  {name}: {secs*1000:.1f} ms")

out = io.StringIO()
ps = pstats.Stats(pr, stream=out).sort_stats("cumulative")
ps.print_stats(35)
print(out.getvalue())
