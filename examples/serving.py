"""HBM-resident serving (TPU extension beyond the reference's examples).

Shows the round-2 serving surface:
* the ApproxTopK full-scan mode (``mode="scan"`` — recall from the
  extraction's recall_target instead of probe selection; the measured
  throughput winner at batch >= 256),
* the chained loop API used for honest throughput measurement,
* SQL top-k served from the resident searcher (Session.device_searcher).
"""

import common
import numpy as np

from pqvector_tpu import DeviceIvfSearcher
from pqvector_tpu.engine.options import VectorTopKOptions
from pqvector_tpu.engine.session import Session

indexed = common.ensure_indexed(common.source_path(), common.indexed_path())
query = common.read_query_vector(indexed, common.DEFAULT_COLUMN, common.query_row())
queries = np.stack([query] * 8)

searcher = DeviceIvfSearcher.from_parquet(indexed)

# Exact-selection IVF (auto picks the measured-best kernel for the layout).
d_ivf, ids_ivf = searcher.search(queries, k=5, nprobe=8)
print("ivf ids[0]: ", np.asarray(ids_ivf[0]).tolist())

# ApproxTopK full scan: nprobe-free serving; winners re-scored exactly.
d_scan, ids_scan = searcher.search(queries, k=5, nprobe=8, mode="scan")
print("scan ids[0]:", np.asarray(ids_scan[0]).tolist())

# Chained-loop serving call: `reps` batches inside ONE device dispatch.
d_loop, ids_loop = searcher.search_loop(queries, k=5, nprobe=8, reps=4, mode="scan")
print("loop ids[0]:", np.asarray(ids_loop[0]).tolist())

# SQL top-k served from the resident searcher: identical results to the
# host path (probe -> candidate pages -> filter -> top-k), tiny I/O.
session = Session(VectorTopKOptions(nprobe=8))
session.register_parquet("t", indexed)
session.device_searcher("t")  # cache -> resident serving active
vec = ", ".join(f"{v:.6f}" for v in query)
df = session.sql(
    f"SELECT id FROM t ORDER BY array_distance({common.DEFAULT_COLUMN}, [{vec}]) LIMIT 5"
)
print("sql ids:    ", df.collect().column("id").to_pylist())

# Autotuned serving plan: calibrate (mode, nprobe) once against a query
# sample for a recall target, then serve the measured winner.
from pqvector_tpu.query import autotune

report = autotune(searcher, queries, k=5, recall_target=0.9,
                  modes=("masked", "scan"), reps=2, budget_s=1.0)
if report.best:
    print(f"autotune: mode={report.best.mode} nprobe={report.best.nprobe} "
          f"recall={report.best.recall:.3f}")

# Recall knob: a SPILLED resident layout duplicates boundary rows into
# their runner-up cluster (query/spill.py), lifting probe recall at the
# same nprobe — the probed modes' residual loss is exactly those rows.
spilled = Session(VectorTopKOptions(nprobe=8))
spilled.register_parquet("t", indexed)
spilled.device_searcher("t", spill=0.2)
df_sp = spilled.sql(
    f"SELECT id FROM t ORDER BY array_distance({common.DEFAULT_COLUMN}, [{vec}]) LIMIT 5"
)
print("spilled ids:", df_sp.collect().column("id").to_pylist())
