"""Standalone top-k search (mirror of /root/reference/examples/topk_search.rs)."""

import common
import numpy as np

from pqvector_tpu import TopkBuilder

indexed = common.ensure_indexed(common.source_path(), common.indexed_path())
query = common.read_query_vector(indexed, common.DEFAULT_COLUMN, common.query_row())

results = TopkBuilder(indexed, query).k(10).nprobe(8).search()
print(f"top-{len(results)} neighbors of row {common.query_row()}:")
for r in results:
    print(f"  row={r.row_idx:8d}  distance={r.distance:.4f}")

# Batched device search for sustained throughput.
from pqvector_tpu import DeviceIvfSearcher

searcher = DeviceIvfSearcher.from_parquet(indexed)
queries = np.stack([query] * 4)
dists, ids = searcher.search(queries, k=5, nprobe=8)
print("batched ids[0]:", np.asarray(ids[0]).tolist())
