"""Stage-timer and engine-metrics observability tests (SURVEY.md §5.1/§5.5)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.engine import Session, VectorTopKOptions
from pqvector_tpu.utils.profiling import drain_stages, stage


def test_stage_timers_collect_and_drain():
    drain_stages()
    with stage("outer"):
        with stage("inner"):
            pass
    records = drain_stages()
    names = [n for n, _ in records]
    assert names == ["inner", "outer"]
    assert all(t >= 0 for _, t in records)
    assert drain_stages() == []


def test_vector_topk_emits_stage_timings(tmp_path):
    path = tmp_path / "d.parquet"
    vecs = [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]]
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(3), pa.int32()),
                "vec": pa.array(vecs, pa.list_(pa.float32())),
            }
        ),
        path,
    )
    IndexBuilder(path, "vec").n_clusters(2).build_inplace()
    session = Session(VectorTopKOptions(nprobe=2))
    session.register_parquet("t", path)
    drain_stages()
    session.sql(
        "SELECT id FROM t ORDER BY array_distance(vec, [0.0, 0.0]) LIMIT 1"
    ).collect()
    names = [n for n, _ in drain_stages()]
    assert "vector_topk.collect_candidates" in names
    assert "vector_topk.fetch_and_topk" in names


def test_operator_metrics_track_rows_and_time(tmp_path):
    path = tmp_path / "d.parquet"
    pq.write_table(
        pa.table({"x": pa.array(np.arange(10, dtype=np.int64))}), path
    )
    session = Session(enable_vector_topk=False)
    session.register_parquet("t", path)
    df = session.sql("SELECT x FROM t WHERE x >= 5")
    df.collect()
    plan = df.physical_plan()
    # projection -> filter -> scan
    filt = plan.input
    assert filt.metrics.output_rows.value == 5
    assert filt.metrics.elapsed_compute.nanos >= 0
