"""Engine edge cases beyond the reference suite."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.engine import Session, VectorTopKOptions
from pqvector_tpu.errors import PlanError


@pytest.fixture()
def path(tmp_path):
    p = tmp_path / "t.parquet"
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((20, 4)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(20), pa.int32()),
                "name": pa.array([f"n{i}" for i in range(20)]),
                "score": pa.array(rng.uniform(0, 1, 20)),
                "vec": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        ),
        p,
    )
    IndexBuilder(p, "vec").n_clusters(4).build_inplace()
    return p


def session(path):
    s = Session(VectorTopKOptions(nprobe=4))
    s.register_parquet("t", path)
    return s


def test_limit_without_order_by(path):
    out = session(path).sql("SELECT id FROM t LIMIT 3").collect()
    assert out.num_rows == 3


def test_order_by_plain_column_asc(path):
    out = session(path).sql("SELECT id FROM t ORDER BY score LIMIT 5").collect()
    assert out.num_rows == 5


def test_projection_expression(path):
    out = session(path).sql("SELECT id + 1 AS next_id FROM t LIMIT 2").collect()
    assert out.column_names == ["next_id"]
    assert out.column("next_id").to_pylist() == [1.0, 2.0]


def test_boolean_predicates(path):
    out = session(path).sql(
        "SELECT id FROM t WHERE (id >= 5 AND id < 8) OR id = 15 ORDER BY id"
    ).collect()
    assert out.column("id").to_pylist() == [5, 6, 7, 15]


def test_not_predicate(path):
    out = session(path).sql("SELECT id FROM t WHERE NOT id < 18 ORDER BY id").collect()
    assert out.column("id").to_pylist() == [18, 19]


def test_string_predicate(path):
    out = session(path).sql("SELECT id FROM t WHERE name = 'n7'").collect()
    assert out.column("id").to_pylist() == [7]


def test_select_zero_limit(path):
    out = session(path).sql(
        "SELECT id FROM t ORDER BY array_distance(vec, [0.0, 0.0, 0.0, 0.0]) LIMIT 0"
    ).collect()
    assert out.num_rows == 0


def test_empty_result_filter(path):
    out = session(path).sql(
        "SELECT id FROM t WHERE id > 1000 "
        "ORDER BY array_distance(vec, [0.0, 0.0, 0.0, 0.0]) LIMIT 3"
    ).collect()
    assert out.num_rows == 0


def test_unknown_function_errors(path):
    with pytest.raises(PlanError, match="Unsupported function"):
        session(path).sql("SELECT magic(id) FROM t LIMIT 1").collect()


def test_offset_only(path):
    out = session(path).sql("SELECT id FROM t ORDER BY id LIMIT 5 OFFSET 17").collect()
    assert out.column("id").to_pylist() == [17, 18, 19]


def test_session_device_searcher(path):
    s = session(path)
    searcher = s.device_searcher("t", row_tile=64)
    assert s.device_searcher("t", row_tile=64) is searcher  # cached
    import pyarrow.parquet as pq2
    import numpy as np2

    vecs = np2.array(
        pq2.read_table(path).column("vec").to_pylist(), dtype=np2.float32
    )
    dists, ids = searcher.search(vecs[3], k=1, nprobe=4)
    assert int(ids[0, 0]) == 3


def test_session_device_searcher_unknown_table(path):
    s = session(path)
    with pytest.raises(PlanError, match="not registered"):
        s.device_searcher("missing")


def test_session_device_searcher_kwargs_key(path):
    """The searcher cache keys on kwargs: a spill= request after a plain
    build must not serve the cached unspilled searcher."""
    from pqvector_tpu.engine.session import Session

    s = Session()
    s.register_parquet("t", path)
    plain = s.device_searcher("t", row_tile=64)
    spilled = s.device_searcher("t", row_tile=64, spill=0.2)
    assert spilled is not plain
    assert spilled._spill_dups and not plain._spill_dups
    assert s.device_searcher("t", row_tile=64, spill=0.2) is spilled
