"""Dynamic updates on the resident searcher: tombstone deletes + the
delta-buffer append (main + memtable design — the reference's
file-embedded index supports neither without a rebuild)."""

import numpy as np
import pytest

from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index
from pqvector_tpu.errors import ValidationError
from pqvector_tpu.query.device import DeviceIvfSearcher


@pytest.fixture()
def setup():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((600, 12)).astype(np.float32)
    index = build_ivf_index(
        Embeddings(x, 12), IvfBuildConfig(n_clusters=8, seed=0)
    )
    q = (x[[7, 40, 300]] + 0.01).astype(np.float32)
    return x, index, q


def _truth(x, q, k, alive=None, extra=None, extra_ids=None):
    rows = x if extra is None else np.vstack([x, extra])
    ids = np.arange(len(x))
    if extra is not None:
        ids = np.concatenate([ids, extra_ids])
    d2 = (
        np.sum(q * q, 1)[:, None] - 2.0 * q @ rows.T
        + np.sum(rows * rows, 1)[None, :]
    )
    if alive is not None:
        d2[:, ~alive] = np.inf
    order = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return ids[order]


def test_delete_rows_excluded_everywhere(setup):
    x, index, q = setup
    s = DeviceIvfSearcher(index, x)
    k = 5
    _, base = s.exact(q, k)
    victims = np.asarray(base)[:, 0]  # delete every query's nearest
    s.delete_rows(victims)
    alive = np.ones(len(x), bool)
    alive[victims] = False
    want = _truth(x, q, k, alive=alive)
    for mode_call in (
        lambda: s.exact(q, k),
        lambda: s.search(q, k, 8, mode="masked"),
        lambda: s.search(q, k, 8, mode="gather"),
        lambda: s.search_loop(q, k, 8, reps=2, mode="masked"),
        lambda: s.exact_loop(q, k, reps=2, mode="xla"),
    ):
        _, got = mode_call()
        got = np.asarray(got)
        assert not np.isin(got, victims).any()
        np.testing.assert_array_equal(got, want)


def test_delete_validation(setup):
    x, index, _ = setup
    s = DeviceIvfSearcher(index, x)
    with pytest.raises(ValidationError, match="delete_rows ids"):
        s.delete_rows([len(x) + 5])
    with pytest.raises(ValidationError, match="delete_rows ids"):
        s.delete_rows([-1])
    s.delete_rows([])  # no-op


def test_append_rows_found_exactly(setup):
    x, index, q = setup
    s = DeviceIvfSearcher(index, x)
    rng = np.random.default_rng(9)
    new = (q + 0.001 * rng.standard_normal(q.shape)).astype(np.float32)
    new_ids = s.append_rows(new)
    np.testing.assert_array_equal(new_ids, len(x) + np.arange(3))
    d, got = s.exact(q, 4)
    got = np.asarray(got)
    # each query's nearest is now its appended twin
    np.testing.assert_array_equal(got[:, 0], new_ids)
    # distances ascending, finite for real slots
    d = np.asarray(d)
    assert np.all(np.diff(d, axis=1) >= -1e-6)
    # probed modes merge the delta too
    _, gm = s.search(q, 4, 8, mode="masked")
    np.testing.assert_array_equal(np.asarray(gm)[:, 0], new_ids)
    # a second append keeps earlier rows and continues the id space
    more = s.append_rows(rng.standard_normal((2, 12)).astype(np.float32))
    np.testing.assert_array_equal(more, len(x) + 3 + np.arange(2))
    _, g2 = s.exact(q, 4)
    np.testing.assert_array_equal(np.asarray(g2)[:, 0], new_ids)


def test_update_row_delete_then_append(setup):
    x, index, q = setup
    s = DeviceIvfSearcher(index, x)
    _, base = s.exact(q[:1], 1)
    old = int(np.asarray(base)[0, 0])
    s.delete_rows([old])
    new_id = int(s.append_rows(x[old] * 1.0)[0])
    _, got = s.exact(q[:1], 2)
    got = np.asarray(got)[0]
    assert got[0] == new_id  # the re-appended version wins
    assert old not in got.tolist()
    # deleting the appended row tombstones it in the delta buffer
    s.delete_rows([new_id])
    _, got2 = s.exact(q[:1], 2)
    assert new_id not in np.asarray(got2)[0].tolist()


def test_dynamic_on_spilled_searcher(setup):
    x, index, q = setup
    s = DeviceIvfSearcher.with_spill(index, x, spill=0.3)
    assert s._id_domain == len(x)
    _, base = s.exact(q, 3)
    victim = int(np.asarray(base)[0, 0])
    s.delete_rows([victim])  # both copies tombstoned
    new_ids = s.append_rows(q[:1])
    _, got = s.exact(q, 3)
    got = np.asarray(got)
    assert victim not in got[0].tolist()
    assert got[0, 0] == new_ids[0]
    # still no duplicate ids anywhere
    for r in got:
        ids = [v for v in r.tolist() if v >= 0]
        assert len(set(ids)) == len(ids)


def test_scan_modes_respect_dynamic_state(setup):
    """The nprobe-free serving modes (approx/scan families) also exclude
    tombstones and merge deltas — the filter/merge lives in the shared
    finalize, not per mode."""
    x, index, q = setup
    s = DeviceIvfSearcher(index, x, row_tile=128)
    _, base = s.exact(q, 3)
    victim = int(np.asarray(base)[0, 0])
    s.delete_rows([victim])
    new_ids = s.append_rows(q[:1] + 0.0005)
    for mode in ("approx", "xbin", "xbin8"):
        _, got = s.search(q, 3, 1, mode=mode)
        got = np.asarray(got)
        assert victim not in got[0].tolist()
        assert got[0, 0] == new_ids[0]


def test_delta_bucket_shapes_stable(setup):
    """Delta capacity grows in power-of-two buckets (floor 256): repeated
    small appends keep _finalize_jit's input shapes stable (each distinct
    shape is a fresh trace — a ~6 s remote compile through the tunnel)."""
    x, index, q = setup
    rng = np.random.default_rng(2)
    s = DeviceIvfSearcher(index, x)
    shapes = set()
    for _ in range(5):
        s.append_rows(rng.standard_normal((3, 12)).astype(np.float32))
        shapes.add(tuple(s._delta[0].shape))
    assert shapes == {(256, 12)}
    # tombstone bitmap sized to cover appended ids (no clip-aliasing)
    s.delete_rows([int(s._id_domain - 1)])
    assert int(s._deleted_dev.shape[0]) >= s._id_domain
    _, got = s.exact(q, 3)
    assert int(s._id_domain - 1) not in np.asarray(got).tolist()


def test_append_then_delete_bitmap_covers_domain(setup):
    """Deleting BEFORE appending must not leave a small bitmap that
    appended ids clip-alias into."""
    x, index, q = setup
    s = DeviceIvfSearcher(index, x)
    s.delete_rows([0])
    new_ids = s.append_rows(q[:1])
    assert int(s._deleted_dev.shape[0]) >= s._id_domain
    _, got = s.exact(q, 2)
    assert np.asarray(got)[0, 0] == new_ids[0]  # not falsely tombstoned


def test_sql_resident_steps_aside_for_dynamic_state(tmp_path):
    """SQL serves FILE contents: a resident searcher holding dynamic
    state (appends/deletes) is skipped — the host path answers, matching
    the file (appended ids aren't file rows and carry no SQL columns)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pqvector_tpu.builder import IndexBuilder
    from pqvector_tpu.engine.session import Session

    rng = np.random.default_rng(6)
    n, d = 300, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    flat = pa.array(x.reshape(-1), pa.float32())
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * d)
    path = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"id": pa.array(np.arange(n)),
                  "vec": pa.ListArray.from_arrays(offsets, flat)}),
        path, row_group_size=64,
    )
    IndexBuilder(path, "vec").n_clusters(6).build_inplace()

    s = Session()
    s.register_parquet("t", path)
    searcher = s.device_searcher("t")
    searcher.append_rows(x[:1] + 0.0001)
    q = ", ".join(f"{v:.6f}" for v in x[0])
    df = s.sql(
        f"SELECT id FROM t ORDER BY array_distance(vec, [{q}]) LIMIT 3"
    )
    ids = df.collect().column("id").to_pylist()
    assert len(ids) == 3 and all(0 <= i < n for i in ids)
    assert ids[0] == 0  # the file's own row 0, not the appended id


def test_int8_scan_modes_respect_dynamic_state(setup):
    """binscan8 (int8 Pallas scan) must honor tombstones + deltas like the
    other scan families: the int8 codes of the STATIC layout are stale by
    design (quantized at residency), so deletes must drop rows at finalize
    and appended rows must surface from the delta buffer."""
    x, index, q = setup
    s = DeviceIvfSearcher(index, x, cluster_sorted=True, row_tile=128)
    truth_before = np.asarray(s.search(q, 3, 1, mode="binscan8")[1])
    victim = int(truth_before[0, 0])
    s.delete_rows([victim])
    _, got = s.search(q, 3, 1, mode="binscan8")
    assert victim not in np.asarray(got)[0].tolist()
    new_row = q[0:1] * 1.0001
    s.append_rows(new_row)
    d2, got2 = s.search(q, 3, 1, mode="binscan8")
    assert np.asarray(got2)[0, 0] == s._id_domain - 1  # appended row wins
