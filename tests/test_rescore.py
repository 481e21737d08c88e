"""Full-precision re-score on reduced-precision storage.

Measured on DEEP-10M (docs/PERFORMANCE.md round-3): bf16 STORAGE alone
caps exact selection at 0.9527 recall@10 vs the f32 truth — real-data
neighbor margins sit below bf16's 2^-8 element rounding. The fix: every
selection mode widens its fetch and re-scores candidates against a
retained f32 reference (``rescore_dtype="auto"``), which recovers the
f32 ordering exactly. These tests build data whose neighbor spacing
vanishes under bf16 rounding and pin the recovery per mode family.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index
from pqvector_tpu.query.device import DeviceIvfSearcher


@pytest.fixture(scope="module")
def near_tie():
    """Clusters of 4 rows spaced 1e-4 apart around O(1) centers: the
    spacing is far below bf16 resolution (~0.008 relative), so bf16
    storage cannot rank within a cluster; f32 can."""
    rng = np.random.default_rng(42)
    n_groups, per, d = 256, 4, 32
    centers = rng.uniform(-4, 4, (n_groups, d)).astype(np.float32)
    rows = []
    for g in range(n_groups):
        for j in range(per):
            rows.append(centers[g] + (1e-4 * j) * np.eye(d, dtype=np.float32)[0])
    x = np.stack(rows).astype(np.float32)
    index = build_ivf_index(
        Embeddings(x, d), IvfBuildConfig(n_clusters=16, seed=0)
    )
    # Queries sit nearest the j=2 member of a group: f32 order within the
    # group is [2, 1 or 3, ...]; bf16 sees all four as equal.
    gq = rng.integers(0, n_groups, 48)
    q = centers[gq].copy()
    q[:, 0] += 2.1e-4
    truth = np.stack([
        np.array([4 * g + 2, 4 * g + 3, 4 * g + 1, 4 * g + 0]) for g in gq
    ])
    return x, index, q, truth


def _f32_truth(x, q, k):
    d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    return np.argsort(d2, axis=1, kind="stable")[:, :k]


def test_bf16_searcher_holds_f32_reference(near_tie):
    x, index, q, truth = near_tie
    s = DeviceIvfSearcher(index, x, dtype=jnp.bfloat16)
    assert s._emb_ref is not None
    assert s._emb_ref.dtype == jnp.float32
    s_off = DeviceIvfSearcher(index, x, dtype=jnp.bfloat16, rescore_dtype=None)
    assert s_off._emb_ref is None
    s_f32 = DeviceIvfSearcher(index, x)
    assert s_f32._emb_ref is None  # f32 storage IS the reference


@pytest.mark.parametrize("mode", ["xla", "approx", "xbin", "binscan"])
def test_exact_modes_recover_f32_order(near_tie, mode):
    x, index, q, truth = near_tie
    s = DeviceIvfSearcher(index, x, dtype=jnp.bfloat16, row_tile=256)
    k = 4
    dist, ids = s.exact(q, k, mode=mode)
    ids = np.asarray(ids)
    tids = _f32_truth(x, q, k)
    # Selection may be approximate (bins/ApproxTopK) but within-group
    # near-ties MUST be ranked by the f32 re-score: the top-1 is exact.
    assert (ids[:, 0] == tids[:, 0]).mean() >= 0.97
    hits = sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, tids)
    )
    assert hits / tids.size >= 0.95
    # Distances are f32-exact for the returned ids.
    want = np.sqrt(((q[:, None, :] - x[ids]) ** 2).sum(-1))
    np.testing.assert_allclose(np.asarray(dist), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["gather", "masked", "approx", "bincompact"])
def test_search_modes_recover_f32_order(near_tie, mode):
    x, index, q, truth = near_tie
    # row_tile=512 keeps n_pad a multiple of the bincompact ctile grid.
    s = DeviceIvfSearcher(
        index, x, dtype=jnp.bfloat16, row_tile=512, cluster_sorted=True
    )
    k = 4
    dist, ids = s.search(q, k, nprobe=16, mode=mode)  # full probe coverage
    ids = np.asarray(ids)
    tids = _f32_truth(x, q, k)
    assert (ids[:, 0] == tids[:, 0]).mean() >= 0.97
    hits = sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, tids)
    )
    assert hits / tids.size >= 0.95


def test_rescore_off_is_storage_bounded(near_tie):
    """Opt-out control: without the reference the bf16 searcher cannot
    rank within the 1e-4 groups (this is the measured DEEP-10M failure
    mode, kept as a pinned negative)."""
    x, index, q, truth = near_tie
    s = DeviceIvfSearcher(
        index, x, dtype=jnp.bfloat16, row_tile=256, rescore_dtype=None
    )
    _, ids = s.exact(q, 4, mode="xla")
    ids = np.asarray(ids)
    tids = _f32_truth(x, q, 4)
    # bf16 sees the 4 group members as exact ties -> top-1 is arbitrary
    # among them; exact top-1 agreement should be near chance (~25%),
    # certainly nowhere near the rescored path's >=97%.
    assert (ids[:, 0] == tids[:, 0]).mean() < 0.9


def test_loop_forms_use_reference(near_tie):
    x, index, q, truth = near_tie
    s = DeviceIvfSearcher(index, x, dtype=jnp.bfloat16, row_tile=256)
    k = 4
    _, ids = s.exact(q, k, mode="xla")
    ed, ei = s.exact_loop(q, k, reps=2, mode="xla")
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(ids))
    ld, li = s.search_loop(q, k, nprobe=16, reps=2, mode="scan")
    tids = _f32_truth(x, q, k)
    assert (np.asarray(li)[:, 0] == tids[:, 0]).mean() >= 0.97


def test_int8_codes_quantize_from_reference(near_tie):
    x, index, q, truth = near_tie
    s = DeviceIvfSearcher(index, x, dtype=jnp.bfloat16, row_tile=256)
    e8, sc = s._xbin8_arrays()
    # Codes must come from the f32 rows, not the bf16-rounded storage:
    # re-quantizing the f32 reference reproduces them bit-exactly.
    from pqvector_tpu.query.device import _quantize_rows_i8

    e8_ref, sc_ref = _quantize_rows_i8(s._emb_ref)
    np.testing.assert_array_equal(np.asarray(e8), np.asarray(e8_ref))
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(sc_ref))


def test_distributed_exact_bf16_with_reference(near_tie):
    """Row-sharded bf16 exact search with the sharded f32 reference must
    rank the sub-bf16-spacing groups exactly like an f32 mesh search."""
    from pqvector_tpu.dist import DistributedExactSearcher, make_mesh

    x, index, q, truth = near_tie
    mesh = make_mesh(2)
    s32 = DistributedExactSearcher(x, mesh=mesh, row_tile=128)
    sb = DistributedExactSearcher(
        x, mesh=mesh, row_tile=128, dtype=jnp.bfloat16
    )
    assert sb._emb_ref is not None
    d32, i32 = s32.search(q, 4)
    db, ib = sb.search(q, 4)
    np.testing.assert_array_equal(ib, i32)
    np.testing.assert_allclose(db, d32, rtol=1e-5, atol=1e-6)
    # Opt-out stays storage-bounded (ties collapse under bf16).
    s_off = DistributedExactSearcher(
        x, mesh=mesh, row_tile=128, dtype=jnp.bfloat16, rescore_dtype=None
    )
    assert s_off._emb_ref is None
