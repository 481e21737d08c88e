"""Multi-chip tests over the virtual 8-device CPU mesh.

The parity bar: distributed k-means must match the single-chip loop for the
same initial centroids, and distributed search must match the single-device
searcher (which itself matches brute force)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index
from pqvector_tpu.errors import ValidationError
from pqvector_tpu.dist import (
    DistributedExactSearcher,
    DistributedIvfSearcher,
    distributed_lloyd,
    make_mesh,
)
from pqvector_tpu.index.kmeans import _lloyd, _pad_rows


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(21)
    centers = rng.uniform(-5, 5, (6, 8)).astype(np.float32)
    x = np.concatenate(
        [c + 0.1 * rng.standard_normal((40, 8)).astype(np.float32) for c in centers]
    )
    return x


def test_distributed_lloyd_matches_single_chip(mesh, data):
    k = 6
    rng = np.random.default_rng(0)
    c0 = data[rng.choice(len(data), k, replace=False)].copy()

    block = 16
    x_pad, w = _pad_rows(jnp.asarray(data), block)
    c_single, a_single = _lloyd(x_pad, w, jnp.asarray(c0), 10, block, k)
    c_single = np.asarray(c_single)
    a_single = np.asarray(a_single)[: len(data)]

    c_dist, a_dist = distributed_lloyd(data, c0, 10, mesh=mesh, block_rows=16)

    np.testing.assert_allclose(c_dist, c_single, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(a_dist, a_single)


def test_distributed_exact_matches_brute_force(mesh, data):
    searcher = DistributedExactSearcher(data, mesh=mesh, row_tile=8)
    queries = data[[3, 77, 200]] + 0.01
    dists, ids = searcher.search(queries, k=5)
    for b, q in enumerate(queries):
        d = ((data - q[None, :]) ** 2).sum(1)
        want = np.argsort(d, kind="stable")[:5]
        np.testing.assert_array_equal(ids[b], want)
        np.testing.assert_allclose(dists[b], np.sqrt(d[want]), rtol=1e-4, atol=1e-4)


def test_distributed_ivf_matches_single_device(mesh, data):
    index = build_ivf_index(Embeddings(data, 8), IvfBuildConfig(n_clusters=6, seed=1))
    from pqvector_tpu.query.device import DeviceIvfSearcher

    single = DeviceIvfSearcher(index, data, row_tile=64)
    dist = DistributedIvfSearcher(index, data, mesh=mesh, tile=8)

    queries = data[[10, 99, 230]]
    for nprobe in (1, 3, 6):
        d_s, i_s = single.search(queries, k=4, nprobe=nprobe)
        d_d, i_d = dist.search(queries, k=4, nprobe=nprobe)
        np.testing.assert_array_equal(np.asarray(i_s), i_d)
        np.testing.assert_allclose(np.asarray(d_s), d_d, rtol=1e-4, atol=1e-4)


def test_distributed_ivf_k_exceeds_candidates(mesh, data):
    index = build_ivf_index(Embeddings(data, 8), IvfBuildConfig(n_clusters=6, seed=1))
    dist = DistributedIvfSearcher(index, data, mesh=mesh, tile=8)
    dists, ids = dist.search(data[0], k=120, nprobe=1)
    valid = (ids[0] >= 0).sum()
    assert 0 < valid < 120
    assert np.all(np.isinf(dists[0][ids[0] == -1]))


def test_distributed_build_matches_single_chip(mesh, data):
    """Full distributed build == single-chip build (same seed)."""
    from pqvector_tpu.dist.build import build_ivf_index_distributed
    from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index

    emb = Embeddings(data, 8)
    cfg = IvfBuildConfig(n_clusters=6, seed=5, block_rows=16)
    single = build_ivf_index(emb, cfg)
    dist = build_ivf_index_distributed(emb, cfg, mesh=mesh)
    np.testing.assert_allclose(dist.centroids, single.centroids, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(dist.row_ids, single.row_ids)
    np.testing.assert_array_equal(dist.list_offsets, single.list_offsets)


def test_distributed_exact_bf16(mesh, data):
    import jax.numpy as jnp

    # Unit-scale data: bf16 scoring noise (~0.4% of |x|^2 ~ d) stays well
    # below typical neighbor gaps, unlike the tight-blob module fixture.
    rng = np.random.default_rng(13)
    x = rng.standard_normal((240, 8)).astype(np.float32)
    searcher = DistributedExactSearcher(x, mesh=mesh, row_tile=8, dtype=jnp.bfloat16)
    q = x[[5]]
    dists, ids = searcher.search(q, k=5)
    d = ((x - q[0]) ** 2).sum(1)
    want = set(np.argsort(d)[:5].tolist())
    assert ids[0][0] == 5
    assert len(set(ids[0].tolist()) & want) >= 4  # bf16 may permute near-ties


def test_distributed_fused_matches_gather(mesh, data):
    """The fused per-shard stream-kernel path returns the same ids as the
    gather path (and therefore the single-device searcher)."""
    index = build_ivf_index(Embeddings(data, 8), IvfBuildConfig(n_clusters=6, seed=1))
    dist = DistributedIvfSearcher(index, data, mesh=mesh, tile=8)
    queries = data[[10, 99, 230]]
    for nprobe in (1, 3, 6):
        d_g, i_g = dist.search(queries, k=4, nprobe=nprobe)
        d_f, i_f = dist.search_fused(queries, k=4, nprobe=nprobe)
        np.testing.assert_array_equal(i_f, i_g)
        np.testing.assert_allclose(d_f, d_g, rtol=1e-4, atol=1e-4)


def test_distributed_fused_loop_matches_single_call(mesh, data):
    index = build_ivf_index(Embeddings(data, 8), IvfBuildConfig(n_clusters=6, seed=1))
    dist = DistributedIvfSearcher(index, data, mesh=mesh, tile=8)
    queries = data[[5, 77]]
    d1, i1 = dist.search_fused(queries, k=3, nprobe=2)
    dl, il = dist.search_loop(queries, k=3, nprobe=2, reps=2)
    np.testing.assert_array_equal(il, i1)
    np.testing.assert_allclose(dl, d1, rtol=1e-5)


def test_distributed_fused_device_count_invariant(data):
    """Results must not depend on the mesh size (2 vs 8 devices)."""
    index = build_ivf_index(Embeddings(data, 8), IvfBuildConfig(n_clusters=6, seed=1))
    queries = data[[1, 150]]
    results = []
    for n_dev in (2, 8):
        dist = DistributedIvfSearcher(index, data, mesh=make_mesh(n_dev), tile=8)
        results.append(dist.search_fused(queries, k=4, nprobe=3))
    np.testing.assert_array_equal(results[0][1], results[1][1])
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-4)


def test_distributed_scan_matches_exact(mesh, data):
    """Distributed ApproxTopK scan: on CPU approx_min_k is exact, so ids
    match the distributed exact searcher across the same mesh."""
    index = build_ivf_index(Embeddings(data, 8), IvfBuildConfig(n_clusters=6, seed=0))
    rng = np.random.default_rng(3)
    queries = rng.standard_normal((5, 8)).astype(np.float32)
    exact = DistributedExactSearcher(data, mesh=mesh, row_tile=64)
    de, ie = exact.search(queries, k=4)
    dist = DistributedIvfSearcher(index, data, mesh=mesh, tile=64)
    ds, is_ = dist.search_scan(queries, k=4)
    np.testing.assert_array_equal(is_, ie)
    np.testing.assert_allclose(ds, de, rtol=1e-5)
    dl, il = dist.search_scan(queries, k=4, reps=2)
    np.testing.assert_array_equal(il, ie)
    # overfetch knob (round-4 tuned serving point parity): widened
    # selection + re-score must return the same winners.
    do, io_ = dist.search_scan(queries, k=4, overfetch=8)
    np.testing.assert_array_equal(io_, ie)
    np.testing.assert_allclose(do, de, rtol=1e-5)


def test_distributed_xbin_matches_exact(mesh, data):
    """Distributed XLA binned-min scan: with one tile group per shard
    (l_bins = rows_per_dev) selection is collision-free, so ids match the
    distributed exact searcher exactly."""
    index = build_ivf_index(Embeddings(data, 8), IvfBuildConfig(n_clusters=6, seed=0))
    rng = np.random.default_rng(5)
    queries = rng.standard_normal((5, 8)).astype(np.float32)
    exact = DistributedExactSearcher(data, mesh=mesh, row_tile=64)
    de, ie = exact.search(queries, k=4)
    dist = DistributedIvfSearcher(index, data, mesh=mesh, tile=64)
    assert dist.can_xbin(4)
    dx, ix = dist.search_xbin(queries, k=4)
    np.testing.assert_array_equal(ix, ie)
    np.testing.assert_allclose(dx, de, rtol=1e-5, atol=1e-5)
    dl, il = dist.search_xbin(queries, k=4, reps=2)
    np.testing.assert_array_equal(il, ie)
    # Explicit bins + chunked accumulator: same ids for any divisor pair.
    lb = dist._rows_per_dev // 2
    d3, i3 = dist.search_xbin(queries, k=4, l_bins=lb, chunk_groups=1)
    got = set(np.asarray(i3)[0].tolist())
    assert got  # collisions possible at 2 rows/bin; ids must be valid rows
    assert all(0 <= g < data.shape[0] for g in got if g >= 0)
    with pytest.raises(ValidationError):
        dist.search_xbin(queries, k=4, l_bins=7)  # not a divisor


def test_cluster_axis_matches_single_device(data):
    """2-D (data x cluster) mesh probe fan-out: ids match the row-sharded
    1-D fused path (and therefore the single-device searcher) for several
    mesh shapes."""
    from pqvector_tpu.dist import DistributedClusterIvfSearcher, make_mesh_2d

    index = build_ivf_index(Embeddings(data, 8), IvfBuildConfig(n_clusters=6, seed=1))
    queries = data[[10, 99, 230]]
    ref = DistributedIvfSearcher(index, data, mesh=make_mesh(8), tile=8)
    # (4, 2) is covered by test_cluster_axis_spilled — per-shape compiles
    # dominate this test's cost, so don't duplicate it here.
    for shape in ((2, 4), (1, 8), (8, 1)):
        mesh2 = make_mesh_2d(*shape)
        dist2 = DistributedClusterIvfSearcher(index, data, mesh=mesh2, tile=8)
        for nprobe in (1, 3, 6):
            d_r, i_r = ref.search_fused(queries, k=4, nprobe=nprobe)
            d_c, i_c = dist2.search(queries, k=4, nprobe=nprobe)
            np.testing.assert_array_equal(i_c, i_r)
            np.testing.assert_allclose(d_c, d_r, rtol=1e-4, atol=1e-4)


def test_cluster_axis_loop_matches_single_call(data):
    from pqvector_tpu.dist import DistributedClusterIvfSearcher, make_mesh_2d

    index = build_ivf_index(Embeddings(data, 8), IvfBuildConfig(n_clusters=6, seed=1))
    dist2 = DistributedClusterIvfSearcher(
        index, data, mesh=make_mesh_2d(2, 4), tile=8
    )
    queries = data[[5, 77]]
    d1, i1 = dist2.search(queries, k=3, nprobe=2)
    dl, il = dist2.search_loop(queries, k=3, nprobe=2, reps=2)
    np.testing.assert_array_equal(il, i1)
    np.testing.assert_allclose(dl, d1, rtol=1e-5)


def test_distributed_binscan_matches_exact(mesh, data):
    """Distributed fused binned-min scan: with <=128 rows per shard each
    shard is a single bin tile, so selection is collision-free and ids
    match the distributed exact searcher exactly."""
    index = build_ivf_index(Embeddings(data, 8), IvfBuildConfig(n_clusters=6, seed=0))
    rng = np.random.default_rng(4)
    queries = rng.standard_normal((5, 8)).astype(np.float32)
    exact = DistributedExactSearcher(data, mesh=mesh, row_tile=64)
    de, ie = exact.search(queries, k=4)
    dist = DistributedIvfSearcher(index, data, mesh=mesh, tile=128)
    assert dist.can_binscan(4)
    db, ib = dist.search_binscan(queries, k=4)
    np.testing.assert_array_equal(ib, ie)
    np.testing.assert_allclose(db, de, rtol=1e-5, atol=1e-5)
    dl, il = dist.search_binscan(queries, k=4, reps=2)
    np.testing.assert_array_equal(il, ie)


def test_distributed_binscan_multi_tile_recall():
    """Multi-tile shards: binscan misses only on cross-tile bin collisions;
    recall stays high and returned distances are exact re-scores."""
    rng = np.random.default_rng(11)
    n, d, k = 2048, 8, 5
    data2 = rng.standard_normal((n, d)).astype(np.float32)
    index = build_ivf_index(
        Embeddings(data2, d), IvfBuildConfig(n_clusters=8, seed=0)
    )
    mesh2 = make_mesh(2)
    dist = DistributedIvfSearcher(index, data2, mesh=mesh2, tile=128)
    assert dist._rows_per_dev // dist._binscan_tile() >= 2  # multi-tile
    queries = rng.standard_normal((16, d)).astype(np.float32)
    db, ib = dist.search_binscan(queries, k=k)
    d2 = ((queries[:, None, :] - data2[None, :, :]) ** 2).sum(-1)
    tids = np.argsort(d2, axis=1, kind="stable")[:, :k]
    hits = sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ib, tids)
    )
    assert hits / (len(queries) * k) >= 0.9
    want = np.sqrt(((queries[:, None, :] - data2[ib]) ** 2).sum(-1))
    np.testing.assert_allclose(db, want, rtol=1e-4, atol=1e-4)


def test_distributed_bincompact_matches_fused(mesh, data):
    """Full-cap bincompact covers every tile, so ids match the exact
    searcher; the default popularity cap keeps recall on probed clusters."""
    index = build_ivf_index(Embeddings(data, 8), IvfBuildConfig(n_clusters=6, seed=1))
    rng = np.random.default_rng(5)
    queries = data[[10, 99, 230]]
    exact = DistributedExactSearcher(data, mesh=mesh, row_tile=64)
    de, ie = exact.search(queries, k=4)
    dist = DistributedIvfSearcher(index, data, mesh=mesh, tile=128)
    db, ib = dist.search_bincompact(queries, k=4, nprobe=6, cap=dist._nt_local)
    np.testing.assert_array_equal(ib, ie)
    np.testing.assert_allclose(db, de, rtol=1e-5, atol=1e-5)
    # Loop form agrees with the single call (default cap).
    d1, i1 = dist.search_bincompact(queries, k=4, nprobe=3)
    dl, il = dist.search_bincompact(queries, k=4, nprobe=3, reps=2)
    np.testing.assert_array_equal(il, i1)
    np.testing.assert_allclose(dl, d1, rtol=1e-5)
    # An explicit cap beyond the shard tile count clamps (the kernel grid
    # is static over cap; past-the-end would read garbage tile indices).
    dc, ic = dist.search_bincompact(queries, k=4, nprobe=6, cap=10**6)
    np.testing.assert_array_equal(ic, ie)


def test_distributed_bincompact_probe_selection():
    """With a tight cap, bincompact returns rows from probed clusters (the
    popularity selection keeps the batch's hot tiles)."""
    rng = np.random.default_rng(12)
    n, d, k = 2048, 8, 4
    centers = rng.uniform(-8, 8, (8, d)).astype(np.float32)
    lab = rng.integers(0, 8, n)
    data2 = (centers[lab] + 0.1 * rng.standard_normal((n, d))).astype(
        np.float32
    )
    index = build_ivf_index(
        Embeddings(data2, d), IvfBuildConfig(n_clusters=8, seed=0)
    )
    mesh2 = make_mesh(2)
    dist = DistributedIvfSearcher(index, data2, mesh=mesh2, tile=128)
    qrows = rng.integers(0, n, 16)
    queries = (
        data2[qrows] + 0.02 * rng.standard_normal((16, d))
    ).astype(np.float32)
    single_ref = build_single_reference(index, data2, queries, k)
    db, ib = dist.search_bincompact(queries, k=k, nprobe=2)
    hits = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(ib, single_ref)
    )
    assert hits / (len(queries) * k) >= 0.9
    assert float((ib[:, 0] == qrows).mean()) >= 0.9


def build_single_reference(index, data2, queries, k):
    from pqvector_tpu.query.device import DeviceIvfSearcher

    single = DeviceIvfSearcher(index, data2, row_tile=128)
    _, ids = single.search(queries, k, nprobe=2)
    return np.asarray(ids)


def test_distributed_spilled_matches_exact_and_dedups(mesh, data):
    """Spilled distributed searcher: originals-only ids, no duplicates,
    exact agreement with the unspilled searcher at full probe coverage
    (nprobe=kc probes every cluster, so the spill can only ADD duplicate
    copies — dedup must collapse them back to the true top-k)."""
    index = build_ivf_index(
        Embeddings(data, data.shape[1]), IvfBuildConfig(n_clusters=6, seed=0)
    )
    base = DistributedIvfSearcher(index, data, mesh=mesh, tile=8)
    sp = DistributedIvfSearcher.with_spill(
        index, data, spill=0.3, mesh=mesh, tile=8
    )
    assert sp._spill_dups and not base._spill_dups
    queries = data[[5, 50, 111]] + 0.02
    d0, i0 = base.search_fused(queries, k=4, nprobe=6)
    d1, i1 = sp.search_fused(queries, k=4, nprobe=6)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_allclose(d1, d0, rtol=1e-5)
    for r in i1:
        ids = [v for v in r.tolist() if v >= 0]
        assert len(set(ids)) == len(ids)
        assert all(v < len(data) for v in ids)


def test_distributed_spilled_recall_lift(mesh, data):
    """At nprobe=1 on clustered data, spilling boundary rows into the
    runner-up cluster must not lose recall vs the unspilled searcher
    (and lifts it when boundary rows exist)."""
    index = build_ivf_index(
        Embeddings(data, data.shape[1]), IvfBuildConfig(n_clusters=6, seed=0)
    )
    rng = np.random.default_rng(3)
    q = (data[rng.integers(0, len(data), 24)]
         + 0.3 * rng.standard_normal((24, data.shape[1]))).astype(np.float32)
    d2 = (
        np.sum(q * q, 1)[:, None] - 2.0 * q @ data.T
        + np.sum(data * data, 1)[None, :]
    )
    truth = np.argsort(d2, axis=1, kind="stable")[:, :4]

    def rec(searcher):
        _, ids = searcher.search_fused(q, k=4, nprobe=1)
        return sum(
            len(set(a.tolist()) & set(b.tolist()))
            for a, b in zip(ids, truth)
        ) / truth.size

    base = DistributedIvfSearcher(index, data, mesh=mesh, tile=8)
    sp = DistributedIvfSearcher.with_spill(
        index, data, spill=0.4, mesh=mesh, tile=8
    )
    assert rec(sp) >= rec(base)


def test_distributed_spilled_loop_and_scan(mesh, data):
    """search_loop and the full-scan modes also dedup on spilled layouts
    (the scan modes cover every row, so every duplicated row WILL appear
    twice before dedup)."""
    index = build_ivf_index(
        Embeddings(data, data.shape[1]), IvfBuildConfig(n_clusters=6, seed=0)
    )
    sp = DistributedIvfSearcher.with_spill(
        index, data, spill=0.5, mesh=mesh, tile=8
    )
    queries = data[[7, 70]] + 0.01
    d2 = (
        np.sum(queries * queries, 1)[:, None] - 2.0 * queries @ data.T
        + np.sum(data * data, 1)[None, :]
    )
    truth = np.argsort(d2, axis=1, kind="stable")[:, :3]
    _, il = sp.search_loop(queries, k=3, nprobe=6, reps=2)
    np.testing.assert_array_equal(il, truth)
    _, isc = sp.search_scan(queries, k=3)
    for r in isc:
        ids = [v for v in r.tolist() if v >= 0]
        assert len(set(ids)) == len(ids)


def test_distributed_xbin8_recall_and_exact_distances(mesh, data):
    """Distributed int8 xbin: quantization may perturb selection, so pin
    recall vs the distributed exact searcher plus EXACT distances for the
    returned ids (per-shard re-score against full-precision rows)."""
    index = build_ivf_index(
        Embeddings(data, 8), IvfBuildConfig(n_clusters=6, seed=0)
    )
    rng = np.random.default_rng(5)
    queries = rng.standard_normal((5, 8)).astype(np.float32)
    exact = DistributedExactSearcher(data, mesh=mesh, row_tile=64)
    _, ie = exact.search(queries, k=4)
    dist = DistributedIvfSearcher(index, data, mesh=mesh, tile=64)
    d8, i8 = dist.search_xbin8(queries, k=4)
    hits = sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(i8, ie)
    )
    assert hits / ie.size >= 0.9
    for b in range(len(queries)):
        want = np.sqrt(((data[i8[b]] - queries[b]) ** 2).sum(1))
        np.testing.assert_allclose(d8[b], want, rtol=1e-4, atol=1e-4)
    dl, il = dist.search_xbin8(queries, k=4, reps=2)
    np.testing.assert_array_equal(il, i8)
    # Spilled layout composes: ids deduped, original rows only.
    sp = DistributedIvfSearcher.with_spill(
        index, data, spill=0.3, mesh=mesh, tile=64
    )
    _, isp = sp.search_xbin8(queries, k=4)
    for r in isp:
        ids = [v for v in r.tolist() if v >= 0]
        assert len(set(ids)) == len(ids)
        assert all(v < len(data) for v in ids)


def test_distributed_bincompact_calibration(mesh, data):
    """Measured calibration pins the per-shard tile cap to the sample's
    actual probed-union max across shards; results match the uncalibrated
    path and the cap is never larger than the static formula's budget."""
    index = build_ivf_index(
        Embeddings(data, 8), IvfBuildConfig(n_clusters=6, seed=0)
    )
    dist = DistributedIvfSearcher(index, data, mesh=mesh, tile=128)
    queries = data[[5, 50, 111]] + 0.02
    d0, i0 = dist.search_bincompact(queries, k=4, nprobe=3)
    cap = dist.calibrate_bincompact(queries, nprobe=3, k=4)
    assert 1 <= cap <= dist._nt_local
    d1, i1 = dist.search_bincompact(queries, k=4, nprobe=3)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_allclose(d1, d0, rtol=1e-5)
    # full probe coverage at nprobe=kc -> calibrated cap covers all
    # shard-active tiles; search still equals the fused exact path
    dist.calibrate_bincompact(queries, nprobe=6, k=4)
    _, ic = dist.search_bincompact(queries, k=4, nprobe=6)
    _, ie = dist.search_fused(queries, k=4, nprobe=6)
    np.testing.assert_array_equal(ic, ie)
    dist._bincompact_calibrated = None


def test_cluster_axis_spilled(mesh, data):
    """2-D mesh spilled searcher: full probe coverage reproduces the
    unspilled result exactly; ids are deduped originals."""
    from pqvector_tpu.dist import DistributedClusterIvfSearcher, make_mesh_2d

    index = build_ivf_index(
        Embeddings(data, 8), IvfBuildConfig(n_clusters=6, seed=0)
    )
    mesh2 = make_mesh_2d(4, 2)
    base = DistributedClusterIvfSearcher(index, data, mesh=mesh2, tile=8)
    sp = DistributedClusterIvfSearcher.with_spill(
        index, data, spill=0.3, mesh=mesh2, tile=8
    )
    queries = data[[5, 50, 111]] + 0.02
    d0, i0 = base.search(queries, k=4, nprobe=6)
    # Independent oracle for THIS mesh shape (the shape-sweep parity test
    # no longer includes (4,2)): the 1-D row-sharded fused path.
    ref = DistributedIvfSearcher(index, data, mesh=mesh, tile=8)
    d_r, i_r = ref.search_fused(queries, k=4, nprobe=6)
    np.testing.assert_array_equal(i0, i_r)
    np.testing.assert_allclose(d0, d_r, rtol=1e-4, atol=1e-4)
    d1, i1 = sp.search(queries, k=4, nprobe=6)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_allclose(d1, d0, rtol=1e-5)
    _, il = sp.search_loop(queries, k=4, nprobe=6, reps=2)
    np.testing.assert_array_equal(il, i0)
    for r in i1:
        ids = [v for v in r.tolist() if v >= 0]
        assert len(set(ids)) == len(ids)
        assert all(v < len(data) for v in ids)


def test_distributed_binscan8_recall_and_exact_distances():
    """Distributed int8 binned-min scan: quantized selection, exact
    re-score per shard — recall high, returned distances exact."""
    rng = np.random.default_rng(31)
    n, d, k = 2048, 8, 5
    data2 = rng.standard_normal((n, d)).astype(np.float32)
    index = build_ivf_index(
        Embeddings(data2, d), IvfBuildConfig(n_clusters=8, seed=0)
    )
    dist = DistributedIvfSearcher(index, data2, mesh=make_mesh(2), tile=128)
    assert dist.can_binscan(k, esize=1)
    queries = rng.standard_normal((16, d)).astype(np.float32)
    db, ib = dist.search_binscan8(queries, k=k)
    d2 = ((queries[:, None, :] - data2[None, :, :]) ** 2).sum(-1)
    tids = np.argsort(d2, axis=1, kind="stable")[:, :k]
    hits = sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ib, tids)
    )
    assert hits / (len(queries) * k) >= 0.85
    want = np.sqrt(((queries[:, None, :] - data2[ib]) ** 2).sum(-1))
    np.testing.assert_allclose(db, want, rtol=1e-4, atol=1e-4)
    # Chained form agrees.
    dl, il = dist.search_binscan8(queries, k=k, reps=2)
    np.testing.assert_array_equal(il, ib)


# ----------------------------------------------------------------------
# Round-5 additions (VERDICT r4 item 8): rescore + dynamic updates at
# dist scale.
# ----------------------------------------------------------------------


@pytest.fixture(scope="module")
def near_tie_dist():
    """Groups of 4 rows spaced 1e-4 apart (below bf16 resolution): the
    within-group ranking is only recoverable through the f32 reference."""
    rng = np.random.default_rng(7)
    n_groups, per, d = 48, 4, 16
    centers = rng.uniform(-4, 4, (n_groups, d)).astype(np.float32)
    rows = []
    for g in range(n_groups):
        for j in range(per):
            rows.append(
                centers[g] + (1e-4 * j) * np.eye(d, dtype=np.float32)[0]
            )
    x = np.stack(rows).astype(np.float32)
    index = build_ivf_index(
        Embeddings(x, d), IvfBuildConfig(n_clusters=6, seed=0)
    )
    gq = rng.integers(0, n_groups, 16)
    q = centers[gq].copy()
    q[:, 0] += 2.1e-4
    return x, index, q


def _f32_truth_top1(x, q):
    d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    return np.argsort(d2, axis=1, kind="stable")[:, 0]


def test_distributed_rescore_recovers_f32_ranking(mesh, near_tie_dist):
    """bf16 storage + sharded f32 reference: every dist path re-scores its
    local winners pre-merge, so sub-bf16 near-ties rank f32-exactly."""
    x, index, q = near_tie_dist
    s = DistributedIvfSearcher(
        index, x, mesh=mesh, tile=8, dtype=jnp.bfloat16
    )
    assert s._emb_ref is not None
    top1 = _f32_truth_top1(x, q)
    for name, call in (
        ("search", lambda: s.search(q, k=4, nprobe=6)),
        ("search_fused", lambda: s.search_fused(q, k=4, nprobe=6)),
        ("search_scan", lambda: s.search_scan(q, k=4)),
    ):
        d, ids = call()
        assert (ids[:, 0] == top1).mean() >= 0.9, name
        # Returned distances are f32-exact for the chosen ids.
        want = np.sqrt(((q[:, None, :] - x[ids]) ** 2).sum(-1))
        np.testing.assert_allclose(d, want, rtol=1e-4, atol=1e-5)
    # Opt-out holds no reference and keeps bf16-rounded distances.
    s_no = DistributedIvfSearcher(
        index, x, mesh=mesh, tile=8, dtype=jnp.bfloat16, rescore_dtype=None
    )
    assert s_no._emb_ref is None


def test_distributed_spilled_rescore(mesh, near_tie_dist):
    """with_spill + bf16 + f32 reference: dedup composes with the
    pre-merge re-score (full coverage == unspilled f32 results)."""
    x, index, q = near_tie_dist
    sp = DistributedIvfSearcher.with_spill(
        index, x, spill=0.3, mesh=mesh, tile=8, dtype=jnp.bfloat16
    )
    assert sp._spill_dups and sp._emb_ref is not None
    base = DistributedIvfSearcher(index, x, mesh=mesh, tile=8)
    d0, i0 = base.search_fused(q, k=4, nprobe=6)
    d1, i1 = sp.search_fused(q, k=4, nprobe=6)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_allclose(d1, d0, rtol=1e-4, atol=1e-5)


def test_distributed_dynamic_updates(mesh, data):
    """Tombstone deletes + delta appends across the dist search paths."""
    index = build_ivf_index(
        Embeddings(data, data.shape[1]), IvfBuildConfig(n_clusters=6, seed=0)
    )
    s = DistributedIvfSearcher(index, data, mesh=mesh, tile=8)
    queries = data[[5, 50, 111]] + 0.02
    _, i0 = s.search(queries, k=3, nprobe=6)
    victims = np.unique(i0[:, 0])
    s.delete_rows(victims)
    appended = s.append_rows(queries + 0.001)
    for name, call in (
        ("search", lambda: s.search(queries, k=3, nprobe=6)),
        ("search_fused", lambda: s.search_fused(queries, k=3, nprobe=6)),
        ("search_scan", lambda: s.search_scan(queries, k=3)),
        ("search_loop", lambda: s.search_loop(queries, k=3, nprobe=6, reps=2)),
    ):
        d, ids = call()
        assert not np.isin(ids, victims).any(), name
        # The fresh near-duplicates win their own queries exactly.
        assert (ids[:, 0] == appended).all(), name
        assert np.isfinite(d[:, 0]).all(), name
    # Deleting an appended id removes it again.
    s.delete_rows(appended[:1])
    _, ids = s.search(queries[:1], k=3, nprobe=6)
    assert appended[0] not in ids
    with pytest.raises(ValidationError, match="delete_rows"):
        s.delete_rows([10**6])
    with pytest.raises(ValidationError, match="append_rows"):
        s.append_rows(np.zeros((2, 3), np.float32))


def test_distributed_dynamic_spilled(mesh, data):
    """Deletes tombstone EVERY copy of a spilled row (copies may live on
    two shards)."""
    index = build_ivf_index(
        Embeddings(data, data.shape[1]), IvfBuildConfig(n_clusters=6, seed=0)
    )
    sp = DistributedIvfSearcher.with_spill(
        index, data, spill=0.5, mesh=mesh, tile=8
    )
    queries = data[[5, 50, 111]] + 0.02
    _, i0 = sp.search_fused(queries, k=3, nprobe=6)
    victims = np.unique(i0[:, 0])
    sp.delete_rows(victims)
    _, ids = sp.search_fused(queries, k=3, nprobe=6)
    assert not np.isin(ids, victims).any()
    # Dedup still holds after the dynamic merge.
    for r in ids:
        live = [v for v in r.tolist() if v >= 0]
        assert len(set(live)) == len(live)
