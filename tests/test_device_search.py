"""Device-resident batched search tests (CPU backend; same XLA programs)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pqvector_tpu import Embeddings, IvfBuildConfig, ValidationError, build_ivf_index
from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.query.device import DeviceIvfSearcher


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((500, 16)).astype(np.float32)
    index = build_ivf_index(Embeddings(x, 16), IvfBuildConfig(n_clusters=10, seed=3))
    searcher = DeviceIvfSearcher(index, x, row_tile=128)
    queries = rng.standard_normal((7, 16)).astype(np.float32)
    return x, index, searcher, queries


def brute_force(x, q, k):
    d = ((x - q[None, :]) ** 2).sum(1)
    idx = np.argsort(d, kind="stable")[:k]
    return idx, np.sqrt(d[idx])


def test_exact_matches_numpy(setup):
    x, _, searcher, queries = setup
    dists, ids = searcher.exact(queries, k=5)
    for b, q in enumerate(queries):
        want_ids, want_d = brute_force(x, q, 5)
        np.testing.assert_array_equal(np.asarray(ids[b]), want_ids)
        np.testing.assert_allclose(np.asarray(dists[b]), want_d, rtol=1e-4, atol=1e-4)


def test_ivf_full_probe_equals_exact(setup):
    x, index, searcher, queries = setup
    dists, ids = searcher.search(queries, k=5, nprobe=index.n_clusters)
    for b, q in enumerate(queries):
        want_ids, want_d = brute_force(x, q, 5)
        np.testing.assert_array_equal(np.asarray(ids[b]), want_ids)
        np.testing.assert_allclose(np.asarray(dists[b]), want_d, rtol=1e-4, atol=1e-4)


def test_ivf_matches_host_candidates(setup):
    """Device IVF ranking must equal the host candidate_rows + exact-distance
    path at the same nprobe."""
    x, index, searcher, queries = setup
    k, nprobe = 4, 3
    dists, ids = searcher.search(queries, k=k, nprobe=nprobe)
    for b, q in enumerate(queries):
        rows = index.candidate_rows(q, nprobe)
        d = ((x[rows] - q[None, :]) ** 2).sum(1)
        order = np.argsort(d, kind="stable")[:k]
        np.testing.assert_array_equal(np.asarray(ids[b]), rows[order])


def test_missing_slots_marked(setup):
    x, index, searcher, _ = setup
    # k far beyond any cluster's population with nprobe=1.
    q = x[0]
    dists, ids = searcher.search(q, k=400, nprobe=1)
    ids = np.asarray(ids[0])
    dists = np.asarray(dists[0])
    n_valid = (ids >= 0).sum()
    assert n_valid == index.cluster_sizes()[
        int(index.find_closest_centroids(q, 1)[0])
    ]
    assert np.all(np.isinf(dists[ids == -1]))


def test_query_validation(setup):
    _, _, searcher, _ = setup
    with pytest.raises(ValidationError):
        searcher.exact(np.zeros((2, 3), np.float32), k=1)
    with pytest.raises(ValidationError):
        searcher.search(np.zeros((1, 16), np.float32), k=0, nprobe=1)
    with pytest.raises(ValidationError):
        searcher.search(np.zeros((1, 16), np.float32), k=1, nprobe=0)


def test_single_query_vector_promoted(setup):
    x, _, searcher, _ = setup
    dists, ids = searcher.exact(x[42], k=1)
    assert ids.shape == (1, 1)
    assert int(ids[0, 0]) == 42


def test_from_parquet_round_trip(tmp_path):
    rng = np.random.default_rng(5)
    x = rng.standard_normal((120, 8)).astype(np.float32)
    path = tmp_path / "d.parquet"
    table = pa.table(
        {
            "id": pa.array(range(120), pa.int32()),
            "emb": pa.array(list(x), pa.list_(pa.float32())),
        }
    )
    pq.write_table(table, path)
    IndexBuilder(path, "emb").n_clusters(4).build_inplace()
    searcher = DeviceIvfSearcher.from_parquet(path, row_tile=64)
    dists, ids = searcher.search(x[7], k=3, nprobe=4)
    assert int(ids[0, 0]) == 7
    np.testing.assert_allclose(float(dists[0, 0]), 0.0, atol=1e-4)


def test_bfloat16_storage_close_ranking(setup):
    import jax.numpy as jnp

    x, index, _, queries = setup
    searcher16 = DeviceIvfSearcher(index, x, dtype=jnp.bfloat16, row_tile=128)
    d16, i16 = searcher16.exact(queries, k=10)
    for b, q in enumerate(queries):
        want_ids, _ = brute_force(x, q, 10)
        # bf16 scoring may permute near-ties; require >=80% overlap@10.
        overlap = len(set(np.asarray(i16[b]).tolist()) & set(want_ids.tolist()))
        assert overlap >= 8


def test_cluster_sorted_resident_layout(setup):
    """cluster_sorted=True permutes HBM rows but returns original ids."""
    x, index, _, queries = setup
    base = DeviceIvfSearcher(index, x, row_tile=128)
    sorted_s = DeviceIvfSearcher(index, x, row_tile=128, cluster_sorted=True)
    # Inverted lists became contiguous ranges internally.
    np.testing.assert_array_equal(
        np.asarray(sorted_s.index.row_ids), np.arange(index.total_rows)
    )
    for nprobe in (1, 4, 10):
        d_b, i_b = base.search(queries, k=5, nprobe=nprobe)
        d_s, i_s = sorted_s.search(queries, k=5, nprobe=nprobe)
        np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_s))
        np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_s), rtol=1e-5)
    d_b, i_b = base.exact(queries, k=5)
    d_s, i_s = sorted_s.exact(queries, k=5)
    np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_s))


def test_exact_approx_mode_matches_numpy(setup):
    """mode='approx' (hardware ApproxTopK on TPU) lowers to exact top-k on
    CPU, so ids/distances must match the brute-force oracle here. Exercises
    the chunked scan + static tail (row_tile=128, chunk=min(n_pad, 8192))."""
    x, _, searcher, queries = setup
    dists, ids = searcher.exact(queries, k=5, mode="approx")
    for b, q in enumerate(queries):
        want_ids, want_d = brute_force(x, q, 5)
        np.testing.assert_array_equal(np.asarray(ids[b]), want_ids)
        np.testing.assert_allclose(np.asarray(dists[b]), want_d, rtol=1e-4, atol=1e-4)


def test_ivf_approx_mode_matches_gather(setup):
    x, index, searcher, queries = setup
    k, nprobe = 4, 3
    d_a, i_a = searcher.search(queries, k=k, nprobe=nprobe, mode="approx")
    d_g, i_g = searcher.search(queries, k=k, nprobe=nprobe, mode="gather")
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_g))
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_g), rtol=1e-5)


def test_ivf_approx_missing_slots(setup):
    """k larger than the probed candidate count: surplus slots are -1/inf."""
    x, index, searcher, queries = setup
    smallest = int(np.argmin(index.cluster_sizes()))
    c = np.asarray(index.centroids[smallest], np.float32)
    d, ids = searcher.search(c, k=index.total_rows, nprobe=1, mode="approx")
    n_cand = int(index.cluster_sizes()[smallest])
    ids = np.asarray(ids)[0]
    assert (ids[n_cand:] == -1).all()
    assert np.isinf(np.asarray(d)[0][n_cand:]).all()
    assert (ids[:n_cand] != -1).all()


def test_cluster_sorted_pallas_local_mask(setup):
    """Pallas mode on a cluster_sorted searcher routes through the per-tile
    local cluster tables (interpret mode on CPU) and matches the gather path."""
    x, index, _, queries = setup
    s = DeviceIvfSearcher(index, x, row_tile=128, cluster_sorted=True)
    assert s._row_cluster_sorted
    k, nprobe = 4, 3
    d_p, i_p = s.search(queries, k=k, nprobe=nprobe, mode="pallas")
    assert s._tile_tables  # the local-table path really ran
    d_g, i_g = s.search(queries, k=k, nprobe=nprobe, mode="gather")
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_g))
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_g), rtol=1e-5)


def test_search_loop_matches_single(setup):
    """The in-dispatch loop API returns the same results as one search call
    (the loop re-issues the same query batch via the chained dependency)."""
    x, index, _, queries = setup
    s = DeviceIvfSearcher(index, x, row_tile=128, cluster_sorted=True)
    d1, i1 = s.search(queries, k=4, nprobe=3, mode="pallas")
    dl, il = s.search_loop(queries, k=4, nprobe=3, reps=2)
    np.testing.assert_array_equal(np.asarray(il), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(dl), np.asarray(d1), rtol=1e-5)

    de, ie = s.exact(queries, k=4, mode="pallas")
    dle, ile = s.exact_loop(queries, k=4, reps=2)
    np.testing.assert_array_equal(np.asarray(ile), np.asarray(ie))
    np.testing.assert_allclose(np.asarray(dle), np.asarray(de), rtol=1e-5)


def test_search_loop_unsorted_layout(setup):
    """Loop API falls back to the global-mask kernel on unsorted layouts."""
    x, index, searcher, queries = setup
    assert not searcher._row_cluster_sorted
    d1, i1 = searcher.search(queries, k=4, nprobe=3, mode="pallas")
    dl, il = searcher.search_loop(queries, k=4, nprobe=3, reps=2)
    np.testing.assert_array_equal(np.asarray(il), np.asarray(i1))


def test_exact_approx_k_exceeds_n(setup):
    """approx mode honors the k > n contract (surplus slots -1/inf) instead
    of tripping approx_min_k's k < width requirement."""
    x, _, searcher, queries = setup
    n = x.shape[0]
    d, ids = searcher.exact(queries[:2], k=n + 40, mode="approx")
    ids = np.asarray(ids)
    d = np.asarray(d)
    assert ids.shape == (2, n + 40)
    assert (ids[:, n:] == -1).all()
    assert np.isinf(d[:, n:]).all()
    want_ids, _ = brute_force(x, queries[0], 5)
    np.testing.assert_array_equal(ids[0][:5], want_ids)


def test_stream_modes_match_existing(setup):
    """Round-2 stream kernels agree with the round-1 paths at the device API
    level (exact + IVF across nprobe), including id mapping back to original
    rows on the cluster_sorted layout."""
    x, index, _, queries = setup
    s = DeviceIvfSearcher(index, x, row_tile=128, cluster_sorted=True)
    de, ie = s.exact(queries, k=5, mode="stream")
    dx, ix = s.exact(queries, k=5, mode="xla")
    np.testing.assert_array_equal(np.asarray(ie), np.asarray(ix))
    np.testing.assert_allclose(np.asarray(de), np.asarray(dx), rtol=1e-5)
    for nprobe in (1, 4, 10):
        d_s, i_s = s.search(queries, k=5, nprobe=nprobe, mode="stream")
        d_g, i_g = s.search(queries, k=5, nprobe=nprobe, mode="gather")
        np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_g))
        np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_g), rtol=1e-5)


def test_stream_loop_matches_single(setup):
    x, index, _, queries = setup
    s = DeviceIvfSearcher(index, x, row_tile=128, cluster_sorted=True)
    d1, i1 = s.search(queries, k=4, nprobe=3, mode="stream")
    dl, il = s.search_loop(queries, k=4, nprobe=3, reps=2, mode="stream")
    np.testing.assert_array_equal(np.asarray(il), np.asarray(i1))
    de, ie = s.exact(queries, k=4, mode="stream")
    dle, ile = s.exact_loop(queries, k=4, reps=2, mode="stream")
    np.testing.assert_array_equal(np.asarray(ile), np.asarray(ie))


def test_stream_mode_rejected_on_unsorted(setup):
    x, index, searcher, queries = setup
    assert not searcher._row_cluster_sorted
    with pytest.raises(ValidationError):
        searcher.search(queries, k=4, nprobe=3, mode="stream")


def test_search_loop_approx_mode(setup):
    """Loop API supports the ApproxTopK mode (fair best-of-modes timing);
    on CPU approx_min_k is exact, so ids match the stream loop."""
    x, index, _, queries = setup
    s = DeviceIvfSearcher(index, x, row_tile=128, cluster_sorted=True)
    d1, i1 = s.search_loop(queries, k=4, nprobe=3, reps=2, mode="stream")
    da, ia = s.search_loop(queries, k=4, nprobe=3, reps=2, mode="approx")
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(i1))


def test_scan_mode_matches_exact(setup):
    """mode="scan" = ApproxTopK full scan (nprobe ignored); on CPU
    approx_min_k is exact, so it matches the exact scan everywhere."""
    x, _, searcher, queries = setup
    de, ie = searcher.exact(queries, k=5)
    d1, i1 = searcher.search(queries, k=5, nprobe=1, mode="scan")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(ie))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(de), rtol=1e-5)
    dl, il = searcher.search_loop(queries, k=5, nprobe=1, reps=2, mode="scan")
    np.testing.assert_array_equal(np.asarray(il), np.asarray(ie))


def test_scan_overfetch_knob(setup):
    """scan_overfetch overrides the ApproxTopK fetch-width policy; results
    stay exact on CPU for any width >= k, and widths < k clamp to k."""
    x, _, searcher, queries = setup
    de, ie = searcher.exact(queries, k=5)
    try:
        for kf in (3, 8, 40):  # below-k clamps to k; others widen
            searcher.scan_overfetch = kf
            _, i1 = searcher.search(queries, k=5, nprobe=1, mode="scan")
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(ie))
            _, i2 = searcher.search(queries, k=5, nprobe=3, mode="approx")
            _, im = searcher.search(queries, k=5, nprobe=3)
            np.testing.assert_array_equal(np.asarray(i2), np.asarray(im))
            _, il = searcher.search_loop(
                queries, k=5, nprobe=1, reps=2, mode="scan"
            )
            np.testing.assert_array_equal(np.asarray(il), np.asarray(ie))
    finally:
        searcher.scan_overfetch = 0


def test_xbin_mode_matches_exact(setup):
    """mode="xbin" (XLA binned-min scan): at this fixture size the whole
    array is one tile group (nt=1), so selection is collision-free and must
    equal the exact scan; nprobe is ignored."""
    x, _, searcher, queries = setup
    assert searcher.can_xbin(5)
    de, ie = searcher.exact(queries, k=5)
    d1, i1 = searcher.search(queries, k=5, nprobe=1, mode="xbin")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(ie))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(de), rtol=1e-5)
    dl, il = searcher.search_loop(queries, k=5, nprobe=1, reps=2, mode="xbin")
    np.testing.assert_array_equal(np.asarray(il), np.asarray(ie))
    dl, il = searcher.exact_loop(queries, k=5, reps=2, mode="xbin")
    np.testing.assert_array_equal(np.asarray(il), np.asarray(ie))


def test_xbin_multi_tile_provenance(setup):
    """Small l_bins forces nt > 1: packed keys must decode to the right
    rows (exact distances, ascending, subset of the array) with only bin
    collisions as selection loss."""
    from pqvector_tpu.query.device import _exact_xbin_impl

    x, _, searcher, queries = setup
    n_pad = int(searcher.emb.shape[0])
    assert n_pad % 128 == 0 and n_pad // 128 > 1
    d2, ids = _exact_xbin_impl(
        jnp_q := searcher._check_queries(queries), searcher.emb,
        searcher.emb_sq, k=5, l_bins=128,
    )
    d2, ids = np.asarray(d2), np.asarray(ids)
    hits = 0
    for b, q in enumerate(queries):
        want_ids, want_d = brute_force(x, q, 5)
        got = ids[b][ids[b] >= 0]
        assert len(set(got.tolist())) == len(got)  # distinct rows
        # Exact re-scored distances for whatever was selected, ascending.
        true_d = ((x[got] - q[None, :]) ** 2).sum(1)
        np.testing.assert_allclose(d2[b][: len(got)], true_d, rtol=1e-4)
        assert np.all(np.diff(d2[b]) >= -1e-5)
        hits += len(set(got.tolist()) & set(want_ids.tolist()))
    # 128 bins x nt=4: collisions among the top-5 are rare but possible.
    assert hits >= 0.8 * queries.shape[0] * 5


def test_xbin_chunked_matches_unchunked(setup):
    """chunk_groups folds the same keys through a lax.scan accumulator:
    bit-identical selection to the one-fusion form for any divisor, and
    non-divisor requests clamp to the largest divisor of nt."""
    from pqvector_tpu.query.device import _exact_xbin_impl

    x, _, searcher, queries = setup
    q = searcher._check_queries(queries)
    ref_d, ref_i = _exact_xbin_impl(
        q, searcher.emb, searcher.emb_sq, k=5, l_bins=128
    )
    nt = int(searcher.emb.shape[0]) // 128
    assert nt > 1
    for g in (1, 2, nt - 1, nt):
        d2, ids = _exact_xbin_impl(
            q, searcher.emb, searcher.emb_sq, k=5, l_bins=128,
            chunk_groups=g,
        )
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_i))
        np.testing.assert_allclose(
            np.asarray(d2), np.asarray(ref_d), rtol=1e-6
        )
    # Through the serving knob: same ids as the unchunked searcher mode.
    _, i0 = searcher.search(queries, k=5, nprobe=1, mode="xbin")
    searcher.xbin_chunk_groups = 2
    try:
        _, i1 = searcher.search(queries, k=5, nprobe=1, mode="xbin")
        _, il = searcher.exact_loop(queries, k=5, reps=2, mode="xbin")
    finally:
        searcher.xbin_chunk_groups = 0
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_array_equal(np.asarray(il), np.asarray(i0))


def test_compact_select_rolled_matches_gather():
    """A cluster spanning > 16 tiles routes tile-popularity into the rolled
    fori_loop (unrolled scatter-max per step would scale HLO size with the
    span on skewed indexes); selection must equal the gather formulation."""
    import jax.numpy as jnp

    from pqvector_tpu.query.device import _compact_select

    rng = np.random.default_rng(0)
    kc, d, ctile = 4, 8, 16
    spans = [20, 2, 1, 1]  # cluster 0 spans 20 tiles -> rolled branch
    nt = sum(spans)
    n_pad = nt * ctile
    tile_lo = jnp.asarray(np.cumsum([0] + spans[:-1]), jnp.int32)
    tile_hi = jnp.asarray(np.cumsum(spans), jnp.int32) - 1
    row_cluster = jnp.asarray(
        np.repeat(np.arange(kc), np.array(spans) * ctile), jnp.int32
    )
    centroids = jnp.asarray(rng.standard_normal((kc, d)), jnp.float32)
    c_sq = jnp.sum(centroids * centroids, axis=1)
    q = jnp.asarray(rng.standard_normal((3, d)), jnp.float32)
    args = (q, centroids, c_sq, row_cluster, jnp.int32(2), 4, ctile, nt)
    sel_rolled = _compact_select(*args, tile_lo, tile_hi, max(spans), n_pad)
    sel_gather = _compact_select(*args, None, None, 0, n_pad)
    np.testing.assert_array_equal(
        np.asarray(sel_rolled), np.asarray(sel_gather)
    )


def test_xbin_provenance_cap():
    """xbin tile codes share binscan's provenance-bit budget: a bin count
    whose code bits exceed PROVENANCE_BITS_MAX eats too many value mantissa
    bits for reliable selection — auto skips it, explicit raises."""
    from types import SimpleNamespace

    from pqvector_tpu.errors import ValidationError
    from pqvector_tpu.kernels.binscan import PROVENANCE_BITS_MAX
    from pqvector_tpu.query.device import (
        DeviceIvfSearcher, _xbin_bins, _xbin_code_bits,
    )

    n_pad = 128 * (1 << 17)  # 16.8M rows: 128 bins would need 17 code bits
    assert _xbin_code_bits(n_pad, 128) == 17 > PROVENANCE_BITS_MAX
    lb = _xbin_bins(n_pad, 10)
    assert lb > 0 and _xbin_code_bits(n_pad, lb) <= PROVENANCE_BITS_MAX
    fake = SimpleNamespace(emb=np.empty((n_pad, 0)), xbin_bins=128)
    with pytest.raises(ValidationError, match="provenance bits"):
        DeviceIvfSearcher._xbin_bins_checked(fake, 10)


def test_xbin_auto_chunk_policy(setup, monkeypatch):
    """xbin_chunk_groups=0 is an auto policy: unchunked within the fuse
    budget, bounded lax.scan steps beyond it (the unchunked epilogue is a
    16 GB OOM risk at B=4096 x 1M if XLA declines the strided-reshape
    fusion); -1 forces the one-call form; results are identical either
    way."""
    from pqvector_tpu.query import device as dev

    # Pure policy math.
    assert dev._xbin_auto_chunk(4096, 1_003_520, 62720, 7) == 7  # explicit
    assert dev._xbin_auto_chunk(4096, 1_003_520, 62720, -1) == 0  # forced
    assert dev._xbin_auto_chunk(256, 1_003_520, 62720, 0) == 0  # in budget
    g = dev._xbin_auto_chunk(4096, 1_003_520, 62720, 0)  # 16 GB unfused
    assert g >= 1 and 4096 * g * 62720 * 4 <= dev._XBIN_FUSE_BUDGET

    # Behavioral: shrink the budget so the fixture trips the auto chunk;
    # selection must stay bit-identical to the forced-unchunked form.
    x, _, searcher, queries = setup
    _, i_fused = searcher.search(queries, k=5, nprobe=1, mode="xbin")
    monkeypatch.setattr(dev, "_XBIN_FUSE_BUDGET", 1024)
    searcher.xbin_chunk_groups = -1
    try:
        _, i_forced = searcher.search(queries, k=5, nprobe=1, mode="xbin")
        searcher.xbin_chunk_groups = 0
        _, i_auto = searcher.search(queries, k=5, nprobe=1, mode="xbin")
        _, i_loop = searcher.search_loop(
            queries, k=5, nprobe=1, reps=2, mode="xbin"
        )
    finally:
        searcher.xbin_chunk_groups = 0
    np.testing.assert_array_equal(np.asarray(i_forced), np.asarray(i_fused))
    np.testing.assert_array_equal(np.asarray(i_auto), np.asarray(i_fused))
    np.testing.assert_array_equal(np.asarray(i_loop), np.asarray(i_fused))


def test_exact_loop_approx_mode(setup):
    x, _, searcher, queries = setup
    de, ie = searcher.exact(queries, k=5)
    dl, il = searcher.exact_loop(queries, k=5, reps=2, mode="approx")
    np.testing.assert_array_equal(np.asarray(il), np.asarray(ie))


def test_approx_bf16_scores_close(setup):
    """bfloat16 approx scores: selection may differ in near-ties, but the
    returned (re-scored) distances stay within bf16 selection tolerance."""
    import jax.numpy as jnp

    x, _, searcher, queries = setup
    searcher.approx_score_dtype = jnp.bfloat16
    try:
        d2, ids = searcher.search(queries, k=5, nprobe=3, mode="scan")
        for b, q in enumerate(queries):
            want_ids, want_d = brute_force(x, q, 5)
            got_d = np.asarray(d2[b])
            # Each returned distance within 1% of the true kth-range value.
            assert np.all(got_d <= want_d * 1.01 + 1e-3)
    finally:
        searcher.approx_score_dtype = jnp.float32


def test_masked_loop_mode_matches_single(setup):
    """search_loop(mode='masked') — the any-k XLA path used for k > 32."""
    x, index, _, queries = setup
    s = DeviceIvfSearcher(index, x, row_tile=128, cluster_sorted=True)
    d1, i1 = s.search(queries, k=40, nprobe=3, mode="masked")
    dl, il = s.search_loop(queries, k=40, nprobe=3, reps=2, mode="masked")
    np.testing.assert_array_equal(np.asarray(il), np.asarray(i1))
    # auto routes large k to the XLA merge (Mosaic stack blows up at k>32)
    da, ia = s.search_loop(queries, k=40, nprobe=3, reps=2, mode="auto")
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(i1))


def test_pallas_tile_respects_dim_and_k(setup):
    """Tile sizing must honor all three Mosaic scoped-vmem constraints
    (score stack, dimension-scaled emb block, k-scaled pass stack)."""
    x, index, searcher, _ = setup
    # Baseline: d=16 tiny, k small -> tile = row_tile.
    assert searcher._pallas_tile(4096, 256) == 4096
    # d=1024 f32 emb block cap: tile * 1024 * 4 <= 2 MB -> tile <= 512
    # (checked on a shell searcher so no 1024-d matrix is materialized).
    fake = DeviceIvfSearcher.__new__(DeviceIvfSearcher)
    fake.dim = 1024
    fake.emb = searcher.emb
    assert DeviceIvfSearcher._pallas_tile(fake, 4096, 256) <= 512
    # k=100 shrinks the budget ~16/k.
    t10 = searcher._pallas_tile(4096, 256, k=10)
    t100 = searcher._pallas_tile(4096, 256, k=100)
    assert t100 < t10


def test_compact_mode_full_probe_matches_exact(setup):
    """mode='compact' with nprobe = all clusters: every tile is active, so
    the compacted scan covers the whole array and (on CPU, where approx
    extraction is exact) must reproduce the brute-force top-k."""
    x, index, searcher, queries = setup
    dists, ids = searcher.search(
        queries, k=5, nprobe=index.n_clusters, mode="compact"
    )
    for b, q in enumerate(queries):
        want_ids, want_d = brute_force(x, q, 5)
        np.testing.assert_array_equal(np.asarray(ids[b]), want_ids)
        np.testing.assert_allclose(
            np.asarray(dists[b]), want_d, rtol=1e-4, atol=1e-4
        )


def test_compact_mode_recall_superset_of_masked(setup):
    """Compact serves the UNION of the batch's probed clusters — a superset
    of each query's own probe set — so with exact extraction (CPU) its
    recall can never be below the masked IVF scan's at the same nprobe."""
    x, index, searcher, queries = setup
    k, nprobe = 5, 2
    d_c, i_c = searcher.search(queries, k=k, nprobe=nprobe, mode="compact")
    d_m, i_m = searcher.search(queries, k=k, nprobe=nprobe, mode="masked")
    i_c, i_m = np.asarray(i_c), np.asarray(i_m)
    for b, q in enumerate(queries):
        want_ids, _ = brute_force(x, q, k)
        hits_c = len(set(want_ids) & set(i_c[b][i_c[b] >= 0]))
        hits_m = len(set(want_ids) & set(i_m[b][i_m[b] >= 0]))
        assert hits_c >= hits_m


def test_compact_mode_cluster_sorted_layout(setup):
    """Same checks on the cluster-sorted resident layout (gid remapping)."""
    x, index, _, queries = setup
    searcher = DeviceIvfSearcher(index, x, row_tile=128, cluster_sorted=True)
    dists, ids = searcher.search(
        queries, k=5, nprobe=index.n_clusters, mode="compact"
    )
    for b, q in enumerate(queries):
        want_ids, want_d = brute_force(x, q, 5)
        np.testing.assert_array_equal(np.asarray(ids[b]), want_ids)


def test_compact_loop_matches_single(setup):
    x, index, searcher, queries = setup
    d1, i1 = searcher.search(queries, k=4, nprobe=3, mode="compact")
    dl, il = searcher.search_loop(queries, k=4, nprobe=3, reps=2, mode="compact")
    np.testing.assert_array_equal(np.asarray(il), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(dl), np.asarray(d1), rtol=1e-5)


def test_xbin8_mode_recall_and_exact_distances(setup):
    """mode="xbin8" (int8 quantized xbin): selection may differ from the
    exact scan by quantization races, but returned distances are EXACT
    (winners re-scored against the full-precision rows), ascending, and
    recall stays high under the default 4k over-fetch."""
    x, _, searcher, queries = setup
    assert searcher.can_xbin(5)
    de, ie = searcher.exact(queries, k=5)
    d8, i8 = searcher.search(queries, k=5, nprobe=1, mode="xbin8")
    i8 = np.asarray(i8)
    d8 = np.asarray(d8)
    hits = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(i8, np.asarray(ie))
    )
    assert hits / ie.size >= 0.9
    # distances exact for whatever ids were returned
    for b in range(len(queries)):
        want = np.sqrt(((x[i8[b]] - queries[b]) ** 2).sum(1))
        np.testing.assert_allclose(d8[b], want, rtol=1e-4, atol=1e-4)
        assert np.all(np.diff(d8[b]) >= -1e-6)
    # loops route through the dedicated chained dispatch
    dl, il = searcher.search_loop(queries, k=5, nprobe=1, reps=2, mode="xbin8")
    np.testing.assert_array_equal(np.asarray(il), i8)
    dl, il = searcher.exact_loop(queries, k=5, reps=2, mode="xbin8")
    np.testing.assert_array_equal(np.asarray(il), i8)


def test_xbin8_quantization_unit():
    """Per-row symmetric int8 codes reconstruct within 1/254 relative
    error per component; zero (pad) rows stay zero with scale 1."""
    from pqvector_tpu.query.device import _quantize_rows_i8
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    x = np.vstack([
        rng.standard_normal((20, 8)).astype(np.float32) * 10.0,
        np.zeros((4, 8), np.float32),
    ])
    qi, s = _quantize_rows_i8(jnp.asarray(x))
    qi, s = np.asarray(qi), np.asarray(s)
    recon = qi.astype(np.float32) * s[:, None]
    amax = np.abs(x).max(axis=1, keepdims=True)
    np.testing.assert_allclose(recon, x, atol=float(amax.max()) / 253)
    assert np.all(qi[20:] == 0) and np.all(s[20:] == 1.0)
    assert np.abs(qi).max() <= 127


def test_xbin8_chunked_matches_unchunked(setup):
    x, _, searcher, queries = setup
    d0, i0 = searcher.search(queries, k=5, nprobe=1, mode="xbin8")
    searcher.xbin_chunk_groups = 1
    try:
        d1, i1 = searcher.search(queries, k=5, nprobe=1, mode="xbin8")
    finally:
        searcher.xbin_chunk_groups = 0
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-6)


def test_loop_apis_reject_unknown_modes(setup):
    """search_loop/exact_loop must raise on modes they cannot serve instead
    of silently running a different kernel (the autotune/gather lesson)."""
    _, _, searcher, queries = setup
    with pytest.raises(ValidationError, match="search_loop mode"):
        searcher.search_loop(queries, k=4, nprobe=2, reps=2, mode="gather")
    with pytest.raises(ValidationError, match="search_loop mode"):
        searcher.search_loop(queries, k=4, nprobe=2, reps=2, mode="bogus")
    with pytest.raises(ValidationError, match="exact_loop mode"):
        searcher.exact_loop(queries, k=4, reps=2, mode="bogus")


def test_exact_loop_xla_mode_runs_xla_merge(setup):
    """mode="xla" in exact_loop routes to the XLA merge (was silently
    running the Pallas kernel) and still matches ground truth."""
    x, _, searcher, queries = setup
    _, ie = searcher.exact(queries, k=4, mode="xla")
    _, il = searcher.exact_loop(queries, k=4, reps=2, mode="xla")
    np.testing.assert_array_equal(np.asarray(il), np.asarray(ie))


def test_approx_scan_single_call_matches_chunked(setup):
    """The whole-array single-call branch of _approx_scan (round-4 fast
    path: no lax.scan scaffold, no redundant width-k merge) must select
    the same winners as the chunked form."""
    from pqvector_tpu.query.device import _exact_approx_topk_impl

    x, _, searcher, queries = setup
    import jax.numpy as jnp

    n_pad = int(searcher.emb.shape[0])
    kw = dict(k=5, recall_target=0.99, score_dtype=jnp.float32, overfetch=8)
    d1, i1 = _exact_approx_topk_impl(
        jnp.asarray(queries), searcher.emb, searcher.emb_sq,
        chunk=n_pad, **kw,
    )
    d2, i2 = _exact_approx_topk_impl(
        jnp.asarray(queries), searcher.emb, searcher.emb_sq,
        chunk=n_pad // 2, **kw,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)
