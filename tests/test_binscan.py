"""Fused binned-min scan kernel (kernels/binscan.py) — interpret mode on CPU."""

import jax
import numpy as np
import pytest

from pqvector_tpu.kernels.binscan import pallas_binned_scan

INTERPRET = jax.default_backend() != "tpu"


def _pad(emb: np.ndarray, tile: int):
    n, d = emb.shape
    n_pad = -(-(n + 1) // tile) * tile
    e = np.zeros((n_pad, d), np.float32)
    e[:n] = emb
    sq = np.full(n_pad, 3.0e38, np.float32)
    sq[:n] = np.einsum("nd,nd->n", emb, emb)
    return e, sq


def _true_topk(q, emb, k):
    d2 = ((q[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    ids = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d2, ids, axis=1), ids


def test_binscan_recall_and_exact_distances():
    rng = np.random.default_rng(0)
    n, d, b, k = 5000, 128, 64, 10
    emb = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    e, sq = _pad(emb, 1024)
    d2, ids = pallas_binned_scan(q, e, sq, k, interpret=INTERPRET)
    d2, ids = np.asarray(d2), np.asarray(ids)
    td2, tids = _true_topk(q, emb, k)
    hits = sum(
        len(set(a.tolist()) & set(bb.tolist())) for a, bb in zip(ids, tids)
    )
    assert hits / (b * k) >= 0.97  # only cross-tile bin collisions miss
    # Returned distances are exact for the returned ids (f32 re-score).
    want = ((q[:, None, :] - emb[ids]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, want, rtol=1e-5, atol=1e-4)
    assert np.all(np.diff(d2, axis=1) >= -1e-6)  # ascending


def test_binscan_provenance_decode_planted_duplicates():
    # Queries that exactly equal stored rows must decode back to those rows:
    # exercises every provenance field (tg, g3, slab rotation, lane).
    rng = np.random.default_rng(1)
    n, d = 4000, 128
    emb = 10.0 * rng.standard_normal((n, d)).astype(np.float32)
    rows = np.arange(7, n, 29)[:128]
    q = emb[rows].copy()
    e, sq = _pad(emb, 1024)
    d2, ids = pallas_binned_scan(q, e, sq, 1, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], rows)
    assert np.all(np.asarray(d2)[:, 0] < 1e-3)


def test_binscan_large_norm_queries():
    # Regression: |x|^2 - 2*q.x goes NEGATIVE when candidates are closer
    # than the query norm, and negative f32 bits compare reversed as ints —
    # the kernel must score true squared distances (|q|^2 added back).
    rng = np.random.default_rng(7)
    n, d, b, k = 3000, 32, 32, 5
    emb = rng.standard_normal((n, d)).astype(np.float32)
    # Queries near stored rows but with a dominating norm offset.
    rows = rng.integers(0, n, b)
    q = (emb[rows] + 0.05 * rng.standard_normal((b, d))).astype(np.float32)
    e, sq = _pad(emb, 1024)
    d2, ids = pallas_binned_scan(q, e, sq, k, interpret=INTERPRET)
    ids = np.asarray(ids)
    _, tids = _true_topk(q, emb, k)
    hits = sum(
        len(set(a.tolist()) & set(bb.tolist())) for a, bb in zip(ids, tids)
    )
    assert hits / (b * k) >= 0.97
    assert np.all(ids[:, 0] == rows)  # the perturbed source row is top-1


def test_binscan_batch_padding_and_small_tile():
    rng = np.random.default_rng(2)
    n, d, b, k = 2000, 64, 100, 5  # b not a multiple of the query tile
    emb = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    e, sq = _pad(emb, 512)
    d2, ids = pallas_binned_scan(q, e, sq, k, tile=512, interpret=INTERPRET)
    assert d2.shape == (b, k) and ids.shape == (b, k)
    td2, tids = _true_topk(q, emb, k)
    hits = sum(
        len(set(a.tolist()) & set(bb.tolist()))
        for a, bb in zip(np.asarray(ids), tids)
    )
    assert hits / (b * k) >= 0.95


def test_binscan_expand_provenance_and_recall():
    # expand=2 spreads rows over 2*tile bins (tg%expand picks the slab
    # block); provenance decode must ignore the block index and planted
    # queries must still come back exactly. Recall should be >= expand=1
    # (collision rate roughly halves).
    rng = np.random.default_rng(11)
    n, d, b, k, tile = 6000, 64, 48, 10, 512
    emb = rng.standard_normal((n, d)).astype(np.float32)
    e, sq = _pad(emb, tile)
    rows = np.arange(3, n, 47)[:48]
    q = emb[rows].copy()
    d2, ids = pallas_binned_scan(
        q, e, sq, 1, tile=tile, expand=2, interpret=INTERPRET
    )
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], rows)
    assert np.all(np.asarray(d2)[:, 0] < 1e-3)
    q2 = rng.standard_normal((b, d)).astype(np.float32)
    _, tids = _true_topk(q2, emb, k)
    res = {}
    for ex in (1, 2):
        _, ids = pallas_binned_scan(
            q2, e, sq, k, tile=tile, expand=ex, interpret=INTERPRET
        )
        ids = np.asarray(ids)
        res[ex] = sum(
            len(set(a.tolist()) & set(bb.tolist()))
            for a, bb in zip(ids, tids)
        ) / (b * k)
    assert res[2] >= 0.95 and res[2] >= res[1] - 0.02


def test_binscan_expand_needs_enough_tiles():
    rng = np.random.default_rng(12)
    emb = rng.standard_normal((1500, 16)).astype(np.float32)
    e, sq = _pad(emb, 512)  # nt=4 < expand*n_lg=8
    with pytest.raises(ValueError, match="expand"):
        pallas_binned_scan(
            np.zeros((4, 16), np.float32), e, sq, 4, tile=512, expand=2,
            interpret=INTERPRET,
        )


def test_binscan_k_exceeding_bins_rejected():
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((100, 8)).astype(np.float32)
    e, sq = _pad(emb, 512)
    with pytest.raises(ValueError, match="bins"):
        pallas_binned_scan(
            np.zeros((4, 8), np.float32), e, sq, 600, tile=512,
            interpret=INTERPRET,
        )


def test_binscan_searcher_modes():
    from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index
    from pqvector_tpu.query.device import DeviceIvfSearcher

    rng = np.random.default_rng(4)
    n, d, b, k = 3000, 32, 16, 5
    emb = rng.standard_normal((n, d)).astype(np.float32)
    index = build_ivf_index(Embeddings(emb, d), IvfBuildConfig(n_clusters=8, seed=0))
    s = DeviceIvfSearcher(index, emb, row_tile=128, cluster_sorted=True)
    assert s.can_binscan(k)
    q = rng.standard_normal((b, d)).astype(np.float32)
    dist, ids = s.exact(q, k, mode="binscan")
    dist, ids = np.asarray(dist), np.asarray(ids)
    _, want_ids = _true_topk(q, emb, k)
    hits = sum(
        len(set(a.tolist()) & set(bb.tolist())) for a, bb in zip(ids, want_ids)
    )
    assert hits / (b * k) >= 0.95
    # exact() returns sqrt distances in ORIGINAL row ids (cluster_sorted
    # searchers map back); verify against direct recomputation.
    want = np.sqrt(((q[:, None, :] - emb[ids]) ** 2).sum(-1))
    np.testing.assert_allclose(dist, want, rtol=1e-4, atol=1e-4)
    # Loop forms compile and agree with the single-dispatch form.
    ld, li = s.search_loop(q, k, nprobe=4, reps=2, mode="binscan")
    np.testing.assert_allclose(np.asarray(ld), dist, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(li), ids)
    ed, ei = s.exact_loop(q, k, reps=2, mode="binscan")
    np.testing.assert_allclose(np.asarray(ed), dist, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ei), ids)


def test_binned_scan_select_matches_subset_truth():
    # Selecting a tile subset must return exactly the best rows WITHIN the
    # selected tiles, with global ids.
    from pqvector_tpu.kernels.binscan import pallas_binned_scan_select

    rng = np.random.default_rng(5)
    n, d, b, k, tile = 6000, 64, 24, 5, 512
    emb = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    e, sq = _pad(emb, tile)
    nt = e.shape[0] // tile
    sel = np.array([9, 2, 5, 0, 11], np.int32)  # arbitrary order
    d2, ids = pallas_binned_scan_select(
        q, e, sq, sel, k, tile=tile, interpret=INTERPRET
    )
    d2, ids = np.asarray(d2), np.asarray(ids)
    rows = np.concatenate([np.arange(t * tile, (t + 1) * tile) for t in sel])
    rows = rows[rows < n]
    sub = emb[rows]
    td2 = ((q[:, None, :] - sub[None, :, :]) ** 2).sum(-1)
    tloc = np.argsort(td2, axis=1)[:, :k]
    tids = rows[tloc]
    hits = sum(
        len(set(a.tolist()) & set(bb.tolist())) for a, bb in zip(ids, tids)
    )
    assert hits / (b * k) >= 0.95
    # All returned ids must come from selected tiles.
    assert set(np.unique(ids)).issubset(set(rows.tolist()))
    want = ((q[:, None, :] - emb[ids]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, want, rtol=1e-5, atol=1e-4)


def test_binscan_select_expand_subset_and_provenance():
    # expand=2 on the SELECT path: ids must stay within the selected
    # tiles and planted rows decode exactly (block index is redundant
    # with tg%expand — _merge_bins must drop it).
    from pqvector_tpu.kernels.binscan import pallas_binned_scan_select

    rng = np.random.default_rng(13)
    n, d, k, tile = 9000, 32, 5, 512
    emb = rng.standard_normal((n, d)).astype(np.float32)
    e, sq = _pad(emb, tile)
    sel = np.array([0, 3, 7, 11, 2, 5, 9, 13, 1], np.int32)  # cap=9 >= 2*4
    rows = np.concatenate(
        [np.arange(t * tile, (t + 1) * tile) for t in sel]
    )
    rows = rows[rows < n]
    planted = rows[::97][:24]
    q = emb[planted].copy()
    d2, ids = pallas_binned_scan_select(
        q, e, sq, sel, k, tile=tile, expand=2, interpret=INTERPRET
    )
    ids = np.asarray(ids)
    np.testing.assert_array_equal(ids[:, 0], planted)
    assert set(np.unique(ids)).issubset(set(rows.tolist()))
    with pytest.raises(ValueError, match="expand"):
        pallas_binned_scan_select(
            q, e, sq, sel[:4], k, tile=tile, expand=2, interpret=INTERPRET
        )


def test_bincompact_mode_recall_and_probe_semantics():
    from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index
    from pqvector_tpu.query.device import DeviceIvfSearcher

    rng = np.random.default_rng(6)
    n, d, b, k = 4000, 32, 32, 5
    modes_c = rng.uniform(-1, 1, (16, d)).astype(np.float32)
    emb = (modes_c[rng.integers(0, 16, n)]
           + 0.1 * rng.standard_normal((n, d))).astype(np.float32)
    index = build_ivf_index(
        Embeddings(emb, d), IvfBuildConfig(n_clusters=16, seed=0)
    )
    s = DeviceIvfSearcher(index, emb, row_tile=512, cluster_sorted=True)
    ctile, cap = s._compact_bin_params(b, 4, k)
    assert ctile > 0
    qrows = rng.integers(0, n, b)
    q = (emb[qrows] + 0.03 * rng.standard_normal((b, d))).astype(np.float32)
    dist, ids = s.search(q, k, nprobe=4, mode="bincompact")
    dist, ids = np.asarray(dist), np.asarray(ids)
    # Compare against the established compact mode (same candidate
    # semantics: the batch's probed-tile union).
    dc, ic = s.search(q, k, nprobe=4, mode="compact")
    ic = np.asarray(ic)
    hits = sum(
        len(set(a.tolist()) & set(bb.tolist())) for a, bb in zip(ids, ic)
    )
    assert hits / (b * k) >= 0.9
    assert float((ids[:, 0] == qrows).mean()) >= 0.9
    # Loop form agrees.
    ld, li = s.search_loop(q, k, nprobe=4, reps=2, mode="bincompact")
    np.testing.assert_array_equal(np.asarray(li), ids)


def test_binscan_provenance_bit_budget_guard():
    # 20M rows at tile=1024 would need >13 provenance bits.
    import jax.numpy as jnp

    e = jnp.zeros((20 * 1024 * 1024, 8), jnp.bfloat16)
    sq = jnp.zeros((20 * 1024 * 1024,), jnp.float32)
    with pytest.raises(ValueError, match="precision"):
        pallas_binned_scan(
            np.zeros((4, 8), np.float32), e, sq, 4, interpret=INTERPRET
        )


def test_binscan_large_k():
    # k=100 exceeds the stream kernel's scoped-vmem budget (routed to the
    # XLA merge) and collapses ApproxTopK recall on sorted layouts; binscan
    # holds tile=1024 bins, so large k stays on the fused path.
    rng = np.random.default_rng(8)
    n, d, b, k = 8000, 32, 16, 100
    emb = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    e, sq = _pad(emb, 1024)
    d2, ids = pallas_binned_scan(q, e, sq, k, interpret=INTERPRET)
    ids = np.asarray(ids)
    _, tids = _true_topk(q, emb, k)
    hits = sum(
        len(set(a.tolist()) & set(bb.tolist())) for a, bb in zip(ids, tids)
    )
    assert hits / (b * k) >= 0.9
    assert np.all(np.diff(np.asarray(d2), axis=1) >= -1e-6)


def test_calibrate_bincompact_measured_cap():
    from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index
    from pqvector_tpu.query.device import DeviceIvfSearcher

    rng = np.random.default_rng(10)
    n, d, b, k = 24000, 16, 8, 5
    centers = rng.uniform(-6, 6, (24, d)).astype(np.float32)
    emb = (centers[rng.integers(0, 24, n)]
           + 0.1 * rng.standard_normal((n, d))).astype(np.float32)
    index = build_ivf_index(
        Embeddings(emb, d), IvfBuildConfig(n_clusters=24, seed=0)
    )
    s = DeviceIvfSearcher(index, emb, row_tile=512, cluster_sorted=True)
    # Concentrate the batch near ONE mode so the probed union is a strict
    # subset of tiles (the point of calibration).
    q = (centers[0][None, :]
         + 0.05 * rng.standard_normal((b, d))).astype(np.float32)
    ctile, cap = s.calibrate_bincompact(q, nprobe=2, k=k, bucket=1)
    assert ctile > 0
    nt = int(s.emb.shape[0]) // ctile
    # One-mode batch probes a handful of clusters -> strict tile subset.
    assert 1 <= cap < nt
    # The calibrated params drive the mode and results match compact.
    assert s._compact_bin_params(b, 2, k) == (ctile, cap)
    _, ids = s.search(q, k, nprobe=2, mode="bincompact")
    _, ic = s.search(q, k, nprobe=2, mode="compact")
    ids, ic = np.asarray(ids), np.asarray(ic)
    hits = sum(
        len(set(a.tolist()) & set(bb.tolist())) for a, bb in zip(ids, ic)
    )
    assert hits / (b * k) >= 0.9
    # Clearing the calibration restores the formula path.
    s._bincompact_calibrated = None
    assert s._compact_bin_params(b, 2, k) != (0, 0)


def test_binscan_b_tile_vmem_model():
    """Regression: the bin-accumulator out block is double-buffered by
    Mosaic (measured on-chip OOM: expand=2, tile=2048, d=128 bf16 at
    bt=512 allocates 17.02M > the 16M scoped-vmem limit), so expand=2
    must drop the query block to 256 and large-dim f32 tiles must shrink
    further."""
    from pqvector_tpu.kernels.binscan import binscan_b_tile

    assert binscan_b_tile(2048, 128, 2, expand=1) == 512
    assert binscan_b_tile(2048, 128, 2, expand=2) == 256
    assert binscan_b_tile(2048, 128, 2, expand=4) == 128
    # d=1024 f32: tile=2048 emb block alone (16.8M) exceeds the budget.
    assert binscan_b_tile(2048, 1024, 4) == 0
    assert binscan_b_tile(1024, 1024, 4) == 256


def test_binscan_expand_respects_vmem():
    """The searcher only picks an expansion whose accumulator still fits
    with a >=256 query block (on-chip B=4096 compile failed before this
    guard accounted for Mosaic's output double-buffering)."""
    from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index
    from pqvector_tpu.query.device import DeviceIvfSearcher

    rng = np.random.default_rng(11)
    n, d = 1 << 16, 128
    emb = rng.standard_normal((n, d)).astype(np.float32)
    index = build_ivf_index(
        Embeddings(emb, d), IvfBuildConfig(n_clusters=16, seed=0)
    )
    s = DeviceIvfSearcher(index, emb, row_tile=2048, cluster_sorted=True)
    t = s._binscan_tile()
    e = s._binscan_expand(t)
    from pqvector_tpu.kernels.binscan import binscan_b_tile

    assert binscan_b_tile(t, d, 4, expand=e) >= 256


def test_calibration_scoped_to_operating_point():
    """A calibrated bincompact cap only applies at or below the measured
    (nprobe, batch): larger probe sets must fall back to the formula (the
    stale cap would silently drop probed tiles)."""
    import numpy as np

    from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index
    from pqvector_tpu.query.device import DeviceIvfSearcher

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4096, 16)).astype(np.float32)
    index = build_ivf_index(
        Embeddings(x, 16), IvfBuildConfig(n_clusters=16, seed=0)
    )
    s = DeviceIvfSearcher(index, x, cluster_sorted=True, row_tile=512)
    q = x[:8] + 0.01
    ct, cap = s.calibrate_bincompact(q, nprobe=2, k=4)
    assert ct > 0
    assert s._compact_bin_params(8, 2, 4) == (ct, cap)
    # larger nprobe or batch -> formula, not the stale cap
    assert s._compact_bin_params(8, 16, 4) != (ct, cap) or (
        s._compact_bin_params(8, 16, 4)[1] >= cap
    )
    big = s._compact_bin_params(4096, 16, 4)
    assert big[1] >= cap or big == (0, 0)


def _quantize_rows(emb_pad):
    from pqvector_tpu.query.device import _quantize_rows_i8

    e8, sc = _quantize_rows_i8(emb_pad)
    return np.asarray(e8), np.asarray(sc)


def test_binscan8_recall_and_exact_distances():
    # Int8-code path: selection on the quantized cross term (int8 MXU),
    # returned distances exact (re-scored against the f32 rows).
    rng = np.random.default_rng(20)
    n, d, b, k = 5000, 128, 64, 10
    emb = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    e, sq = _pad(emb, 1024)
    e8, sc = _quantize_rows(e)
    d2, ids = pallas_binned_scan(
        q, e8, sq, k, interpret=INTERPRET, scale=sc, emb_ref=e
    )
    d2, ids = np.asarray(d2), np.asarray(ids)
    _, tids = _true_topk(q, emb, k)
    hits = sum(
        len(set(a.tolist()) & set(bb.tolist())) for a, bb in zip(ids, tids)
    )
    assert hits / (b * k) >= 0.9  # bin collisions + ~1% quantization
    want = ((q[:, None, :] - emb[ids]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, want, rtol=1e-5, atol=1e-4)
    assert np.all(np.diff(d2, axis=1) >= -1e-6)


def test_binscan8_planted_duplicates_with_rescore():
    # A query equal to a stored row has true distance 0; quantization can
    # perturb its bin key, but the widened fetch + exact re-score must
    # still surface it as top-1 on well-separated data.
    rng = np.random.default_rng(21)
    n, d = 4000, 64
    emb = 10.0 * rng.standard_normal((n, d)).astype(np.float32)
    rows = np.arange(7, n, 41)[:64]
    q = emb[rows].copy()
    e, sq = _pad(emb, 1024)
    e8, sc = _quantize_rows(e)
    d2, ids = pallas_binned_scan(
        q, e8, sq, 1, interpret=INTERPRET, scale=sc, emb_ref=e
    )
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], rows)
    assert np.all(np.asarray(d2)[:, 0] < 1e-3)


def test_binscan8_select_subset():
    from pqvector_tpu.kernels.binscan import pallas_binned_scan_select

    rng = np.random.default_rng(22)
    n, d, b, k, tile = 6000, 64, 24, 5, 512
    emb = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    e, sq = _pad(emb, tile)
    e8, sc = _quantize_rows(e)
    sel = np.array([9, 2, 5, 0, 11], np.int32)
    d2, ids = pallas_binned_scan_select(
        q, e8, sq, sel, k, tile=tile, interpret=INTERPRET,
        scale=sc, emb_ref=e,
    )
    d2, ids = np.asarray(d2), np.asarray(ids)
    rows = np.concatenate([np.arange(t * tile, (t + 1) * tile) for t in sel])
    rows = rows[rows < n]
    sub = emb[rows]
    td2 = ((q[:, None, :] - sub[None, :, :]) ** 2).sum(-1)
    tids = rows[np.argsort(td2, axis=1)[:, :k]]
    hits = sum(
        len(set(a.tolist()) & set(bb.tolist())) for a, bb in zip(ids, tids)
    )
    assert hits / (b * k) >= 0.9
    assert set(np.unique(ids)).issubset(set(rows.tolist()))
    want = ((q[:, None, :] - emb[ids]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, want, rtol=1e-5, atol=1e-4)


def test_binscan8_searcher_modes():
    # mode="binscan8"/"bincompact8" through the searcher: single dispatch
    # and loop forms, distances exact, ids mapped to original rows.
    from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index
    from pqvector_tpu.query.device import DeviceIvfSearcher

    rng = np.random.default_rng(23)
    n, d, b, k = 3000, 32, 16, 5
    emb = rng.standard_normal((n, d)).astype(np.float32)
    index = build_ivf_index(
        Embeddings(emb, d), IvfBuildConfig(n_clusters=8, seed=0)
    )
    s = DeviceIvfSearcher(index, emb, row_tile=128, cluster_sorted=True)
    assert s.can_binscan(k, esize=1)
    q = rng.standard_normal((b, d)).astype(np.float32)
    dist, ids = s.exact(q, k, mode="binscan8")
    dist, ids = np.asarray(dist), np.asarray(ids)
    _, want_ids = _true_topk(q, emb, k)
    hits = sum(
        len(set(a.tolist()) & set(bb.tolist()))
        for a, bb in zip(ids, want_ids)
    )
    assert hits / (b * k) >= 0.9
    want = np.sqrt(((q[:, None, :] - emb[ids]) ** 2).sum(-1))
    np.testing.assert_allclose(dist, want, rtol=1e-4, atol=1e-4)
    # Serving path (nprobe ignored) and both loop forms agree.
    sd, si = s.search(q, k, nprobe=4, mode="binscan8")
    np.testing.assert_array_equal(np.asarray(si), ids)
    ld, li = s.search_loop(q, k, nprobe=4, reps=2, mode="binscan8")
    np.testing.assert_array_equal(np.asarray(li), ids)
    ed, ei = s.exact_loop(q, k, reps=2, mode="binscan8")
    np.testing.assert_array_equal(np.asarray(ei), ids)


def test_bincompact8_mode_matches_bincompact():
    from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index
    from pqvector_tpu.query.device import DeviceIvfSearcher

    rng = np.random.default_rng(24)
    n, d, b, k = 4000, 32, 32, 5
    modes_c = rng.uniform(-1, 1, (16, d)).astype(np.float32)
    emb = (modes_c[rng.integers(0, 16, n)]
           + 0.1 * rng.standard_normal((n, d))).astype(np.float32)
    index = build_ivf_index(
        Embeddings(emb, d), IvfBuildConfig(n_clusters=16, seed=0)
    )
    s = DeviceIvfSearcher(index, emb, row_tile=512, cluster_sorted=True)
    assert s._compact_bin_params(b, 4, k, esize=1)[0] > 0
    qrows = rng.integers(0, n, b)
    q = (emb[qrows] + 0.03 * rng.standard_normal((b, d))).astype(np.float32)
    dist, ids = s.search(q, k, nprobe=4, mode="bincompact8")
    dist, ids = np.asarray(dist), np.asarray(ids)
    db, ib = s.search(q, k, nprobe=4, mode="bincompact")
    ib = np.asarray(ib)
    hits = sum(
        len(set(a.tolist()) & set(bb.tolist())) for a, bb in zip(ids, ib)
    )
    assert hits / (b * k) >= 0.85  # quantization on clustered data
    assert float((ids[:, 0] == qrows).mean()) >= 0.85
    # Distances exact for returned ids.
    want = np.sqrt(((q[:, None, :] - emb[ids]) ** 2).sum(-1))
    np.testing.assert_allclose(dist, want, rtol=1e-4, atol=1e-4)
    # Loop form agrees with the single dispatch.
    ld, li = s.search_loop(q, k, nprobe=4, reps=2, mode="bincompact8")
    np.testing.assert_array_equal(np.asarray(li), ids)
