"""mode="tilescan" — per-tile argmin full scan (query/device.py
_exact_tilescan_impl): packed-key provenance, chunked/unchunked parity,
eligibility rules, and the rescore-reference interplay. CPU backend."""

import numpy as np
import pytest

from pqvector_tpu import Embeddings, IvfBuildConfig, ValidationError, build_ivf_index
from pqvector_tpu.query.device import (
    DeviceIvfSearcher,
    _exact_tilescan_impl,
    _tilescan_auto_chunk,
)


def brute_force(x, q, k):
    d = ((x - q[None, :]) ** 2).sum(1)
    idx = np.argsort(d, kind="stable")[:k]
    return idx, np.sqrt(d[idx])


@pytest.fixture(scope="module")
def planted():
    """600 far-away rows plus 5 planted near-neighbors of each query at
    rows spread >16 apart, so tile<=16 selection is collision-free and
    tilescan must equal the exact scan."""
    rng = np.random.default_rng(5)
    x = 10.0 + rng.standard_normal((600, 24)).astype(np.float32)
    queries = rng.standard_normal((4, 24)).astype(np.float32)
    spots = np.array([17, 120, 260, 391, 555])
    for b, q in enumerate(queries):
        for j, r in enumerate(spots):
            x[r + b] = q + 1e-3 * (j + 1)  # distinct tiles (stride >= 16)
    index = build_ivf_index(
        Embeddings(x, 24), IvfBuildConfig(n_clusters=8, seed=0)
    )
    searcher = DeviceIvfSearcher(index, x, row_tile=128)
    searcher.tilescan_tile = 16
    return x, searcher, queries


def test_tilescan_matches_exact_when_collision_free(planted):
    x, searcher, queries = planted
    assert searcher.can_tilescan(5)
    de, ie = searcher.exact(queries, k=5)
    d1, i1 = searcher.search(queries, k=5, nprobe=1, mode="tilescan")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(ie))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(de), rtol=1e-5)
    _, il = searcher.search_loop(
        queries, k=5, nprobe=1, reps=2, mode="tilescan"
    )
    np.testing.assert_array_equal(np.asarray(il), np.asarray(ie))
    _, il = searcher.exact_loop(queries, k=5, reps=2, mode="tilescan")
    np.testing.assert_array_equal(np.asarray(il), np.asarray(ie))


def test_tilescan_provenance_and_ordering(planted):
    """Whatever tilescan selects must decode to real distinct rows with
    exact re-scored distances, ascending."""
    x, searcher, queries = planted
    q = searcher._check_queries(queries)
    d2, ids = _exact_tilescan_impl(
        q, searcher.emb, searcher.emb_sq, k=5, tile=64
    )
    d2, ids = np.asarray(d2), np.asarray(ids)
    for b, qq in enumerate(queries):
        got = ids[b][ids[b] >= 0]
        assert len(set(got.tolist())) == len(got)
        true_d = ((x[got] - qq[None, :]) ** 2).sum(1)
        np.testing.assert_allclose(d2[b][: len(got)], true_d, rtol=1e-4)
        assert np.all(np.diff(d2[b]) >= -1e-5)


def test_tilescan_chunked_matches_unchunked(planted):
    """chunk_rows stacks independent per-step tile tables: bit-identical
    selection to the one-fused-call form for any step size."""
    _, searcher, queries = planted
    q = searcher._check_queries(queries)
    n_pad = int(searcher.emb.shape[0])
    ref_d, ref_i = _exact_tilescan_impl(
        q, searcher.emb, searcher.emb_sq, k=5, tile=16, chunk_rows=-1
    )
    for rows in (16, 128, 256, n_pad // 2, n_pad):
        d2, ids = _exact_tilescan_impl(
            q, searcher.emb, searcher.emb_sq, k=5, tile=16, chunk_rows=rows
        )
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_i))
        np.testing.assert_allclose(
            np.asarray(d2), np.asarray(ref_d), rtol=1e-6
        )


def test_tilescan_auto_chunk_policy():
    # fused while the worst-case unfused block fits the budget
    assert _tilescan_auto_chunk(4, 1024, 128, 0) == 0
    assert _tilescan_auto_chunk(4, 1024, 128, -1) == 0  # forced fused
    assert _tilescan_auto_chunk(4, 1024, 128, 512) == 512  # explicit
    # beyond the budget: tile-aligned rows per step
    big_b = (2 << 30) // 4 // 1024 + 1  # 1 row over budget at n_pad=1024
    got = _tilescan_auto_chunk(big_b, 2048, 128, 0)
    assert got and got % 128 == 0


def test_tilescan_eligibility(planted):
    _, searcher, _ = planted
    old = searcher.tilescan_tile
    try:
        searcher.tilescan_tile = 7  # not a power of two
        with pytest.raises(ValidationError, match="power of two"):
            searcher.search(
                np.zeros((1, 24), np.float32), k=5, nprobe=1, mode="tilescan"
            )
        assert not searcher.can_tilescan(5)
        searcher.tilescan_tile = 128  # nt=5 < k=6
        with pytest.raises(ValidationError, match="exceeds"):
            searcher.search(
                np.zeros((1, 24), np.float32), k=6, nprobe=1, mode="tilescan"
            )
    finally:
        searcher.tilescan_tile = old
    # auto tile shrinks until k fits the tile count
    assert searcher._tilescan_tile_checked(5) == 16  # explicit knob
    searcher.tilescan_tile = 0
    try:
        t = searcher._tilescan_tile_checked(5)
        assert int(searcher.emb.shape[0]) // t >= 5
    finally:
        searcher.tilescan_tile = old


def test_tilescan_refused_on_cluster_sorted():
    """Cluster-sorted layouts pack same-cluster true neighbors into one
    tile; each tile keeps only its argmin, so tilescan would silently
    serve degraded recall (ADVICE r4). The searcher must refuse."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal((512, 16)).astype(np.float32)
    index = build_ivf_index(
        Embeddings(x, 16), IvfBuildConfig(n_clusters=6, seed=3)
    )
    s = DeviceIvfSearcher(index, x, row_tile=128, cluster_sorted=True)
    assert s._row_cluster_sorted
    assert not s.can_tilescan(5)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    with pytest.raises(ValidationError, match="cluster-sorted"):
        s.search(q, k=5, nprobe=1, mode="tilescan")
    with pytest.raises(ValidationError, match="cluster-sorted"):
        s.exact(q, k=5, mode="tilescan")


def test_tilescan_random_recall_bounded():
    """On random data tile collisions are the only selection loss: the
    planted-free recall across queries stays high at tile=8 (pairwise
    collision odds ~ k^2/2 * tile/n)."""
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2000, 16)).astype(np.float32)
    index = build_ivf_index(
        Embeddings(x, 16), IvfBuildConfig(n_clusters=12, seed=1)
    )
    s = DeviceIvfSearcher(index, x, row_tile=128)
    s.tilescan_tile = 8
    queries = rng.standard_normal((16, 16)).astype(np.float32)
    _, ids = s.search(queries, k=5, nprobe=1, mode="tilescan")
    ids = np.asarray(ids)
    hits = 0
    for b, q in enumerate(queries):
        want, _ = brute_force(x, q, 5)
        hits += len(set(ids[b].tolist()) & set(want.tolist()))
    assert hits >= 0.85 * queries.shape[0] * 5


def test_tilescan_bf16_storage_rescores_f32():
    """Reduced-precision storage + the f32 re-score reference: returned
    distances are f32-exact for whatever tilescan selects."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    x = rng.standard_normal((512, 16)).astype(np.float32)
    index = build_ivf_index(
        Embeddings(x, 16), IvfBuildConfig(n_clusters=6, seed=2)
    )
    s = DeviceIvfSearcher(index, x, row_tile=128, dtype=jnp.bfloat16)
    s.tilescan_tile = 4
    queries = rng.standard_normal((3, 16)).astype(np.float32)
    d, ids = s.search(queries, k=3, nprobe=1, mode="tilescan")
    d, ids = np.asarray(d), np.asarray(ids)
    for b, q in enumerate(queries):
        got = ids[b][ids[b] >= 0]
        true_d = np.sqrt(((x[got] - q[None, :]) ** 2).sum(1))
        np.testing.assert_allclose(d[b][: len(got)], true_d, rtol=1e-4)
