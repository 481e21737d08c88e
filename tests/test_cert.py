"""mode="cert" — certified-exact full scan (query/device.py
_exact_cert_impl): tile-min lower bounds + whole-tile refine + a
completeness certificate with an in-dispatch exact fallback. The mode's
contract is recall 1.0 (identity with the exact paths) regardless of
whether the certificate fires or the fallback runs. CPU backend."""

import numpy as np
import pytest

import jax.numpy as jnp

from pqvector_tpu import Embeddings, IvfBuildConfig, ValidationError, build_ivf_index
from pqvector_tpu.query.device import (
    DeviceIvfSearcher,
    _exact_cert_impl,
    _topk_min_wide,
)


def brute_force(x, q, k):
    d = ((x - q[None, :]) ** 2).sum(1)
    idx = np.argsort(d, kind="stable")[:k]
    return idx, np.sqrt(d[idx])


def make_searcher(x, n_clusters=8, **kw):
    index = build_ivf_index(
        Embeddings(x, x.shape[1]), IvfBuildConfig(n_clusters=n_clusters, seed=0)
    )
    return DeviceIvfSearcher(index, x, row_tile=128, **kw)


@pytest.fixture(scope="module")
def clustered():
    """Gaussian mixture (the bench's data shape): dense distance ties near
    d_k are exactly where a sloppy certificate would silently lose rows."""
    rng = np.random.default_rng(11)
    modes = rng.uniform(-1, 1, (16, 32)).astype(np.float32)
    which = rng.integers(0, 16, 3000)
    x = modes[which] + 0.15 * rng.standard_normal((3000, 32)).astype(np.float32)
    queries = x[rng.integers(0, 3000, 8)] + 0.05 * rng.standard_normal(
        (8, 32)
    ).astype(np.float32)
    return x.astype(np.float32), queries.astype(np.float32)


def test_cert_matches_exact_f32(clustered):
    x, queries = clustered
    s = make_searcher(x)
    assert s.can_cert(10)
    de, ie = s.exact(queries, k=10, mode="xla")
    dc, ic = s.exact(queries, k=10, mode="cert")
    np.testing.assert_array_equal(np.asarray(ic), np.asarray(ie))
    np.testing.assert_allclose(np.asarray(dc), np.asarray(de), rtol=1e-5)


def test_cert_matches_truth_bf16_storage(clustered):
    """bf16 storage + f32 reference: cert's pass 1 runs on the reference,
    so results must equal the f32 brute force, not the bf16-rounded one."""
    x, queries = clustered
    s = make_searcher(x, dtype=jnp.bfloat16)
    dc, ic = s.exact(queries, k=10, mode="cert")
    for b, q in enumerate(queries):
        idx, d = brute_force(x, q, 10)
        np.testing.assert_array_equal(np.asarray(ic)[b], idx)
        np.testing.assert_allclose(np.asarray(dc)[b], d, rtol=1e-5)


def test_cert_cluster_sorted_layout(clustered):
    """tilescan refuses cluster-sorted layouts (argmin-only loses
    co-located neighbors); cert gathers tiles whole, so it stays eligible
    AND exact there."""
    x, queries = clustered
    s = make_searcher(x, cluster_sorted=True)
    assert not s.can_tilescan(10)
    assert s.can_cert(10)
    de, ie = s.exact(queries, k=10, mode="xla")
    dc, ic = s.exact(queries, k=10, mode="cert")
    np.testing.assert_array_equal(np.asarray(ic), np.asarray(ie))


def test_cert_pass1_high_stays_exact(clustered):
    """cert_pass1='high' (bf16_3x pass 1, widened slack): results must
    stay identical to the exact path — mis-selected tiles land in the
    fallback, never in the output."""
    x, queries = clustered
    s = make_searcher(x)
    s.cert_pass1 = "high"
    de, ie = s.exact(queries, k=10, mode="xla")
    dc, ic = s.exact(queries, k=10, mode="cert")
    np.testing.assert_array_equal(np.asarray(ic), np.asarray(ie))
    np.testing.assert_allclose(np.asarray(dc), np.asarray(de), rtol=1e-5)
    _, il = s.exact_loop(queries, k=10, reps=2, mode="cert")
    np.testing.assert_array_equal(np.asarray(il), np.asarray(ie))
    s.cert_pass1 = "bogus"
    with pytest.raises(ValidationError, match="cert_pass1"):
        s.exact(queries, k=10, mode="cert")


def test_cert_pass1_high_adversarial_ties():
    """Planted winners spaced INSIDE the widened high-precision slack:
    the certificate must refuse and the fallback must return the true
    top-k (reuses the adversarial-wall construction)."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal(24).astype(np.float32)
    x = np.empty((1280, 24), dtype=np.float32)
    dirs = rng.standard_normal((1280, 24)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    radii = (1.0 + 2e-3 + 1e-2 * rng.random(1280)).astype(np.float32)
    radii[:40] = 1.0 + 1e-3 * np.arange(40)
    x[:] = base[None, :] + dirs * radii[:, None]
    x = x[rng.permutation(1280)]
    queries = np.stack([base, base + 1e-5]).astype(np.float32)
    s = make_searcher(x)
    s.cert_pass1 = "high"
    de, ie = s.exact(queries, k=10, mode="xla")
    dc, ic = s.exact(queries, k=10, mode="cert")
    # f64-truth identity up to f32 boundary ties (see
    # test_cert_adversarial_ties for the tie rationale).
    for b, q in enumerate(queries):
        d64 = ((x.astype(np.float64) - q[None, :]) ** 2).sum(1)
        truth = np.sort(d64)[:10]
        got = d64[np.asarray(ic)[b]]
        assert (got <= truth[-1] + 1e-5).all()
        np.testing.assert_allclose(np.sort(got)[:9], truth[:9], atol=1e-5)


def test_cert_pass1_storage_stays_exact(clustered):
    """cert_pass1='storage' (pass 1 over the bf16 scan array, 2^-8 slack):
    candidates still refine against the f32 reference, so results equal
    the f32 truth whether or not the certificate fires."""
    x, queries = clustered
    s = make_searcher(x, dtype=jnp.bfloat16)
    s.cert_pass1 = "storage"
    dc, ic = s.exact(queries, k=10, mode="cert")
    for b, q in enumerate(queries):
        idx, d = brute_force(x, q, 10)
        np.testing.assert_array_equal(np.asarray(ic)[b], idx)
        np.testing.assert_allclose(np.asarray(dc)[b], d, rtol=1e-5)
    _, il = s.exact_loop(queries, k=10, reps=2, mode="cert")
    np.testing.assert_array_equal(np.asarray(il), np.asarray(ic))


def test_cert_probe_diagnostic(clustered):
    """cert_probe reports the certify rate without running the fallback:
    1.0 on well-separated data at default knobs, 0.0 when starved to a
    single fetched tile (m < k tiles cannot cover k winners)."""
    x, queries = clustered
    s = make_searcher(x)
    rate, margins = s.cert_probe(queries, k=10)
    assert rate == 1.0
    assert margins.shape == (len(queries),)
    assert (margins >= 0).all()
    s.cert_fetch_tiles = 1
    rate1, m1 = s.cert_probe(queries, k=10)
    assert rate1 < 1.0
    # Margins and the served results agree: search still returns the
    # exact answer because the fallback covers the failed certificates.
    de, ie = s.exact(queries, k=10, mode="xla")
    _, ic = s.exact(queries, k=10, mode="cert")
    np.testing.assert_array_equal(np.asarray(ic), np.asarray(ie))


def test_cert_narrow_fetch_falls_back_exactly(clustered):
    """cert_fetch_tiles=1 starves the candidate set, so the certificate
    must fail and the fallback must still return the exact answer."""
    x, queries = clustered
    s = make_searcher(x)
    s.cert_fetch_tiles = 1
    de, ie = s.exact(queries, k=10, mode="xla")
    dc, ic = s.exact(queries, k=10, mode="cert")
    np.testing.assert_array_equal(np.asarray(ic), np.asarray(ie))
    np.testing.assert_allclose(np.asarray(dc), np.asarray(de), rtol=1e-5)


def test_cert_scan_form_matches_fused(clustered):
    """The lax.scan candidate-scoring form (fuse budget exceeded) must be
    bit-identical to the one-shot einsum form."""
    import pqvector_tpu.query.device as dev

    x, queries = clustered
    s = make_searcher(x)
    d1, i1 = s.exact(queries, k=10, mode="cert")
    old = dev._CERT_FUSE_BUDGET
    dev._CERT_FUSE_BUDGET = 0  # force the scan form
    try:
        s2 = make_searcher(x)
        d2, i2 = s2.exact(queries, k=10, mode="cert")
    finally:
        dev._CERT_FUSE_BUDGET = old
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=0)


def test_cert_adversarial_ties():
    """A wall of near-ties just beyond d_k, spaced INSIDE the certificate
    slack (~3e-3 here) but above f32 matmul-form rounding (~1e-4): the
    certificate must refuse and the fallback must return the true top-k.
    (Spacing below ~1e-4 is indistinguishable even to the existing exact
    merge — both paths are 'exact up to f32 selection rounding'.)"""
    rng = np.random.default_rng(3)
    base = rng.standard_normal(24).astype(np.float32)
    x = np.empty((1280, 24), dtype=np.float32)
    dirs = rng.standard_normal((1280, 24)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    radii = (1.0 + 2e-3 + 1e-2 * rng.random(1280)).astype(np.float32)
    radii[:40] = 1.0 + 1e-3 * np.arange(40)  # planted winners, 1e-3 apart
    x[:] = base[None, :] + dirs * radii[:, None]
    x = x[rng.permutation(1280)]
    queries = np.stack([base, base + 1e-5]).astype(np.float32)
    s = make_searcher(x)
    de, ie = s.exact(queries, k=10, mode="xla")
    dc, ic = s.exact(queries, k=10, mode="cert")
    # Both paths match the f64 ground truth up to f32-summation-scale
    # boundary ties (random wall rows can sit ~1e-8 apart in d^2, below
    # what ANY f32 path can order — cert and the merge may legitimately
    # swap such rows at the k-th boundary; every returned row must still
    # be within that of the true 10th distance).
    for b, q in enumerate(queries):
        d64 = ((x.astype(np.float64) - q[None, :]) ** 2).sum(1)
        truth = np.sort(d64)[:10]
        for ids_got in (np.asarray(ic)[b], np.asarray(ie)[b]):
            got = d64[ids_got]
            assert (got <= truth[-1] + 1e-5).all()
            np.testing.assert_allclose(np.sort(got)[:9], truth[:9], atol=1e-5)


def test_cert_k_exceeds_rows():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((50, 16)).astype(np.float32)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    s = make_searcher(x, n_clusters=4)
    d, ids = s.exact(q, k=60, mode="cert")
    d, ids = np.asarray(d), np.asarray(ids)
    assert ids.shape == (3, 60)
    assert (ids[:, :50] >= 0).all()
    assert (ids[:, 50:] == -1).all()
    assert np.isinf(d[:, 50:]).all()
    de, ie = s.exact(q, k=60, mode="xla")
    np.testing.assert_array_equal(ids, np.asarray(ie))


def test_cert_loops_match_exact(clustered):
    x, queries = clustered
    s = make_searcher(x)
    de, ie = s.exact(queries, k=10, mode="xla")
    _, il = s.exact_loop(queries, k=10, reps=2, mode="cert")
    np.testing.assert_array_equal(np.asarray(il), np.asarray(ie))
    _, il = s.search_loop(queries, k=10, nprobe=1, reps=2, mode="cert")
    np.testing.assert_array_equal(np.asarray(il), np.asarray(ie))


def test_cert_defer_regime_raises(clustered):
    """In the deferred-re-score regime the f32 reference must stay out of
    the loop body, which cert cannot honor — expect a clear refusal, not
    a compile-time HBM blowup."""
    x, queries = clustered
    s = make_searcher(x, dtype=jnp.bfloat16)
    s.loop_rescore = "defer"
    with pytest.raises(ValidationError, match="cert"):
        s.exact_loop(queries, k=10, reps=2, mode="cert")
    with pytest.raises(ValidationError, match="cert"):
        s.search_loop(queries, k=10, nprobe=1, reps=2, mode="cert")
    # Single-dispatch cert stays available (no loop carry involved).
    dc, ic = s.exact(queries, k=10, mode="cert")
    de, ie = s.exact(queries, k=10, mode="xla")
    np.testing.assert_array_equal(np.asarray(ic), np.asarray(ie))


def test_cert_after_dynamic_updates(clustered):
    """Deletes and appends compose through _finalize like every mode."""
    x, queries = clustered
    s = make_searcher(x)
    _, ie0 = s.exact(queries, k=5, mode="xla")
    victims = np.unique(np.asarray(ie0)[:, 0])
    s.delete_rows(victims)
    appended = s.append_rows(queries + 0.01)
    de, ie = s.exact(queries, k=5, mode="xla")
    dc, ic = s.exact(queries, k=5, mode="cert")
    ie, ic = np.asarray(ie), np.asarray(ic)
    np.testing.assert_array_equal(ic, ie)
    assert not np.isin(ic, victims).any()
    assert np.isin(appended, ic).any()  # the fresh near-duplicates win


def test_topk_min_wide_chunked_matches_direct():
    rng = np.random.default_rng(9)
    keys = rng.integers(-(2**30), 2**30, (4, 1000), dtype=np.int32)
    v1, i1 = _topk_min_wide(jnp.asarray(keys), 7)
    v2, i2 = _topk_min_wide(jnp.asarray(keys), 7, chunk=128)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    # Values determine indices up to ties; verify the decoded values agree
    # with numpy's ascending sort.
    ref = np.sort(keys, axis=1)[:, :7]
    np.testing.assert_array_equal(np.asarray(v1), ref)


def test_cert_spilled_searcher(clustered):
    """Spilled multi-assignment layouts (duplicate rows) dedup through
    _finalize; cert must agree with the exact path there too."""
    x, queries = clustered
    index = build_ivf_index(
        Embeddings(x, x.shape[1]), IvfBuildConfig(n_clusters=8, seed=0)
    )
    s = DeviceIvfSearcher.with_spill(index, x, spill=1, row_tile=128)
    de, ie = s.exact(queries, k=10, mode="xla")
    dc, ic = s.exact(queries, k=10, mode="cert")
    np.testing.assert_array_equal(np.asarray(ic), np.asarray(ie))


def test_cert_pass2_knob_forms_agree(clustered):
    # cert_pass2 forces the pass-2 candidate-scoring form; both must
    # produce identical results (the budget only picks a default).
    x, q = clustered
    s = make_searcher(x, dtype=jnp.bfloat16)
    outs = []
    for form in ("fused", "scan", "auto"):
        s.cert_pass2 = form
        d2, ids = s.exact(q, 10, mode="cert")
        outs.append((np.asarray(d2), np.asarray(ids)))
    for d2, ids in outs[1:]:
        np.testing.assert_array_equal(ids, outs[0][1])
        np.testing.assert_allclose(d2, outs[0][0], rtol=0, atol=0)
