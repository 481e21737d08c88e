"""Streaming-threshold top-k kernel tests (interpret mode on CPU).

Oracle: brute-force numpy; cross-check vs the round-1 kernels. Covers the
running-accumulator merge, in-kernel local mask, and active-tile compaction
(pallas_stream_masked_topk must equal the full-scan masked kernel while
visiting only probed tiles).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pqvector_tpu.kernels.stream_topk import (
    _tile_schedule,
    pallas_stream_exact_topk,
    pallas_stream_masked_topk,
)

INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    n, d = 1024, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((8, d)).astype(np.float32)
    sq = np.einsum("nd,nd->n", x, x)
    brute = ((x[None, :, :] - q[:, None, :]) ** 2).sum(-1)
    return x, q, sq, brute


def test_stream_exact_topk(data):
    x, q, sq, brute = data
    for k in (1, 5, 16):
        d2, ids = pallas_stream_exact_topk(
            jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), k, tile=256,
            interpret=INTERPRET,
        )
        want = np.argsort(brute, axis=1)[:, :k]
        np.testing.assert_array_equal(np.asarray(ids), want)
        np.testing.assert_allclose(
            np.asarray(d2), np.sort(brute, 1)[:, :k], rtol=1e-3, atol=1e-3
        )


def test_stream_exact_with_padding():
    """Pad rows (sq = +3e38) must never enter the results; k > n fills -1."""
    rng = np.random.default_rng(3)
    n, n_pad, d = 5, 256, 8
    x = np.zeros((n_pad, d), np.float32)
    x[:n] = rng.standard_normal((n, d)).astype(np.float32)
    sq = np.full(n_pad, 3.0e38, np.float32)
    sq[:n] = np.einsum("nd,nd->n", x[:n], x[:n])
    q = rng.standard_normal((4, d)).astype(np.float32)
    d2, ids = pallas_stream_exact_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), 8, tile=256,
        interpret=INTERPRET,
    )
    ids = np.asarray(ids)
    d2 = np.asarray(d2)
    brute = ((x[None, :n, :] - q[:, None, :]) ** 2).sum(-1)
    want = np.argsort(brute, axis=1)
    np.testing.assert_array_equal(ids[:, :n], want)
    assert np.all(np.isinf(d2[:, n:]))


def _cluster_fixture(data):
    x, q, sq, brute = data
    rng = np.random.default_rng(1)
    kc = 8
    cent = rng.standard_normal((kc, 16)).astype(np.float32)
    csq = np.einsum("kd,kd->k", cent, cent)
    rc = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1).argmin(1).astype(np.int32)
    order = np.argsort(rc, kind="stable")
    xs, sqs, rcs = x[order], sq[order], rc[order]
    tile = 256
    nt = len(xs) // tile
    parts = rcs.reshape(nt, tile)
    cmax = 128
    tc = np.full((nt, cmax), kc, dtype=np.int32)
    lcl = np.empty((nt, tile), dtype=np.float32)
    for t in range(nt):
        u = np.unique(parts[t])
        tc[t, : u.size] = u
        lcl[t] = np.searchsorted(u, parts[t])
    return x, q, cent, csq, rc, order, xs, sqs, tc, lcl, tile, cmax, kc


def test_stream_masked_topk_matches_oracle(data):
    x, q, cent, csq, rc, order, xs, sqs, tc, lcl, tile, cmax, kc = (
        _cluster_fixture(data)
    )
    brute_s = ((xs[None, :, :] - q[:, None, :]) ** 2).sum(-1)
    cb = ((cent[None, :, :] - q[:, None, :]) ** 2).sum(-1)
    for nprobe in (1, 3, 8):
        d2, ids = pallas_stream_masked_topk(
            jnp.asarray(q), jnp.asarray(cent), jnp.asarray(csq),
            jnp.asarray(lcl.reshape(-1)), jnp.asarray(tc),
            jnp.asarray(xs), jnp.asarray(sqs), jnp.int32(nprobe),
            5, max_probe=8, tile=tile, cmax=cmax, interpret=INTERPRET,
        )
        rcs = rc[order]
        for bi in range(len(q)):
            probed = set(np.argsort(cb[bi])[:nprobe].tolist())
            rows = np.array([r for r in range(len(xs)) if rcs[r] in probed])
            want = rows[np.argsort(brute_s[bi, rows])[:5]]
            np.testing.assert_array_equal(np.asarray(ids[bi]), want)


def test_stream_masked_matches_round1_local_kernel(data):
    from pqvector_tpu.kernels.scan_topk import pallas_masked_local_topk

    x, q, cent, csq, rc, order, xs, sqs, tc, lcl, tile, cmax, kc = (
        _cluster_fixture(data)
    )
    for nprobe in (2, 5):
        d_s, i_s = pallas_stream_masked_topk(
            jnp.asarray(q), jnp.asarray(cent), jnp.asarray(csq),
            jnp.asarray(lcl.reshape(-1)), jnp.asarray(tc),
            jnp.asarray(xs), jnp.asarray(sqs), jnp.int32(nprobe),
            7, max_probe=8, tile=tile, cmax=cmax, interpret=INTERPRET,
        )
        d_l, i_l = pallas_masked_local_topk(
            jnp.asarray(q), jnp.asarray(cent), jnp.asarray(csq),
            jnp.asarray(lcl.reshape(-1)), jnp.asarray(tc),
            jnp.asarray(xs), jnp.asarray(sqs), jnp.int32(nprobe),
            7, max_probe=8, tile=tile, cmax=cmax, interpret=INTERPRET,
        )
        np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_l))
        np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_l), rtol=1e-5)


def test_tile_schedule_compacts_probed_tiles():
    """Schedule lists exactly the tiles containing probed clusters, in
    ascending order, padded by repeating the last active tile."""
    kc_pad = 128
    mask = np.zeros((2, kc_pad), np.float32)
    mask[0, 3] = 1.0
    mask[1, 5] = 1.0
    tc = np.full((6, 4), 9, np.int32)  # 6 tiles, sentinel cluster 9
    tc[1, 0] = 3  # tile 1 hosts cluster 3
    tc[4, 0] = 5  # tile 4 hosts cluster 5
    tc[4, 1] = 3  # and cluster 3
    sched = np.asarray(_tile_schedule(jnp.asarray(mask), jnp.asarray(tc)))
    assert sched[0] == 2
    assert sched[1:3].tolist() == [1, 4]
    assert np.all(sched[3:] == 4)


def test_stream_masked_empty_probe_set():
    """All probed clusters empty -> zero active tiles -> all ids -1."""
    rng = np.random.default_rng(5)
    n, d, tile = 256, 8, 256
    x = rng.standard_normal((n, d)).astype(np.float32)
    sq = np.einsum("nd,nd->n", x, x)
    kc = 4
    cent = np.stack([
        np.full(d, 100.0, np.float32),  # cluster 0: near nothing, empty
        *[c for c in rng.standard_normal((kc - 1, d)).astype(np.float32)],
    ])
    csq = np.einsum("kd,kd->k", cent, cent)
    # Assign every row to clusters 1..3; cluster 0 stays empty.
    rc = 1 + (np.arange(n) % (kc - 1)).astype(np.int32)
    order = np.argsort(rc, kind="stable")
    xs, sqs, rcs = x[order], sq[order], rc[order]
    tc = np.full((1, 128), kc, np.int32)
    u = np.unique(rcs)
    tc[0, : u.size] = u
    lcl = np.searchsorted(u, rcs).astype(np.float32)
    # Query sitting on the empty cluster's centroid, nprobe=1 -> no candidates.
    q = np.full((2, d), 100.0, np.float32)
    d2, ids = pallas_stream_masked_topk(
        jnp.asarray(q), jnp.asarray(cent), jnp.asarray(csq),
        jnp.asarray(lcl), jnp.asarray(tc),
        jnp.asarray(xs), jnp.asarray(sqs), jnp.int32(1),
        3, max_probe=4, tile=tile, cmax=128, interpret=INTERPRET,
    )
    assert np.all(np.isinf(np.asarray(d2)))


def test_stream_subtiles_match_single(data):
    """subtiles>1 (fewer grid steps, same work) returns identical results."""
    x, q, sq, brute = data
    d1, i1 = pallas_stream_exact_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), 5, tile=256,
        subtiles=1, interpret=INTERPRET,
    )
    d2, i2 = pallas_stream_exact_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), 5, tile=256,
        subtiles=2, interpret=INTERPRET,
    )
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))

    f = _cluster_fixture(data)
    x_, q_, cent, csq, rc, order, xs, sqs, tc, lcl, tile, cmax, kc = f
    d_a, i_a = pallas_stream_masked_topk(
        jnp.asarray(q_), jnp.asarray(cent), jnp.asarray(csq),
        jnp.asarray(lcl.reshape(-1)), jnp.asarray(tc),
        jnp.asarray(xs), jnp.asarray(sqs), jnp.int32(3),
        5, max_probe=8, tile=tile, cmax=cmax, subtiles=2, interpret=INTERPRET,
    )
    d_b, i_b = pallas_stream_masked_topk(
        jnp.asarray(q_), jnp.asarray(cent), jnp.asarray(csq),
        jnp.asarray(lcl.reshape(-1)), jnp.asarray(tc),
        jnp.asarray(xs), jnp.asarray(sqs), jnp.int32(3),
        5, max_probe=8, tile=tile, cmax=cmax, subtiles=1, interpret=INTERPRET,
    )
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))
