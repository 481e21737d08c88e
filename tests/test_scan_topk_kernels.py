"""Fused Pallas scan+top-k kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pqvector_tpu.kernels.scan_topk import pallas_exact_topk, pallas_masked_topk

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


def test_pallas_exact_topk(data):
    x, q, sq, brute = data
    d2, ids = pallas_exact_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), 5, tile=256,
        interpret=INTERPRET,
    )
    want = np.argsort(brute, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(ids), want)
    np.testing.assert_allclose(
        np.asarray(d2), np.sort(brute, 1)[:, :5], rtol=1e-3, atol=1e-3
    )


def test_pallas_masked_topk_matches_reference(data):
    x, q, sq, brute = data
    rng = np.random.default_rng(1)
    kc = 8
    cent = rng.standard_normal((kc, 16)).astype(np.float32)
    csq = np.einsum("kd,kd->k", cent, cent)
    rc = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1).argmin(1).astype(np.int32)
    for nprobe in (1, 3, 8):
        d2, ids = pallas_masked_topk(
            jnp.asarray(q),
            jnp.asarray(cent),
            jnp.asarray(csq),
            jnp.asarray(rc),
            jnp.asarray(x),
            jnp.asarray(sq),
            jnp.int32(nprobe),
            5,
            max_probe=8,
            tile=256,
            interpret=INTERPRET,
        )
        cb = ((cent[None, :, :] - q[:, None, :]) ** 2).sum(-1)
        for bi in range(len(q)):
            probed = set(np.argsort(cb[bi])[:nprobe].tolist())
            rows = np.array([r for r in range(len(x)) if rc[r] in probed])
            want = rows[np.argsort(brute[bi, rows])[:5]]
            np.testing.assert_array_equal(np.asarray(ids[bi]), want)


def test_pallas_masked_local_topk_matches_global(data):
    """The local-cluster-table kernel must equal the global-mask kernel on a
    cluster-sorted layout (same probes, same winners)."""
    from pqvector_tpu.kernels.scan_topk import pallas_masked_local_topk

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
    uniques = [np.unique(parts[t]) for t in range(nt)]
    cmax = 128  # 128-lane floor (Mosaic layout rule)
    tc = np.full((nt, cmax), kc, dtype=np.int32)
    lcl = np.empty((nt, tile), dtype=np.float32)
    for t, u in enumerate(uniques):
        tc[t, : u.size] = u
        lcl[t] = np.searchsorted(u, parts[t])

    for nprobe in (1, 3, 8):
        d_l, i_l = pallas_masked_local_topk(
            jnp.asarray(q), jnp.asarray(cent), jnp.asarray(csq),
            jnp.asarray(lcl.reshape(-1)), jnp.asarray(tc),
            jnp.asarray(xs), jnp.asarray(sqs), jnp.int32(nprobe),
            5, max_probe=8, tile=tile, cmax=cmax, interpret=INTERPRET,
        )
        d_g, i_g = pallas_masked_topk(
            jnp.asarray(q), jnp.asarray(cent), jnp.asarray(csq),
            jnp.asarray(rcs), jnp.asarray(xs), jnp.asarray(sqs),
            jnp.int32(nprobe), 5, max_probe=8, tile=tile,
            interpret=INTERPRET,
        )
        np.testing.assert_array_equal(np.asarray(i_l), np.asarray(i_g))
        np.testing.assert_allclose(np.asarray(d_l), np.asarray(d_g), rtol=1e-5)
