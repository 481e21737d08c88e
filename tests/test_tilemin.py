"""kernels/tilemin.py — fused matmul + per-tile min (cert pass 1).
Interpret mode on CPU; numerical identity with the XLA fold."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pqvector_tpu.kernels.tilemin import pallas_tile_min, tilemin_params


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    n_pad, d = 4096, 64
    x = rng.standard_normal((n_pad, d)).astype(np.float32)
    sq = np.einsum("nd,nd->n", x, x).astype(np.float32)
    sq[-137:] = np.inf  # pad rows never win
    q = rng.standard_normal((24, d)).astype(np.float32)
    return x, sq, q


def _ref(x, sq, q, tile):
    part = sq[None, :] - 2.0 * q @ x.T
    return part.reshape(len(q), -1, tile).min(2)


def test_matches_reference_f32(data):
    x, sq, q = data
    out = np.asarray(
        pallas_tile_min(
            jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), 128,
            interpret=True,
        )
    )
    np.testing.assert_allclose(out, _ref(x, sq, q, 128), rtol=1e-5, atol=1e-5)


def test_inf_pad_rows_never_win(data):
    x, sq, q = data
    out = np.asarray(
        pallas_tile_min(
            jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), 128,
            interpret=True,
        )
    )
    # The last tile holds only pad rows (137 > 128): its min must be inf.
    assert np.isinf(out[:, -1]).all()
    assert np.isfinite(out[:, :-2]).all()


def test_bf16_storage(data):
    x, sq, q = data
    out = np.asarray(
        pallas_tile_min(
            jnp.asarray(q), jnp.asarray(x, jnp.bfloat16), jnp.asarray(sq),
            128, interpret=True,
        )
    )
    ref = _ref(np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32), sq, q, 128)
    fin = np.isfinite(ref)
    assert (np.isinf(out) == ~fin).all()  # pad-only tiles stay inf
    # bf16 products differ from f32-of-rounded-values by <= 2^-8 relative.
    scale = np.abs(ref) + np.einsum("bd,bd->b", q, q)[:, None]
    assert (np.abs(out - ref)[fin] <= (2.0**-7 * scale + 1e-3)[fin]).all()


def test_odd_batch_sizes(data):
    x, sq, q = data
    for b in (1, 7, 24):
        out = np.asarray(
            pallas_tile_min(
                jnp.asarray(q[:b]), jnp.asarray(x), jnp.asarray(sq), 128,
                interpret=True,
            )
        )
        np.testing.assert_allclose(
            out, _ref(x, sq, q[:b], 128), rtol=1e-5, atol=1e-5
        )


def test_params_reject_oversized():
    # d so large no divisor fits the VMEM budget.
    assert tilemin_params(128 * 7, 128, 1 << 20, 4, 8) == (0, 0)
    with pytest.raises(ValueError, match="multiple of tile"):
        pallas_tile_min(
            jnp.zeros((2, 8)), jnp.zeros((100, 8)), jnp.zeros(100), 128,
            interpret=True,
        )


def test_params_mosaic_legal():
    """Any grid returned must be Mosaic-legal: the out block's minor dim
    (ct) a multiple of 128, or the whole tile count (session r5f: Mosaic
    rejected ct=40 on the bench shape's nt=7840; such shapes now fall
    back to the fused XLA dot-shaped fold in _tile_min_vals)."""
    for n_pad, d, esize in (
        (1003520, 128, 2), (1003520, 128, 4), (1003520, 1024, 4),
        (10002432, 96, 2), (128 * 128 * 64, 128, 4), (128 * 128, 128, 4),
    ):
        nt = n_pad // 128
        ct, bt = tilemin_params(n_pad, 128, d, esize, 1024)
        if ct:
            assert ct % 128 == 0 or ct == nt, (n_pad, d, ct)
            assert nt % ct == 0 and bt % 8 == 0
    # A 128-multiple tile count always has a legal grid at small d.
    ct, bt = tilemin_params(128 * 128 * 64, 128, 128, 2, 1024)
    assert ct and ct % 128 == 0
