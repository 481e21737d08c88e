"""Deferred loop re-score (VERDICT r4 item 2 — the >=12M while-carry OOM).

TPU while-loops copy scan-visible arrays into the carry (donation does
not remove the copies — session r4i), so a big f32 re-score reference
inside a chained search_loop body OOMs HBM at >=12M rows. The library
fix: `DeviceIvfSearcher._loop_defer_rescore` holds the reference out of
the `lax.scan` body (bf16-only selection at a widened k) and refines the
LAST rep's winners against the reference after the scan. These tests pin
(a) the auto sizing policy at the real DEEP-12M shape, (b) recall parity
between deferred and in-body re-score on sub-bf16-spacing data, and
(c) the knob plumbing across mode families and the spilled layout.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pqvector_tpu import Embeddings, IvfBuildConfig, ValidationError, build_ivf_index
from pqvector_tpu.query.device import DeviceIvfSearcher


@pytest.fixture(scope="module")
def near_tie():
    """Groups of 4 rows spaced 1e-4 apart (below bf16 resolution): the
    within-group ranking is only recoverable through the f32 reference,
    so these rows notice if deferring drops the re-score."""
    rng = np.random.default_rng(7)
    n_groups, per, d = 128, 4, 32
    centers = rng.uniform(-4, 4, (n_groups, d)).astype(np.float32)
    rows = []
    for g in range(n_groups):
        for j in range(per):
            rows.append(centers[g] + (1e-4 * j) * np.eye(d, dtype=np.float32)[0])
    x = np.stack(rows).astype(np.float32)
    index = build_ivf_index(
        Embeddings(x, d), IvfBuildConfig(n_clusters=8, seed=0)
    )
    gq = rng.integers(0, n_groups, 32)
    q = centers[gq].copy()
    q[:, 0] += 2.1e-4
    return x, index, q


def _f32_truth(x, q, k):
    d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    return np.argsort(d2, axis=1, kind="stable")[:, :k]


def test_auto_policy_sizes_against_hbm(near_tie, monkeypatch):
    """The auto decision must defer exactly past the measured boundary:
    10M x 96 bf16+f32ref compiled and served on the 16 GB chip (r4i),
    12M OOMed."""
    x, index, _ = near_tie
    s = DeviceIvfSearcher(index, x, dtype=jnp.bfloat16, row_tile=128)
    assert s._emb_ref is not None
    assert not s._loop_defer_rescore()  # tiny array: in-body

    # Synthesize the decision inputs for the DEEP shapes without the
    # memory: the policy reads only emb.shape/dtype and the HBM budget.
    class FakeEmb:
        def __init__(self, n, d, dtype):
            self.shape = (n, d)
            self.dtype = dtype

    s2 = DeviceIvfSearcher(index, x, dtype=jnp.bfloat16, row_tile=128)
    s2.emb = FakeEmb(10_002_432, 96, jnp.bfloat16)
    assert not s2._loop_defer_rescore()  # 11.5 GB live: fits (r4i served)
    s2.emb = FakeEmb(12_003_328, 96, jnp.bfloat16)
    assert s2._loop_defer_rescore()  # 13.8 GB live: the r4i OOM shape
    # Env override scales the budget.
    monkeypatch.setenv("PQVECTOR_TPU_HBM_GB", "32")
    assert not s2._loop_defer_rescore()
    monkeypatch.delenv("PQVECTOR_TPU_HBM_GB")

    # f32 storage (no reference) never defers.
    s3 = DeviceIvfSearcher(index, x, row_tile=128)
    s3.emb = FakeEmb(12_003_328, 96, jnp.float32)
    assert not s3._loop_defer_rescore()

    # Forced modes override the sizing in both directions.
    s2.loop_rescore = "body"
    assert not s2._loop_defer_rescore()
    s2.loop_rescore = "defer"
    assert s2._loop_defer_rescore()
    s2.loop_rescore = "bogus"
    with pytest.raises(ValidationError, match="loop_rescore"):
        s2._loop_defer_rescore()


@pytest.mark.parametrize("mode", ["scan", "binscan", "masked", "pallas"])
def test_search_loop_defer_matches_body(near_tie, mode):
    """Deferred re-score must rank the sub-bf16 near-ties exactly like
    the in-body re-score (both resolve ranking through the f32 rows)."""
    x, index, q = near_tie
    k = 4
    s = DeviceIvfSearcher(index, x, dtype=jnp.bfloat16, row_tile=128)
    s.loop_rescore = "body"
    db, ib = s.search_loop(q, k, nprobe=8, reps=2, mode=mode)
    s.loop_rescore = "defer"
    dd, idd = s.search_loop(q, k, nprobe=8, reps=2, mode=mode)
    tids = _f32_truth(x, q, k)
    ib, idd = np.asarray(ib), np.asarray(idd)
    # Both forms recover the f32 top-1 (impossible from bf16 alone).
    assert (ib[:, 0] == tids[:, 0]).mean() >= 0.95
    assert (idd[:, 0] == tids[:, 0]).mean() >= 0.95
    # Returned distances are f32-exact for the chosen ids in both forms.
    for ids_got, d_got in ((ib, db), (idd, dd)):
        want = np.sqrt(((q[:, None, :] - x[ids_got]) ** 2).sum(-1))
        np.testing.assert_allclose(
            np.asarray(d_got), want, rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("mode", ["xla", "approx", "binscan", "stream"])
def test_exact_loop_defer_matches_body(near_tie, mode):
    x, index, q = near_tie
    k = 4
    s = DeviceIvfSearcher(index, x, dtype=jnp.bfloat16, row_tile=128)
    s.loop_rescore = "body"
    _, ib = s.exact_loop(q, k, reps=2, mode=mode)
    s.loop_rescore = "defer"
    _, idd = s.exact_loop(q, k, reps=2, mode=mode)
    tids = _f32_truth(x, q, k)
    assert (np.asarray(ib)[:, 0] == tids[:, 0]).mean() >= 0.95
    assert (np.asarray(idd)[:, 0] == tids[:, 0]).mean() >= 0.95


def test_xbin8_loop_defer(near_tie):
    x, index, q = near_tie
    k = 4
    s = DeviceIvfSearcher(index, x, dtype=jnp.bfloat16, row_tile=128)
    s.loop_rescore = "defer"
    _, ids = s.exact_loop(q, k, reps=2, mode="xbin8")
    tids = _f32_truth(x, q, k)
    assert (np.asarray(ids)[:, 0] == tids[:, 0]).mean() >= 0.9


def test_spilled_searcher_defer(near_tie):
    """Deferred re-score under the spilled layout: the widened-k defer
    stacks on the spill 2k dedup and ids stay original-space."""
    x, index, q = near_tie
    s = DeviceIvfSearcher.with_spill(
        index, x, spill=0.2, dtype=jnp.bfloat16, row_tile=128
    )
    assert s._emb_ref is not None
    s.loop_rescore = "defer"
    d, ids = s.search_loop(q, 4, nprobe=8, reps=2, mode="scan")
    ids = np.asarray(ids)
    tids = _f32_truth(x, q, 4)
    assert (ids[:, 0] == tids[:, 0]).mean() >= 0.95
    # No duplicate ids per query (spill dedup survived the defer).
    for row in ids:
        got = row[row >= 0]
        assert len(set(got.tolist())) == len(got)
    assert ids.max() < len(x)  # original id space
