"""Masked-scan IVF path: must agree with the gather path at every nprobe."""

import numpy as np
import pytest

from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index
from pqvector_tpu.query.device import DeviceIvfSearcher


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((600, 12)).astype(np.float32)
    index = build_ivf_index(Embeddings(x, 12), IvfBuildConfig(n_clusters=12, seed=2))
    searcher = DeviceIvfSearcher(index, x, row_tile=128)
    queries = rng.standard_normal((9, 12)).astype(np.float32)
    return x, index, searcher, queries


@pytest.mark.parametrize("nprobe", [1, 3, 12])
def test_masked_matches_gather(setup, nprobe):
    _, _, searcher, queries = setup
    d_g, i_g = searcher.search(queries, k=6, nprobe=nprobe, mode="gather")
    d_m, i_m = searcher.search(queries, k=6, nprobe=nprobe, mode="masked")
    np.testing.assert_array_equal(np.asarray(i_g), np.asarray(i_m))
    np.testing.assert_allclose(np.asarray(d_g), np.asarray(d_m), rtol=1e-5, atol=1e-6)


def test_masked_missing_slots(setup):
    x, index, searcher, _ = setup
    d, i = searcher.search(x[0], k=500, nprobe=1, mode="masked")
    i = np.asarray(i[0])
    valid = (i >= 0).sum()
    assert valid == index.cluster_sizes()[int(index.find_closest_centroids(x[0], 1)[0])]
    assert np.all(np.isinf(np.asarray(d[0])[i == -1]))


def test_bad_mode_rejected(setup):
    _, _, searcher, queries = setup
    from pqvector_tpu.errors import ValidationError

    with pytest.raises(ValidationError, match="mode"):
        searcher.search(queries, k=3, nprobe=2, mode="wat")


@pytest.mark.parametrize("nprobe", [1, 3, 12])
def test_pallas_mode_matches_gather(setup, nprobe):
    _, _, searcher, queries = setup
    d_g, i_g = searcher.search(queries, k=6, nprobe=nprobe, mode="gather")
    d_p, i_p = searcher.search(queries, k=6, nprobe=nprobe, mode="pallas")
    np.testing.assert_array_equal(np.asarray(i_g), np.asarray(i_p))
    np.testing.assert_allclose(np.asarray(d_g), np.asarray(d_p), rtol=1e-5, atol=1e-6)


def test_exact_pallas_mode_matches_xla(setup):
    x, _, searcher, queries = setup
    d_x, i_x = searcher.exact(queries, k=6, mode="xla")
    d_p, i_p = searcher.exact(queries, k=6, mode="pallas")
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_p))
    np.testing.assert_allclose(np.asarray(d_x), np.asarray(d_p), rtol=1e-5, atol=1e-6)
