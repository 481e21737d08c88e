"""Determinism tests (SURVEY.md §5.2): fixed seeds -> identical artifacts.

The reference's safety story is Rust + seeded StdRng
(/root/reference/src/ivf/index.rs:327); ours is functional JAX + seeded
jax.random. Byte-level reproducibility of the built index is the contract.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pqvector_tpu import Embeddings, IvfBuildConfig, build_ivf_index
from pqvector_tpu.builder import IndexBuilder
from pqvector_tpu.io.embed import read_index_from_parquet


def test_build_bytes_identical_for_seed():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3000, 16)).astype(np.float32)
    a = build_ivf_index(Embeddings(x, 16), IvfBuildConfig(n_clusters=32, seed=7))
    b = build_ivf_index(Embeddings(x, 16), IvfBuildConfig(n_clusters=32, seed=7))
    assert a.to_bytes() == b.to_bytes()


def test_different_seed_differs():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3000, 16)).astype(np.float32)
    a = build_ivf_index(Embeddings(x, 16), IvfBuildConfig(n_clusters=32, seed=7))
    b = build_ivf_index(Embeddings(x, 16), IvfBuildConfig(n_clusters=32, seed=8))
    assert a.to_bytes() != b.to_bytes()


def test_file_level_reproducibility(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((500, 8)).astype(np.float32)
    table = pa.table(
        {
            "id": pa.array(range(500), pa.int32()),
            "vec": pa.array(list(x), pa.list_(pa.float32())),
        }
    )
    outs = []
    for name in ("a", "b"):
        src = tmp_path / f"{name}.parquet"
        pq.write_table(table, src)
        IndexBuilder(src, "vec").n_clusters(8).seed(123).build_inplace()
        index, _ = read_index_from_parquet(src)
        outs.append(index.to_bytes())
    assert outs[0] == outs[1]
