"""The staged (chunk-streamed) build must equal the unstaged build exactly.

Round-4 scheduling (index/build.py): build_ivf_index_staged streams each
decoded chunk to the device in wire dtype (decode overlaps the transfer;
a sample-first schedule was measured and rejected — docs/PERFORMANCE.md
§r4h). The determinism contract: identical centroids and assignments to
build_ivf_index on the same data/config — the training sample is the
same host-drawn index set gathered on device in the same order, and the
f32 upcast/normalize and wire quantizers are row-local.

Reference anchor: build_ivf_index semantics
/root/reference/src/ivf/index.rs:152-214 (5%/100k sample, :172-174).
"""
import numpy as np
import pytest

from pqvector_tpu.bench.datasets import write_embedding_parquet
from pqvector_tpu.index.build import (
    IvfBuildConfig,
    build_ivf_index,
    build_ivf_index_staged,
)
from pqvector_tpu.types import Embeddings


def _data(n=4000, d=24, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((32, d)).astype(np.float32) * 4
    pick = rng.integers(0, 32, n)
    return (centers[pick] + rng.standard_normal((n, d)).astype(np.float32))


@pytest.mark.parametrize("normalize", [False, True])
def test_staged_matches_unstaged(tmp_path, normalize):
    emb = _data()
    path = str(tmp_path / "e.parquet")
    write_embedding_parquet(path, emb, row_group_size=1500)
    # n=4000 with n_clusters=64 -> sample_size=200 (5%) < n: the
    # sample-first branch runs; small batch_rows forces multi-chunk
    # host gathers across chunk boundaries.
    cfg = IvfBuildConfig(n_clusters=64, seed=11)
    staged = build_ivf_index_staged(
        path, "embedding", cfg, batch_rows=700, normalize=normalize
    )
    if normalize:
        # Reproduce the staged path's device-side f32 row normalization
        # exactly (numpy f64 norms differ in the last bit).
        import jax.numpy as jnp

        x = jnp.asarray(emb)
        data = np.asarray(
            x / jnp.maximum(
                jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True)), 1e-30
            )
        )
    else:
        data = emb
    unstaged = build_ivf_index(Embeddings(data, emb.shape[1]), cfg)
    np.testing.assert_array_equal(staged.centroids, unstaged.centroids)
    np.testing.assert_array_equal(staged.row_ids, unstaged.row_ids)
    np.testing.assert_array_equal(staged.list_offsets, unstaged.list_offsets)


@pytest.mark.parametrize("wire", ["bfloat16", "int8"])
def test_staged_matches_unstaged_reduced_wire(tmp_path, wire):
    # Chunked (staged) and full-matrix (unstaged) wire encoding must
    # produce identical indexes: the quantizers are row-local.
    emb = _data()
    path = str(tmp_path / "w.parquet")
    write_embedding_parquet(path, emb, row_group_size=1500)
    cfg = IvfBuildConfig(n_clusters=64, seed=11, transfer_dtype=wire)
    staged = build_ivf_index_staged(path, "embedding", cfg, batch_rows=700)
    unstaged = build_ivf_index(Embeddings(emb, emb.shape[1]), cfg)
    np.testing.assert_array_equal(staged.centroids, unstaged.centroids)
    np.testing.assert_array_equal(staged.row_ids, unstaged.row_ids)
    np.testing.assert_array_equal(staged.list_offsets, unstaged.list_offsets)


def test_int8_wire_partition_quality():
    # Input rounding perturbs only the partition: the int8-wire index
    # must assign nearly all rows to the same cluster as the f32 build
    # on well-separated data (and searching re-scores at storage
    # precision regardless).
    emb = _data(n=3000, d=16, seed=9)
    f32 = build_ivf_index(
        Embeddings(emb, 16), IvfBuildConfig(n_clusters=16, seed=2)
    )
    i8 = build_ivf_index(
        Embeddings(emb, 16),
        IvfBuildConfig(n_clusters=16, seed=2, transfer_dtype="int8"),
    )
    # Same seed -> comparable cluster identities; compare row co-assignment.
    def assign_of(ix):
        a = np.empty(3000, np.int32)
        for c in range(ix.n_clusters):
            a[ix.cluster_rows(c)] = c
        return a

    a, b = assign_of(f32), assign_of(i8)
    agree = (a == b).mean()
    assert agree > 0.95, agree


def test_staged_full_sample_branch(tmp_path):
    # sample_size == n (tiny data): the ship-everything branch.
    emb = _data(n=300, d=8)
    path = str(tmp_path / "s.parquet")
    write_embedding_parquet(path, emb, row_group_size=100)
    cfg = IvfBuildConfig(n_clusters=8, seed=5)
    staged = build_ivf_index_staged(path, "embedding", cfg, batch_rows=128)
    unstaged = build_ivf_index(Embeddings(emb, 8), cfg)
    np.testing.assert_array_equal(staged.centroids, unstaged.centroids)
    np.testing.assert_array_equal(staged.row_ids, unstaged.row_ids)
