"""Bench dataset loader and harness tests (CPU-sized)."""

import numpy as np
import pytest

from pqvector_tpu.bench.datasets import (
    read_fvecs,
    read_ivecs,
    synthetic_embeddings,
    write_embedding_parquet,
)


def test_fvecs_round_trip(tmp_path):
    path = tmp_path / "x.fvecs"
    mat = np.arange(12, dtype=np.float32).reshape(3, 4)
    with open(path, "wb") as f:
        for row in mat:
            np.array([4], dtype=np.int32).tofile(f)
            row.tofile(f)
    got = read_fvecs(path)
    np.testing.assert_array_equal(got, mat)
    np.testing.assert_array_equal(read_fvecs(path, max_rows=2), mat[:2])


def test_ivecs_round_trip(tmp_path):
    path = tmp_path / "x.ivecs"
    mat = np.arange(6, dtype=np.int32).reshape(2, 3)
    with open(path, "wb") as f:
        for row in mat:
            np.array([3], dtype=np.int32).tofile(f)
            row.tofile(f)
    np.testing.assert_array_equal(read_ivecs(path), mat)


def test_malformed_fvecs(tmp_path):
    path = tmp_path / "bad.fvecs"
    path.write_bytes(b"\x03\x00\x00\x00\x01\x02")
    from pqvector_tpu.errors import ValidationError

    with pytest.raises(ValidationError):
        read_fvecs(path)


def test_synthetic_deterministic():
    a = synthetic_embeddings(100, 8, seed=5)
    b = synthetic_embeddings(100, 8, seed=5)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (100, 8) and a.dtype == np.float32


def test_write_embedding_parquet_round_trip(tmp_path):
    import pyarrow.parquet as pq

    path = tmp_path / "t.parquet"
    emb = synthetic_embeddings(300, 6)
    write_embedding_parquet(path, emb, batch_rows=128, row_group_size=100)
    table = pq.read_table(path)
    assert table.num_rows == 300
    got = np.array(table.column("embedding").to_pylist(), dtype=np.float32)
    np.testing.assert_allclose(got, emb)
    assert pq.ParquetFile(path).metadata.num_row_groups >= 3


def test_query_harness_end_to_end(tmp_path, monkeypatch, capsys):
    """Small run of the query.rs-shaped harness: unindexed ground truth,
    in-place build, indexed query, recall report."""
    import argparse

    from pqvector_tpu.bench import harness

    monkeypatch.chdir(tmp_path)
    args = argparse.Namespace(
        path=None,
        vector_column="embedding",
        id_column="id",
        build_mode="both",
        nprobe=64,
        max_candidates=None,
        n_clusters=8,
        k=10,
        query_row=3,
        metrics=True,
        rows=500,
        dim=16,
    )
    results = harness.run(args)
    assert results["inplace_recall"] == 1.0  # nprobe == n_clusters -> exact
    assert results["rewrite_recall"] == 1.0
    out = capsys.readouterr().out
    assert "Recall@10: 100.00%" in out
    assert "vector_topk" in out


def test_query_harness_without_id_column(tmp_path, monkeypatch):
    """No id column: recall matches by vector identity (the reference's
    FNV vector-hash fallback, query.rs:498-569)."""
    import argparse

    from pqvector_tpu.bench import harness
    from pqvector_tpu.bench.datasets import synthetic_embeddings

    monkeypatch.chdir(tmp_path)
    import pyarrow as pa
    import pyarrow.parquet as pq

    emb = synthetic_embeddings(300, 8, seed=9)
    path = tmp_path / "noid.parquet"
    pq.write_table(
        pa.table({"embedding": pa.array(list(emb), pa.list_(pa.float32()))}), path
    )
    args = argparse.Namespace(
        path=str(path),
        vector_column="embedding",
        id_column=None,
        build_mode="inplace",
        nprobe=64,
        max_candidates=None,
        n_clusters=8,
        k=5,
        query_row=7,
        metrics=False,
        rows=300,
        dim=8,
    )
    results = harness.run(args)
    assert results["inplace_recall"] == 1.0
