"""Benchmark dataset loaders and generators.

Covers the reference's synthetic generator (seeded uniform parquet,
/root/reference/benches/bench_util.rs:12-58) plus loaders for the standard
ANN benchmark formats named in BASELINE.md (SIFT1M / GloVe / DEEP): ``fvecs``
/ ``bvecs`` / ``ivecs``. The environment has no network egress, so real
datasets are used only when already present on disk; everything else runs on
synthetic data with the same shapes.
"""

from __future__ import annotations

import os

import numpy as np

from ..errors import ValidationError


def read_fvecs(path: str | os.PathLike, max_rows: int | None = None) -> np.ndarray:
    """Read an .fvecs file: per row, i32 dim then dim f32 values."""
    raw = np.fromfile(path, dtype=np.int32)
    if raw.size == 0:
        return np.empty((0, 0), dtype=np.float32)
    dim = int(raw[0])
    if dim <= 0 or raw.size % (dim + 1) != 0:
        raise ValidationError(f"Malformed fvecs file: {path}")
    mat = raw.reshape(-1, dim + 1)[:, 1:]
    if max_rows is not None:
        mat = mat[:max_rows]
    return mat.view(np.float32).copy()


def read_ivecs(path: str | os.PathLike, max_rows: int | None = None) -> np.ndarray:
    """Read an .ivecs file (same framing, int32 payload)."""
    raw = np.fromfile(path, dtype=np.int32)
    if raw.size == 0:
        return np.empty((0, 0), dtype=np.int32)
    dim = int(raw[0])
    if dim <= 0 or raw.size % (dim + 1) != 0:
        raise ValidationError(f"Malformed ivecs file: {path}")
    mat = raw.reshape(-1, dim + 1)[:, 1:]
    if max_rows is not None:
        mat = mat[:max_rows]
    return mat.copy()


def read_bvecs(path: str | os.PathLike, max_rows: int | None = None) -> np.ndarray:
    """Read a .bvecs file: per row, i32 dim then dim u8 values."""
    raw = np.fromfile(path, dtype=np.uint8)
    if raw.size == 0:
        return np.empty((0, 0), dtype=np.float32)
    dim = int(np.frombuffer(raw[:4].tobytes(), dtype=np.int32)[0])
    stride = 4 + dim
    if dim <= 0 or raw.size % stride != 0:
        raise ValidationError(f"Malformed bvecs file: {path}")
    mat = raw.reshape(-1, stride)[:, 4:]
    if max_rows is not None:
        mat = mat[:max_rows]
    return mat.astype(np.float32)


def synthetic_embeddings(
    rows: int, dim: int, seed: int = 1234, n_modes: int = 256, noise: float = 0.15
) -> np.ndarray:
    """Seeded clustered gaussian-mixture embeddings (gives IVF structure)."""
    rng = np.random.default_rng(seed)
    modes = rng.uniform(-1.0, 1.0, (n_modes, dim)).astype(np.float32)
    which = rng.integers(0, n_modes, rows)
    return modes[which] + noise * rng.standard_normal((rows, dim)).astype(np.float32)


def write_embedding_parquet(
    path: str | os.PathLike,
    embeddings: np.ndarray,
    column: str = "embedding",
    batch_rows: int = 65536,
    row_group_size: int | None = None,
    compression: str = "snappy",
) -> None:
    """Write an (id, vectors) parquet like the reference generator
    (bench_util.rs:12-58)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows, dim = embeddings.shape
    schema = pa.schema(
        [pa.field("id", pa.int64()), pa.field(column, pa.list_(pa.float32()))]
    )
    writer = pq.ParquetWriter(path, schema, compression=compression)
    written = 0
    while written < rows:
        n = min(batch_rows, rows - written)
        chunk = np.ascontiguousarray(embeddings[written : written + n])
        flat = pa.array(chunk.reshape(-1), pa.float32())
        offsets = pa.array(np.arange(n + 1, dtype=np.int32) * dim)
        vec = pa.ListArray.from_arrays(offsets, flat)
        table = pa.table(
            {"id": pa.array(np.arange(written, written + n)), column: vec},
            schema=schema,
        )
        writer.write_table(table, row_group_size=row_group_size)
        written += n
    writer.close()


def random_query(dim: int, seed: int = 7) -> np.ndarray:
    """Seeded random query (bench_util.rs random_query analog)."""
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 1.0, dim).astype(np.float32)


def sift1m_paths(base_dir: str) -> dict[str, str] | None:
    """Standard SIFT1M layout if present on disk (no egress to fetch it)."""
    paths = {
        "base": os.path.join(base_dir, "sift_base.fvecs"),
        "query": os.path.join(base_dir, "sift_query.fvecs"),
        "groundtruth": os.path.join(base_dir, "sift_groundtruth.ivecs"),
    }
    if all(os.path.exists(p) for p in paths.values()):
        return paths
    return None
