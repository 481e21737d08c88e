"""Shared example helpers (mirrors /root/reference/examples/common/mod.rs).

Env vars: ``PQ_VECTOR_SOURCE`` (source parquet), ``PQ_VECTOR_INDEXED``
(indexed copy), ``PQ_VECTOR_QUERY_ROW`` (row to use as the query vector).
``ensure_indexed`` auto-builds the index if the footer keys are absent
(mod.rs:38-55). When no source is configured, a small synthetic dataset is
generated so the examples run out of the box.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS even under the axon sitecustomize, which pins
# jax_platforms=axon so the env var alone is ignored. Without this, the test
# suite's example subprocesses would run k-means on the real TPU (violating
# the one-TPU-process rule and failing whenever the chip is busy).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from pqvector_tpu import IndexBuilder, has_pq_vector_index  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data")
DEFAULT_SOURCE = os.path.join(DATA_DIR, "example.parquet")
DEFAULT_COLUMN = "embedding"


def source_path() -> str:
    path = os.environ.get("PQ_VECTOR_SOURCE", DEFAULT_SOURCE)
    if not os.path.exists(path):
        if path != DEFAULT_SOURCE:
            raise FileNotFoundError(path)
        generate_default(path)
    return path


def indexed_path() -> str:
    return os.environ.get(
        "PQ_VECTOR_INDEXED", source_path().replace(".parquet", "_indexed.parquet")
    )


def query_row() -> int:
    return int(os.environ.get("PQ_VECTOR_QUERY_ROW", "0"))


def generate_default(path: str, rows: int = 10_000, dim: int = 64) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(0)
    modes = rng.uniform(-1, 1, (32, dim)).astype(np.float32)
    x = modes[rng.integers(0, 32, rows)] + 0.1 * rng.standard_normal(
        (rows, dim)
    ).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(np.arange(rows)),
                "title": pa.array([f"item-{i}" for i in range(rows)]),
                DEFAULT_COLUMN: pa.array(list(x), pa.list_(pa.float32())),
            }
        ),
        path,
    )
    print(f"generated synthetic dataset: {path} ({rows} x {dim})")


def ensure_indexed(source: str, indexed: str, column: str = DEFAULT_COLUMN) -> str:
    """Build the indexed copy if it doesn't already carry an index
    (examples/common/mod.rs:38-55)."""
    if os.path.exists(indexed) and has_pq_vector_index(indexed):
        return indexed
    print(f"building index: {source} -> {indexed}")
    IndexBuilder(source, column).build_new(indexed)
    return indexed


def read_query_vector(path: str, column: str, row: int) -> np.ndarray:
    import pyarrow.parquet as pq

    table = pq.read_table(path, columns=[column])
    return np.asarray(table.column(column)[row].as_py(), dtype=np.float32)
