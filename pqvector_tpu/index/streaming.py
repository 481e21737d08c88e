"""Streaming build paths for datasets larger than host/device memory.

The reference materializes every embedding in RAM before training
(/root/reference/src/ivf/parquet.rs:216-305) — fine at 1M rows, not at 100M.
The TPU build's scaling story (SURVEY.md §5.7: "scaling the long axis" = n
vectors): train on the bounded 5%/100k sample as usual, then run the full
assignment pass *streamed* — decode Parquet row-group batches, assign each
batch on device, and never hold more than one batch of embeddings.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..errors import FormatError, ValidationError
from ..types import EmbeddingColumn
from .kmeans import assign_clusters


def iter_embedding_batches(
    path: str | os.PathLike,
    embedding_column: EmbeddingColumn,
    batch_rows: int = 131072,
):
    """Yield [rows, dim] float32 matrices from a Parquet vector column.

    Each row group decodes through the native sequential chunk decoder
    when its layout allows (io/pages.decode_rg_matrix_native; batches are
    then row-group sized), with a per-row-group pyarrow fallback — so
    mixed layouts stream correctly with no duplicated rows."""
    import contextlib

    from ..io.native import load as _native_load
    from ..io.pages import (
        decode_rg_matrix_from_buf,
        embedding_leaf_meta,
        rg_chunk_span,
    )
    from ..io.prefetch import iter_prefetched
    from ..io.reader import extract_embeddings

    pf = pq.ParquetFile(path)
    column = str(embedding_column)
    if column not in pf.schema_arrow.names:
        raise ValidationError(f"Column '{column}' not found")

    lm = None
    if _native_load() is not None:
        try:
            lm = embedding_leaf_meta(path, embedding_column)
        except FormatError:
            lm = None
    if lm is not None:
        leaf_idx, leaf, row_groups = lm
        # Background thread reads the next chunk while this one decodes
        # and the device consumes the batch (read + native decode both
        # release the GIL).
        chunks = iter_prefetched(
            path,
            list(enumerate(row_groups)),
            lambda it: rg_chunk_span(it[1], leaf_idx),
        )
        with contextlib.closing(chunks):
            for (g, rg), buf in chunks:
                mat = decode_rg_matrix_from_buf(buf, rg, leaf_idx, leaf)
                if mat is None:
                    tbl = pf.read_row_group(g, columns=[column])
                    mat = extract_embeddings(tbl, embedding_column).data
                if mat.shape[0]:
                    yield mat
        return

    for batch in pf.iter_batches(batch_size=batch_rows, columns=[column]):
        if batch.num_rows == 0:
            continue
        table = pa.Table.from_batches([batch])
        yield extract_embeddings(table, embedding_column).data


def assign_clusters_streaming(
    path: str | os.PathLike,
    embedding_column: EmbeddingColumn,
    centroids: np.ndarray,
    batch_rows: int = 131072,
    block_rows: int = 8192,
) -> np.ndarray:
    """Nearest-centroid assignment over a Parquet file, one batch at a time.

    Equivalent to the reference's full assignment pass
    (/root/reference/src/ivf/index.rs:193-206) with O(batch) host memory.
    """
    parts: list[np.ndarray] = []
    dim = centroids.shape[1]
    for chunk in iter_embedding_batches(path, embedding_column, batch_rows):
        if chunk.shape[1] != dim:
            raise ValidationError(
                "Embedding vectors have inconsistent dimensions"
            )
        parts.append(assign_clusters(chunk, centroids, block_rows))
    if not parts:
        return np.empty(0, dtype=np.int32)
    return np.concatenate(parts)


def sample_embeddings_streaming(
    path: str | os.PathLike,
    embedding_column: EmbeddingColumn,
    sample_size: int,
    total_rows: int,
    seed: int,
    batch_rows: int = 131072,
) -> np.ndarray:
    """Deterministic uniform sample without materializing the full column.

    Draws global row indices up front (host RNG, O(n) memory for indices
    only) and collects them batch by batch.
    """
    rng = np.random.default_rng(seed)
    chosen = np.sort(rng.choice(total_rows, size=sample_size, replace=False))
    out = None
    base = 0
    pos = 0
    for chunk in iter_embedding_batches(path, embedding_column, batch_rows):
        if out is None:
            out = np.empty((sample_size, chunk.shape[1]), dtype=np.float32)
        end = base + chunk.shape[0]
        while pos < sample_size and chosen[pos] < end:
            out[pos] = chunk[chosen[pos] - base]
            pos += 1
        base = end
        if pos >= sample_size:
            break
    if out is None or pos < sample_size:
        raise ValidationError(
            f"File has fewer rows ({base}) than requested sample indices"
        )
    return out
