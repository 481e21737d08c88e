"""IVF index construction orchestration.

Device-side counterpart of ``build_ivf_index``
(/root/reference/src/ivf/index.rs:152-214): default ``n_clusters = ceil(sqrt n)``,
5%/100k training sample, k-means on the sample, then one full-data assignment
pass to build the inverted lists (sample-trained, full-assigned — the
reference's second assignment pass at :193-206).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ValidationError
from ..types import Embeddings
from .ivf import IvfIndex
from .kmeans import (
    KMeansParams,
    assign_clusters,
    default_n_clusters,
    k_means,
    sample_indices_host,
    train_sample_size,
)


@dataclasses.dataclass(frozen=True)
class IvfBuildConfig:
    """Mirror of IvfBuildConfig (/root/reference/src/ivf/index.rs:46-50)."""

    n_clusters: int | None = None
    max_iters: int = 20
    seed: int = 42
    block_rows: int = 8192
    #: Host->device wire dtype for the build transfer — the build's
    #: dominant stage on remote-attached TPUs (round-4 stage attribution,
    #: scripts/chip_session_r4h.py: the tunnel runs 20-80 MB/s, so the
    #: 1M×1024 matrix alone is 25-100 s at bf16). "bfloat16" halves the
    #: f32 bytes at a 2^-8 input rounding; "int8" quarters them
    #: (symmetric per-row quantization, ~2^-7 relative rounding). The
    #: rounding perturbs only the PARTITION (centroids/assignments);
    #: serving re-scores at storage precision regardless. All training
    #: math stays f32 on device and results remain deterministic for a
    #: given config. "auto" (default) resolves to bfloat16 on the TPU
    #: backend and float32 elsewhere (CPU tests and reference-parity
    #: comparisons stay exact); pass "float32" explicitly for
    #: exact-input training on TPU, "int8" for the fastest build.
    transfer_dtype: str = "auto"

    def __post_init__(self) -> None:
        if self.max_iters <= 0:
            raise ValidationError("max_iters must be > 0")
        if self.n_clusters is not None and self.n_clusters <= 0:
            raise ValidationError("n_clusters must be > 0")
        if self.transfer_dtype not in ("auto", "float32", "bfloat16", "int8"):
            raise ValidationError(
                "transfer_dtype must be 'auto', 'float32', 'bfloat16' "
                "or 'int8'"
            )


def resolve_transfer_dtype(config: IvfBuildConfig) -> str:
    """Resolve the "auto" wire dtype: bfloat16 on TPU, float32 elsewhere."""
    if config.transfer_dtype != "auto":
        return config.transfer_dtype
    return "bfloat16" if jax.default_backend() == "tpu" else "float32"


def _encode_int8(part: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 wire quantization (host side).

    Row-local, so chunked (staged) and full-matrix (unstaged) encoding
    produce identical codes. Zero rows get scale 1 / codes 0. Matches
    the device-side serving quantizer (query/device._quantize_rows_i8)."""
    a = np.max(np.abs(part), axis=1)
    s = np.where(a > 0, a / 127.0, 1.0).astype(np.float32)
    codes = np.clip(np.rint(part / s[:, None]), -127, 127).astype(np.int8)
    return codes, s


def _dequant_i8(codes, scales):
    """codes int8 [n,d] * per-row scale -> f32 [n,d] (device program)."""
    return codes.astype(jnp.float32) * scales[:, None]


def build_ivf_index(
    embeddings: Embeddings, config: IvfBuildConfig | None = None
) -> IvfIndex:
    config = config or IvfBuildConfig()
    n = embeddings.row_count
    if n == 0:
        raise ValidationError("Cannot build IVF index with zero vectors")

    n_clusters = (
        config.n_clusters if config.n_clusters is not None else default_n_clusters(n)
    )
    if n_clusters > n:
        raise ValidationError("n_clusters cannot exceed number of vectors")

    from ..utils.profiling import stage

    sample_size = train_sample_size(n, n_clusters)
    params = KMeansParams(
        n_clusters=n_clusters,
        max_iters=config.max_iters,
        seed=config.seed,
        block_rows=config.block_rows,
    )
    wire_mode = resolve_transfer_dtype(config)
    if wire_mode == "bfloat16":
        import ml_dtypes

        wire = ml_dtypes.bfloat16

    def encode(part: np.ndarray):
        if wire_mode == "bfloat16":
            return part.astype(wire)
        if wire_mode == "int8":
            return _encode_int8(part)
        return part

    data = np.ascontiguousarray(embeddings.data, dtype=np.float32)
    if wire_mode == "int8":
        codes_h, scales_h = _encode_int8(data)
    if sample_size == n:
        with stage("build.transfer"):
            if wire_mode == "int8":
                x = _dequant_i8(jnp.asarray(codes_h), jnp.asarray(scales_h))
            else:
                x = jnp.asarray(encode(data)).astype(jnp.float32)
        with stage("build.train"):
            centroids, _ = k_means(x, params)
    else:
        # Deterministic 5% sample without replacement
        # (/root/reference/src/ivf/index.rs:222-242). Indices are drawn on
        # host (device sampling measured at 157 s for n=1.2M on the
        # tunneled v5e; the draw needs no vector data) and the sample rows
        # are gathered on HOST, so training ships ~5% of the bytes first
        # and the full-matrix transfer streams while Lloyd runs (device_put
        # is async; only the assignment pass below depends on it).
        idx = sample_indices_host(config.seed ^ 0x5A5A5A5A, n, sample_size)
        with stage("build.sample_transfer"):
            if wire_mode == "int8":
                sample = _dequant_i8(
                    jnp.asarray(codes_h[idx]), jnp.asarray(scales_h[idx])
                )
            else:
                sample = jnp.asarray(encode(data[idx])).astype(jnp.float32)
        with stage("build.transfer_enqueue"):
            # Wire payloads stay in wire dtype; no dependent PROGRAM is
            # enqueued here — the device executes programs in dispatch
            # order, so a dequant/upcast enqueued now would make k_means
            # below wait for the full transfer (assign upcasts itself).
            if wire_mode == "int8":
                xc = jax.device_put(codes_h)
                xs = jax.device_put(scales_h)
            else:
                x = jax.device_put(encode(data))
        with stage("build.train"):
            centroids, _ = k_means(sample, params)
        if wire_mode == "int8":
            x = _dequant_i8(xc, xs)

    # The reference always runs a fresh full-data assignment pass to build the
    # inverted lists, even when k-means saw every row (:193-206).
    with stage("build.assign"):
        assignments = assign_clusters(x, centroids, config.block_rows)
    return IvfIndex.from_assignments(centroids, assignments)


def build_ivf_index_staged(
    path,
    embedding_column,
    config: IvfBuildConfig | None = None,
    batch_rows: int = 131072,
    normalize: bool = False,
) -> IvfIndex:
    """Pipelined build: Parquet decode overlaps the host->HBM transfer.

    Each decoded chunk is ``device_put`` immediately (async), so the wire
    streams while the next chunk decodes — the build approaches
    max(decode, transfer) + train + assign instead of their sum. Stage
    attribution (round-4, scripts/chip_session_r4h.py): the wire is the
    dominant stage (2 GB bf16 at the tunnel's 20-80 MB/s = 25-100 s,
    window-dependent) and Lloyd itself is ~2 s warm, so a sample-first
    schedule was measured and REJECTED — it hides the 2 s train but
    forfeits the ~26 s decode/wire overlap (the device also executes
    programs in dispatch order, so anything enqueued after the concat
    waits for the full transfer regardless). ``build.transfer_drain``
    blocks on the assembled array so train/assign times are honest.

    Same deterministic result as the unstaged path: the training sample
    is gathered (on device) at the same host-drawn indices, and the f32
    upcast/normalize are row-local.
    """
    from ..utils.profiling import stage
    from .streaming import iter_embedding_batches

    config = config or IvfBuildConfig()
    wire_mode = resolve_transfer_dtype(config)
    if wire_mode == "bfloat16":
        import ml_dtypes

        wire = ml_dtypes.bfloat16
    with stage("build.decode+transfer"):
        chunks = []
        scale_chunks = []
        rows = 0
        dim = None
        for part in iter_embedding_batches(path, embedding_column, batch_rows):
            dim = part.shape[1] if dim is None else dim
            if part.shape[1] != dim:
                raise ValidationError("Inconsistent embedding dimensions")
            rows += len(part)
            if wire_mode == "bfloat16":
                part = part.astype(wire)  # half the tunnel bytes
            elif wire_mode == "int8":
                part, s = _encode_int8(part)  # quarter the tunnel bytes
                scale_chunks.append(jax.device_put(s))
            chunks.append(jax.device_put(part))  # async; overlaps next decode
        if rows == 0:
            raise ValidationError("Cannot build IVF index with zero vectors")
        # Keep the resident array in WIRE dtype: the sample gather is
        # cheaper in bf16 (upcast after — exact), and assign_clusters
        # upcasts internally; nothing needs a second full-size f32 copy.
        # (int8 dequants once here — its sample gather needs f32 anyway
        # and the dequant waits on the same full transfer the train
        # sample does, so nothing stalls that wasn't already blocked.)
        x = jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]
        del chunks
        if wire_mode == "int8":
            xs = (
                jnp.concatenate(scale_chunks)
                if len(scale_chunks) > 1
                else scale_chunks[0]
            )
            x = _dequant_i8(x, xs)
            del scale_chunks
    with stage("build.transfer_drain"):
        # The decode+transfer stage above only times the ENQUEUE; block on
        # the assembled array so the train/assign stages below are honest
        # (round-4: a sick 20 MB/s window made the wire tail masquerade as
        # a 111 s "train" stage).
        np.asarray(jax.device_get(x[:1, :1]))

    n = rows
    n_clusters = (
        config.n_clusters if config.n_clusters is not None else default_n_clusters(n)
    )
    if n_clusters > n:
        raise ValidationError("n_clusters cannot exceed number of vectors")
    sample_size = train_sample_size(n, n_clusters)
    params = KMeansParams(
        n_clusters=n_clusters,
        max_iters=config.max_iters,
        seed=config.seed,
        block_rows=config.block_rows,
    )

    def upcast_norm(a):
        a = a.astype(jnp.float32)  # all training math stays f32
        if normalize:
            norms = jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True))
            a = a / jnp.maximum(norms, 1e-30)
        return a

    with stage("build.train"):
        if sample_size == n:
            centroids, _ = k_means(upcast_norm(x), params)
        else:
            idx = sample_indices_host(config.seed ^ 0x5A5A5A5A, n, sample_size)
            sample = upcast_norm(jnp.take(x, jnp.asarray(idx), axis=0))
            centroids, _ = k_means(sample, params)
    with stage("build.assign"):
        xa = upcast_norm(x) if normalize else x  # assign upcasts f32 itself
        assignments = assign_clusters(xa, centroids, config.block_rows)
    return IvfIndex.from_assignments(centroids, assignments)
