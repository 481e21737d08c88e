"""IVF index construction orchestration.

Device-side counterpart of ``build_ivf_index``
(/root/reference/src/ivf/index.rs:152-214): default ``n_clusters = ceil(sqrt n)``,
5%/100k training sample, k-means on the sample, then one full-data assignment
pass to build the inverted lists (sample-trained, full-assigned — the
reference's second assignment pass at :193-206).
"""

from __future__ import annotations

import dataclasses
import os

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
    #: Where the full-data nearest-centroid pass runs for the STAGED
    #: (file-based) build. "device" ships the whole matrix and assigns on
    #: the TPU; "host" ships only the training sample (~25-100 MB vs
    #: 1-4 GB) and assigns with a chunked BLAS sgemm + native argmin on
    #: the host — the same reduced-L2 argmin as the device kernel
    #: (kmeans._assign_blocks), so partitions agree except at f32
    #: rounding-boundary ties. On a remote-attached TPU the wire is the
    #: build's floor (20-80 MB/s, sessions r4j-r4l), so "auto" resolves
    #: to "host" on the TPU backend; everywhere else it stays "device"
    #: (exact staged==unstaged parity for CPU tests). Ignored by the
    #: in-memory ``build_ivf_index`` (its data has no decode stage to
    #: keep on host).
    assign_backend: str = "auto"

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
        if self.assign_backend not in ("auto", "device", "host"):
            raise ValidationError(
                "assign_backend must be 'auto', 'device' or 'host'"
            )


def resolve_transfer_dtype(config: IvfBuildConfig) -> str:
    """Resolve the "auto" wire dtype: bfloat16 on TPU, float32 elsewhere."""
    if config.transfer_dtype != "auto":
        return config.transfer_dtype
    return "bfloat16" if jax.default_backend() == "tpu" else "float32"


def resolve_assign_backend(config: IvfBuildConfig) -> str:
    """Resolve the "auto" assignment backend for the staged build: host
    on TPU (skip the 1-4 GB bulk wire; see IvfBuildConfig.assign_backend),
    device elsewhere."""
    if config.assign_backend != "auto":
        return config.assign_backend
    return "host" if jax.default_backend() == "tpu" else "device"


_HOST_AMX_BF16: bool | None = None


def _host_amx_bf16() -> bool:
    """Whether the host CPU advertises AMX-BF16 and torch can drive it.

    oneDNN (torch's CPU matmul backend) dispatches bf16 matmuls to the
    AMX tile units when present (`brg_matmul:*_amx`, verified on this
    host) — measured 306 GF/s vs the 59 GF/s numpy f32 sgemm in the same
    window (the f32 path is AT the AVX-512 f32 FMA peak, so no f32
    tuning can close that gap)."""
    global _HOST_AMX_BF16
    if _HOST_AMX_BF16 is None:
        ok = False
        try:
            with open("/proc/cpuinfo") as f:
                ok = "amx_bf16" in f.read()
            if ok:
                import torch  # noqa: F401
        except Exception:  # noqa: BLE001
            ok = False
        _HOST_AMX_BF16 = ok
    return _HOST_AMX_BF16


def resolve_host_gemm(wire_mode: str) -> str:
    """Resolve the host-assign GEMM engine: "bf16" (certified — AMX tile
    units + exact f32 re-score of margin-ambiguous rows, partitions
    equal the f32 sgemm's; see _assign_clusters_host) when the hardware
    supports it and the build is already on a lossy wire, else "f32".
    The wire gate is conservatism, not numerics — the certified bf16
    path produces f32-identical assignments — it just keeps
    explicitly-exact builds (transfer_dtype="float32") on the one-pass
    f32 BLAS with zero moving parts. Override with
    PQVECTOR_TPU_HOST_GEMM=bf16|f32."""
    env = os.environ.get("PQVECTOR_TPU_HOST_GEMM", "auto")
    if env in ("bf16", "f32"):
        return env
    lossy = wire_mode in ("bfloat16", "int8")
    return "bf16" if (lossy and _host_amx_bf16()) else "f32"


def _assign_clusters_host(
    parts: list[np.ndarray],
    centroids: np.ndarray,
    block_rows: int = 65536,
    normalize: bool = False,
    gemm: str = "f32",
) -> np.ndarray:
    """Nearest-centroid assignment on the HOST: chunked GEMM + native
    first-min argmin over the reduced L2 form ``|c_j|^2 - 2 x.c_j`` —
    the same form and tie order as the device kernel
    (kmeans._assign_blocks). Either way this beats the 25-100 s bulk
    wire. ``parts`` is the decoded chunk list (never concatenated: the
    4 GB host concat alone measured 33 s, session r4h).

    ``gemm="f32"``: one BLAS sgemm per block (~137 GF/s single-core solo
    — AT the AVX-512 f32 FMA peak, so no f32 tuning remains).

    ``gemm="bf16"``: CERTIFIED bf16 — the score matmul runs on
    torch/oneDNN's AMX bf16 tile kernels (measured 306 vs 59 GF/s in the
    same contended window), then every row whose top-2 margin falls
    inside the bf16 error envelope is re-scored with the exact f32
    sgemm, so the returned partition EQUALS the f32 path's (the same
    margin-certificate design as query/device._exact_cert_impl).
    Envelope: bf16 rounds inputs at eps=2^-9 and the score output once
    more, so |red_bf16 - red_f32| <= 2*(2^-8 + 2^-9)*|x||c_j| per
    reduced score; rows certify when margin > 2 * 2^-5 * |x| * Cmax
    (>= 3x headroom, also covering the f32 paths' own accumulation
    differences). Ambiguous rows (margin-dependent; ~0.5-3% on
    clustered data) pay one exact sub-block sgemm."""
    import ctypes

    from ..io.native import load as _native_load

    c = np.ascontiguousarray(centroids, dtype=np.float32)
    ct = c.T.copy()  # [d, k] contiguous for sgemm
    bias = (c * c).sum(axis=1).astype(np.float32)  # |c_j|^2
    k = c.shape[0]
    cmax = float(np.sqrt(bias.max())) if k else 0.0
    torch_w = None
    if gemm == "bf16":
        try:
            import torch

            torch_w = torch.from_numpy(ct).bfloat16()  # [d, k] packed once
        except Exception:  # noqa: BLE001
            torch_w = None  # fall back to the f32 sgemm
    lib = _native_load()
    use_native = lib is not None and hasattr(lib, "pqv_assign_argmin")
    out_parts = []
    for part in parts:
        part = np.ascontiguousarray(part, dtype=np.float32)
        n = part.shape[0]
        assign = np.empty(n, np.int32)
        for lo in range(0, n, block_rows):
            hi = min(lo + block_rows, n)
            blockv = part[lo:hi]
            if normalize:
                # Host f32 row norms (cosine metric); only ties at f32
                # rounding boundaries can differ from the device pass.
                norms = np.sqrt((blockv * blockv).sum(axis=1, keepdims=True))
                blockv = blockv / np.maximum(norms, np.float32(1e-30))
            if torch_w is not None:
                import torch

                blockv = np.ascontiguousarray(blockv)
                xb = torch.from_numpy(blockv).bfloat16()
                sb = xb @ torch_w  # [b, k] bf16 scores (AMX)
                xn = np.sqrt(np.einsum("nd,nd->n", blockv, blockv))
                env = np.ascontiguousarray(
                    np.float32(2.0 * 2.0**-5 * cmax) * xn
                )
                idx = amb = None
                if use_native and hasattr(lib, "pqv_assign_margin_bf16"):
                    su = sb.view(torch.int16).numpy()  # zero-copy bf16 bits
                    idx = np.empty(hi - lo, np.int32)
                    ambu = np.empty(hi - lo, np.uint8)
                    rc = lib.pqv_assign_margin_bf16(
                        su.ctypes.data_as(ctypes.c_void_p),
                        hi - lo,
                        k,
                        bias.ctypes.data_as(ctypes.c_void_p),
                        env.ctypes.data_as(ctypes.c_void_p),
                        idx.ctypes.data_as(ctypes.c_void_p),
                        ambu.ctypes.data_as(ctypes.c_void_p),
                    )
                    if rc == 0:
                        amb = ambu.astype(bool)
                    else:
                        idx = None
                if idx is None:  # numpy fallback (no native library)
                    red = sb.float().numpy()
                    red *= np.float32(-2.0)
                    red += bias[None, :]
                    rn = np.arange(hi - lo)
                    idx = np.argmin(red, axis=1).astype(np.int32)
                    m1 = red[rn, idx]
                    red[rn, idx] = np.inf
                    m2 = red.min(axis=1)
                    amb = (m2 - m1) <= env
                if amb.any():
                    sub = blockv[amb] @ ct  # exact f32 re-score
                    if use_native:
                        sub_assign = np.empty(int(amb.sum()), np.int32)
                        rc = lib.pqv_assign_argmin(
                            sub.ctypes.data_as(ctypes.c_void_p),
                            sub.shape[0],
                            k,
                            bias.ctypes.data_as(ctypes.c_void_p),
                            sub_assign.ctypes.data_as(ctypes.c_void_p),
                        )
                        if rc != 0:
                            sub_assign = np.argmin(
                                bias - 2.0 * sub, axis=1
                            ).astype(np.int32)
                    else:
                        sub_assign = np.argmin(
                            bias - 2.0 * sub, axis=1
                        ).astype(np.int32)
                    idx[amb] = sub_assign
                assign[lo:hi] = idx
                continue
            scores = blockv @ ct  # [b, k] f32 sgemm
            if use_native:
                rc = lib.pqv_assign_argmin(
                    scores.ctypes.data_as(ctypes.c_void_p),
                    hi - lo,
                    k,
                    bias.ctypes.data_as(ctypes.c_void_p),
                    assign[lo:hi].ctypes.data_as(ctypes.c_void_p),
                )
                if rc != 0:
                    assign[lo:hi] = np.argmin(bias - 2.0 * scores, axis=1)
            else:
                assign[lo:hi] = np.argmin(bias - 2.0 * scores, axis=1)
        out_parts.append(assign)
    return np.concatenate(out_parts) if len(out_parts) > 1 else out_parts[0]


def _encode_int8_np(part: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Numpy oracle for the symmetric per-row int8 wire quantization.

    Row-local, so chunked (staged) and full-matrix (unstaged) encoding
    produce identical codes. Zero rows get scale 1 / codes 0. Matches
    the device-side serving quantizer (query/device._quantize_rows_i8)."""
    a = np.max(np.abs(part), axis=1)
    s = np.where(a > 0, a / 127.0, 1.0).astype(np.float32)
    codes = np.clip(np.rint(part / s[:, None]), -127, 127).astype(np.int8)
    return codes, s


def _cast_bf16(part: np.ndarray) -> np.ndarray:
    """f32 -> bfloat16 host cast: native RNE (GIL-released) with the
    ml_dtypes astype as fallback. Bit-identical
    (tests/test_staged_build.py::test_native_bf16_cast_matches_mldtypes)."""
    import ml_dtypes

    from ..io.native import load as _native_load

    lib = _native_load()
    if lib is None or not hasattr(lib, "pqv_cast_bf16"):
        return part.astype(ml_dtypes.bfloat16)
    import ctypes

    part = np.ascontiguousarray(part, dtype=np.float32)
    out = np.empty(part.shape, np.uint16)
    rc = lib.pqv_cast_bf16(
        part.ctypes.data_as(ctypes.c_void_p),
        part.size,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return part.astype(ml_dtypes.bfloat16)
    return out.view(ml_dtypes.bfloat16)


def _encode_int8(part: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int8 wire quantization: native (GIL-released — the numpy passes
    cost 29 s of GIL-contended time inside the threaded build loop,
    session r4k) with the numpy oracle as fallback. Bit-identical
    (tests/test_staged_build.py::test_native_int8_encode_matches_oracle)."""
    from ..io.native import load as _native_load

    lib = _native_load()
    if lib is None or not hasattr(lib, "pqv_quantize_i8"):
        return _encode_int8_np(part)
    import ctypes

    part = np.ascontiguousarray(part, dtype=np.float32)
    n, d = part.shape
    codes = np.empty((n, d), np.int8)
    scales = np.empty(n, np.float32)
    rc = lib.pqv_quantize_i8(
        part.ctypes.data_as(ctypes.c_void_p),
        n,
        d,
        codes.ctypes.data_as(ctypes.c_void_p),
        scales.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return _encode_int8_np(part)
    return codes, scales


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

    def encode(part: np.ndarray):
        if wire_mode == "bfloat16":
            return _cast_bf16(part)
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

    A bounded-queue worker thread owns wire-encode + ``device_put`` for
    each decoded chunk (through the tunnel, device_put's host-side
    serialization/backpressure BLOCKS the caller — session r4j measured
    the single-threaded loop fully serial), so the wire streams while
    the main thread decodes the next chunk and the build approaches
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

    With ``assign_backend="host"`` (the TPU-backend default — sessions
    r4j-r4l pinned the bulk wire as the build's floor) the full matrix
    never crosses the wire at all: only the training sample ships (the
    wire-encode is row-local, so the shipped sample bit-matches the
    device path's gather), training runs on device, and the assignment
    pass runs on host over the decoded chunks. Centroids are identical;
    assignments read the EXACT decoded f32 rows (under a reduced wire
    dtype that is strictly better than the device pass, which assigns
    the wire-rounded resident array; at f32 wire the paths agree up to
    rounding-boundary ties).
    """
    from ..utils.profiling import stage
    from .streaming import iter_embedding_batches

    config = config or IvfBuildConfig()
    wire_mode = resolve_transfer_dtype(config)
    assign_backend = resolve_assign_backend(config)
    # The resolved pair determines the partition: host assignment reads
    # exact decoded f32 rows while the device pass assigns wire-rounded
    # ones, so the same data + config can partition differently across
    # backends. Log it so cross-environment partition diffs are
    # attributable (ADVICE r4).
    import logging

    logging.getLogger("pqvector_tpu.build").info(
        "staged build: transfer_dtype=%s assign_backend=%s host_gemm=%s "
        "backend=%s",
        wire_mode, assign_backend,
        resolve_host_gemm(wire_mode) if assign_backend == "host" else "-",
        jax.default_backend(),
    )
    if assign_backend == "host":
        return _build_staged_host_assign(
            path, embedding_column, config, batch_rows, normalize, wire_mode
        )
    with stage("build.decode+transfer"):
        # device_put is only nominally async through the tunnel: its
        # host-side serialization + transport backpressure block the
        # caller (session r4j: decode 26 s + wire ran SERIAL, 63 s loop
        # at bf16). A single bounded-queue worker owns encode+put so the
        # wire streams while the main thread decodes the next chunk;
        # one worker keeps chunk order. build.wire_encode/build.put_wait
        # accumulate the worker's split so chip sessions can attribute.
        import queue as _queue
        import threading
        import time as _time

        from ..utils.profiling import add_stage_time, current_records

        caller_records = current_records()
        chunks = []
        scale_chunks = []
        rows = 0
        dim = None
        work: _queue.Queue = _queue.Queue(maxsize=2)
        worker_err: list[BaseException] = []

        def _encode_put() -> None:
            enc_s = put_s = 0.0
            try:
                while True:
                    part = work.get()
                    if part is None:
                        return
                    t0 = _time.perf_counter()
                    if wire_mode == "bfloat16":
                        part = _cast_bf16(part)  # half the tunnel bytes
                    elif wire_mode == "int8":
                        part, s = _encode_int8(part)  # quarter the bytes
                    t1 = _time.perf_counter()
                    enc_s += t1 - t0
                    if wire_mode == "int8":
                        scale_chunks.append(jax.device_put(s))
                    chunks.append(jax.device_put(part))
                    put_s += _time.perf_counter() - t1
            except BaseException as e:  # surfaced on the main thread
                worker_err.append(e)
            finally:
                add_stage_time("build.wire_encode", enc_s, caller_records)
                add_stage_time("build.put_wait", put_s, caller_records)

        def _put_checked(item) -> bool:
            # A plain blocking put deadlocks if the worker died with the
            # queue full (nothing drains it); poll the error list instead.
            while not worker_err:
                try:
                    work.put(item, timeout=0.5)
                    return True
                except _queue.Full:
                    continue
            return False

        t = threading.Thread(target=_encode_put, name="pqvector-wire")
        t.start()
        try:
            for part in iter_embedding_batches(path, embedding_column, batch_rows):
                dim = part.shape[1] if dim is None else dim
                if part.shape[1] != dim:
                    raise ValidationError("Inconsistent embedding dimensions")
                rows += len(part)
                if not _put_checked(part):
                    break
        finally:
            _put_checked(None)
            t.join()
        if worker_err:
            raise worker_err[0]
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


def _build_staged_host_assign(
    path,
    embedding_column,
    config: IvfBuildConfig,
    batch_rows: int,
    normalize: bool,
    wire_mode: str,
) -> IvfIndex:
    """Staged build, ``assign_backend="host"``: ship ONLY the training
    sample; train on device; assign on host (see build_ivf_index_staged).

    The wire drops from the full matrix (1-4 GB) to the sample
    (~25-100 MB) plus the centroid fetch (~4 MB), so the build no longer
    floors on tunnel weather: reference-default ≈ decode + ~2 s train +
    ~16 s host assign in ANY window (sessions r4j-r4l measured the bulk
    wire alone at 25-100+ s)."""
    from ..utils.profiling import stage
    from .streaming import iter_embedding_batches

    with stage("build.decode"):
        parts = []
        rows = 0
        dim = None
        for part in iter_embedding_batches(path, embedding_column, batch_rows):
            dim = part.shape[1] if dim is None else dim
            if part.shape[1] != dim:
                raise ValidationError("Inconsistent embedding dimensions")
            rows += len(part)
            parts.append(np.ascontiguousarray(part, dtype=np.float32))
        if rows == 0:
            raise ValidationError("Cannot build IVF index with zero vectors")

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

    with stage("build.sample_transfer"):
        if sample_size == n:
            sample_h = (
                np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            )
        else:
            # Gather the host-drawn sample rows across chunk boundaries,
            # preserving idx order (the device path's take() order).
            idx = sample_indices_host(config.seed ^ 0x5A5A5A5A, n, sample_size)
            starts = np.zeros(len(parts) + 1, np.int64)
            np.cumsum([len(p) for p in parts], out=starts[1:])
            cid = np.searchsorted(starts, idx, side="right") - 1
            sample_h = np.empty((len(idx), dim), np.float32)
            for j, p in enumerate(parts):
                m = cid == j
                if m.any():
                    sample_h[m] = p[idx[m] - starts[j]]
        # Wire-encode the RAW sample (row-local: identical bits to
        # encoding the full matrix and gathering on device), upcast to
        # f32 and normalize ON DEVICE — the exact op order of the
        # device-assign path, so centroids match it bit-for-bit.
        if wire_mode == "int8":
            codes, scales = _encode_int8(sample_h)
            sample = _dequant_i8(jnp.asarray(codes), jnp.asarray(scales))
        elif wire_mode == "bfloat16":
            sample = jnp.asarray(_cast_bf16(sample_h)).astype(jnp.float32)
        else:
            sample = jnp.asarray(sample_h)
        if normalize:
            norms = jnp.sqrt(jnp.sum(sample * sample, axis=1, keepdims=True))
            sample = sample / jnp.maximum(norms, 1e-30)
    with stage("build.train"):
        centroids_dev, _ = k_means(sample, params)
        centroids = np.asarray(centroids_dev)  # ~4 MB fetch
    with stage("build.assign"):
        assignments = _assign_clusters_host(
            parts, centroids, normalize=normalize,
            gemm=resolve_host_gemm(wire_mode),
        )
    return IvfIndex.from_assignments(centroids, assignments)
