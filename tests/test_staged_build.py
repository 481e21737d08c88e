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


def test_staged_worker_error_propagates(tmp_path, monkeypatch):
    # A failure on the wire worker (encode/device_put) must surface as the
    # original exception on the caller, not hang the bounded queue.
    import pqvector_tpu.index.build as B

    emb = _data(n=2000, d=8)
    path = str(tmp_path / "err.parquet")
    write_embedding_parquet(path, emb, row_group_size=250)

    def boom(part):
        raise RuntimeError("wire worker boom")

    monkeypatch.setattr(B, "_encode_int8", boom)
    cfg = IvfBuildConfig(n_clusters=8, seed=1, transfer_dtype="int8")
    with pytest.raises(RuntimeError, match="wire worker boom"):
        build_ivf_index_staged(path, "embedding", cfg, batch_rows=100)


def test_native_int8_encode_matches_oracle():
    # The native quantizer must be BIT-identical to the numpy oracle —
    # staged/unstaged and native/python builds must agree exactly.
    from pqvector_tpu.index.build import _encode_int8, _encode_int8_np
    from pqvector_tpu.io.native import load

    if load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(12)
    part = rng.standard_normal((700, 33)).astype(np.float32) * 100
    part[5] = 0.0  # zero row -> scale 1, codes 0
    part[6, 0] = np.float32(3.2e38)  # near-f32-max magnitudes
    c_n, s_n = _encode_int8(part)
    c_o, s_o = _encode_int8_np(part)
    np.testing.assert_array_equal(s_n, s_o)
    np.testing.assert_array_equal(c_n, c_o)


def test_native_bf16_cast_matches_mldtypes():
    # The native RNE cast must match ml_dtypes bit-for-bit, including
    # inf, NaN (quieted, never rounded into inf), denormals and the
    # rounding boundary cases.
    import ml_dtypes

    from pqvector_tpu.index.build import _cast_bf16
    from pqvector_tpu.io.native import load

    if load() is None or not hasattr(load(), "pqv_cast_bf16"):
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.standard_normal(4096).astype(np.float32) * 1e3,
        np.array([0.0, -0.0, np.inf, -np.inf, np.nan, -np.nan,
                  1e-40, -1e-40, 3.4e38, -3.4e38,
                  1.0039062, 1.0039063, 1.0117186, 1.0117188], np.float32),
    ]).reshape(-1, 2)
    native = _cast_bf16(vals)
    oracle = vals.astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(
        native.view(np.uint16), oracle.view(np.uint16)
    )


@pytest.mark.parametrize("wire", ["float32", "bfloat16", "int8"])
def test_host_assign_matches_device(tmp_path, wire):
    # assign_backend="host" must produce the same centroids BIT-FOR-BIT
    # (same sample values, same device training). Assignments: the host
    # pass reads the EXACT decoded f32 rows — wire rounding never
    # touches it (the device path assigns the wire-rounded resident
    # array), so host assignments are pinned against the f64
    # exact-nearest-centroid truth instead; at f32 wire the two paths
    # see identical data and must agree exactly ON THIS CPU BACKEND
    # (on real TPU the device matmul is bf16-MXU: chip-measured accuracy
    # vs f64 truth is host 1.0000 / device 0.9983 — host assign is
    # strictly MORE accurate there; scripts/verify logs, round 4).
    emb = _data()
    path = str(tmp_path / "h.parquet")
    write_embedding_parquet(path, emb, row_group_size=1500)
    dev = build_ivf_index_staged(
        path, "embedding",
        IvfBuildConfig(n_clusters=64, seed=11, transfer_dtype=wire,
                       assign_backend="device"),
        batch_rows=700,
    )
    host = build_ivf_index_staged(
        path, "embedding",
        IvfBuildConfig(n_clusters=64, seed=11, transfer_dtype=wire,
                       assign_backend="host"),
        batch_rows=700,
    )
    np.testing.assert_array_equal(host.centroids, dev.centroids)
    if wire == "float32":
        np.testing.assert_array_equal(host.row_ids, dev.row_ids)
        np.testing.assert_array_equal(host.list_offsets, dev.list_offsets)
    # Exact f64 truth: nearest centroid per raw row.
    d2 = ((emb[:, None, :].astype(np.float64)
           - host.centroids[None].astype(np.float64)) ** 2).sum(-1)
    truth = np.argmin(d2, axis=1)
    lab = np.empty(len(emb), np.int64)
    for c in range(host.n_clusters):
        lab[host.cluster_rows(c)] = c
    assert (lab == truth).mean() > 0.999


def test_host_assign_normalized(tmp_path):
    # Cosine metric: sample normalization runs on device (same op order
    # as the device path), per-chunk host normalization for assignment.
    emb = _data()
    path = str(tmp_path / "hn.parquet")
    write_embedding_parquet(path, emb, row_group_size=1500)
    dev = build_ivf_index_staged(
        path, "embedding",
        IvfBuildConfig(n_clusters=32, seed=4, assign_backend="device"),
        batch_rows=700, normalize=True,
    )
    host = build_ivf_index_staged(
        path, "embedding",
        IvfBuildConfig(n_clusters=32, seed=4, assign_backend="host"),
        batch_rows=700, normalize=True,
    )
    np.testing.assert_array_equal(host.centroids, dev.centroids)
    # Host vs device normalization can differ at rounding-boundary ties;
    # on blob data the partitions should agree everywhere.
    np.testing.assert_array_equal(host.row_ids, dev.row_ids)


def test_host_assign_full_sample_branch(tmp_path):
    emb = _data(n=300, d=8)
    path = str(tmp_path / "hs.parquet")
    write_embedding_parquet(path, emb, row_group_size=100)
    dev = build_ivf_index_staged(
        path, "embedding",
        IvfBuildConfig(n_clusters=8, seed=5, assign_backend="device"),
        batch_rows=128,
    )
    host = build_ivf_index_staged(
        path, "embedding",
        IvfBuildConfig(n_clusters=8, seed=5, assign_backend="host"),
        batch_rows=128,
    )
    np.testing.assert_array_equal(host.centroids, dev.centroids)
    np.testing.assert_array_equal(host.row_ids, dev.row_ids)


def test_assign_backend_validation():
    with pytest.raises(Exception):
        IvfBuildConfig(assign_backend="gpu")
    from pqvector_tpu.index.build import resolve_assign_backend
    # CPU backend in tests -> device (exact staged==unstaged parity).
    assert resolve_assign_backend(IvfBuildConfig()) == "device"
    assert resolve_assign_backend(
        IvfBuildConfig(assign_backend="host")) == "host"


def test_host_gemm_bf16_matches_f32_exactly():
    # The certified bf16 host GEMM (AMX matmul + exact f32 re-score of
    # margin-ambiguous rows) must return the f32 sgemm's partition
    # EXACTLY — the margin certificate covers every bf16 rounding — and
    # be deterministic. Centroids drawn from the data with tiny offsets
    # deliberately create near-tie rows that exercise the re-score path.
    # (The code path runs on any host — without AMX it is merely slower —
    # so this exercises the real torch route, not a stub.)
    pytest.importorskip("torch")
    from pqvector_tpu.index.build import _assign_clusters_host

    emb = _data(n=3000, d=32, seed=9)
    rng = np.random.default_rng(1)
    centroids = emb[rng.integers(0, len(emb), 48)] + 0.01
    parts = [emb[:1200], emb[1200:]]
    a32 = _assign_clusters_host(parts, centroids, block_rows=512, gemm="f32")
    ab = _assign_clusters_host(parts, centroids, block_rows=512, gemm="bf16")
    ab2 = _assign_clusters_host(parts, centroids, block_rows=512, gemm="bf16")
    np.testing.assert_array_equal(ab, ab2)  # deterministic
    np.testing.assert_array_equal(a32, ab)  # certified-exact

    # Cosine path too (normalize inside the block loop).
    an32 = _assign_clusters_host(
        parts, centroids, block_rows=512, gemm="f32", normalize=True
    )
    anb = _assign_clusters_host(
        parts, centroids, block_rows=512, gemm="bf16", normalize=True
    )
    np.testing.assert_array_equal(an32, anb)


def test_resolve_host_gemm_gating(monkeypatch):
    from pqvector_tpu.index import build as b

    # Env override wins both ways.
    monkeypatch.setenv("PQVECTOR_TPU_HOST_GEMM", "bf16")
    assert b.resolve_host_gemm("float32") == "bf16"
    monkeypatch.setenv("PQVECTOR_TPU_HOST_GEMM", "f32")
    assert b.resolve_host_gemm("bfloat16") == "f32"
    monkeypatch.delenv("PQVECTOR_TPU_HOST_GEMM")
    # Exact wire keeps the exact f32 sgemm regardless of hardware.
    monkeypatch.setattr(b, "_HOST_AMX_BF16", True)
    assert b.resolve_host_gemm("float32") == "f32"
    assert b.resolve_host_gemm("bfloat16") == "bf16"
    assert b.resolve_host_gemm("int8") == "bf16"
    # No AMX -> f32 even on a lossy wire.
    monkeypatch.setattr(b, "_HOST_AMX_BF16", False)
    assert b.resolve_host_gemm("bfloat16") == "f32"


def test_host_gemm_bf16_numpy_fallback_matches(monkeypatch):
    # Without the native library the certified bf16 path falls back to
    # the numpy margin passes — same exact-vs-f32 contract.
    pytest.importorskip("torch")
    from pqvector_tpu.index import build as b

    monkeypatch.setattr("pqvector_tpu.io.native.load", lambda: None)
    emb = _data(n=2000, d=32, seed=12)
    rng = np.random.default_rng(2)
    centroids = emb[rng.integers(0, len(emb), 40)] + 0.01
    a32 = b._assign_clusters_host([emb], centroids, block_rows=512, gemm="f32")
    ab = b._assign_clusters_host([emb], centroids, block_rows=512, gemm="bf16")
    np.testing.assert_array_equal(a32, ab)


def test_native_assign_margin_bf16_vs_oracle():
    # Fuzz the native one-pass two-min/argmin kernel against a numpy
    # oracle: odd k (vector tail), k<16 (pure scalar), duplicated
    # minima (margin 0 -> always ambiguous), and random envelopes.
    import ctypes

    from pqvector_tpu.io.native import load

    lib = load()
    if lib is None or not hasattr(lib, "pqv_assign_margin_bf16"):
        pytest.skip("native library unavailable")
    import ml_dtypes

    rng = np.random.default_rng(33)
    for n, k in ((64, 1000), (33, 37), (16, 5), (7, 16), (5, 1)):
        sc = rng.standard_normal((n, k)).astype(np.float32)
        if k >= 3:
            sc[0, 2] = sc[0, 0]  # duplicate min candidate
        sb = sc.astype(ml_dtypes.bfloat16)
        bias = (rng.standard_normal(k).astype(np.float32)) ** 2
        env = np.abs(rng.standard_normal(n).astype(np.float32)) * 0.05
        red = bias[None, :] - 2.0 * sb.astype(np.float32)
        oidx = np.argmin(red, axis=1).astype(np.int32)
        m1 = red[np.arange(n), oidx]
        r2 = red.copy()
        r2[np.arange(n), oidx] = np.inf
        m2 = r2.min(axis=1) if k > 1 else np.full(n, np.inf, np.float32)
        oamb = (m2 - m1) <= env
        idx = np.empty(n, np.int32)
        amb = np.empty(n, np.uint8)
        rc = lib.pqv_assign_margin_bf16(
            sb.view(np.uint16).ctypes.data_as(ctypes.c_void_p),
            n, k,
            bias.ctypes.data_as(ctypes.c_void_p),
            env.ctypes.data_as(ctypes.c_void_p),
            idx.ctypes.data_as(ctypes.c_void_p),
            amb.ctypes.data_as(ctypes.c_void_p),
        )
        assert rc == 0
        np.testing.assert_array_equal(idx, oidx, err_msg=f"k={k}")
        np.testing.assert_array_equal(
            amb.astype(bool), oamb, err_msg=f"k={k}"
        )
