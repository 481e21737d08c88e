"""K-means on TPU: k-means++ init + Lloyd's iterations as jitted XLA programs.

TPU-native re-design of the reference CPU trainer (components #2/#3/#4 in
SURVEY.md §2, /root/reference/src/ivf/index.rs:323-457). The reference
parallelizes the O(n*k*d) assignment loop over OS threads with a manually
unrolled scalar L2 kernel; here the same math is expressed as MXU matmuls:

* assignment:  ``argmin_k(|c|^2 - 2 x @ c^T)``  (the ``|x|^2`` term is
  constant per row and dropped from the argmin),
* centroid update: one-hot-matmul segment sum ``onehot(a)^T @ x`` — the
  TPU-idiomatic scatter, which also runs on the MXU,
* early exit on zero reassignments via ``lax.while_loop``
  (mirrors /root/reference/src/ivf/index.rs:432-434),
* empty clusters keep their stale centroid
  (mirrors /root/reference/src/ivf/index.rs:446-453),
* k-means++ seeding on a <=50k sub-sample with a ``fori_loop`` of matvec
  min-distance updates (mirrors /root/reference/src/ivf/index.rs:332-390),
* deterministic for a fixed seed via ``jax.random`` (the reference seeds a
  StdRng at /root/reference/src/ivf/index.rs:327; exact streams differ but
  determinism-per-seed is preserved).

Rows are processed in fixed-size blocks (``lax.scan`` over row tiles) so the
``[block, k]`` score tile is the only large intermediate — n can exceed what a
materialized ``[n, k]`` distance matrix would allow.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ValidationError

_INIT_SAMPLE_CAP = 50_000  # /root/reference/src/ivf/index.rs:332
_TRAIN_SAMPLE_CAP = 100_000  # /root/reference/src/ivf/index.rs:173
_TRAIN_SAMPLE_FRACTION = 20  # 5% == n/20, /root/reference/src/ivf/index.rs:172


@dataclasses.dataclass(frozen=True)
class KMeansParams:
    """Mirror of the reference KMeansParams (/root/reference/src/ivf/index.rs:216-220)."""

    n_clusters: int
    max_iters: int = 20
    seed: int = 42
    block_rows: int = 8192


def default_n_clusters(n_vectors: int) -> int:
    """ceil(sqrt(n)) default (/root/reference/src/ivf/index.rs:163-166)."""
    return max(1, math.ceil(math.sqrt(n_vectors)))


def train_sample_size(n_vectors: int, n_clusters: int) -> int:
    """5% capped at 100k, at least n_clusters, at most n
    (/root/reference/src/ivf/index.rs:172-174)."""
    size = max(n_vectors // _TRAIN_SAMPLE_FRACTION, 1)
    size = min(size, _TRAIN_SAMPLE_CAP)
    return min(max(size, n_clusters), n_vectors)


def _block_count(n: int, block: int) -> int:
    return -(-n // block)


@functools.partial(jax.jit, static_argnames=("n", "m"))
def sample_indices(key: jax.Array, n: int, m: int) -> jnp.ndarray:
    """Uniform random m-subset of [0, n) without replacement (device).

    Implemented as argsort over random keys + slice. Both
    ``jax.random.choice(replace=False)`` (14s+ at n=20k) and
    ``lax.top_k`` with large k (minutes at m=50k) are pathological on this
    backend. NOTE: measured 157 s at n=1.2M on the tunneled v5e — prefer
    ``sample_indices_host`` whenever the index choice can happen on host
    (sampling needs no device data, only the row count).
    """
    scores = jax.random.uniform(key, (n,))
    return jnp.argsort(scores)[:m]


def sample_indices_host(seed: int, n: int, m: int) -> np.ndarray:
    """Uniform random m-subset of [0, n) without replacement, on host.

    Index sampling depends only on (seed, n, m) — never on vector data — so
    there is no reason to burn device time on it: numpy's generator does the
    draw in milliseconds where the device argsort path took minutes at
    n=1M+ (see docs/PERFORMANCE.md). Deterministic per seed, mirroring
    ``sample_embeddings`` (/root/reference/src/ivf/index.rs:222-242; the
    reference also seeds a host RNG for this).
    """
    rng = np.random.default_rng(np.uint64(seed))
    return rng.choice(n, size=m, replace=False).astype(np.int64)


def _pad_rows(x: jnp.ndarray, block: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pad rows to a multiple of ``block``; returns (padded, row weights)."""
    n, d = x.shape
    n_pad = _block_count(n, block) * block
    w = jnp.ones((n,), dtype=x.dtype)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        w = jnp.pad(w, (0, n_pad - n))
    return x, w


@functools.partial(jax.jit, static_argnames=("block",))
def _assign_blocks(x: jnp.ndarray, centroids: jnp.ndarray, block: int) -> jnp.ndarray:
    """argmin-distance cluster assignment, scanned over row tiles.

    ``x`` must already be padded to a multiple of ``block``. Only the
    ``[block, k]`` score tile is live at a time.
    """
    n, d = x.shape
    k = centroids.shape[0]
    c_norm = jnp.sum(centroids * centroids, axis=1)  # [k]
    ct = centroids.T  # [d, k]

    def step(_, xb):
        scores = jnp.dot(xb, ct, preferred_element_type=jnp.float32)  # [B, k]
        assign = jnp.argmin(c_norm[None, :] - 2.0 * scores, axis=1)
        return None, assign.astype(jnp.int32)

    xb = x.reshape(n // block, block, d)
    _, assign = jax.lax.scan(step, None, xb)
    return assign.reshape(-1)


@functools.partial(jax.jit, static_argnames=("block", "n_clusters"))
def _lloyd(
    x: jnp.ndarray,
    w: jnp.ndarray,
    centroids0: jnp.ndarray,
    max_iters: int,
    block: int,
    n_clusters: int,
):
    """Lloyd's loop with early exit, fused assignment + one-hot-matmul update.

    Semantics mirror /root/reference/src/ivf/index.rs:395-454: each iteration
    assigns all rows, counts reassignments vs the previous iteration
    (initial assignment is all-zeros, :392), breaks *before* the centroid
    update when nothing changed, and keeps stale centroids for empty clusters.
    """
    n, d = x.shape
    k = n_clusters
    nb = n // block
    xb = x.reshape(nb, block, d)
    wb = w.reshape(nb, block)
    cluster_iota = jnp.arange(k, dtype=jnp.int32)

    def assign_and_accumulate(centroids):
        c_norm = jnp.sum(centroids * centroids, axis=1)
        ct = centroids.T

        def step(carry, inputs):
            sums, counts = carry
            xi, wi = inputs
            scores = jnp.dot(xi, ct, preferred_element_type=jnp.float32)
            assign = jnp.argmin(c_norm[None, :] - 2.0 * scores, axis=1).astype(
                jnp.int32
            )
            onehot = (assign[:, None] == cluster_iota[None, :]).astype(
                jnp.float32
            ) * wi[:, None]
            sums = sums + jnp.dot(onehot.T, xi, preferred_element_type=jnp.float32)
            counts = counts + jnp.sum(onehot, axis=0)
            return (sums, counts), assign

        init = (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32))
        (sums, counts), assign = jax.lax.scan(step, init, (xb, wb))
        return sums, counts, assign.reshape(-1)

    def cond(state):
        i, changed, _, _ = state
        return jnp.logical_and(i < max_iters, jnp.logical_or(i == 0, changed > 0))

    def body(state):
        i, _, centroids, prev_assign = state
        sums, counts, assign = assign_and_accumulate(centroids)
        changed = jnp.sum(
            jnp.where(w > 0, (assign != prev_assign).astype(jnp.int32), 0)
        )
        new_centroids = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centroids
        )
        centroids = jnp.where(changed > 0, new_centroids, centroids)
        return i + 1, changed, centroids, assign

    init_assign = jnp.zeros((n,), jnp.int32)
    _, _, centroids, assign = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(1), centroids0, init_assign)
    )
    return centroids, assign


@functools.partial(jax.jit, static_argnames=("n_clusters",))
def _kmeans_pp_init(
    sample: jnp.ndarray, key: jax.Array, n_clusters: int
) -> jnp.ndarray:
    """k-means++ seeding (/root/reference/src/ivf/index.rs:332-390).

    ``sample`` is the init sub-sample (<=50k rows). Sequential ``fori_loop``:
    each step computes squared distances to the most recent centroid (matvec),
    folds into the running minimum, and draws the next seed proportional to
    the minimum distances (first index whose cumsum crosses a uniform
    threshold, :373-383); an all-zero total falls back to a uniform draw
    (:384-389).
    """
    m, d = sample.shape
    k = n_clusters
    s_norm = jnp.sum(sample * sample, axis=1)  # [m]

    key, sub = jax.random.split(key)
    first = jax.random.randint(sub, (), 0, m)
    centroids0 = jnp.zeros((k, d), jnp.float32).at[0].set(sample[first])
    c = sample[first]
    min_d = jnp.maximum(
        s_norm + jnp.sum(c * c) - 2.0 * (sample @ c), 0.0
    )  # dist to first centroid

    def step(i, carry):
        centroids, min_d, key = carry
        key, t_key, u_key = jax.random.split(key, 3)
        total = jnp.sum(min_d)
        cumsum = jnp.cumsum(min_d)
        threshold = jax.random.uniform(t_key, (), jnp.float32) * total
        weighted_idx = jnp.searchsorted(cumsum, threshold, side="left")
        weighted_idx = jnp.minimum(weighted_idx, m - 1)
        uniform_idx = jax.random.randint(u_key, (), 0, m)
        idx = jnp.where(total > 0, weighted_idx, uniform_idx)
        c = sample[idx]
        centroids = centroids.at[i].set(c)
        d2 = jnp.maximum(s_norm + jnp.sum(c * c) - 2.0 * (sample @ c), 0.0)
        min_d = jnp.minimum(min_d, d2)
        return centroids, min_d, key

    centroids, _, _ = jax.lax.fori_loop(1, k, step, (centroids0, min_d, key))
    return centroids


def k_means(
    x: np.ndarray | jnp.ndarray, params: KMeansParams
) -> tuple[np.ndarray, np.ndarray]:
    """Train k-means; returns (centroids [k, d] f32, assignments [n] i32).

    Device-side equivalent of /root/reference/src/ivf/index.rs:323-457.
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    n, d = x.shape
    k = params.n_clusters
    if k <= 0:
        raise ValidationError("n_clusters must be > 0")
    if k > n:
        raise ValidationError("n_clusters cannot exceed number of vectors")

    key = jax.random.PRNGKey(params.seed)
    key, init_key, _ = jax.random.split(key, 3)  # third slot was the old
    # device sampling key; kept in the split so init_key's stream (and thus
    # seeded centroid reproducibility) is unchanged.

    init_sample_size = min(n, _INIT_SAMPLE_CAP)
    init_sample_size = max(init_sample_size, k)
    if init_sample_size == n:
        init_sample = x
    else:
        # Host-side index draw (device sampling measured pathological on
        # this backend); the row gather itself stays on device.
        idx = sample_indices_host(params.seed ^ 0x3C3C3C3C, n, init_sample_size)
        init_sample = jnp.take(x, jnp.asarray(idx), axis=0)

    centroids0 = _kmeans_pp_init(init_sample, init_key, k)

    block = min(params.block_rows, max(256, n))
    x_pad, w = _pad_rows(x, block)
    centroids, assign = _lloyd(x_pad, w, centroids0, params.max_iters, block, k)
    return np.asarray(centroids), np.asarray(assign[:n])


def assign_clusters(
    x: np.ndarray | jnp.ndarray, centroids: np.ndarray, block_rows: int = 8192
) -> np.ndarray:
    """Nearest-centroid assignment for all rows (used for the final inverted-
    list build pass, /root/reference/src/ivf/index.rs:193-206)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    n = x.shape[0]
    block = min(block_rows, max(256, n))
    x_pad, _ = _pad_rows(x, block)
    assign = _assign_blocks(x_pad, jnp.asarray(centroids, jnp.float32), block)
    return np.asarray(assign[:n])
