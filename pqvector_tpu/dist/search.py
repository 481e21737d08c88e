"""Multi-chip batched search: rows sharded over ICI, all-gather top-k merge.

Query-time scale-out (SURVEY.md §2 "first-class TPU equivalents"): the
embedding matrix is row-sharded across the mesh; each chip runs the streamed
exact (or IVF) top-k over its shard, then per-chip top-k candidate sets are
``all_gather``-ed (k*n_dev rows per query — tiny) and merged with one final
top-k. ICI traffic is O(B * k * n_dev), independent of n.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..errors import ValidationError
from ..index.ivf import IvfIndex
from ..query.device import _exact_topk_impl, _ivf_topk_impl, _round_up
from .mesh import DATA_AXIS, make_mesh


def _max_probe_bucket(nprobe: int, n_clusters: int) -> int:
    """Power-of-two probe bucket (bounded recompiles as nprobe varies),
    floored at min(128, n_clusters) and capped at n_clusters."""
    max_probe = 1
    while max_probe < nprobe:
        max_probe *= 2
    return min(max(max_probe, min(128, n_clusters)), n_clusters)


def _merge_gathered(best_d, best_i):
    """[n_dev, B, k] gathered results -> final [B, k]."""
    n_dev, b, k = best_d.shape
    all_d = jnp.transpose(best_d, (1, 0, 2)).reshape(b, n_dev * k)
    all_i = jnp.transpose(best_i, (1, 0, 2)).reshape(b, n_dev * k)
    order = jnp.argsort(all_d, axis=1, stable=True)[:, :k]
    return jnp.take_along_axis(all_d, order, axis=1), jnp.take_along_axis(
        all_i, order, axis=1
    )


def _shard_search_body(
    searcher, shard_fn, operands, specs, rows_local, reps,
    gather_axes=DATA_AXIS,
):
    """shard_map skeleton shared by every distributed search body.

    Per-shard kernel -> global-id map -> all-gather fan-in -> merged top-k,
    with optional ``reps``-chaining (the timing API: each chained search
    depends on the last result, so materializing the output proves all reps
    executed) and the query-validating host wrapper.

    ``shard_fn(q, *locals) -> (d2, local_ids)`` runs on ONE shard.
    ``operands`` are its shard arguments with the global-id map first;
    ``specs`` their PartitionSpecs; ``rows_local`` bounds the local-id clip.

    When the searcher holds a sharded f32 re-score reference
    (``dtype=bfloat16, rescore_dtype="auto"`` — the DeviceIvfSearcher
    rescore design at dist scale), each shard re-scores its OWN winners
    against its local f32 rows in direct-difference form BEFORE the
    all-gather, so the merge ranks f32-exact distances and the ICI bytes
    are unchanged ([n_dev, B, k] either way).
    """
    mesh, dim, n_total = searcher.mesh, searcher.dim, searcher.n
    ref = getattr(searcher, "_emb_ref", None)
    has_ref = ref is not None
    if has_ref:
        operands = (operands[0], ref) + tuple(operands[1:])
        specs = (specs[0], P(DATA_AXIS)) + tuple(specs[1:])

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(),) + tuple(specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(q0, gid_local, *rest):
        if has_ref:
            ref_local, *rest = rest

        def one(q):
            d2, local_ids = shard_fn(q, *rest)
            safe = jnp.clip(local_ids, 0, rows_local - 1)
            if has_ref:
                diff = ref_local[safe] - q[:, None, :]
                d2 = jnp.where(
                    local_ids >= 0, jnp.sum(diff * diff, axis=-1), jnp.inf
                )
            gids = jnp.where(local_ids >= 0, gid_local[safe], -1)
            d2 = jnp.where(gids < 0, jnp.inf, d2)
            d2_all = jax.lax.all_gather(d2, gather_axes)
            ids_all = jax.lax.all_gather(gids, gather_axes)
            return _merge_gathered(d2_all, ids_all)

        if reps is None:
            return one(q0)

        def step(q, _):
            d2, ids = one(q)
            link = jnp.where(jnp.isfinite(d2[:, :1]), d2[:, :1], 0.0)
            return q0 + 0.0 * link, (d2, ids)

        _, (d2s, idss) = jax.lax.scan(step, q0, None, length=reps)
        return d2s[-1], idss[-1]

    def call(queries):
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != dim:
            raise ValidationError(
                f"Query dimension mismatch: expected {dim}, got {q.shape[1]}"
            )
        qs = jax.device_put(q, NamedSharding(mesh, P()))
        d2, ids = jax.jit(run)(qs, *operands)
        ids = np.asarray(ids)
        d2 = np.asarray(d2)
        ids = np.where(np.isinf(d2) | (ids >= n_total), -1, ids)
        return np.sqrt(d2), ids

    return call


class DistributedExactSearcher:
    """Row-sharded exact brute-force top-k over a device mesh."""

    def __init__(
        self,
        embeddings: np.ndarray,
        mesh=None,
        row_tile: int = 1024,
        dtype=None,
        rescore_dtype="auto",
    ):
        """``rescore_dtype="auto"`` keeps a sharded f32 re-score copy next
        to reduced-precision storage (same recovery as
        DeviceIvfSearcher — real-data neighbor margins sit below bf16's
        2^-8, tests/test_rescore.py); ``None`` opts out."""
        self.mesh = mesh or make_mesh()
        n_dev = self.mesh.devices.size
        embeddings = np.asarray(embeddings, dtype=np.float32)
        n, d = embeddings.shape
        self.n = n
        self.dim = d
        self.row_tile = row_tile

        per_dev = _round_up(-(-n // n_dev), row_tile)
        n_pad = per_dev * n_dev
        emb = np.zeros((n_pad, d), dtype=np.float32)
        emb[:n] = embeddings
        sq = np.full(n_pad, np.inf, dtype=np.float32)
        sq[:n] = np.einsum("nd,nd->n", embeddings, embeddings)

        sh = NamedSharding(self.mesh, P(DATA_AXIS))
        self._emb_ref = None
        if dtype is not None and jnp.dtype(dtype) != jnp.float32:
            if rescore_dtype is not None:
                # Ship f32 once; storage is a device-side downcast that
                # keeps the sharding (saves the separate bf16 transfer).
                self._emb_ref = jax.device_put(emb, sh)
                self.emb = self._emb_ref.astype(dtype)
                self.emb_sq = jax.device_put(sq, sh)
                self._per_dev = per_dev
                return
            emb = jnp.asarray(emb, dtype=dtype)
        self.emb = jax.device_put(emb, sh)
        self.emb_sq = jax.device_put(sq, sh)
        self._per_dev = per_dev

    def search(self, queries: np.ndarray, k: int):
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise ValidationError(
                f"Query dimension mismatch: expected {self.dim}, got {q.shape[1]}"
            )
        qs = jax.device_put(q, NamedSharding(self.mesh, P()))
        per_dev = self._per_dev
        tile = self.row_tile
        has_ref = self._emb_ref is not None

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS))
            + ((P(DATA_AXIS),) if has_ref else ()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def run(q, emb_local, sq_local, *ref_local):
            my = jax.lax.axis_index(DATA_AXIS)
            d2, ids = _exact_topk_impl(
                q, emb_local, sq_local, k, tile,
                emb_ref=ref_local[0] if ref_local else None,
            )
            ids = jnp.where(ids >= 0, ids + my * per_dev, ids)
            d2_all = jax.lax.all_gather(d2, DATA_AXIS)  # [n_dev, B, k]
            ids_all = jax.lax.all_gather(ids, DATA_AXIS)
            return _merge_gathered(d2_all, ids_all)

        args = (qs, self.emb, self.emb_sq) + (
            (self._emb_ref,) if has_ref else ()
        )
        d2, ids = jax.jit(run, static_argnums=())(*args)
        ids = jnp.where(ids >= self.n, -1, jnp.where(ids < 0, -1, ids))
        return np.sqrt(np.asarray(d2)), np.asarray(ids)


class DistributedIvfSearcher:
    """Cluster-sharded IVF top-k over a device mesh.

    Clusters are greedily balanced across devices by population; each device
    holds a dense block of its clusters' rows plus a full ``[k, Lmax_local]``
    cluster table (clusters it does not own are all-sentinel). A query probes
    the replicated centroids once; every device gathers candidates for the
    probed clusters it owns, computes a local top-k, and the per-device
    results are all-gathered and merged.
    """

    def __init__(
        self,
        index: IvfIndex,
        embeddings: np.ndarray,
        mesh=None,
        tile: int = 1024,
        orig_ids: np.ndarray | None = None,
        dtype=None,
        rescore_dtype="auto",
    ):
        """``orig_ids`` (spilled layouts, query/spill.py): maps each row of
        ``embeddings`` to the ORIGINAL row it copies; searches then return
        original ids and dedup (rows may appear twice, possibly on two
        different shards — the all-gather merge sees both).

        ``dtype`` stores the sharded scan array reduced (bfloat16 halves
        the per-shard HBM traffic); ``rescore_dtype="auto"`` then keeps a
        sharded f32 reference and every search path re-scores its local
        winners against it before the all-gather merge (real-data neighbor
        margins sit below 2^-8 — tests/test_rescore.py); ``None`` opts
        out."""
        self._spill_dups = orig_ids is not None
        self.mesh = mesh or make_mesh()
        n_dev = self.mesh.devices.size
        embeddings = np.asarray(embeddings, dtype=np.float32)
        n, d = embeddings.shape
        if d != index.dim:
            raise ValidationError(
                f"Embedding dim {d} does not match index dim {index.dim}"
            )
        self.index = index
        self.n = n
        self.dim = d
        self.tile = tile

        # Greedy balance clusters by size.
        sizes = index.cluster_sizes()
        order = np.argsort(sizes)[::-1]
        owner = np.zeros(index.n_clusters, dtype=np.int64)
        load = np.zeros(n_dev, dtype=np.int64)
        for c in order:
            dev = int(np.argmin(load))
            owner[c] = dev
            load[dev] += int(sizes[c])

        rows_per_dev = int(load.max()) if n else 0
        rows_per_dev = max(_round_up(max(rows_per_dev, 1) + 1, tile), tile)
        lmax = max(1, int(sizes.max())) if index.n_clusters else 1

        emb_blocks = np.zeros((n_dev, rows_per_dev, d), dtype=np.float32)
        sq_blocks = np.full((n_dev, rows_per_dev), np.inf, dtype=np.float32)
        gid_blocks = np.full((n_dev, rows_per_dev), -1, dtype=np.int32)
        tables = np.full(
            (n_dev, index.n_clusters, lmax), rows_per_dev - 1, dtype=np.int32
        )
        # Per-device cluster ids: the fill order below is ascending cluster
        # index, so each device block is cluster-sorted — exactly the layout
        # the fused stream kernel's tile tables need (pad rows = sentinel kc).
        rc_blocks = np.full((n_dev, rows_per_dev), index.n_clusters, np.int32)
        fill = np.zeros(n_dev, dtype=np.int64)
        for c in range(index.n_clusters):
            dev = int(owner[c])
            rows = index.cluster_rows(c)
            start = int(fill[dev])
            count = rows.size
            if count:
                emb_blocks[dev, start : start + count] = embeddings[rows]
                sq_blocks[dev, start : start + count] = np.einsum(
                    "nd,nd->n", embeddings[rows], embeddings[rows]
                )
                gid_blocks[dev, start : start + count] = (
                    orig_ids[rows] if orig_ids is not None else rows
                )
                rc_blocks[dev, start : start + count] = c
                tables[dev, c, :count] = np.arange(start, start + count)
            fill[dev] += count
        # Sentinel row (rows_per_dev - 1) must stay inf / -1: guaranteed since
        # fill[dev] <= rows_per_dev - 1 by construction.

        # Tile tables for the fused stream kernel (device.py analog, one
        # table set per device; shared static cmax = max over devices).
        nt_local = rows_per_dev // tile
        tc_blocks = None
        lcl_blocks = None
        cmax = 128
        if nt_local * tile == rows_per_dev:
            parts = rc_blocks.reshape(n_dev, nt_local, tile)
            nuniq = (np.diff(parts, axis=2) != 0).sum(axis=2).max() + 1
            cmax = max(128, _round_up(int(nuniq), 128))
            tc_blocks = np.full(
                (n_dev, nt_local, cmax), index.n_clusters, np.int32
            )
            lcl_blocks = np.empty((n_dev, nt_local, tile), np.float32)
            for dev in range(n_dev):
                for t in range(nt_local):
                    u = np.unique(parts[dev, t])
                    tc_blocks[dev, t, : u.size] = u
                    lcl_blocks[dev, t] = np.searchsorted(u, parts[dev, t])
        self._cmax = cmax
        self._nt_local = nt_local

        sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        emb_flat = emb_blocks.reshape(n_dev * rows_per_dev, d)
        self._emb_ref = None
        if dtype is not None and jnp.dtype(dtype) != jnp.dtype(jnp.float32):
            if rescore_dtype is not None:
                self._emb_ref = jax.device_put(emb_flat, sharding)
                self.emb = self._emb_ref.astype(dtype)
            else:
                self.emb = jax.device_put(emb_flat, sharding).astype(dtype)
        else:
            self.emb = jax.device_put(emb_flat, sharding)
        self.emb_sq = jax.device_put(sq_blocks.reshape(-1), sharding)
        # Finite sentinel copy for the Pallas kernels (inf poisons 0*inf).
        self.emb_sq_pallas = jax.device_put(
            np.where(np.isinf(sq_blocks), 3.0e38, sq_blocks).reshape(-1),
            sharding,
        )
        self.gids = jax.device_put(gid_blocks.reshape(-1), sharding)
        self.tables = jax.device_put(
            tables.reshape(n_dev * index.n_clusters, lmax), sharding
        )
        self.lcl = (
            None
            if lcl_blocks is None
            else jax.device_put(lcl_blocks.reshape(-1), sharding)
        )
        self.tc = (
            None
            if tc_blocks is None
            else jax.device_put(
                tc_blocks.reshape(n_dev * nt_local, cmax), sharding
            )
        )
        self.centroids = jax.device_put(
            index.centroids, NamedSharding(self.mesh, P())
        )
        self.c_sq = jax.device_put(
            np.einsum("kd,kd->k", index.centroids, index.centroids),
            NamedSharding(self.mesh, P()),
        )
        self._rows_per_dev = rows_per_dev
        self._emb_i8 = None  # lazy per-shard int8 codes for search_xbin8
        self._emb_i8_scale = None
        # Dynamic-update state (device.py analog at dist scale): host copy
        # of the global-id map (delete scatters need layout positions), a
        # tombstone bitmap over the id domain, and a small replicated
        # append buffer merged on the host side of the numpy API boundary.
        self._gids_host = gid_blocks.reshape(-1).copy()
        self._id_domain = int(
            (orig_ids.max() + 1) if (orig_ids is not None and len(orig_ids))
            else n
        )
        self._deleted_host = None
        self._delta_host: list = []
        self._delta = None  # (x [m, d] f32, sq [m], gid [m]) host numpy

    @classmethod
    def with_spill(
        cls,
        index: IvfIndex,
        embeddings: np.ndarray,
        spill: float = 0.2,
        mesh=None,
        tile: int = 1024,
        assign_block: int = 65536,
        assign_dtype=jnp.float32,
        dtype=None,
        rescore_dtype="auto",
    ) -> "DistributedIvfSearcher":
        """Row-sharded searcher over a SPILLED layout (query/spill.py):
        the ``spill`` fraction of smallest-runner-up-margin rows is
        duplicated into its runner-up cluster before the greedy shard
        balance, lifting probe recall at unchanged nprobe. Copies may land
        on different shards; the all-gather merge sees both, so public
        searches select 2k and dedup by original id (dedup_topk_np).
        Mirrors DeviceIvfSearcher.with_spill; wire format untouched."""
        from ..query.spill import build_spilled_layout

        ext_index, ext_emb, gid = build_spilled_layout(
            index, embeddings, spill,
            block=assign_block, assign_dtype=assign_dtype,
        )
        return cls(
            ext_index, ext_emb, mesh=mesh, tile=tile, orig_ids=gid,
            dtype=dtype, rescore_dtype=rescore_dtype,
        )

    def _search_impl(self, queries: np.ndarray, k: int, nprobe: int):
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise ValidationError(
                f"Query dimension mismatch: expected {self.dim}, got {q.shape[1]}"
            )
        nprobe = min(max(1, nprobe), self.index.n_clusters)
        qs = jax.device_put(q, NamedSharding(self.mesh, P()))
        tile = min(self.tile, self._rows_per_dev)

        has_ref = self._emb_ref is not None
        ref_ops = (self._emb_ref,) if has_ref else ()

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS), P(), P())
            + ((P(DATA_AXIS),) if has_ref else ()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def run(q, emb_local, sq_local, gid_local, table_local, centroids,
                c_sq, *ref_local):
            d2, local_ids = _ivf_topk_impl(
                q, centroids, c_sq, table_local, emb_local, sq_local, k, nprobe, tile
            )
            safe = jnp.clip(local_ids, 0, emb_local.shape[0] - 1)
            if ref_local:  # f32 re-score of local winners (see
                # _shard_search_body — same design, pre-merge)
                diff = ref_local[0][safe] - q[:, None, :]
                d2 = jnp.where(
                    local_ids >= 0, jnp.sum(diff * diff, axis=-1), jnp.inf
                )
            gids = jnp.where(local_ids >= 0, gid_local[safe], -1)
            d2 = jnp.where(gids < 0, jnp.inf, d2)
            d2_all = jax.lax.all_gather(d2, DATA_AXIS)
            ids_all = jax.lax.all_gather(gids, DATA_AXIS)
            return _merge_gathered(d2_all, ids_all)

        d2, ids = jax.jit(run)(
            qs, self.emb, self.emb_sq, self.gids, self.tables,
            self.centroids, self.c_sq, *ref_ops
        )
        ids = np.asarray(ids)
        d2 = np.asarray(d2)
        ids = np.where(np.isinf(d2), -1, ids)
        return np.sqrt(d2), ids

    # ------------------------------------------------------------------
    # Fused fast path: the round-2 stream kernel per shard (VERDICT item 4)
    # ------------------------------------------------------------------

    def _max_probe_bucket(self, nprobe: int) -> int:
        return _max_probe_bucket(nprobe, self.index.n_clusters)

    def _fused_body(self, k: int, nprobe: int, reps: int | None):
        """shard_map'd fused search: each device runs the streaming masked
        kernel over its cluster-sorted shard (active-tile compaction skips
        tiles whose clusters no query probed), then per-shard top-k sets are
        all-gathered (O(B*k*n_dev) ICI bytes) and merged."""
        if self.lcl is None:
            raise ValidationError(
                "Fused path needs tile-aligned shards (rows_per_dev % tile)"
            )
        from ..kernels.stream_topk import pallas_stream_masked_topk

        max_probe = self._max_probe_bucket(nprobe)
        tile = self.tile
        cmax = self._cmax
        interpret = jax.default_backend() != "tpu"

        def shard_fn(q, emb_local, sq_local, lcl_local, tc_local,
                     centroids, c_sq):
            return pallas_stream_masked_topk(
                q, centroids, c_sq, lcl_local, tc_local,
                emb_local, sq_local, jnp.int32(nprobe), k,
                max_probe=max_probe, tile=tile, cmax=cmax,
                interpret=interpret,
            )

        return _shard_search_body(
            self, shard_fn,
            operands=(self.gids, self.emb, self.emb_sq_pallas, self.lcl,
                      self.tc, self.centroids, self.c_sq),
            specs=(P(DATA_AXIS),) * 5 + (P(), P()),
            rows_local=self._rows_per_dev, reps=reps,
        )

    def _search_fused_impl(self, queries: np.ndarray, k: int, nprobe: int):
        """Fused per-shard stream-kernel search (ids match :meth:`search`)."""
        nprobe = min(max(1, nprobe), self.index.n_clusters)
        return self._fused_body(k, nprobe, None)(queries)

    def _search_loop_impl(
        self, queries: np.ndarray, k: int, nprobe: int, reps: int = 16
    ):
        """``reps`` chained fused searches in ONE dispatch (timing API —
        same chained-dependency methodology as DeviceIvfSearcher.search_loop:
        materializing the result proves all ``reps`` executed)."""
        nprobe = min(max(1, nprobe), self.index.n_clusters)
        return self._fused_body(k, nprobe, reps)(queries)

    # ------------------------------------------------------------------
    # Distributed ApproxTopK scan (mode="scan" analog of
    # DeviceIvfSearcher.search_loop): each shard runs the hardware
    # PartialReduce full scan over its block, then per-shard top-k sets are
    # all-gathered and merged. nprobe-free; recall comes from recall_target.
    # ------------------------------------------------------------------

    def _scan_body(
        self, k: int, reps: int | None, recall_target: float,
        overfetch: int = 0,
    ):
        from ..query.device import _exact_approx_topk_impl

        # Shards are cluster-sorted (rows grouped by assignment before
        # sharding), so mirror DeviceIvfSearcher._approx_chunk: at k > 32
        # PartialReduce's contiguous reduction bins collide on sorted runs
        # and recall collapses unless chunks shrink to 64k rows.
        chunk = min(self._rows_per_dev, 65536 if k > 32 else 64 * 4096)

        def shard_fn(q, emb_local, sq_local):
            return _exact_approx_topk_impl(
                q, emb_local, sq_local, k=k, chunk=chunk,
                recall_target=recall_target, overfetch=overfetch,
            )

        return _shard_search_body(
            self, shard_fn,
            operands=(self.gids, self.emb, self.emb_sq),
            specs=(P(DATA_AXIS),) * 3,
            rows_local=self._rows_per_dev, reps=reps,
        )

    def _search_scan_impl(
        self,
        queries: np.ndarray,
        k: int,
        reps: int | None = None,
        recall_target: float = 0.99,
        overfetch: int = 0,
    ):
        """Distributed ApproxTopK full scan (``reps`` chains for timing).

        ``overfetch`` mirrors DeviceIvfSearcher.scan_overfetch (the tuned
        single-chip serving point is rt=0.9, fetch=2k — round 4)."""
        return self._scan_body(k, reps, recall_target, overfetch)(queries)

    def can_xbin(self, k: int = 10) -> bool:
        """XLA binned-min scan eligibility on the PER-SHARD row count."""
        from ..query.device import _xbin_bins

        if self._spill_dups:
            k = 2 * k  # spilled searches select 2k for the id dedup
        return _xbin_bins(self._rows_per_dev, k) > 0

    def _search_xbin_impl(
        self,
        queries: np.ndarray,
        k: int,
        reps: int | None = None,
        l_bins: int = 0,
        chunk_groups: int = 0,
    ):
        """Distributed XLA binned-min full scan (mode="xbin" analog of
        DeviceIvfSearcher.search: fused-epilogue selection per shard; see
        query/device.py:_exact_xbin_impl). Sharding shrinks each shard's
        tile-group count, so keys spend FEWER provenance bits than the
        single-chip form. ``l_bins``/``chunk_groups`` mirror the device
        searcher's xbin_bins / xbin_chunk_groups knobs (0 = auto bins /
        auto-chunk policy, -1 forces the one-call fused form — see
        query/device.py:_xbin_auto_chunk), applied per shard."""
        from ..kernels.binscan import PROVENANCE_BITS_MAX
        from ..query.device import (
            _exact_xbin_impl, _xbin_auto_chunk, _xbin_bins, _xbin_code_bits,
        )

        if l_bins:
            if self._rows_per_dev % l_bins or not (0 < k <= l_bins) \
                    or l_bins > 65536:
                raise ValidationError(
                    f"l_bins={l_bins} invalid: must divide rows_per_dev="
                    f"{self._rows_per_dev}, satisfy k<=bins, stay <= 65536"
                )
            if _xbin_code_bits(self._rows_per_dev, l_bins) \
                    > PROVENANCE_BITS_MAX:
                raise ValidationError(
                    f"l_bins={l_bins} spends "
                    f"{_xbin_code_bits(self._rows_per_dev, l_bins)} "
                    f"provenance bits per shard (max {PROVENANCE_BITS_MAX})"
                )
        else:
            l_bins = _xbin_bins(self._rows_per_dev, k)
        if not l_bins:
            raise ValidationError(
                "xbin ineligible for this shard shape/k (no lane-aligned "
                "bin count divides the per-shard rows)"
            )

        b = int(np.shape(queries)[0]) if np.ndim(queries) > 1 else 1
        eff_chunk = _xbin_auto_chunk(
            b, self._rows_per_dev, l_bins, chunk_groups,
        )

        def shard_fn(q, emb_local, sq_local):
            return _exact_xbin_impl(
                q, emb_local, sq_local, k=k, l_bins=l_bins,
                chunk_groups=eff_chunk,
            )

        return _shard_search_body(
            self, shard_fn,
            operands=(self.gids, self.emb, self.emb_sq),
            specs=(P(DATA_AXIS),) * 3,
            rows_local=self._rows_per_dev, reps=reps,
        )(queries)

    def _xbin8_arrays(self):
        """Lazy per-shard int8 quantization of the row-sharded array
        (mode="xbin8" analog — row-wise ops, so the quantization itself
        runs shard-local under jit)."""
        if self._emb_i8 is None:
            from ..query.device import _quantize_rows_i8

            sh = NamedSharding(self.mesh, P(DATA_AXIS))
            self._emb_i8, self._emb_i8_scale = jax.jit(
                _quantize_rows_i8, out_shardings=(sh, sh)
            )(self.emb)
        return self._emb_i8, self._emb_i8_scale

    def _search_xbin8_impl(
        self,
        queries: np.ndarray,
        k: int,
        reps: int | None = None,
        l_bins: int = 0,
        chunk_groups: int = 0,
    ):
        """Distributed int8 xbin scan (mode="xbin8" analog): per-shard
        int8 scoring + fused binned-min selection, winners re-scored
        exactly against the shard's full-precision rows before the
        all-gather merge (query/device.py:_exact_xbin8_impl)."""
        from ..kernels.binscan import PROVENANCE_BITS_MAX
        from ..query.device import (
            _exact_xbin8_impl, _xbin_auto_chunk, _xbin_bins, _xbin_code_bits,
        )

        if l_bins:
            if self._rows_per_dev % l_bins or not (0 < k <= l_bins) \
                    or l_bins > 65536:
                raise ValidationError(
                    f"l_bins={l_bins} invalid: must divide rows_per_dev="
                    f"{self._rows_per_dev}, satisfy k<=bins, stay <= 65536"
                )
            if _xbin_code_bits(self._rows_per_dev, l_bins) \
                    > PROVENANCE_BITS_MAX:
                raise ValidationError(
                    f"l_bins={l_bins} spends "
                    f"{_xbin_code_bits(self._rows_per_dev, l_bins)} "
                    f"provenance bits per shard (max {PROVENANCE_BITS_MAX})"
                )
        else:
            l_bins = _xbin_bins(self._rows_per_dev, k)
        if not l_bins:
            raise ValidationError(
                "xbin ineligible for this shard shape/k (no lane-aligned "
                "bin count divides the per-shard rows)"
            )

        b = int(np.shape(queries)[0]) if np.ndim(queries) > 1 else 1
        eff_chunk = _xbin_auto_chunk(
            b, self._rows_per_dev, l_bins, chunk_groups,
        )
        e8, sc = self._xbin8_arrays()

        def shard_fn(q, e8_local, sc_local, sq_local, emb_local):
            return _exact_xbin8_impl(
                q, e8_local, sc_local, sq_local, emb_local,
                k=k, l_bins=l_bins, chunk_groups=eff_chunk,
            )

        return _shard_search_body(
            self, shard_fn,
            operands=(self.gids, e8, sc, self.emb_sq, self.emb),
            specs=(P(DATA_AXIS),) * 5,
            rows_local=self._rows_per_dev, reps=reps,
        )(queries)

    # ------------------------------------------------------------------
    # Distributed fused binned-min scan (mode="binscan"/"bincompact"
    # analogs of DeviceIvfSearcher.search): each shard streams its block
    # through kernels/binscan.py — extraction overlaps the scoring matmul
    # instead of paying the serialized PartialReduce pass. Sharding also
    # extends the kernel's provenance-bit budget by n_dev x (each shard
    # packs LOCAL tile ids).
    # ------------------------------------------------------------------

    def _binscan_tile(self, esize: int | None = None) -> int:
        """Largest lane-aligned tile dividing the per-shard rows whose
        working set also fits scoped VMEM (binscan_b_tile >= 256, the same
        gate as DeviceIvfSearcher._binscan_vmem_ok — without it a large-dim
        shard would pass eligibility and then crash in the kernel).
        ``esize=1`` sizes for the int8-code variant."""
        from ..kernels.binscan import binscan_b_tile

        rows_per_dev = self._rows_per_dev
        d = int(self.emb.shape[1])
        if esize is None:
            esize = jnp.dtype(self.emb.dtype).itemsize
        for t in (1024, 512, 256, 128):
            if rows_per_dev % t == 0 and binscan_b_tile(t, d, esize) >= 256:
                return t
        raise ValidationError(
            f"shard row count {rows_per_dev} has no lane-aligned binscan "
            f"tile that fits scoped VMEM at d={d}"
        )

    def can_binscan(self, k: int = 10, esize: int | None = None) -> bool:
        """Bin-count / provenance-bit eligibility (kernels/binscan.py),
        evaluated on the PER-SHARD row count (``esize=1`` for binscan8)."""
        try:
            t = self._binscan_tile(esize=esize)
        except ValidationError:
            return False
        from ..kernels.binscan import PROVENANCE_BITS_MAX, provenance_bits

        if self._spill_dups:
            k = 2 * k  # spilled searches select 2k for the id dedup
        nt = self._rows_per_dev // t
        return k <= t and provenance_bits(nt, t) <= PROVENANCE_BITS_MAX

    def _binscan_body(self, k: int, reps: int | None):
        from ..kernels.binscan import pallas_binned_scan

        tile = self._binscan_tile()
        interpret = jax.default_backend() != "tpu"

        def shard_fn(q, emb_local, sq_local):
            return pallas_binned_scan(
                q, emb_local, sq_local, k, tile=tile, interpret=interpret
            )

        return _shard_search_body(
            self, shard_fn,
            operands=(self.gids, self.emb, self.emb_sq_pallas),
            specs=(P(DATA_AXIS),) * 3,
            rows_local=self._rows_per_dev, reps=reps,
        )

    def _search_binscan_impl(
        self, queries: np.ndarray, k: int, reps: int | None = None
    ):
        """Distributed fused binned-min full scan (``reps`` chains)."""
        if not self.can_binscan(k):
            raise ValidationError(
                "binscan ineligible for this shard shape/k (bin and "
                "provenance limits — kernels/binscan.py)"
            )
        return self._binscan_body(k, reps)(queries)

    def _search_binscan8_impl(
        self, queries: np.ndarray, k: int, reps: int | None = None
    ):
        """Distributed int8 fused binned-min scan (mode="binscan8"
        analog): each shard streams its int8 codes through the Pallas
        kernel (int8 MXU, 1/4 the f32 bytes) and re-scores winners
        exactly against its full-precision rows before the all-gather
        merge."""
        from ..kernels.binscan import pallas_binned_scan

        if not self.can_binscan(k, esize=1):
            raise ValidationError(
                "binscan8 ineligible for this shard shape/k (bin and "
                "provenance limits — kernels/binscan.py)"
            )
        tile = self._binscan_tile(esize=1)
        interpret = jax.default_backend() != "tpu"
        e8, sc = self._xbin8_arrays()

        def shard_fn(q, e8_local, sc_local, sq_local, emb_local):
            return pallas_binned_scan(
                q, e8_local, sq_local, k, tile=tile, interpret=interpret,
                scale=sc_local, emb_ref=emb_local,
            )

        return _shard_search_body(
            self, shard_fn,
            operands=(self.gids, e8, sc, self.emb_sq_pallas, self.emb),
            specs=(P(DATA_AXIS),) * 5,
            rows_local=self._rows_per_dev, reps=reps,
        )(queries)

    def calibrate_bincompact(
        self,
        queries: np.ndarray,
        nprobe: int,
        k: int = 10,
        slack: float = 1.15,
        bucket: int = 16,
    ) -> int:
        """Pin the per-shard bincompact tile budget to the MEASURED
        probed-union size (the dist analog of
        DeviceIvfSearcher.calibrate_bincompact — the static formula
        over-budgets at large cluster counts).

        Computes each shard's actual probed-tile union for the sample on
        host, takes the MAX across shards (SPMD: every shard runs the
        same cap), adds ``slack``, rounds up to ``bucket`` (bounding
        recompiles). Returns the cap (0 if ineligible); subsequent
        ``search_bincompact(cap=None)`` calls use it. Clear with
        ``self._bincompact_calibrated = None``."""
        from ..kernels.binscan import PROVENANCE_BITS_MAX, provenance_bits

        self._bincompact_calibrated = None
        if self.tc is None:
            return 0
        if self._spill_dups:
            k = 2 * k  # spilled searches run the impls at 2k
        if k > self.tile:
            return 0
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        nprobe = min(max(1, nprobe), self.index.n_clusters)
        cent = np.asarray(self.index.centroids, np.float32)
        d2 = np.einsum("kd,kd->k", cent, cent)[None, :] - 2.0 * (q @ cent.T)
        kp = min(nprobe, cent.shape[0])
        probe = (
            np.argpartition(d2, kp - 1, axis=1)[:, :kp]
            if kp < cent.shape[0]
            else np.broadcast_to(np.arange(cent.shape[0]), d2.shape)
        )
        probed = np.unique(probe)
        n_dev = self.mesh.devices.size
        tc = np.asarray(self.tc).reshape(n_dev, self._nt_local, self._cmax)
        # Pad slots hold the sentinel cluster (kc), never probed.
        active_per_dev = np.isin(tc, probed).any(axis=2).sum(axis=1)
        cap = int(-(-(int(active_per_dev.max()) * slack) // bucket) * bucket)
        cap = max(1, min(self._nt_local, cap))
        if provenance_bits(cap, self.tile) > PROVENANCE_BITS_MAX:
            return 0
        # Record the operating point: a later search with a larger batch
        # or nprobe has a larger probed union than this cap covers.
        self._bincompact_calibrated = (cap, nprobe, q.shape[0])
        return cap

    def _bincompact_cap(self, batch: int, nprobe: int, slack: float = 1.3):
        """Static per-shard selected-tile budget for search_bincompact.

        Every shard must run the same cap (SPMD); size it for the expected
        probed-union coverage of the whole batch, divided across shards,
        with ``slack`` headroom (under-capped tiles are the least-probed).
        A prior ``calibrate_bincompact`` measurement overrides this."""
        kc = max(self.index.n_clusters, 1)
        tile = self.tile
        nt_local = self._nt_local
        draws = batch * nprobe
        expected = kc * (1.0 - (1.0 - 1.0 / kc) ** draws)
        n_dev = self.mesh.devices.size
        tiles_per = (self.n / kc) / tile + 1.0
        cap = int(min(nt_local, -(-expected * tiles_per * slack / n_dev // 1)))
        return max(cap, 1)

    def _bincompact_body(self, k: int, nprobe: int, reps: int | None, cap: int):
        from ..kernels.binscan import pallas_binned_scan_select

        if self.tc is None:
            raise ValidationError(
                "bincompact needs tile-aligned shards (rows_per_dev % tile)"
            )
        tile = self.tile
        if k > tile:
            raise ValidationError(f"bincompact requires k <= tile ({tile})")
        cmax = self._cmax
        nt_local = self._nt_local
        kc = self.index.n_clusters
        max_probe = self._max_probe_bucket(nprobe)
        interpret = jax.default_backend() != "tpu"

        def shard_fn(q, emb_local, sq_local, tc_local, centroids, c_sq):
            b = q.shape[0]
            tc2 = tc_local.reshape(nt_local, cmax)
            # Replicated probe -> per-cluster popularity counts.
            c_scores = jnp.dot(
                q, centroids.T, preferred_element_type=jnp.float32
            )
            _, probe = jax.lax.top_k(
                -(c_sq[None, :] - 2.0 * c_scores), max_probe
            )
            in_probe = jnp.broadcast_to(
                jnp.arange(max_probe, dtype=jnp.int32)[None, :] < nprobe,
                (b, max_probe),
            )
            counts = jnp.zeros(kc + 1, jnp.int32).at[
                probe.reshape(-1)
            ].add(in_probe.reshape(-1).astype(jnp.int32))
            counts = counts.at[kc].set(0)
            # LOCAL tile popularity via the shard's tile-cluster table
            # (tc rows list each tile's unique clusters; sentinel kc).
            tile_pop = counts[tc2].max(axis=1)
            order = jnp.argsort(
                jnp.where(tile_pop > 0, -tile_pop, jnp.int32(1)),
                stable=True,
            )
            sel = order[:cap]
            return pallas_binned_scan_select(
                q, emb_local, sq_local, sel, k, tile=tile, cap=cap,
                interpret=interpret,
            )

        return _shard_search_body(
            self, shard_fn,
            operands=(self.gids, self.emb, self.emb_sq_pallas, self.tc,
                      self.centroids, self.c_sq),
            specs=(P(DATA_AXIS),) * 4 + (P(), P()),
            rows_local=self._rows_per_dev, reps=reps,
        )

    def _search_bincompact_impl(
        self,
        queries: np.ndarray,
        k: int,
        nprobe: int,
        reps: int | None = None,
        cap: int | None = None,
    ):
        """Distributed probed-union selection + fused binned-min scan.

        Candidate semantics match DeviceIvfSearcher mode="bincompact": the
        batch's probed-tile union (popularity-capped per shard), streamed
        through kernels/binscan.py once — no gather pass. Reference anchor:
        probed-list search, /root/reference/src/ivf/search.rs:100-127.
        """
        nprobe = min(max(1, nprobe), self.index.n_clusters)
        q = np.asarray(queries)
        b = q.shape[0] if q.ndim > 1 else 1
        if cap is None:
            cal = getattr(self, "_bincompact_calibrated", None)
            if cal and nprobe <= cal[1] and b <= cal[2]:
                cap = cal[0]
            else:
                cap = self._bincompact_cap(b, nprobe)
        else:
            # The kernel's grid is static over `cap` selected tiles; a cap
            # beyond the shard tile count would read past the
            # scalar-prefetch tile list on TPU (garbage DMA offsets).
            cap = max(1, min(int(cap), self._nt_local))
        return self._bincompact_body(k, nprobe, reps, cap)(queries)

    # ------------------------------------------------------------------
    # Public entry points (explicit wrappers, mirroring DeviceIvfSearcher):
    # on a spilled layout every search selects 2k and dedups by original
    # id (copies may sit on different shards, so the all-gather merge sees
    # both); unspilled searchers pass straight through.
    # ------------------------------------------------------------------

    def _spill_dedup(self, fn, queries, k, *args, **kwargs):
        # Widened fetch under a re-score reference (the single-device
        # rescore design, CLAUDE.md): per-shard bf16 selection can misrank
        # inside its 2^-8 window, so each shard fetches 2k f32-refined
        # candidates and the merge keeps the global best k.
        fetch = 2 * k if self._emb_ref is not None else k
        if not self._spill_dups:
            d, ids = fn(queries, fetch, *args, **kwargs)
            d, ids = d[:, :k], ids[:, :k]
        else:
            from ..query.spill import dedup_topk_np

            d, ids = fn(queries, 2 * fetch, *args, **kwargs)
            d, ids = dedup_topk_np(d, ids, k)
        return self._finalize_dyn(queries, d, ids, k)

    # ------------------------------------------------------------------
    # Dynamic updates (DeviceIvfSearcher analog at dist scale — tombstone
    # deletes + delta-buffer appends; the reference's file-embedded index
    # supports neither without a rebuild, /root/reference/src/ivf/parquet.rs).
    # The SHARDED layout stays static: a delete scatters inf into the
    # sharded norms (so no shard's selection picks the slot — one jitted
    # sharding-preserving scatter per norm array), and appends live in a
    # small replicated side buffer scored exactly and merged at the dist
    # API's numpy boundary (every dist search already materializes the
    # all-gathered result to host).
    # ------------------------------------------------------------------

    def delete_rows(self, row_ids) -> None:
        """Tombstone ``row_ids`` (original or appended ids) on every
        shard that holds a copy."""
        ids = np.unique(np.asarray(row_ids, np.int64).reshape(-1))
        if ids.size == 0:
            return
        if ids.min() < 0 or ids.max() >= self._id_domain:
            raise ValidationError(
                f"delete_rows ids must be in [0, {self._id_domain})"
            )
        if (
            self._deleted_host is None
            or self._deleted_host.size < self._id_domain
        ):
            grown = np.zeros(self._id_domain, bool)
            if self._deleted_host is not None:
                grown[: self._deleted_host.size] = self._deleted_host
            self._deleted_host = grown
        self._deleted_host[ids] = True
        pos = np.flatnonzero(np.isin(self._gids_host, ids))
        if pos.size:
            sh = NamedSharding(self.mesh, P(DATA_AXIS))
            upd = jax.jit(
                lambda a, p, v: a.at[p].set(v), out_shardings=sh
            )
            p = jnp.asarray(pos)
            self.emb_sq = upd(self.emb_sq, p, jnp.inf)
            # Finite sentinel for the Pallas kernels (inf poisons 0*inf).
            self.emb_sq_pallas = upd(
                self.emb_sq_pallas, p, jnp.float32(3.0e38)
            )
        if self._delta is not None:
            dx, dsq, dgid = self._delta
            self._delta = (
                dx, np.where(np.isin(dgid, ids), np.inf, dsq), dgid
            )

    def append_rows(self, embeddings: np.ndarray) -> np.ndarray:
        """Append rows to the replicated delta buffer; returns their ids
        (the id space continues past the original rows). Deltas are scored
        EXACTLY at merge time, so appended rows have recall 1.0; fold them
        into the sharded layout with a rebuild when the buffer grows."""
        x = np.ascontiguousarray(embeddings, np.float32)
        if x.ndim == 1:
            x = x[None, :]
        if x.ndim != 2 or x.shape[1] != self.dim:
            raise ValidationError(
                f"append_rows expects [m, {self.dim}] embeddings"
            )
        new_ids = np.arange(
            self._id_domain, self._id_domain + len(x), dtype=np.int32
        )
        self._id_domain += len(x)
        self._delta_host.append((x, new_ids))
        xs = np.concatenate([a for a, _ in self._delta_host])
        gs = np.concatenate([g for _, g in self._delta_host])
        sq = np.einsum("md,md->m", xs, xs)
        if self._deleted_host is not None:  # earlier tombstones survive
            cov = gs < self._deleted_host.size
            sq[cov] = np.where(
                self._deleted_host[gs[cov]], np.inf, sq[cov]
            )
        self._delta = (xs, sq, gs)
        return new_ids

    def _finalize_dyn(self, queries, d, ids, k: int):
        """Tombstone filter + exact delta merge on the merged host-side
        results (distances arrive sqrt'd; the merge is monotonic)."""
        if self._deleted_host is None and self._delta is None:
            return d, ids
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        d, ids = d.copy(), ids.copy()
        if self._deleted_host is not None:
            bm = self._deleted_host
            safe = np.clip(ids, 0, bm.size - 1)
            dead = (ids >= 0) & (ids < bm.size) & bm[safe]
            d[dead] = np.inf
            ids[dead] = -1
        if self._delta is not None:
            dx, dsq, dgid = self._delta
            sc = (
                dsq[None, :]
                - 2.0 * (q @ dx.T)
                + np.einsum("bd,bd->b", q, q)[:, None]
            )
            sc = np.where(
                np.isinf(dsq)[None, :],
                np.inf,
                np.sqrt(np.maximum(sc, 0.0)),
            )
            all_d = np.concatenate([d, sc], axis=1)
            all_i = np.concatenate(
                [ids, np.broadcast_to(dgid[None, :], sc.shape)], axis=1
            )
            order = np.argsort(all_d, axis=1, kind="stable")[:, :k]
            d = np.take_along_axis(all_d, order, axis=1)
            ids = np.take_along_axis(all_i, order, axis=1)
            ids = np.where(np.isinf(d), -1, ids)
        return d[:, :k], ids[:, :k]

    def search(self, queries: np.ndarray, k: int, nprobe: int):
        """Cluster-table gather search (see _search_impl)."""
        return self._spill_dedup(self._search_impl, queries, k, nprobe)

    def search_fused(self, queries: np.ndarray, k: int, nprobe: int):
        """Fused per-shard stream-kernel search (ids match search)."""
        return self._spill_dedup(self._search_fused_impl, queries, k, nprobe)

    def search_loop(
        self, queries: np.ndarray, k: int, nprobe: int, reps: int = 16
    ):
        """``reps`` chained fused searches in ONE dispatch (timing API)."""
        return self._spill_dedup(
            self._search_loop_impl, queries, k, nprobe, reps
        )

    def search_scan(
        self,
        queries: np.ndarray,
        k: int,
        reps: int | None = None,
        recall_target: float = 0.99,
        overfetch: int = 0,
    ):
        """Distributed ApproxTopK full scan (see _search_scan_impl)."""
        return self._spill_dedup(
            self._search_scan_impl, queries, k, reps, recall_target,
            overfetch,
        )

    def search_xbin(
        self,
        queries: np.ndarray,
        k: int,
        reps: int | None = None,
        l_bins: int = 0,
        chunk_groups: int = 0,
    ):
        """Distributed XLA binned-min scan (see _search_xbin_impl)."""
        return self._spill_dedup(
            self._search_xbin_impl, queries, k, reps, l_bins, chunk_groups
        )

    def search_xbin8(
        self,
        queries: np.ndarray,
        k: int,
        reps: int | None = None,
        l_bins: int = 0,
        chunk_groups: int = 0,
    ):
        """Distributed int8 xbin scan (see _search_xbin8_impl)."""
        return self._spill_dedup(
            self._search_xbin8_impl, queries, k, reps, l_bins, chunk_groups
        )

    def search_binscan(
        self, queries: np.ndarray, k: int, reps: int | None = None
    ):
        """Distributed fused binned-min full scan (``reps`` chains)."""
        return self._spill_dedup(self._search_binscan_impl, queries, k, reps)

    def search_binscan8(
        self, queries: np.ndarray, k: int, reps: int | None = None
    ):
        """Distributed int8 fused binned-min scan (see
        _search_binscan8_impl)."""
        return self._spill_dedup(
            self._search_binscan8_impl, queries, k, reps
        )

    def search_bincompact(
        self,
        queries: np.ndarray,
        k: int,
        nprobe: int,
        reps: int | None = None,
        cap: int | None = None,
    ):
        """Distributed probed-union binned-min scan (see
        _search_bincompact_impl)."""
        return self._spill_dedup(
            self._search_bincompact_impl, queries, k, nprobe, reps, cap
        )



# ----------------------------------------------------------------------
# Cluster-axis probe fan-out (SURVEY §2 optional `cluster` mesh axis;
# VERDICT r2 item 9)
# ----------------------------------------------------------------------


class DistributedClusterIvfSearcher:
    """IVF search over a 2-D ``(data, cluster)`` mesh.

    Clusters are greedily partitioned across the ``cluster`` axis (each
    cluster group owns whole clusters); within a group the cluster-sorted
    row block is sharded across the ``data`` axis. A query's probe set
    therefore fans out across the cluster axis — each cluster group scores
    only the probed clusters it owns (the stream kernel's active-tile
    compaction skips the rest), and hot clusters are additionally split
    ``data``-ways. Per-device top-k sets are all-gathered over BOTH axes
    (O(B*k*R*C) ICI bytes) and merged, mirroring the reference's
    local-results-then-merge thread pattern (src/ivf/index.rs:193-206) as
    collectives.
    """

    def __init__(
        self,
        index: IvfIndex,
        embeddings: np.ndarray,
        mesh=None,
        data: int | None = None,
        cluster: int | None = None,
        tile: int = 1024,
        orig_ids: np.ndarray | None = None,
    ):
        from .mesh import CLUSTER_AXIS, make_mesh_2d

        # orig_ids: spilled layouts (query/spill.py) — see
        # DistributedIvfSearcher; searches then select 2k and dedup.
        self._spill_dups = orig_ids is not None

        if mesh is None:
            n_dev = len(jax.devices())
            cluster = cluster or max(1, n_dev // (data or 1))
            data = data or max(1, n_dev // cluster)
            mesh = make_mesh_2d(data, cluster)
        self.mesh = mesh
        shape = dict(zip(mesh.axis_names, mesh.devices.shape))
        R = shape[DATA_AXIS]
        C = shape[CLUSTER_AXIS]
        self._R, self._C = R, C

        embeddings = np.asarray(embeddings, dtype=np.float32)
        n, d = embeddings.shape
        if d != index.dim:
            raise ValidationError(
                f"Embedding dim {d} does not match index dim {index.dim}"
            )
        self.index = index
        self.n = n
        self.dim = d
        self.tile = tile
        kc = index.n_clusters

        # Greedy balance clusters over the C cluster groups.
        sizes = index.cluster_sizes()
        order = np.argsort(sizes)[::-1]
        group_of = np.zeros(kc, dtype=np.int64)
        load = np.zeros(C, dtype=np.int64)
        for c in order:
            g = int(np.argmin(load))
            group_of[c] = g
            load[g] += int(sizes[c])

        # Capacity per device: each of the R shards of a group holds at most
        # per_dev - 1 rows so the final row stays a pad/sentinel row.
        max_load = int(load.max()) if n else 0
        per_dev = max(_round_up(-(-max_load // R) + 1, tile), tile)
        n_slots = R * C  # slot b = r * C + g (P((data, cluster)) order)

        emb_blocks = np.zeros((n_slots, per_dev, d), dtype=np.float32)
        sq_blocks = np.full((n_slots, per_dev), np.inf, dtype=np.float32)
        gid_blocks = np.full((n_slots, per_dev), -1, dtype=np.int32)
        rc_blocks = np.full((n_slots, per_dev), kc, np.int32)
        cap = per_dev - 1
        for g in range(C):
            rows_g = np.concatenate(
                [index.cluster_rows(c) for c in range(kc) if group_of[c] == g]
                or [np.empty(0, dtype=np.int64)]
            ).astype(np.int64)
            # Cluster id per row of the group's (cluster-sorted) block.
            cids_g = np.concatenate(
                [
                    np.full(index.cluster_rows(c).size, c, np.int32)
                    for c in range(kc)
                    if group_of[c] == g
                ]
                or [np.empty(0, dtype=np.int32)]
            )
            for r in range(R):
                part = slice(r * cap, min((r + 1) * cap, rows_g.size))
                rows_p = rows_g[part]
                if rows_p.size == 0:
                    continue
                slot = r * C + g
                emb_blocks[slot, : rows_p.size] = embeddings[rows_p]
                sq_blocks[slot, : rows_p.size] = np.einsum(
                    "nd,nd->n", embeddings[rows_p], embeddings[rows_p]
                )
                gid_blocks[slot, : rows_p.size] = (
                    orig_ids[rows_p] if orig_ids is not None else rows_p
                )
                rc_blocks[slot, : rows_p.size] = cids_g[part]

        # Per-slot tile tables for the stream kernel.
        nt_local = per_dev // tile
        parts = rc_blocks.reshape(n_slots, nt_local, tile)
        nuniq = (np.diff(parts, axis=2) != 0).sum(axis=2).max() + 1
        cmax = max(128, _round_up(int(nuniq), 128))
        tc_blocks = np.full((n_slots, nt_local, cmax), kc, np.int32)
        lcl_blocks = np.empty((n_slots, nt_local, tile), np.float32)
        for s in range(n_slots):
            for t in range(nt_local):
                u = np.unique(parts[s, t])
                tc_blocks[s, t, : u.size] = u
                lcl_blocks[s, t] = np.searchsorted(u, parts[s, t])
        self._cmax = cmax
        self._per_dev = per_dev

        from .mesh import CLUSTER_AXIS as _CA

        row_spec = NamedSharding(self.mesh, P((DATA_AXIS, _CA)))
        self.emb = jax.device_put(
            emb_blocks.reshape(n_slots * per_dev, d), row_spec
        )
        self.emb_sq_pallas = jax.device_put(
            np.where(np.isinf(sq_blocks), 3.0e38, sq_blocks).reshape(-1),
            row_spec,
        )
        self.gids = jax.device_put(gid_blocks.reshape(-1), row_spec)
        self.lcl = jax.device_put(lcl_blocks.reshape(-1), row_spec)
        self.tc = jax.device_put(
            tc_blocks.reshape(n_slots * nt_local, cmax), row_spec
        )
        rep = NamedSharding(self.mesh, P())
        self.centroids = jax.device_put(index.centroids, rep)
        self.c_sq = jax.device_put(
            np.einsum("kd,kd->k", index.centroids, index.centroids), rep
        )

    def _max_probe_bucket(self, nprobe: int) -> int:
        return _max_probe_bucket(nprobe, self.index.n_clusters)

    def _body(self, k: int, nprobe: int, reps: int | None):
        from ..kernels.stream_topk import pallas_stream_masked_topk
        from .mesh import CLUSTER_AXIS as _CA

        max_probe = self._max_probe_bucket(nprobe)
        tile = self.tile
        cmax = self._cmax
        interpret = jax.default_backend() != "tpu"
        row = P((DATA_AXIS, _CA))

        def shard_fn(q, emb_local, sq_local, lcl_local, tc_local,
                     centroids, c_sq):
            return pallas_stream_masked_topk(
                q, centroids, c_sq, lcl_local, tc_local,
                emb_local, sq_local, jnp.int32(nprobe), k,
                max_probe=max_probe, tile=tile, cmax=cmax,
                interpret=interpret,
            )

        # Fan-in over BOTH axes: cluster groups hold disjoint clusters;
        # data shards hold disjoint rows of each group.
        return _shard_search_body(
            self, shard_fn,
            operands=(self.gids, self.emb, self.emb_sq_pallas, self.lcl,
                      self.tc, self.centroids, self.c_sq),
            specs=(row,) * 5 + (P(), P()),
            rows_local=self._per_dev, reps=reps,
            gather_axes=(DATA_AXIS, _CA),
        )

    @classmethod
    def with_spill(
        cls,
        index: IvfIndex,
        embeddings: np.ndarray,
        spill: float = 0.2,
        assign_block: int = 65536,
        assign_dtype=jnp.float32,
        **kwargs,
    ) -> "DistributedClusterIvfSearcher":
        """2-D-mesh searcher over a spilled layout (query/spill.py); see
        DistributedIvfSearcher.with_spill for the semantics."""
        from ..query.spill import build_spilled_layout

        ext_index, ext_emb, gid = build_spilled_layout(
            index, embeddings, spill,
            block=assign_block, assign_dtype=assign_dtype,
        )
        return cls(ext_index, ext_emb, orig_ids=gid, **kwargs)

    def _spill_dedup(self, fn, queries, k, *args):
        if not self._spill_dups:
            return fn(queries, k, *args)
        from ..query.spill import dedup_topk_np

        d, ids = fn(queries, 2 * k, *args)
        return dedup_topk_np(d, ids, k)

    def search(self, queries: np.ndarray, k: int, nprobe: int):
        """Fused stream-kernel search over the 2-D mesh."""
        return self._spill_dedup(self._search_impl, queries, k, nprobe)

    def _search_impl(self, queries: np.ndarray, k: int, nprobe: int):
        nprobe = min(max(1, nprobe), self.index.n_clusters)
        return self._body(k, nprobe, None)(queries)

    def search_loop(
        self, queries: np.ndarray, k: int, nprobe: int, reps: int = 16
    ):
        """``reps`` chained searches in ONE dispatch (timing API)."""
        return self._spill_dedup(
            self._search_loop_impl, queries, k, nprobe, reps
        )

    def _search_loop_impl(
        self, queries: np.ndarray, k: int, nprobe: int, reps: int = 16
    ):
        nprobe = min(max(1, nprobe), self.index.n_clusters)
        return self._body(k, nprobe, reps)(queries)
