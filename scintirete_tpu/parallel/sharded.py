"""Sharded indexes over a device mesh.

The reference is strictly single-process (SURVEY.md §2: no distributed
execution of any kind); this module is the TPU-native scaling extension
(SURVEY.md §5 last bullet, §7 step 8): the vector matrix and graph arrays
are sharded across devices with `jax.sharding.NamedSharding`, queries are
data-parallel over a second mesh axis, and per-shard top-k results are
combined with XLA collectives over ICI (`all_gather` inside `shard_map`) —
no hand-written transport.

Mesh layout: ("dp", "shard")
  - "shard": partitions the collection (each device holds N/S vectors, or a
    full independent HNSW sub-graph for 1/S of the collection),
  - "dp": replicates the index and partitions the query batch (pure data
    parallelism for throughput).

Search = local top-k on each shard -> all_gather over "shard" -> merge.
The merged result is exact for the flat index, and equals the union-best of
per-shard HNSW searches (standard sharded-ANN semantics).
"""

from __future__ import annotations

import functools
import os
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scintirete_tpu.index.device import (
    SEARCH_EXPAND,
    _search_kernel,
    _search_kernel_pivot,
    pivot_sample_host,
)
from scintirete_tpu.index.hnsw import HNSWIndex
from scintirete_tpu.ops.distance import pairwise_distance
from scintirete_tpu.types import DistanceMetric, HNSWParams, SearchParams
from scintirete_tpu.utils.rwlock import RWLock


def _pack_local(d, idx):
    """Pack (dists f32 [b,k], indices int [b,k]) into one int32 [b,2k]
    buffer INSIDE the shard_map body — the merged result leaves the fused
    program as a single array, so a serving pass costs one device->host
    transfer instead of two (tunnel rule: ~1 s round trip PER ARRAY).
    Indices must fit int32 — asserted at sync time (S * cap < 2^31)."""
    return jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(d.astype(jnp.float32), jnp.int32),
            idx.astype(jnp.int32),
        ],
        axis=1,
    )


def _unpack_host(packed) -> tuple[np.ndarray, np.ndarray]:
    """Fetch a _pack_local buffer (ONE transfer) -> (dists f32, idx i32)."""
    host = np.asarray(packed)
    k = host.shape[1] // 2
    return host[:, :k].copy().view(np.float32), host[:, k:]


def _query_upload_dtype():
    """f16 query upload (same contract as index/flat.py _QUERY_F16):
    kernels cast up to f32, so only query rounding deviates; halves the
    host->device query transfer on the tunnel."""
    return (
        jnp.float16
        if os.environ.get("SCNT_QUERY_F16", "0") == "1"
        else jnp.float32
    )


def _pow2_at_least(n: int, minimum: int = 8) -> int:
    """Tunnel program-count rule (CLAUDE.md): jit shapes/static args ride
    a pow2 ladder so client-controlled B/ef/k don't mint a fresh compiled
    variant per distinct value."""
    return max(1 << (max(int(n), 1) - 1).bit_length(), minimum)


def make_default_mesh(
    n_devices: Optional[int] = None, dp: int = 1
) -> Mesh:
    """A ("dp", "shard") mesh over the first n_devices devices."""
    n = n_devices or len(jax.devices())
    assert n % dp == 0, f"dp={dp} must divide device count {n}"
    return jax.make_mesh((dp, n // dp), ("dp", "shard"))


# ---------------------------------------------------------------------------
# Exact sharded flat scan
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("metric", "k", "mesh"))
def _sharded_flat_topk(
    queries,  # [B, D] sharded P("dp", None)
    vectors,  # [N, D] sharded P("shard", None)
    sq_norms,  # [N]   sharded P("shard")
    valid,  # [N] bool sharded P("shard")
    metric: int,
    k: int,
    mesh: Mesh,
):
    """Exact top-k over the sharded base. Returns a packed int32 [B, 2k]
    buffer: [:, :k] bitcast f32 dists, [:, k:] global row indices."""
    n_local = vectors.shape[0] // mesh.shape["shard"]

    def local(q, v, n, ok):
        # q: [B/dp, D] local queries (f16 under SCNT_QUERY_F16 — cast up,
        # the distance math is f32 either way); v/n/ok: local shard rows
        d = pairwise_distance(q.astype(jnp.float32), v, metric, n)
        d = jnp.where(ok[None, :], d, jnp.inf)
        kk = min(k, v.shape[0])
        top_d, top_i = jax.lax.top_k(-d, kk)
        top_d = -top_d
        if kk < k:
            top_d = jnp.pad(top_d, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
            top_i = jnp.pad(top_i, ((0, 0), (0, k - kk)), constant_values=0)
        shard_id = jax.lax.axis_index("shard")
        gidx = top_i.astype(jnp.int32) + shard_id.astype(jnp.int32) * n_local
        # combine across shards: gather everyone's candidates, merge locally
        all_d = jax.lax.all_gather(top_d, "shard", axis=1, tiled=True)  # [B, S*k]
        all_i = jax.lax.all_gather(gidx, "shard", axis=1, tiled=True)
        best_d, sel = jax.lax.top_k(-all_d, k)
        return _pack_local(-best_d, jnp.take_along_axis(all_i, sel, axis=1))

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dp", None), P("shard", None), P("shard"), P("shard")),
        out_specs=P("dp", None),
        check_vma=False,  # outputs are replicated over "shard" after all_gather
    )(queries, vectors, sq_norms, valid)


class ShardedFlatIndex:
    """Exact (brute-force) search over a collection sharded across devices.

    The production use: rerank baseline and small-to-medium collections
    where exact search on-chip already beats graph traversal.
    """

    def __init__(self, dim: int, metric: DistanceMetric, mesh: Optional[Mesh] = None,
                 dtype: str = "float32"):
        self.dim = dim
        self.metric = DistanceMetric(metric)
        self.mesh = mesh or make_default_mesh()
        self.dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self._n = 0
        self._vectors = None  # device, padded to multiple of shards
        self._sq_norms = None
        self._valid = None
        self._ids: list[int] = []

    @property
    def shards(self) -> int:
        return self.mesh.shape["shard"]

    def build(self, ids: list[int], vectors: np.ndarray) -> None:
        vectors = np.asarray(vectors, np.float32)
        n = vectors.shape[0]
        assert n < 2**31, "packed-result path indexes rows as int32"
        pad = (-n) % (self.shards * 8)
        padded = np.concatenate(
            [vectors, np.zeros((pad, self.dim), np.float32)], axis=0
        )
        valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        vec_sharding = NamedSharding(self.mesh, P("shard", None))
        row_sharding = NamedSharding(self.mesh, P("shard"))
        self._vectors = jax.device_put(padded.astype(self.dtype), vec_sharding)
        self._sq_norms = jax.device_put(
            np.sum(padded * padded, axis=1), row_sharding
        )
        self._valid = jax.device_put(valid, row_sharding)
        self._ids = list(ids)
        self._n = n

    def search_submit(self, queries: np.ndarray, k: int):
        """Upload + dispatch WITHOUT fetching; pair with search_collect.
        Lets a serving loop overlap the next batch's upload/kernel with the
        previous batch's result fetch (single-chip lesson, round 3: the
        tunnel transfer dominates the pass — see index/flat.py)."""
        queries = np.asarray(queries, np.float32)
        B = queries.shape[0]
        dp = self.mesh.shape["dp"]
        # pow2 B / k ladder: bound compiled-program variants (tunnel rule);
        # the per-shard top-k needs k <= rows-per-shard
        per_shard = self._vectors.shape[0] // self.shards
        k_pad = max(min(_pow2_at_least(k), per_shard), k)
        padded_b = _pow2_at_least(B, minimum=max(dp, 8))
        while padded_b % dp:
            padded_b += 1
        if padded_b > B:
            queries = np.concatenate(
                [queries,
                 np.zeros((padded_b - B, self.dim), np.float32)]
            )
        q_sharded = jax.device_put(
            queries.astype(_query_upload_dtype()),
            NamedSharding(self.mesh, P("dp", None)),
        )
        packed = _sharded_flat_topk(
            q_sharded, self._vectors, self._sq_norms, self._valid,
            metric=int(self.metric), k=k_pad, mesh=self.mesh,
        )
        return (B, k, packed)

    def search_collect(self, payload) -> list[list[tuple[int, float]]]:
        """Fetch a search_submit handle: one packed transfer, then assemble."""
        B, k, packed = payload
        d, i = _unpack_host(packed)
        d, i = d[:B, :k], i[:B, :k]
        out = []
        for b in range(B):
            row = []
            for dist, gi in zip(d[b], i[b]):
                if np.isinf(dist):
                    continue
                row.append((self._ids[int(gi)], float(dist)))
            out.append(row)
        return out

    def search(
        self, queries: np.ndarray, k: int
    ) -> list[list[tuple[int, float]]]:
        return self.search_collect(self.search_submit(queries, k))

    def search_batch_pipelined(
        self, query_batches: list[np.ndarray], k: int, depth: int = 3
    ) -> list[list[list[tuple[int, float]]]]:
        """Depth-N submit/collect overlap across a stream of query batches
        (the round-3 single-chip serving discipline, index/hnsw.py:406)."""
        from collections import deque

        out, pending = [], deque()
        for q in query_batches:
            pending.append(self.search_submit(q, k))
            if len(pending) >= depth:
                out.append(self.search_collect(pending.popleft()))
        while pending:
            out.append(self.search_collect(pending.popleft()))
        return out


# ---------------------------------------------------------------------------
# Sharded HNSW: independent sub-graphs per shard, fused search + merge
# ---------------------------------------------------------------------------


def _merge_shards_packed(d, s, cap, k):
    """Globalize per-shard slots, all_gather over ICI, merge, pack."""
    shard_id = jax.lax.axis_index("shard")
    # globalize slots: (shard, slot) -> shard * cap + slot
    gs = jnp.where(s >= 0, s.astype(jnp.int32) + shard_id * cap, -1)
    all_d = jax.lax.all_gather(d, "shard", axis=1, tiled=True)
    all_s = jax.lax.all_gather(gs, "shard", axis=1, tiled=True)
    best_d, sel = jax.lax.top_k(-all_d, k)
    return _pack_local(-best_d, jnp.take_along_axis(all_s, sel, axis=1))


@functools.partial(
    jax.jit,
    static_argnames=("metric", "ef", "k", "max_steps", "ef_upper", "mesh"),
)
def _fused_sharded_search(
    q, vectors, sq_norms, deleted, neighbors0, up_nbrs_cat, up_rows_flat,
    entry, entry_level,
    metric: int, ef: int, k: int, max_steps: int, ef_upper: int, mesh: Mesh,
):
    """One program: per-shard HNSW beam search (reference-style greedy
    descent entry; ef_upper>1 = beam descent, device.py
    _fused_beam_descent) + all_gather merge over ICI. Returns packed int32
    [B, 2k] (see _pack_local)."""

    def local(q, vectors, sq_norms, deleted, neighbors0, up_cat, up_rows,
              entry, entry_level):
        # q is this dp-group's B/dp slice: the "dp" axis partitions the
        # query batch (pure data parallelism), "shard" partitions the corpus
        d, s, _ = _search_kernel(
            q, vectors[0], sq_norms[0], deleted[0], neighbors0[0],
            up_cat[0], up_rows[0], entry[0], entry_level[0],
            metric=metric, ef=ef, k=k, max_steps=max_steps,
            ef_upper=ef_upper,
        )
        return _merge_shards_packed(d, s, vectors.shape[1], k)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("dp", None),  # query batch split over the dp axis
            P("shard", None, None),
            P("shard", None),
            P("shard", None),
            P("shard", None, None),
            P("shard", None, None),
            P("shard", None),
            P("shard"),
            P("shard"),
        ),
        out_specs=P("dp", None),
        check_vma=False,  # outputs are replicated over "shard" after all_gather
    )(q, vectors, sq_norms, deleted, neighbors0, up_nbrs_cat, up_rows_flat,
      entry, entry_level)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "ef", "k", "max_steps", "expand",
                     "use_pallas", "mesh"),
)
def _fused_sharded_search_pivot(
    q, vectors, sq_norms, deleted, neighbors0, pivots, pivot_vecs, pivot_sq,
    metric: int, ef: int, k: int, max_steps: int, expand: int,
    use_pallas: bool, mesh: Mesh,
):
    """Pivot-entry sharded search (round-3 single-chip serving lesson,
    VERDICT r3 item 7): each shard replaces its upper-layer greedy descent
    with ONE MXU matmul against its own R sampled pivots
    (device.py:_search_kernel_pivot), then beams layer 0 and merges over
    ICI. Returns packed int32 [B, 2k]."""

    def local(q, vectors, sq_norms, deleted, neighbors0, pv, pvec, psq):
        d, s, _ = _search_kernel_pivot(
            q, vectors[0], sq_norms[0], deleted[0], neighbors0[0],
            pv[0], pvec[0], psq[0],
            metric=metric, ef=ef, k=k, max_steps=max_steps,
            expand=expand, use_pallas=use_pallas,
        )
        return _merge_shards_packed(d, s, vectors.shape[1], k)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("dp", None),
            P("shard", None, None),
            P("shard", None),
            P("shard", None),
            P("shard", None, None),
            P("shard", None),
            P("shard", None, None),
            P("shard", None),
        ),
        out_specs=P("dp", None),
        check_vma=False,  # outputs are replicated over "shard" after all_gather
    )(q, vectors, sq_norms, deleted, neighbors0, pivots, pivot_vecs,
      pivot_sq)


class ShardedHNSWIndex:
    """S independent HNSW sub-indexes, one per mesh shard; queries run
    against every shard in one fused program and results merge by distance.

    Inserts round-robin across shards (keeps shards balanced); each shard's
    graph stays small enough that per-shard search cost drops ~S-fold while
    the union of per-shard top-k preserves recall (it can only see MORE of
    the true neighbors than a single graph of the same parameters).
    """

    def __init__(
        self,
        dim: int,
        params: Optional[HNSWParams] = None,
        metric: DistanceMetric = DistanceMetric.COSINE,
        mesh: Optional[Mesh] = None,
    ):
        self.mesh = mesh or make_default_mesh()
        self.S = self.mesh.shape["shard"]
        params = params or HNSWParams()
        self.params = params
        self.metric = DistanceMetric(metric)
        self.dim = dim
        seed = params.resolved_seed()
        # use_device=True: each shard's bulk build runs the MXU kNN
        # constructor / device-assisted chunked path (round-1 shipped
        # host-only sub-builds — an order of magnitude slower). The per-sub
        # device mirror is dropped after each build (bulk_insert below);
        # serving reads the fused stacked arrays instead.
        self.subs = [
            HNSWIndex(
                dim,
                HNSWParams(
                    m=params.m,
                    ef_construction=params.ef_construction,
                    ef_search=params.ef_search,
                    max_layers=params.max_layers,
                    seed=seed + s,
                    neighbor_heuristic=params.neighbor_heuristic,
                ),
                metric,
                use_device=True,
            )
            for s in range(self.S)
        ]
        self._insert_cursor = 0
        self._synced_versions = [-1] * self.S
        self._stacked = None
        self._shape_sig = None
        # per-shard cached host-side padded parts (version-keyed) so an
        # online insert into one shard restacks/reuploads ONLY that shard
        self._parts: list[Optional[dict]] = [None] * self.S
        self._part_versions = [-1] * self.S
        # id -> owning shard, maintained incrementally (inserts/deletes/
        # imports). Round-robin placement means ownership is not derivable
        # from the id, and a per-lookup scan over every shard's dict is
        # O(S) per id — pathological for bulk host paths at 1M x 8 shards.
        self._id_shard: dict[int, int] = {}
        # stacked [S, cap] slot->id table mirroring _stacked's cap, so
        # result assembly is one fancy-index gather instead of a per-hit
        # Python dict walk
        self._slot_ids: Optional[np.ndarray] = None
        # same discipline as HNSWIndex/FlatIndex: searches overlap under
        # the read lock, mutations take short exclusive sections, and the
        # lazy stacked-mirror sync (mutating _parts/_stacked/_slot_ids on
        # the READ path) is serialized by its own mutex — two concurrent
        # first-readers after a mutation must not interleave the restack
        self._rw = RWLock()
        self._sync_mu = threading.Lock()

    def size(self) -> int:
        return sum(sub.size() for sub in self.subs)

    # ----- HNSWIndex-compatible surface (lets Collection host a sharded
    # index transparently when tpu.shard_devices > 1) -----

    @property
    def id_to_slot(self) -> dict:
        # cold-path view (compact, AOF rewrite); hot paths route through
        # _id_shard below
        merged: dict[int, int] = {}
        for sub in self.subs:
            merged.update(sub.id_to_slot)
        return merged

    def _owner(self, vector_id: int):
        s = self._id_shard.get(vector_id)
        return None if s is None else self.subs[s]

    def contains(self, vector_id: int) -> bool:
        sub = self._owner(vector_id)
        return sub is not None and sub.contains(vector_id)

    def has_id(self, vector_id: int) -> bool:
        return self._owner(vector_id) is not None

    def get_vector(self, vector_id: int) -> np.ndarray:
        from scintirete_tpu.errors import ErrorCode, ScintireteError

        sub = self._owner(vector_id)
        if sub is None:
            raise ScintireteError(
                ErrorCode.VECTOR_NOT_FOUND, f"vector not found: {vector_id}"
            )
        return sub.get_vector(vector_id)

    def memory_bytes(self) -> int:
        return sum(sub.memory_bytes() for sub in self.subs)

    def set_ef_search(self, ef: int) -> None:
        import dataclasses

        self.params = dataclasses.replace(self.params, ef_search=ef)
        for sub in self.subs:
            sub.set_ef_search(ef)

    def export_graph_state(self) -> dict:
        return {
            "sharded": True,
            "dim": self.dim,
            "metric": int(self.metric),
            "shards": [sub.export_graph_state() for sub in self.subs],
        }

    @classmethod
    def import_graph_state(cls, state: dict, params=None,
                           mesh: Optional[Mesh] = None) -> "ShardedHNSWIndex":
        sub_states = state["shards"]
        idx = cls(
            dim=state["dim"],
            params=params,
            metric=DistanceMetric(state["metric"]),
            mesh=mesh or make_default_mesh(),
        )
        if idx.S == len(sub_states):
            idx.subs = [
                HNSWIndex.import_graph_state(s, use_device=True)
                for s in sub_states
            ]
            idx._id_shard = {
                vid: s
                for s, sub in enumerate(idx.subs)
                for vid in sub.id_to_slot
            }
            return idx
        # shard count changed (snapshot from different hardware / changed
        # tpu.shard_devices): a crash here would make the snapshot
        # unrestorable anywhere but the original mesh. Degrade to a
        # RE-SHARD: rebuild from the snapshots' live vectors (slow — a
        # fresh bulk build — but correct on any mesh).
        all_ids: list[int] = []
        rows: list[np.ndarray] = []
        for s in sub_states:
            sub = HNSWIndex.import_graph_state(s, use_device=False)
            live = sorted(
                vid for vid in sub.id_to_slot if sub.contains(vid)
            )
            all_ids.extend(live)
            for vid in live:
                rows.append(sub.get_vector(vid))
        if all_ids:
            idx.bulk_insert(all_ids, np.stack(rows))
        return idx

    def bulk_insert(self, ids: list[int], vectors: np.ndarray) -> None:
        with self._rw.write():
            vectors = np.asarray(vectors, np.float32)
            n = len(ids)
            assign = (self._insert_cursor + np.arange(n)) % self.S
            for s in range(self.S):
                sel = np.nonzero(assign == s)[0]
                if sel.size:
                    shard_ids = [ids[i] for i in sel.tolist()]
                    self.subs[s].bulk_insert(shard_ids, vectors[sel])
                    self._id_shard.update((vid, s) for vid in shard_ids)
                    # the build's single-device mirror is dead weight once
                    # the fused stacked arrays re-sync; free the HBM now
                    self.subs[s]._device = None
            self._insert_cursor = (self._insert_cursor + n) % self.S

    def delete(self, vector_id: int) -> bool:
        from scintirete_tpu.errors import ErrorCode, ScintireteError

        with self._rw.write():
            sub = self._owner(vector_id)
            if sub is not None:
                # soft delete: the id keeps its slot (and shard) until
                # compact, so _id_shard stays as-is — matches
                # sub.id_to_slot membership
                return sub.delete(vector_id)
        raise ScintireteError(
            ErrorCode.VECTOR_NOT_FOUND, f"vector not found: {vector_id}"
        )

    # ----- fused device search -----

    _SPECS = {
        "vectors": P("shard", None, None),
        "sq_norms": P("shard", None),
        "deleted": P("shard", None),
        "neighbors0": P("shard", None, None),
        "up_nbrs_cat": P("shard", None, None),
        "up_rows_flat": P("shard", None),
        "entry": P("shard"),
        "entry_level": P("shard"),
        # pivot-entry serving (each shard samples its own entry pivots)
        "pivots": P("shard", None),
        "pivot_vecs": P("shard", None, None),
        "pivot_sq": P("shard", None),
    }

    @staticmethod
    def _build_part(store, cap: int) -> dict:
        """One shard's padded host arrays (cat/rowmap at their natural
        lengths; padded to the unified lengths at assembly)."""
        from scintirete_tpu.index.device import build_cat_tables

        def pad2(a, rows, fill):
            out = np.full((rows,) + a.shape[1:], fill, a.dtype)
            out[: a.shape[0]] = a
            return out

        cat, rows, _ = build_cat_tables(store)
        # rows are per-layer segments of length store.cap; re-segment to the
        # unified cap so flat indexing (l * cap + slot) stays correct
        L = max(len(store.layers), 1)
        seg = rows.reshape(L, -1)
        seg = pad2(seg.T, cap, -1).T.reshape(-1)  # pad slot dim per layer
        e = max(store.entry_slot, 0)
        lv = int(store.levels[e]) if store.entry_slot >= 0 else 0
        piv = pivot_sample_host(store)  # per-shard entry pivots
        return {
            "vectors": pad2(store.vectors, cap, 0.0),
            "sq_norms": pad2(
                np.sum(store.vectors.astype(np.float32) ** 2, axis=1), cap, 0.0
            ),
            "deleted": pad2(store.deleted, cap, True),
            "neighbors0": pad2(store.neighbors0, cap, -1),
            "up_nbrs_cat": cat,
            "up_rows_flat": seg,
            "entry": np.int32(e),
            "entry_level": np.int32(max(lv, 0)),
            "pivots": piv["pivots"],
            "pivot_vecs": piv["pivot_vecs"],
            "pivot_sq": piv["pivot_sq"],
        }

    def _assemble_incremental(self, key: str, parts: list[dict],
                              changed: list[bool]):
        """Rebuild one stacked sharded array, re-uploading ONLY the shards
        whose sub-store version changed; unchanged shards reuse their
        existing per-device buffers (no HBM transfer)."""
        spec = self._SPECS[key]
        sharding = NamedSharding(self.mesh, spec)
        global_shape = (self.S,) + np.asarray(parts[0][key]).shape
        old = self._stacked[key]
        old_bufs = {sh.device: sh.data for sh in old.addressable_shards}
        bufs = []
        for dev, idx in sharding.addressable_devices_indices_map(
            global_shape
        ).items():
            j = idx[0].start or 0  # shard id from the leading-axis slice
            if changed[j] or dev not in old_bufs:
                local = np.asarray(parts[j][key])[None, ...]
                bufs.append(jax.device_put(local, dev))
            else:
                bufs.append(old_bufs[dev])
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, bufs
        )

    def _sync(self) -> None:
        # serialize the mirror mutation: two readers can hit the lazy sync
        # at once (the loser sees matching versions and no-ops), and the
        # version snapshot must happen under the mutex
        with self._sync_mu:
            self._sync_locked()

    def _sync_locked(self) -> None:
        versions = [sub.store.version for sub in self.subs]
        if self._stacked is not None and versions == self._synced_versions:
            return
        stores = [sub.store for sub in self.subs]
        cap = max(s.cap for s in stores)

        # refresh host parts only for shards whose store changed
        changed = [False] * self.S
        for j, s in enumerate(stores):
            if self._parts[j] is None or self._part_versions[j] != s.version:
                self._parts[j] = self._build_part(s, cap)
                self._part_versions[j] = s.version
                changed[j] = True
        parts = self._parts

        # unify cat/rowmap lengths (they grow with layer-table capacity)
        # and the pivot sample width R (it rides linked_count's pow2 ladder)
        cat_rows = max(p["up_nbrs_cat"].shape[0] for p in parts)
        map_len = max(p["up_rows_flat"].shape[0] for p in parts)
        piv_r = max(p["pivots"].shape[0] for p in parts)
        # int32 packed-result guard: global slot = shard * cap + slot
        assert self.S * cap < 2**31, (
            "packed-result path indexes (shard, slot) as int32"
        )

        def pad2(a, rows, fill):
            if a.shape[0] == rows:
                return a
            out = np.full((rows,) + a.shape[1:], fill, a.dtype)
            out[: a.shape[0]] = a
            return out

        def pad_edge(a, rows):
            # pivots pad by REPEATING the last entry (a duplicated pivot is
            # redundant but valid; a -1 sentinel would index vectors[-1])
            if a.shape[0] == rows:
                return a
            reps = np.repeat(a[-1:], rows - a.shape[0], axis=0)
            return np.concatenate([a, reps], axis=0)

        def unify(p):
            return {
                **p,
                "up_nbrs_cat": pad2(p["up_nbrs_cat"], cat_rows, -1),
                "up_rows_flat": pad2(p["up_rows_flat"], map_len, -1),
                "pivots": pad_edge(p["pivots"], piv_r),
                "pivot_vecs": pad_edge(p["pivot_vecs"], piv_r),
                "pivot_sq": pad_edge(p["pivot_sq"], piv_r),
            }

        padded = [unify(p) for p in parts]

        sig = (cap, cat_rows, map_len, piv_r)
        if self._stacked is None or sig != self._shape_sig:
            # first sync or device shapes changed: full stack + upload.
            # (a capacity change in ANY shard invalidates every cached part
            # — rebuild them at the unified cap)
            for j, s in enumerate(stores):
                if parts[j]["vectors"].shape[0] != cap:
                    self._parts[j] = self._build_part(s, cap)
                    self._part_versions[j] = s.version
            parts = self._parts
            padded = [unify(p) for p in parts]
            self._stacked = {
                key: jax.device_put(
                    np.stack([p[key] for p in padded]),
                    NamedSharding(self.mesh, spec),
                )
                for key, spec in self._SPECS.items()
            }
        else:
            self._stacked = {
                key: self._assemble_incremental(key, padded, changed)
                for key in self._SPECS
            }
        # stacked slot->id mirror for vectorized result assembly
        if self._slot_ids is None or self._slot_ids.shape != (self.S, cap):
            self._slot_ids = np.zeros((self.S, cap), np.uint64)
            refresh = range(self.S)
        else:
            refresh = [j for j in range(self.S) if changed[j]]
            if refresh:
                # copy-on-write: in-flight search payloads hold a reference
                # to the table captured at submit time; refreshing rows in
                # place would rewrite them under a pipelined collect (e.g.
                # a delete+insert reusing a slot decodes the wrong id)
                self._slot_ids = self._slot_ids.copy()
        for j in refresh:
            sid = self.subs[j].slot_to_id
            m = min(sid.shape[0], cap)
            self._slot_ids[j, :m] = sid[:m]
            self._slot_ids[j, m:] = 0
        self._shape_sig = sig
        self._synced_versions = versions

    def search_submit(
        self,
        queries: np.ndarray,
        params: SearchParams,
        entry_mode: str = "pivot",  # "pivot" (MXU entry) | "descent" (ref)
    ):
        """Upload + dispatch WITHOUT fetching; pair with search_collect
        (round-3 single-chip serving discipline — index/device.py
        search_submit). The slot->id table and cap are captured here so a
        concurrent restack can't skew an in-flight decode."""
        with self._rw.read():
            B = len(queries)
            if self.size() == 0:
                return (B, 0, 0, None, None)
            self._sync()
            queries = np.asarray(queries, np.float32)
            k = params.top_k
            ef = max(params.ef_search or self.params.ef_search, k)
            a = self._stacked

            # bound compiled-program variants (tunnel rule): B rides the
            # pow2 ladder (also a multiple of dp: dp | device count, a
            # pow2 here); ef/k are STATIC jit args, so client-controlled
            # values are padded up the ladder too — a larger beam only
            # improves recall and distances stay exact; extra hits are
            # sliced off below
            dp = self.mesh.shape["dp"]
            k_pad = _pow2_at_least(k)
            ef_pad = _pow2_at_least(max(ef, k_pad), minimum=16)
            padded_b = _pow2_at_least(B, minimum=max(dp, 8))
            while padded_b % dp:  # non-pow2 dp (e.g. 6 devices, dp=3)
                padded_b += 1
            if padded_b > B:
                queries = np.concatenate(
                    [queries,
                     np.zeros((padded_b - B, queries.shape[1]), np.float32)]
                )
            q = jax.device_put(
                queries.astype(_query_upload_dtype()),
                NamedSharding(self.mesh, P("dp", None)),
            )
            if entry_mode == "pivot":
                # fused Pallas pivot scan on real TPUs (score matrix stays
                # in VMEM); XLA path on CPU meshes / odd pivot counts
                use_pallas = (
                    jax.default_backend() == "tpu"
                    and a["pivots"].shape[1] % 512 == 0
                )
                packed = _fused_sharded_search_pivot(
                    q,
                    a["vectors"], a["sq_norms"], a["deleted"],
                    a["neighbors0"], a["pivots"], a["pivot_vecs"],
                    a["pivot_sq"],
                    metric=int(self.metric), ef=ef_pad, k=k_pad,
                    max_steps=ef_pad + 64, expand=SEARCH_EXPAND,
                    use_pallas=use_pallas, mesh=self.mesh,
                )
            else:
                packed = _fused_sharded_search(
                    q,
                    a["vectors"], a["sq_norms"], a["deleted"],
                    a["neighbors0"], a["up_nbrs_cat"], a["up_rows_flat"],
                    a["entry"], a["entry_level"],
                    metric=int(self.metric), ef=ef_pad, k=k_pad,
                    max_steps=ef_pad + 64,
                    ef_upper=max(
                        int(os.environ.get("SCNT_SEARCH_EF_UPPER", "1")), 1
                    ),
                    mesh=self.mesh,
                )
            cap = a["vectors"].shape[1]
            return (B, k, cap, self._slot_ids, packed)

    def search_collect(self, payload) -> list[list[tuple[int, float]]]:
        """Fetch a search_submit handle: ONE packed transfer, then decode
        against the slot->id table captured at submit time."""
        B, k, cap, slot_ids, packed = payload
        if packed is None:
            return [[] for _ in range(B)]
        d, gs = _unpack_host(packed)
        d, gs = d[:B, :k], gs[:B, :k]
        safe = np.maximum(gs, 0)
        hit_ids = slot_ids[safe // cap, safe % cap]
        ok = (gs >= 0) & np.isfinite(d)
        return [
            [
                (int(vid), float(dist))
                for vid, dist, o in zip(hit_ids[b], d[b], ok[b])
                if o
            ]
            for b in range(B)
        ]

    def search_batch(
        self, queries: np.ndarray, params: SearchParams,
        entry_mode: str = "pivot",
    ) -> list[list[tuple[int, float]]]:
        return self.search_collect(
            self.search_submit(queries, params, entry_mode=entry_mode)
        )

    def search_batch_pipelined(
        self,
        query_batches: list[np.ndarray],
        params: SearchParams,
        depth: int = 3,
        entry_mode: str = "pivot",
    ) -> list[list[list[tuple[int, float]]]]:
        """Depth-N submit/collect overlap across a stream of query batches
        (single-chip lesson: the result fetch dominates a serving pass;
        overlapping it with the next batch's upload+kernel recovers it)."""
        from collections import deque

        out, pending = [], deque()
        for q in query_batches:
            pending.append(self.search_submit(q, params, entry_mode))
            if len(pending) >= depth:
                out.append(self.search_collect(pending.popleft()))
        while pending:
            out.append(self.search_collect(pending.popleft()))
        return out
