"""HNSWIndex: the public index type (ids in, results out).

Capability parity with the reference's `core.HNSWIndex` interface
(reference: internal/core/interfaces.go:114-134 — Build/Insert/Delete/Search/
Get/Size/MemoryUsage/GetParameters/Statistics/SetEfSearch/Export/Import).

Search executes on the TPU via the batched device kernels (device.py) once
the collection is large enough to pay for a dispatch; tiny collections and
the test oracle use the sequential host path. Mutations always go through
the host store; the device mirror re-syncs lazily (version keyed).

Concurrency model (reference: hnsw.go:292 takes RWMutex.RLock for Search):
readers share an RWLock; writers serialize on a separate mutex and take the
write side only for short mutation sections. Bulk builds release the write
side at every chunk boundary (the store's invariants hold there), so
searches proceed DURING a build instead of queueing behind it — the store
they see is simply the graph as of the last completed chunk. A from-scratch
kNN build assembles into a detached store off-lock and publishes it with one
atomic swap.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Any, Optional, Sequence

import numpy as np

from scintirete_tpu.errors import ErrorCode, ScintireteError
from scintirete_tpu.index import host_algo
from scintirete_tpu.index.store import GraphStore, LayerStore
from scintirete_tpu.types import DistanceMetric, HNSWParams, SearchParams
from scintirete_tpu.utils.rwlock import RWLock


@dataclasses.dataclass
class GraphStats:
    nodes: int
    connections: int
    avg_degree: float
    max_layer: int
    memory_bytes: int


# an append this large (and at least 4x the existing collection) is
# rebuilt as a fresh exact-kNN graph of the union instead of chunked
# insertion — faster on TPU and a better graph. Smaller appends keep the
# chunked path, whose vectors become searchable chunk by chunk.
REBUILD_APPEND_MIN = 16384


class HNSWIndex:
    """Thread-safe HNSW index keyed by uint64 vector IDs."""

    def __init__(
        self,
        dim: int,
        params: HNSWParams | None = None,
        metric: DistanceMetric = DistanceMetric.COSINE,
        device_dtype: str = "float32",
        use_device: bool = True,
        search_batch_size: int = 256,
        build_chunk_size: int = 1024,
        device_search_min_size: int = 0,
    ):
        params = params or HNSWParams()
        params.validate()
        self.store = GraphStore(dim, params, metric)
        self.id_to_slot: dict[int, int] = {}
        self.slot_to_id: np.ndarray = np.zeros(self.store.cap, np.uint64)
        self.device_dtype = device_dtype
        self.use_device = use_device
        self.search_batch_size = search_batch_size
        self.build_chunk_size = build_chunk_size
        # below this many live vectors, searches stay on host — a device
        # dispatch costs ~ms (and ~20 ms over a tunneled TPU) while a host
        # search of a tiny graph is microseconds (tpu.device_search_min_size)
        self.device_search_min_size = device_search_min_size
        self._device = None  # lazy DeviceIndex
        # device-resident scan-form base for the batched append path
        # (knn_build.append_batch scan_cache contract)
        self._append_scan_cache: dict = {}
        # readers share; writers take short exclusive sections (see module doc)
        self._rw = RWLock()
        # writer-writer serialization across whole operations (a bulk build
        # must not interleave with online inserts mid-build)
        self._write_mu = threading.RLock()

    # ----- properties -----

    @property
    def dim(self) -> int:
        return self.store.dim

    @property
    def params(self) -> HNSWParams:
        return self.store.params

    @property
    def metric(self) -> DistanceMetric:
        return self.store.metric

    def size(self) -> int:
        with self._rw.read():
            return self.store.live

    def memory_bytes(self) -> int:
        with self._rw.read():
            return self.store.memory_bytes() + 8 * len(self.id_to_slot)

    def set_ef_search(self, ef: int) -> None:
        """Mutate the default ef (reference: hnsw.go:449-453)."""
        with self._write_mu, self._rw.write():
            p = self.store.params
            self.store.params = dataclasses.replace(p, ef_search=ef)

    def stats(self) -> GraphStats:
        with self._rw.read():
            conns = self.store.connection_count()
            n = max(self.store.live, 1)
            return GraphStats(
                nodes=self.store.live,
                connections=conns,
                avg_degree=conns / n,
                max_layer=self.store.max_layer,
                memory_bytes=self.memory_bytes(),
            )

    # ----- mutation -----

    def insert(self, vector_id: int, elements: Sequence[float]) -> None:
        with self._write_mu, self._rw.write():
            if vector_id in self.id_to_slot:
                raise ScintireteError(
                    ErrorCode.INVALID_PARAMETER,
                    f"vector with ID {vector_id} already exists",
                )
            vec = np.asarray(elements, np.float32)
            if vec.ndim != 1 or vec.shape[0] != self.store.dim:
                from scintirete_tpu.errors import dimension_mismatch

                raise dimension_mismatch(self.store.dim, int(vec.shape[-1]))
            slot = host_algo.insert(self.store, vec)
            self._register_slot(vector_id, slot)

    def bulk_insert(self, ids: Sequence[int], vectors: np.ndarray) -> None:
        """Bulk build: from-scratch builds of device-eligible size use the
        exact-kNN constructor (index/knn_build.py — dense MXU phases, no
        sequential insertion); everything else takes the chunked
        device-assisted incremental path (index/bulk.py)."""
        from scintirete_tpu.index import bulk, knn_build

        with self._write_mu:
            # id_to_slot is only mutated under _write_mu, so validation here
            # is race-free vs other writers; readers never mutate it
            seen: set[int] = set()
            for vid in ids:
                v = int(vid)
                # within-batch repeats would register two slots under one
                # id: searches return the id twice, delete() tombstones
                # only the last slot, the other becomes a phantom
                if v in self.id_to_slot or v in seen:
                    raise ScintireteError(
                        ErrorCode.INVALID_PARAMETER,
                        f"vector with ID {vid} already exists",
                    )
                seen.add(v)
            vectors = np.asarray(vectors, np.float32)
            if vectors.ndim != 2 or vectors.shape[1] != self.store.dim:
                from scintirete_tpu.errors import dimension_mismatch

                raise dimension_mismatch(self.store.dim, int(vectors.shape[-1]))
            if (
                self.use_device
                and self.store.count == 0
                and len(vectors) >= knn_build.MIN_BUILD_SIZE
            ):
                # from-scratch build: assemble into a detached store with no
                # locks held (searches on the still-empty index return []),
                # then publish with one atomic swap
                tmp = GraphStore(
                    self.store.dim, self.store.params, self.store.metric
                )
                slots = knn_build.build(
                    tmp, vectors, scan_cache=self._append_scan_cache
                )
                with self._rw.write():
                    self.store = tmp
                    self._device = None  # fresh mirror -> full upload
                    # _append_scan_cache: build() re-seeded it (new lineage)
                    for vid, slot in zip(ids, slots):
                        self._register_slot(int(vid), int(slot))
            elif (
                self.use_device
                and self.store.live == self.store.count  # no tombstones
                and len(vectors)
                >= max(4 * self.store.count, REBUILD_APPEND_MIN)
            ):
                # append at least doubles the collection: rebuilding the
                # UNION with the kNN constructor beats chunked insertion
                # (measured ~5-10x) and yields the better exact-kNN graph;
                # assembled off-lock, published with one atomic swap
                n_old = self.store.count
                old_ids = self.slot_to_id[:n_old].astype(np.uint64)
                all_vecs = np.concatenate(
                    [self.store.vectors[:n_old], vectors]
                )
                tmp = GraphStore(
                    self.store.dim, self.store.params, self.store.metric
                )
                slots = knn_build.build(
                    tmp, all_vecs, scan_cache=self._append_scan_cache
                )
                all_ids = [int(v) for v in old_ids] + [int(v) for v in ids]
                new_map = dict(zip(all_ids, (int(s) for s in slots)))
                new_rev = np.zeros(tmp.cap, np.uint64)
                new_rev[np.asarray(slots)] = all_ids
                with self._rw.write():
                    self.store = tmp
                    self._device = None
                    # _append_scan_cache: build() re-seeded it (new lineage)
                    self.id_to_slot = new_map
                    self.slot_to_id = new_rev
            elif (
                self.use_device
                and self.store.count >= knn_build.MIN_BUILD_SIZE
                and (
                    len(vectors) >= knn_build.APPEND_MIN
                    # on large graphs even small-batch appends go batched:
                    # the chunked path's per-vector link application
                    # degrades sharply at ~1M (measured self-recall 0.18
                    # vs 0.95+ batched), and correctness beats the clone
                    # overhead
                    or (self.store.count >= 200_000 and len(vectors) >= 64)
                )
            ):
                # mid-size append: batched kNN-append into a CLONE off-lock
                # (readers keep the old store), published with one swap.
                # The clone CONTINUES dirty tracking and the scan cache keeps
                # the corpus device-resident, so neither the append's scans
                # nor the post-swap mirror sync re-upload the whole graph
                with knn_build._phase("append_clone"):
                    tmp = self.store.clone(
                        track_dirty=True, share_append_safe=True
                    )
                slots = knn_build.append_batch(
                    tmp, vectors, scan_cache=self._append_scan_cache
                )
                with self._rw.write():
                    self.store = tmp
                    # keep self._device: DeviceGraph.sync is version-keyed
                    # and the clone carried the mirror's dirty baseline —
                    # it scatters only the rows this append touched (a
                    # capacity change still forces the full upload path)
                    for vid, slot in zip(ids, slots):
                        self._register_slot(int(vid), int(slot))
            else:
                device = self._get_device() if self.use_device else None
                id_iter = iter(ids)

                def on_slots(new_slots):
                    # called inside a write section: ids become searchable
                    # atomically with their links
                    for slot in new_slots:
                        self._register_slot(int(next(id_iter)), int(slot))

                bulk.bulk_insert(
                    self.store, vectors, device=device,
                    chunk_size=self.build_chunk_size,
                    write_ctx=self._rw.write, on_slots=on_slots,
                )

    def _register_slot(self, vector_id: int, slot: int) -> None:
        self.id_to_slot[vector_id] = slot
        if self.slot_to_id.shape[0] < self.store.cap:
            new = np.zeros(self.store.cap, np.uint64)
            new[: self.slot_to_id.shape[0]] = self.slot_to_id
            self.slot_to_id = new
        self.slot_to_id[slot] = vector_id

    def delete(self, vector_id: int) -> bool:
        """Tombstone an id. Returns False when it was already deleted
        (reference counts only live ids as deleted, collection.go:152-190)."""
        with self._write_mu, self._rw.write():
            slot = self.id_to_slot.get(vector_id)
            if slot is None:
                raise ScintireteError(
                    ErrorCode.VECTOR_NOT_FOUND, f"vector not found: {vector_id}"
                )
            # keep id mapping so Get on a deleted id reports not-found
            # (mirrors reference tombstone visibility)
            return host_algo.delete(self.store, slot)

    def contains(self, vector_id: int) -> bool:
        with self._rw.read():
            slot = self.id_to_slot.get(vector_id)
            return slot is not None and not self.store.deleted[slot]

    def has_id(self, vector_id: int) -> bool:
        """True if the id was ever assigned (tombstoned ids included)."""
        with self._rw.read():
            return vector_id in self.id_to_slot

    def get_vector(self, vector_id: int) -> np.ndarray:
        with self._rw.read():
            slot = self.id_to_slot.get(vector_id)
            if slot is None or self.store.deleted[slot]:
                raise ScintireteError(
                    ErrorCode.VECTOR_NOT_FOUND, f"vector not found: {vector_id}"
                )
            return self.store.vectors[slot].copy()

    # ----- search -----

    def search(
        self, query: Sequence[float], params: SearchParams
    ) -> list[tuple[int, float]]:
        """Single query -> [(id, distance)] ascending."""
        return self.search_batch(
            np.asarray(query, np.float32)[None, :], params
        )[0]

    def search_batch(
        self, queries: np.ndarray, params: SearchParams
    ) -> list[list[tuple[int, float]]]:
        """Batched queries [B, dim] -> per-query [(id, distance)] ascending."""
        queries = np.asarray(queries, np.float32)
        if queries.ndim != 2 or queries.shape[1] != self.store.dim:
            from scintirete_tpu.errors import dimension_mismatch

            raise dimension_mismatch(self.store.dim, int(queries.shape[-1]))
        with self._rw.read():
            if self.store.live == 0:
                return [[] for _ in range(queries.shape[0])]
            if self.use_device and self.store.live >= self.device_search_min_size:
                slots_b, dists_b = self._device_search(queries, params)
            else:
                slots_b, dists_b = self._host_search(queries, params)
            return self._assemble(slots_b, dists_b)

    def _assemble(self, slots_b, dists_b):
        from scintirete_tpu.index.results import assemble_results

        return assemble_results(self.slot_to_id, slots_b, dists_b)

    def search_batch_arrays(
        self, queries: np.ndarray, params: SearchParams
    ) -> tuple[np.ndarray, np.ndarray]:
        """Packed-array search for the BatchSearch RPC: (ids u64 [B,k],
        dists f32 [B,k]); id 0 / +inf mark missing hits (see
        FlatIndex.search_batch_arrays)."""
        from scintirete_tpu.index.results import assemble_arrays

        queries = np.asarray(queries, np.float32)
        if queries.ndim != 2 or queries.shape[1] != self.store.dim:
            from scintirete_tpu.errors import dimension_mismatch

            raise dimension_mismatch(self.store.dim, int(queries.shape[-1]))
        with self._rw.read():
            if self.store.live == 0:
                b = queries.shape[0]
                return (np.zeros((b, 0), np.uint64),
                        np.zeros((b, 0), np.float32))
            if (
                self.use_device
                and self.store.live >= self.device_search_min_size
            ):
                slots_b, dists_b = self._device_search(queries, params)
            else:
                slots_b, dists_b = self._host_search(queries, params)
            return assemble_arrays(self.slot_to_id, slots_b, dists_b)

    def search_submit(self, queries: np.ndarray, params: SearchParams):
        """Dispatch a batched search (upload + kernels) without fetching;
        pair with search_collect — see FlatIndex.search_submit."""
        queries = np.asarray(queries, np.float32)
        if queries.ndim != 2 or queries.shape[1] != self.store.dim:
            from scintirete_tpu.errors import dimension_mismatch

            raise dimension_mismatch(self.store.dim, int(queries.shape[-1]))
        with self._rw.read():
            if (
                self.store.live == 0
                or not self.use_device
                or self.store.live < self.device_search_min_size
            ):
                return ("done", self.search_batch(queries, params))
            ef = params.ef_search or self.store.params.ef_search
            return (
                "dev",
                self._get_device().search_submit(
                    self.store, queries, params.top_k,
                    max(ef, params.top_k),
                ),
            )

    def search_collect(self, pending) -> list[list[tuple[int, float]]]:
        kind, payload = pending
        if kind == "done":
            return payload
        with self._rw.read():
            slots_b, dists_b = self._get_device().search_collect(payload)
            return self._assemble(slots_b, dists_b)

    def search_batch_pipelined(
        self, batches, params: SearchParams, depth: int = 2
    ) -> list[list[list[tuple[int, float]]]]:
        """Search several query batches keeping up to `depth` in flight
        (steady-state serving over a tunneled TPU; the transfer dominates
        the pass, so overlap is ~2x of sequential search_batch calls)."""
        from collections import deque

        out = []
        pending: deque = deque()
        for q in batches:
            pending.append(self.search_submit(q, params))
            if len(pending) >= depth:
                out.append(self.search_collect(pending.popleft()))
        while pending:
            out.append(self.search_collect(pending.popleft()))
        return out

    def _host_search(self, queries, params):
        slots_b, dists_b = [], []
        k = params.top_k
        for q in queries:
            slots, dists = host_algo.search(self.store, q, k, params.ef_search)
            pad = k - slots.shape[0]
            if pad > 0:
                slots = np.concatenate([slots, np.full(pad, -1, np.int64)])
                dists = np.concatenate([dists, np.full(pad, np.inf, np.float32)])
            slots_b.append(slots)
            dists_b.append(dists)
        return np.stack(slots_b), np.stack(dists_b)

    def _get_device(self):
        from scintirete_tpu.index.device import DeviceIndex

        if self._device is None:
            self._device = DeviceIndex(
                dtype=self.device_dtype, max_batch=self.search_batch_size
            )
        return self._device

    def _device_search(self, queries, params):
        ef = params.ef_search if params.ef_search else self.store.params.ef_search
        ef = max(ef, params.top_k)
        return self._get_device().search(self.store, queries, params.top_k, ef)

    # ----- graph state export/import (reference: hnsw.go:703-804) -----

    def export_graph_state(self) -> dict[str, Any]:
        """Snapshot of the full graph; restoring it needs no rebuild."""
        with self._rw.read():
            s = self.store
            n = s.count
            return {
                "dim": s.dim,
                "metric": int(s.metric),
                "params": dataclasses.asdict(s.params),
                "count": n,
                "live": s.live,
                "entry_slot": s.entry_slot,
                "max_layer": s.max_layer,
                "vectors": s.vectors[:n].copy(),
                "levels": s.levels[:n].copy(),
                "deleted": s.deleted[:n].copy(),
                "neighbors0": s.neighbors0[:n].copy(),
                "layers": [
                    {
                        "count": ls.count,
                        "node_slot": ls.node_slot[: ls.count].copy(),
                        "nbrs": ls.nbrs[: ls.count].copy(),
                    }
                    for ls in s.layers
                ],
                "slot_to_id": self.slot_to_id[:n].copy(),
            }

    @classmethod
    def import_graph_state(
        cls,
        state: dict[str, Any],
        device_dtype: str = "float32",
        use_device: bool = True,
        **kw: Any,
    ) -> "HNSWIndex":
        """Restore without rebuild. `kw` forwards serving/build knobs
        (search_batch_size, device_search_min_size, build_chunk_size) —
        a restored index must honor the same [tpu] config a fresh one
        gets, or a 50-vector collection serves off the device after a
        restart while serving on the host before it."""
        params = HNSWParams(**state["params"])
        idx = cls(
            dim=state["dim"],
            params=params,
            metric=DistanceMetric(state["metric"]),
            device_dtype=device_dtype,
            use_device=use_device,
            **kw,
        )
        s = idx.store
        n = int(state["count"])
        while s.cap < max(n, 1):
            s._grow()
        s.count = n
        s.live = int(state["live"])
        s.entry_slot = int(state["entry_slot"])
        s.max_layer = int(state["max_layer"])
        s.vectors[:n] = state["vectors"]
        s.levels[:n] = state["levels"]
        s.deleted[:n] = state["deleted"]
        s.neighbors0[:n] = state["neighbors0"]
        s.layers = []
        for ldata in state["layers"]:
            ls = LayerStore(s.m, s.cap)
            cnt = int(ldata["count"])
            while ls.cap < max(cnt, 1):
                ls.cap *= 2
            ls.node_slot = np.full(ls.cap, -1, np.int32)
            ls.nbrs = np.full((ls.cap, s.m), -1, np.int32)
            ls.node_slot[:cnt] = ldata["node_slot"]
            ls.nbrs[:cnt] = ldata["nbrs"]
            ls.count = cnt
            rows = np.arange(cnt, dtype=np.int32)
            ls.row_of[ldata["node_slot"][:cnt]] = rows
            s.layers.append(ls)
        s.linked_count = n
        slot_to_id = np.asarray(state["slot_to_id"], np.uint64)
        idx.slot_to_id = np.zeros(s.cap, np.uint64)
        idx.slot_to_id[:n] = slot_to_id
        for slot in range(n):
            if s.levels[slot] >= 0:
                idx.id_to_slot[int(slot_to_id[slot])] = slot
        s.version += 1
        return idx
