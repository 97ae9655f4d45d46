"""Flat-array HNSW graph storage.

The reference keeps `nodes map[uint64]*HNSWNode` with ragged per-node
`Connections [][]uint64` (reference: hnsw.go:17-26, :107-125). Here the graph
is a struct-of-arrays laid out for TPU consumption:

  layer 0 (every node):
    vectors    f32[cap, dim]     single copy of all vector data
    levels     i32[cap]          node's top layer; -1 = empty slot
    deleted    bool[cap]         tombstones (reference: soft delete)
    neighbors0 i32[cap, 2M]      adjacency, node-slot indices, -1 = empty
                                 (layer-0 degree is 2M, reference hnsw.go:228-231)

  layer l >= 1 (only nodes with level >= l, ~cap/2^l of them):
    node_slot  i32[cap_l]        layer row -> node slot
    nbrs       i32[cap_l, M]     adjacency, node-slot indices, -1 = empty
    row_of     i32[cap]          node slot -> layer row, -1 if absent

Slots are internal; uint64 vector IDs map to slots one level up (HNSWIndex).
Capacities double on growth (power-of-two static shapes for jit).
"""

from __future__ import annotations

import numpy as np

from scintirete_tpu.types import HNSWParams, DistanceMetric

_MIN_CAP = 256
_MIN_LAYER_CAP = 64


def _grow_to(arr: np.ndarray, cap: int, fill) -> np.ndarray:
    # np.zeros is calloc-backed (~free); np.full memsets explicitly, which
    # costs seconds per GB on this host — avoid it for zero fills
    shape = (cap,) + arr.shape[1:]
    if fill == 0 or fill is False:
        new = np.zeros(shape, dtype=arr.dtype)
    else:
        new = np.full(shape, fill, dtype=arr.dtype)
    new[: arr.shape[0]] = arr
    return new


class LayerStore:
    """Compact adjacency for one upper layer (l >= 1)."""

    def __init__(self, m: int, node_cap: int, cap: int = _MIN_LAYER_CAP):
        self.m = m
        self.cap = cap
        self.count = 0
        self.node_slot = np.full(cap, -1, np.int32)
        self.nbrs = np.full((cap, m), -1, np.int32)
        self.row_of = np.full(node_cap, -1, np.int32)

    def add(self, node_slot: int) -> int:
        if self.count == self.cap:
            self.cap *= 2
            self.node_slot = _grow_to(self.node_slot, self.cap, -1)
            self.nbrs = _grow_to(self.nbrs, self.cap, -1)
        row = self.count
        self.node_slot[row] = node_slot
        self.row_of[node_slot] = row
        self.count += 1
        return row

    def grow_node_cap(self, node_cap: int) -> None:
        self.row_of = _grow_to(self.row_of, node_cap, -1)


class GraphStore:
    """Host-resident flat-array graph; the single source of truth for
    structure. Device copies are synced from it (see device.py)."""

    def __init__(
        self,
        dim: int,
        params: HNSWParams,
        metric: DistanceMetric,
        cap: int = _MIN_CAP,
    ):
        self.dim = dim
        self.params = params
        self.metric = DistanceMetric(metric)
        self.m = params.m
        self.m0 = params.m * 2
        self.max_layers = params.max_layers

        self.cap = cap
        self.count = 0  # slots handed out (includes tombstones)
        self.live = 0  # live (non-deleted) nodes
        self.vectors = np.zeros((cap, dim), np.float32)
        self.levels = np.full(cap, -1, np.int32)
        self.deleted = np.zeros(cap, np.bool_)
        self.neighbors0 = np.full((cap, self.m0), -1, np.int32)
        self.layers: list[LayerStore] = []  # index 0 -> layer 1

        self.entry_slot = -1
        self.max_layer = -1
        # publication watermark: slots [0, linked_count) have had their
        # links applied (or are intentionally link-free entry nodes). The
        # chunked bulk build allocates a chunk's slots BEFORE its links
        # apply (bulk.py pipelines dispatch ahead of apply), so allocated
        # slots above this watermark are unreachable by traversal AND must
        # not be used as search entry points: a pivot sampled from an
        # unlinked slot has no out-edges, the beam cannot expand, and the
        # search returns a single bogus unregistered hit
        self.linked_count = 0
        # monotonically bumped on every mutation; device sync is keyed off it
        self.version = 0
        # bumped only when VECTOR contents change (slot allocation); the
        # append-path device scan cache is keyed off it — adjacency edits
        # and tombstones don't invalidate a cached vector matrix
        self.vec_version = 0
        # identity token shared by clone() (a clone CONTINUES the lineage;
        # a restored/rebuilt store starts a new one) — guards the append
        # scan cache against cross-store vec_version collisions
        self.lineage: object = object()
        rng_seed = params.resolved_seed()
        self.rng = np.random.default_rng(rng_seed)
        self.seed = rng_seed
        # dirty-row tracking for incremental device sync (single consumer);
        # None = tracking invalid, next sync must be a full upload
        self._dirty: dict | None = None

    # ----- dirty tracking -----

    def _reset_dirty(self) -> None:
        self._dirty = {
            "vectors": set(),
            "neighbors0": set(),
            "deleted": set(),
            "layers": {},  # layer number -> set of layer rows
            "layer_rows": {},  # layer number -> set of node slots (row_of)
        }

    def invalidate_dirty(self) -> None:
        self._dirty = None

    def take_dirty(self) -> dict | None:
        """Consume accumulated dirty rows; None forces a full upload."""
        d = self._dirty
        self._reset_dirty()
        return d

    def _mark(self, key: str, row: int) -> None:
        if self._dirty is not None:
            self._dirty[key].add(row)

    def _mark_layer(self, key: str, layer: int, row: int) -> None:
        if self._dirty is not None:
            self._dirty[key].setdefault(layer, set()).add(row)

    # ----- capacity management -----

    def _grow(self) -> None:
        self.invalidate_dirty()
        self.cap *= 2
        self.vectors = _grow_to(self.vectors, self.cap, 0.0)
        self.levels = _grow_to(self.levels, self.cap, -1)
        self.deleted = _grow_to(self.deleted, self.cap, False)
        self.neighbors0 = _grow_to(self.neighbors0, self.cap, -1)
        for layer in self.layers:
            layer.grow_node_cap(self.cap)

    def reserve(self, levels: np.ndarray) -> None:
        """Pre-size all arrays for a known batch of level draws so that NO
        capacity changes (hence no device-shape changes, no kernel recompiles,
        no full re-uploads) happen during a bulk build."""
        n = len(levels)
        target = self.cap
        while target < self.count + n:
            target *= 2
        if target != self.cap:
            self.invalidate_dirty()
            self.cap = target
            self.vectors = _grow_to(self.vectors, target, 0.0)
            self.levels = _grow_to(self.levels, target, -1)
            self.deleted = _grow_to(self.deleted, target, False)
            self.neighbors0 = _grow_to(self.neighbors0, target, -1)
            for layer in self.layers:
                layer.grow_node_cap(target)
        max_level = int(np.max(levels, initial=0))
        while len(self.layers) < max_level:
            self.layers.append(LayerStore(self.m, self.cap))
        incoming = np.bincount(
            np.minimum(levels, self.max_layers), minlength=self.max_layers + 1
        )
        for l, ls in enumerate(self.layers, start=1):
            expected = ls.count + int(incoming[l:].sum())
            # ~12% headroom: at pow2 collection sizes every layer's count
            # lands ON a pow2 boundary (E[count_l] = n/2^l), so sizing to
            # the exact need leaves the first post-build append batches
            # tripping one layer doubling each — growth is cheap for the
            # mirror now (cat-table re-upload, not a full one) but still
            # the most expensive batch shape
            need = expected + max(expected >> 3, 64)
            if need > ls.cap:
                # growth does NOT invalidate dirty tracking: row contents
                # and row_of are preserved by _grow_to; only the device
                # mirror's concatenated offsets shift, which sync detects
                # via its shape signature and repairs by re-uploading the
                # (small) structure tables alone (device.py sync)
                new_cap = ls.cap
                while new_cap < need:
                    new_cap *= 2
                ls.cap = new_cap
                ls.node_slot = _grow_to(ls.node_slot, new_cap, -1)
                ls.nbrs = _grow_to(ls.nbrs, new_cap, -1)

    def alloc_slots(self, vectors: np.ndarray, levels: np.ndarray) -> np.ndarray:
        """Vectorized slot allocation for a whole chunk (capacity must have
        been reserved). Returns the new slots in order."""
        n = len(vectors)
        assert self.count + n <= self.cap, "reserve() before alloc_slots()"
        slots = np.arange(self.count, self.count + n, dtype=np.int64)
        self.vectors[slots] = vectors
        self.levels[slots] = levels
        if self._dirty is not None:
            self._dirty["vectors"].update(slots.tolist())
        max_level = int(np.max(levels, initial=0))
        for l in range(1, max_level + 1):
            sel = slots[levels >= l]
            if sel.size == 0:
                continue
            ls = self.layers[l - 1]
            assert ls.count + sel.size <= ls.cap, "layer capacity not reserved"
            rows = np.arange(ls.count, ls.count + sel.size, dtype=np.int32)
            ls.node_slot[rows] = sel
            ls.row_of[sel] = rows
            ls.count += sel.size
            if self._dirty is not None:
                self._dirty["layer_rows"].setdefault(l, set()).update(sel.tolist())
        self.count += n
        self.live += n
        self.version += 1
        self.vec_version += 1
        return slots

    def alloc_slot(self, vector: np.ndarray, level: int) -> int:
        if self.count == self.cap:
            self._grow()
        slot = self.count
        self.count += 1
        self.live += 1
        self.vectors[slot] = vector
        self.levels[slot] = level
        self._mark("vectors", slot)
        while len(self.layers) < level:
            self.layers.append(LayerStore(self.m, self.cap))
        for l in range(1, level + 1):
            ls = self.layers[l - 1]
            # a full layer doubles inside add(); dirty tracking stays valid
            # (see reserve) — sync repairs the concatenated tables alone
            ls.add(slot)
            self._mark_layer("layer_rows", l, slot)
        self.version += 1
        self.vec_version += 1
        return slot

    # ----- level assignment (reference: hnsw.go:458-469) -----

    def draw_level(self) -> int:
        # exponential decay, mL = 1/ln 2 -> P(level >= L) = 2^-L
        u = 1.0 - self.rng.random()  # (0, 1], avoids log(0)
        level = int(np.floor(-np.log(u) / np.log(2.0)))
        return min(level, self.max_layers - 1)

    def draw_levels(self, n: int) -> np.ndarray:
        u = 1.0 - self.rng.random(n)
        levels = np.floor(-np.log(u) / np.log(2.0)).astype(np.int32)
        return np.minimum(levels, self.max_layers - 1)

    # ----- adjacency access -----

    def adjacency(self, layer: int) -> tuple[np.ndarray, np.ndarray | None]:
        """(nbrs_table, row_of). row_of None means rows are node slots (layer 0)."""
        if layer == 0:
            return self.neighbors0, None
        ls = self.layers[layer - 1]
        return ls.nbrs, ls.row_of

    def get_neighbors(self, slot: int, layer: int) -> np.ndarray:
        """Live neighbor slot list of `slot` at `layer` (drops -1 padding)."""
        table, row_of = self.adjacency(layer)
        row = slot if row_of is None else int(row_of[slot])
        assert row >= 0, f"slot {slot} is not a member of layer {layer}"
        nbrs = table[row]
        return nbrs[nbrs >= 0]

    def set_neighbors(self, slot: int, layer: int, nbrs: np.ndarray) -> None:
        table, row_of = self.adjacency(layer)
        row = slot if row_of is None else int(row_of[slot])
        assert row >= 0, f"slot {slot} is not a member of layer {layer}"
        width = table.shape[1]
        assert len(nbrs) <= width, f"degree overflow at layer {layer}"
        table[row, : len(nbrs)] = nbrs
        table[row, len(nbrs):] = -1
        if layer == 0:
            self._mark("neighbors0", row)
        else:
            self._mark_layer("layers", layer, row)
        self.version += 1

    def mark_rows_bulk(self, layer: int, rows: np.ndarray) -> None:
        """Vectorized mark_rows for one layer (the append's reprune drain
        marks ~100k rows per 4096-batch at 1M; per-row tuple iteration
        costs a visible fraction of the append wall)."""
        if self._dirty is not None:
            if layer == 0:
                self._dirty["neighbors0"].update(rows.tolist())
            else:
                self._dirty["layers"].setdefault(layer, set()).update(
                    rows.tolist()
                )
        self.version += 1

    def mark_rows(self, pairs) -> None:
        """Record dirty (layer, row) pairs mutated outside set_neighbors
        (the native link-application engine writes adjacency in place)."""
        for layer, row in pairs:
            if layer == 0:
                self._mark("neighbors0", row)
            else:
                self._mark_layer("layers", layer, row)
        self.version += 1

    def mark_deleted(self, slot: int) -> None:
        self.deleted[slot] = True
        self._mark("deleted", slot)
        self.version += 1

    def clone(
        self, track_dirty: bool = False, share_append_safe: bool = False
    ) -> "GraphStore":
        """Copy of all graph arrays (the RNG object is SHARED so the
        level-draw sequence continues wherever the clone is used next).
        Used by the batched append path: assemble into the clone off-lock
        while readers keep searching the original, then publish with one
        atomic swap.

        With track_dirty=True the clone CONTINUES the original's dirty
        bookkeeping (deep-copied sets): a device mirror synced against the
        original stays valid for the clone and the post-swap sync scatters
        only the rows the append touched, instead of re-uploading the whole
        graph (~600 MB at 1M over the tunnel).

        With share_append_safe=True the arrays a batched APPEND only ever
        writes beyond the original's counts stay SHARED (vectors, levels,
        deleted, node_slot, row_of): every reader of the original gates
        access on ITS count/adjacency, so writes at slots/rows >= the old
        watermarks are invisible to it, and the index's write mutex
        serializes all writers — only the adjacency tables, whose EXISTING
        rows the reverse-reprune rewrites, are deep-copied. Cuts the 1M
        pre-append clone from ~700 MB to ~130 MB of memcpy (~2 s/batch on
        this host). A capacity growth in the clone re-allocates its arrays
        (reserve/_grow_to), un-sharing them; any other use of the clone
        must deep-copy."""
        new = GraphStore.__new__(GraphStore)
        new.__dict__.update(self.__dict__)
        if not share_append_safe:
            new.vectors = self.vectors.copy()
            new.levels = self.levels.copy()
            new.deleted = self.deleted.copy()
        new.neighbors0 = self.neighbors0.copy()
        new.layers = []
        for ls in self.layers:
            nl = LayerStore.__new__(LayerStore)
            nl.__dict__.update(ls.__dict__)
            if not share_append_safe:
                nl.node_slot = ls.node_slot.copy()
                nl.row_of = ls.row_of.copy()
            nl.nbrs = ls.nbrs.copy()
            new.layers.append(nl)
        if track_dirty and self._dirty is not None:
            new._dirty = {
                "vectors": set(self._dirty["vectors"]),
                "neighbors0": set(self._dirty["neighbors0"]),
                "deleted": set(self._dirty["deleted"]),
                "layers": {
                    l: set(r) for l, r in self._dirty["layers"].items()
                },
                "layer_rows": {
                    l: set(r) for l, r in self._dirty["layer_rows"].items()
                },
            }
        else:
            new._dirty = None  # fresh mirror after the swap
        return new

    def max_degree(self, layer: int) -> int:
        return self.m0 if layer == 0 else self.m

    # ----- stats -----

    def memory_bytes(self) -> int:
        total = (
            self.vectors.nbytes
            + self.levels.nbytes
            + self.deleted.nbytes
            + self.neighbors0.nbytes
        )
        for ls in self.layers:
            total += ls.node_slot.nbytes + ls.nbrs.nbytes + ls.row_of.nbytes
        return total

    def connection_count(self) -> int:
        total = int((self.neighbors0[: self.count] >= 0).sum())
        for ls in self.layers:
            total += int((ls.nbrs[: ls.count] >= 0).sum())
        return total
