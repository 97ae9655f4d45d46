"""Bulk index construction: device-assisted chunked inserts.

HNSW insertion is inherently sequential (each insert must see the links of
prior inserts — SURVEY.md §7 "hard parts"). The TPU-native compromise:

1. allocate slots + draw levels for a CHUNK of new vectors,
2. run the batched insert-descent kernel against the frozen pre-chunk graph
   (one device program returns, per vector and per layer, the efc best
   candidates),
3. apply link updates host-side IN CHUNK ORDER, merging in exact distances
   to earlier chunk members (so intra-chunk connectivity matches what
   sequential insertion would have discovered),
4. the dirty rows scatter to the device mirror before the next chunk's
   descent.

Quality: candidates are the union of the frozen-graph beam results and ALL
earlier chunk members at the right layers (a superset of what the reference's
sequential search would see); selection stays reference top-M-by-distance.
Recall gates in tests/test_hnsw.py hold the builder to the sequential oracle.

Small graphs bootstrap through plain sequential host insertion (also the
semantics oracle and the replay path).
"""

from __future__ import annotations

import numpy as np

from scintirete_tpu.index import host_algo
from scintirete_tpu.index.store import GraphStore
from scintirete_tpu.ops.distance import distance_np

# below this size, sequential host insertion is faster than device dispatch
BOOTSTRAP_SIZE = 256
DEFAULT_CHUNK = 1024
# batches smaller than this skip the device entirely: a padded device chunk
# costs ~1 s of descent while a host insert is ~20 ms — online single-vector
# inserts (the reference's <10 ms target) must not pay the batch machinery
SMALL_BATCH = 48


def bulk_insert(
    store: GraphStore,
    vectors: np.ndarray,
    device=None,  # DeviceIndex; None = host-only
    chunk_size: int = DEFAULT_CHUNK,
    write_ctx=None,  # callable -> context manager guarding store mutation
    on_slots=None,  # called with each group of new slots INSIDE a write section
) -> list[int]:
    """Insert a batch of vectors; returns their slots in order.

    ``write_ctx`` (e.g. ``RWLock.write``) is entered around every store
    mutation phase and RELEASED between chunks — the graph's invariants hold
    at chunk boundaries, so concurrent readers see a consistent (partial)
    graph and search latency during a build is bounded by one chunk.
    ``on_slots`` lets the caller register id mappings atomically with the
    links that make those slots reachable.
    """
    from contextlib import nullcontext

    wctx = write_ctx if write_ctx is not None else nullcontext
    vectors = np.asarray(vectors, np.float32)
    n = len(vectors)
    slots: list[int] = []

    with wctx():
        levels = store.draw_levels(n)
        # one up-front capacity reservation: device shapes stay fixed for the
        # whole build -> exactly one kernel compile + one full upload
        store.reserve(levels)
        # bootstrap: sequential host inserts until the graph is worth a
        # dispatch; small online batches always stay on the host (latency)
        if device is None or n < SMALL_BATCH:
            boot = n
        else:
            boot = max(0, min(n, BOOTSTRAP_SIZE - store.live))

    pos0 = 0
    while pos0 < boot:
        hi = min(boot, pos0 + 256)
        with wctx():
            group = []
            for i in range(pos0, hi):
                s = host_algo.insert(store, vectors[i], int(levels[i]))
                group.append(s)
            slots.extend(group)
            if on_slots:
                on_slots(group)
        pos0 = hi

    # Pipelined chunks: the descent for chunk t+1 dispatches (async) BEFORE
    # chunk t's links apply on the host, overlapping device traversal with
    # host/C++ link application. Chunk t+1 therefore descends a graph that
    # is stale by one extra chunk — the same approximation the chunking
    # already makes, checked by the recall gates.
    pos = boot
    pending = None
    while pos < n or pending is not None:
        with wctx():
            dispatched = None
            if pos < n:
                # early chunks stay small relative to the graph to bound
                # staleness
                step = min(chunk_size, max(128, store.live))
                chunk = vectors[pos : pos + step]
                chunk_levels = levels[pos : pos + step]
                dispatched = _dispatch_chunk(
                    store, device, chunk, chunk_levels, chunk_size
                )
                pos += step
            if pending is not None:
                applied = _apply_chunk(store, device, *pending)
                slots.extend(applied)
                if on_slots:
                    on_slots(applied)
            pending = dispatched
    return slots


def _dispatch_chunk(store, device, chunk, levels, pad_to):
    """Allocate slots + start the device descent (non-blocking)."""
    B = len(chunk)
    frozen_max = store.max_layer  # descent sees the pre-dispatch graph
    efc = max(store.params.ef_construction, store.m0)
    # new slots are unreachable until linked, so syncing them before the
    # descent is safe
    new_slots = store.alloc_slots(chunk, levels.astype(np.int32))
    q = chunk
    lv = levels.astype(np.int32)
    if B < pad_to:
        q = np.concatenate([q, np.repeat(chunk[:1], pad_to - B, axis=0)])
        lv = np.concatenate([lv, np.zeros(pad_to - B, np.int32)])
    raw = device.build_descent_raw(store, q, lv, efc)
    return chunk, levels, new_slots, raw, frozen_max, efc


def _apply_chunk(
    store: GraphStore,
    device,
    chunk: np.ndarray,  # [B, D]
    levels: np.ndarray,  # [B]
    new_slots: np.ndarray,
    raw,
    frozen_max: int,
    efc: int,
) -> list[int]:
    B = len(chunk)
    # intra-chunk exact distances computed host-side while the device works
    intra = distance_np(chunk, chunk, store.metric)  # [B, B]
    cand_slots, cand_dists = device.assemble_descent(raw, efc)
    cand_slots = cand_slots[:, :B]
    cand_dists = cand_dists[:, :B]
    from scintirete_tpu.native.build import apply_chunk_native

    dirty_pairs = apply_chunk_native(
        store, cand_slots, cand_dists, new_slots,
        levels.astype(np.int32), intra, frozen_max,
    )
    if dirty_pairs is not None:
        store.mark_rows(dirty_pairs)
        store.linked_count = max(store.linked_count, int(new_slots[-1]) + 1)
        return [int(s) for s in new_slots]

    # pure-Python fallback (also the semantics oracle)
    # chunk members eligible per layer, in insertion order
    order_by_layer: dict[int, list[int]] = {}
    max_lvl = int(levels.max(initial=0))
    for lc in range(0, max_lvl + 1):
        order_by_layer[lc] = [j for j in range(B) if levels[j] >= lc]

    for i in range(B):
        level = int(levels[i])
        slot = int(new_slots[i])
        for lc in range(level, -1, -1):
            # frozen-graph candidates (when the layer existed at descent time)
            if lc <= frozen_max and lc < cand_slots.shape[0]:
                cs = cand_slots[lc, i].astype(np.int64)
                cd = cand_dists[lc, i]
                keep = (cs >= 0) & (cs != slot)
                cs, cd = cs[keep], cd[keep]
                if lc >= 1 and cs.size:
                    # beams can return seed nodes that are not members of a
                    # sparse layer; linking to them would break the layer
                    # invariant (reference keeps explicit per-layer lists)
                    member = store.layers[lc - 1].row_of[cs] >= 0
                    cs, cd = cs[member], cd[member]
            else:
                cs = np.empty(0, np.int64)
                cd = np.empty(0, np.float32)
            # earlier chunk members present at this layer
            members = [j for j in order_by_layer.get(lc, ()) if j < i]
            if members:
                mem = np.asarray(members)
                cs = np.concatenate([cs, new_slots[mem]])
                cd = np.concatenate([cd, intra[i, mem]])
            if cs.size == 0:
                continue
            order = np.argsort(cd, kind="stable")[:efc]
            cs, cd = cs[order], cd[order]
            max_conn = store.max_degree(lc)
            selected = host_algo.select_neighbors(store, cs, cd, max_conn)
            selected = selected.astype(np.int32)
            store.set_neighbors(slot, lc, selected)
            for nbr in selected:
                host_algo._add_link(store, int(nbr), slot, lc)
        if level > store.max_layer or store.entry_slot < 0:
            store.max_layer = max(store.max_layer, level)
            store.entry_slot = slot
    store.linked_count = max(store.linked_count, int(new_slots[-1]) + 1)
    return [int(s) for s in new_slots]
