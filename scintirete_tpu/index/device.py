"""Batched HNSW kernels on TPU + the incrementally-synced device graph.

The reference answers one query at a time by chasing pointers through Go maps
under a RWMutex (reference: hnsw.go:292-350, :487-557). Here search AND build
descent run as jitted programs over whole batches against the flat graph
arrays in HBM:

- `_search_kernel`: lockstep greedy descent over the upper layers followed by
  a masked ef-beam at layer 0 (one query batch -> one program).
- `_build_descent_kernel`: the insert path's descent against a frozen graph —
  greedy through layers above each new vector's level, efc-beam collection at
  every layer at-or-below it, beams seeded with the layer above's top-M
  (reference semantics: selected neighbors become the next layer's entry
  points, hnsw.go:216-249).

The beam keeps a sorted top-ef candidate list per query. No visited set is
needed: the list is monotone (an item only enters by beating the current
worst, and the worst only improves), so a displaced candidate can never
re-enter; duplicate adds are blocked by an in-list membership mask. Each step
expands one candidate per query: gather its <=2M neighbor rows, compute
distances as one fused gather+einsum (f32 accumulation), merge via
`lax.top_k`. The convergence predicate mirrors the reference's stop rule
(frontier head worse than the worst kept candidate, hnsw.go:516-518), and
deleted nodes never enter the candidate list (hnsw.go:527-530).

Distances use "comparison form" inside the loops (squared L2, true cosine,
negated dot) and are finalized (sqrt for L2) once at the end, matching the
reference's returned values (reference: distance.go:21-116).

`DeviceGraph` mirrors a host `GraphStore` in HBM and re-syncs lazily: full
upload when shapes change (capacity growth), donated scatter updates of just
the dirty rows otherwise — so chunked builds touch HBM proportionally to the
rows they modify, not to the collection size.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scintirete_tpu.index.store import GraphStore
from scintirete_tpu.types import DistanceMetric

_L2 = int(DistanceMetric.L2)
_COSINE = int(DistanceMetric.COSINE)
_IP = int(DistanceMetric.INNER_PRODUCT)

_INF = jnp.float32(jnp.inf)


# ---------------------------------------------------------------------------
# distance helpers
# ---------------------------------------------------------------------------


def _cmp_dist(q, q_sq, q_norm, vecs, v_sq, metric):
    """Comparison-form distance of q [B, D] against gathered vecs [B, K, D]."""
    dots = jnp.einsum(
        "bkd,bd->bk",
        vecs.astype(jnp.float32),
        q.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    if metric == _IP:
        return -dots
    if metric == _L2:
        return q_sq[:, None] + v_sq - 2.0 * dots
    if metric == _COSINE:
        denom = q_norm[:, None] * jnp.sqrt(v_sq)
        cos = jnp.where(denom > 1e-30, dots / jnp.maximum(denom, 1e-30), 0.0)
        cos = jnp.clip(cos, -1.0, 1.0)
        zero = (q_sq[:, None] <= 1e-30) | (v_sq <= 1e-30)
        return jnp.where(zero, 1.0, 1.0 - cos)
    raise ValueError(f"bad metric {metric}")


def _finalize(d, metric):
    if metric == _L2:
        return jnp.sqrt(jnp.maximum(d, 0.0))
    return d


def _make_dist_fn(queries, vectors, sq_norms, metric):
    q32 = queries.astype(jnp.float32)
    q_sq = jnp.sum(q32 * q32, axis=-1)
    q_norm = jnp.sqrt(q_sq)

    def dist_to(slots):  # [B, K] slots (>=0) -> [B, K] cmp distances
        return _cmp_dist(
            queries, q_sq, q_norm, vectors[slots], sq_norms[slots], metric
        )

    return dist_to


# ---------------------------------------------------------------------------
# traversal building blocks (traced inline by the kernels)
# ---------------------------------------------------------------------------


def _greedy_layer(dist_to, nbrs_l, rows_l, deleted, cur, cur_d):
    """Hill-climb every query within one layer until no neighbor improves
    (reference: searchLayer with numClosest=1)."""
    B = cur.shape[0]

    def cond(state):
        return jnp.any(state[2])

    def body(state):
        cur, cur_d, _ = state
        rows = rows_l[cur] if rows_l is not None else cur
        nbrs = nbrs_l[rows]
        ok = (nbrs >= 0) & (rows >= 0)[:, None]
        safe = jnp.maximum(nbrs, 0)
        ok = ok & ~deleted[safe]
        d = jnp.where(ok, dist_to(safe), _INF)
        best = jnp.argmin(d, axis=1)
        best_d = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
        improve = best_d < cur_d
        new_cur = jnp.where(
            improve, jnp.take_along_axis(nbrs, best[:, None], axis=1)[:, 0], cur
        )
        return new_cur, jnp.where(improve, best_d, cur_d), improve

    cur, cur_d, _ = jax.lax.while_loop(cond, body, (cur, cur_d, jnp.ones((B,), bool)))
    return cur, cur_d


def _ef_beam(
    dist_to,
    nbrs_table,
    row_of,  # None for layer 0 (rows are node slots)
    deleted,
    entry_slots,  # [B, E] node slots, -1 padded
    entry_dists,  # [B, E] cmp distances, +inf where -1
    ef: int,
    max_steps: int,
    active_mask=None,  # [B] bool; inactive queries return their entries as-is
    expand: int = 8,
):
    """Masked batched ef-beam in one layer. Returns (slots [B, ef],
    dists [B, ef]) sorted ascending; -1/inf padding.

    `expand` candidates are expanded per step (multi-expansion): the
    sequential step count drops ~expand-fold while each step's gather /
    merge grows sub-linearly — the right trade on TPU where per-step
    latency dominates. Expanding slightly-worse candidates early only ever
    widens exploration, so the result set is a superset of 1-expansion's.
    """
    B, E = entry_slots.shape
    deg = nbrs_table.shape[1]
    expand = min(expand, ef)

    # seed the sorted candidate list with the entries
    pad = ef - E
    if pad > 0:
        cand_s = jnp.concatenate(
            [entry_slots, jnp.full((B, pad), -1, jnp.int32)], axis=1
        )
        cand_d = jnp.concatenate([entry_dists, jnp.full((B, pad), _INF)], axis=1)
    else:
        cand_s, cand_d = entry_slots[:, :ef], entry_dists[:, :ef]
    order = jnp.argsort(cand_d, axis=1)
    cand_d = jnp.take_along_axis(cand_d, order, axis=1)
    cand_s = jnp.take_along_axis(cand_s, order, axis=1)
    expanded = jnp.zeros((B, ef), bool)
    if active_mask is None:
        active_mask = jnp.ones((B,), bool)
    b_idx = jnp.arange(B)
    K = expand * deg  # gathered block width per step

    def state_active(state):
        cand_s, cand_d, expanded, _ = state
        unexp_d = jnp.where(expanded | (cand_s < 0), _INF, cand_d)
        best_unexp = jnp.min(unexp_d, axis=1)
        worst = cand_d[:, -1]
        active = (best_unexp <= worst) & jnp.isfinite(best_unexp) & active_mask
        return active, unexp_d

    def cond(state):
        active, _ = state_active(state)
        return jnp.any(active) & (state[3] < max_steps)

    def body(state):
        cand_s, cand_d, expanded, steps = state
        active, unexp_d = state_active(state)
        # expand the `expand` nearest unexpanded candidates at once
        neg_top, i_stars = jax.lax.top_k(-unexp_d, expand)  # [B, expand]
        sel_ok = jnp.isfinite(-neg_top) & active[:, None]
        slot_stars = jnp.take_along_axis(cand_s, i_stars, axis=1)
        slot_stars = jnp.maximum(slot_stars, 0)
        old_flags = jnp.take_along_axis(expanded, i_stars, axis=1)
        expanded = expanded.at[b_idx[:, None], i_stars].set(old_flags | sel_ok)

        rows = row_of[slot_stars] if row_of is not None else slot_stars
        nbrs = nbrs_table[rows].reshape(B, K)  # [B, expand*deg]
        safe = jnp.maximum(nbrs, 0)
        ok = (nbrs >= 0) & jnp.repeat(sel_ok & (rows >= 0), deg, axis=1)
        ok = ok & ~deleted[safe]
        # dedup against the kept list (monotone list -> membership is the
        # only re-entry path) and within the gathered block (two expanded
        # nodes may share a neighbor)
        dup_list = jnp.any(nbrs[:, :, None] == cand_s[:, None, :], axis=2)
        eq = nbrs[:, :, None] == nbrs[:, None, :]  # [B, K, K]
        earlier = jnp.tril(jnp.ones((K, K), bool), k=-1)
        dup_block = jnp.any(eq & earlier[None, :, :], axis=2)
        usable = ok & ~dup_list & ~dup_block
        d = jnp.where(usable, dist_to(safe), _INF)
        all_d = jnp.concatenate([cand_d, d], axis=1)
        all_s = jnp.concatenate([cand_s, jnp.where(usable, nbrs, -1)], axis=1)
        all_e = jnp.concatenate([expanded, jnp.zeros((B, K), bool)], axis=1)
        top_negd, sel = jax.lax.top_k(-all_d, ef)
        return (
            jnp.take_along_axis(all_s, sel, axis=1),
            -top_negd,
            jnp.take_along_axis(all_e, sel, axis=1),
            steps + 1,
        )

    cand_s, cand_d, expanded, steps = jax.lax.while_loop(
        cond, body, (cand_s, cand_d, expanded, jnp.int32(0))
    )
    cand_s = jnp.where(jnp.isinf(cand_d), -1, cand_s)
    return cand_s, cand_d, steps


# ---------------------------------------------------------------------------
# search kernel
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("metric", "ef", "k", "max_steps"))
def _search_kernel(
    queries,  # [B, D] f32
    vectors,  # [cap, D] f32/bf16
    sq_norms,  # [cap] f32
    deleted,  # [cap] bool
    neighbors0,  # [cap, 2M] i32
    upper_nbrs: tuple,  # per layer (top..1): [cap_l, M] i32 (node-slot entries)
    upper_rows: tuple,  # per layer (top..1): [cap] i32 (node slot -> row)
    entry_slot,  # scalar i32
    metric: int,
    ef: int,
    k: int,
    max_steps: int,
):
    B = queries.shape[0]
    dist_to = _make_dist_fn(queries, vectors, sq_norms, metric)

    cur = jnp.full((B,), entry_slot, jnp.int32)
    cur_d = dist_to(cur[:, None])[:, 0]
    for nbrs_l, rows_l in zip(upper_nbrs, upper_rows):
        cur, cur_d = _greedy_layer(dist_to, nbrs_l, rows_l, deleted, cur, cur_d)

    cand_s, cand_d, steps = _ef_beam(
        dist_to,
        neighbors0,
        None,
        deleted,
        cur[:, None],
        cur_d[:, None],
        ef,
        max_steps,
    )
    out_d = _finalize(cand_d[:, :k], metric)
    out_s = cand_s[:, :k]
    out_d = jnp.where(out_s < 0, _INF, out_d)
    return out_d, out_s, steps


# ---------------------------------------------------------------------------
# build-descent kernel (the insert path against a frozen graph)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("metric", "efc", "ef_upper", "m", "max_steps")
)
def _build_descent_kernel(
    queries,  # [B, D] the new vectors
    levels,  # [B] i32 target level per new vector
    vectors,
    sq_norms,
    deleted,
    neighbors0,
    upper_nbrs: tuple,  # top..1
    upper_rows: tuple,
    entry_slot,
    metric: int,
    efc: int,
    ef_upper: int,
    m: int,
    max_steps: int,
):
    """Returns (cand_slots [L+1, B, efc], cand_dists [L+1, B, efc]) where
    index l of the leading axis is graph layer l (0 = ground). Layers above a
    vector's level hold -1/inf. Distances are comparison-form finalized.

    Upper-layer beams use `ef_upper` (<= efc): only the top-M per layer are
    kept as links, so a 2M-wide beam loses little while cutting both compile
    size (the per-layer loops unroll) and sequential steps. The ground layer
    keeps the full efc width.
    """
    B = queries.shape[0]
    L = len(upper_nbrs)
    dist_to = _make_dist_fn(queries, vectors, sq_norms, metric)

    cur = jnp.full((B,), entry_slot, jnp.int32)
    cur_d = dist_to(cur[:, None])[:, 0]

    out_slots = [None] * (L + 1)
    out_dists = [None] * (L + 1)

    def single_seed(slots, dists):
        # [B] -> [B, m] padded seed lists
        s = jnp.full((B, m), -1, jnp.int32).at[:, 0].set(slots)
        d = jnp.full((B, m), _INF).at[:, 0].set(dists)
        return s, d

    # entries for the next layer's beam: top-m of this layer's beam for
    # collectors (reference: entryPoints = selectedNeighbors), the greedy
    # result for pass-through queries
    seed_s, seed_d = single_seed(cur, cur_d)

    for i, (nbrs_l, rows_l) in enumerate(zip(upper_nbrs, upper_rows)):
        layer = L - i
        collect = levels >= layer
        # pass-through queries (level < layer) hill-climb with ef=1
        g_cur, g_cur_d = _greedy_layer(dist_to, nbrs_l, rows_l, deleted, cur, cur_d)
        # collectors run the upper beam seeded from the layer above
        cs, cd, _ = _ef_beam(
            dist_to, nbrs_l, rows_l, deleted, seed_s, seed_d, ef_upper,
            max_steps, active_mask=collect,
        )
        pad = efc - ef_upper
        out_slots[layer] = jnp.pad(
            jnp.where(collect[:, None], cs, -1),
            ((0, 0), (0, pad)),
            constant_values=-1,
        )
        out_dists[layer] = jnp.pad(
            jnp.where(collect[:, None], cd, _INF),
            ((0, 0), (0, pad)),
            constant_values=jnp.inf,
        )
        # next layer state
        found = collect & (cs[:, 0] >= 0)
        cur = jnp.where(found, jnp.maximum(cs[:, 0], 0), g_cur)
        cur_d = jnp.where(found, cd[:, 0], g_cur_d)
        g_seed_s, g_seed_d = single_seed(g_cur, g_cur_d)
        seed_s = jnp.where(collect[:, None], cs[:, :m], g_seed_s)
        seed_d = jnp.where(collect[:, None], cd[:, :m], g_seed_d)

    # ground layer: every query collects
    cs, cd, _ = _ef_beam(
        dist_to, neighbors0, None, deleted, seed_s, seed_d, efc, max_steps
    )
    out_slots[0] = cs
    out_dists[0] = cd

    slots = jnp.stack(out_slots, axis=0)
    dists = jnp.stack(out_dists, axis=0)
    return slots, _finalize(dists, metric)


# ---------------------------------------------------------------------------
# scatter updates (incremental device sync)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(arr, idx, vals):
    """Row scatter with out-of-bounds padding dropped (idx = len(arr) pads)."""
    return arr.at[idx].set(vals, mode="drop")


def _pad_pow2(n: int, minimum: int = 64) -> int:
    n = max(n, minimum)
    return 1 << (n - 1).bit_length()


# ---------------------------------------------------------------------------
# device mirror
# ---------------------------------------------------------------------------


class DeviceGraph:
    """HBM mirror of a GraphStore with version-keyed lazy sync.

    Capacity changes (or first sync) trigger a full upload; otherwise only
    the dirty rows recorded by the store since the last sync are scattered
    into the donated device buffers.
    """

    def __init__(self, dtype: str = "float32"):
        self.dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self._version = -1
        self._shape_sig: Any = None
        self.arrays: dict[str, Any] = {}

    def _signature(self, store: GraphStore):
        # keyed to the ALLOCATED layer tables (not max_layer) so that entry
        # level growth during a build never changes device shapes
        return (store.cap, tuple(ls.cap for ls in store.layers))

    def sync(self, store: GraphStore) -> None:
        if store.version == self._version:
            return
        sig = self._signature(store)
        dirty = store.take_dirty()
        if self._shape_sig != sig or dirty is None:
            self._full_upload(store)
        else:
            self._incremental(store, dirty)
        self._version = store.version
        self._shape_sig = sig

    def _full_upload(self, store: GraphStore) -> None:
        vecs = store.vectors
        self.arrays = {
            "vectors": jnp.asarray(vecs, dtype=self.dtype),
            "sq_norms": jnp.asarray(
                np.sum(vecs.astype(np.float32) ** 2, axis=1), dtype=jnp.float32
            ),
            "deleted": jnp.asarray(store.deleted),
            "neighbors0": jnp.asarray(store.neighbors0),
            "upper_nbrs": tuple(
                jnp.asarray(ls.nbrs) for ls in reversed(store.layers)
            ),
            "upper_rows": tuple(
                jnp.asarray(ls.row_of) for ls in reversed(store.layers)
            ),
        }

    @staticmethod
    def _scatter_into(device_arr, rows: set, host_arr: np.ndarray):
        """Scatter dirty host rows into the (donated) device array; row
        indices are padded to power-of-two buckets with out-of-bounds
        sentinels (dropped by the scatter) to bound compile variants."""
        idx = np.fromiter(rows, np.int32, len(rows))
        pad = _pad_pow2(len(idx)) - len(idx)
        if pad:
            idx = np.concatenate([idx, np.full(pad, host_arr.shape[0], np.int32)])
        vals = host_arr[np.minimum(idx, host_arr.shape[0] - 1)]
        vals_j = jnp.asarray(vals).astype(device_arr.dtype)
        return _scatter_rows(device_arr, jnp.asarray(idx), vals_j)

    def _incremental(self, store: GraphStore, dirty: dict) -> None:
        a = self.arrays
        vec_rows = dirty["vectors"]
        if vec_rows:
            a["vectors"] = self._scatter_into(a["vectors"], vec_rows, store.vectors)
            norms = np.sum(
                store.vectors[sorted(vec_rows)].astype(np.float32) ** 2, axis=1
            )
            full_norms = np.zeros(store.cap, np.float32)
            full_norms[sorted(vec_rows)] = norms
            a["sq_norms"] = self._scatter_into(a["sq_norms"], vec_rows, full_norms)
        if dirty["neighbors0"]:
            a["neighbors0"] = self._scatter_into(
                a["neighbors0"], dirty["neighbors0"], store.neighbors0
            )
        if dirty["deleted"]:
            a["deleted"] = self._scatter_into(
                a["deleted"], dirty["deleted"], store.deleted
            )
        n_up = len(store.layers)
        upper_nbrs = list(a["upper_nbrs"])
        upper_rows = list(a["upper_rows"])
        for l in range(1, n_up + 1):
            ls = store.layers[l - 1]
            pos = n_up - l  # tuples are ordered top..1
            rows = dirty["layers"].get(l)
            if rows:
                upper_nbrs[pos] = self._scatter_into(upper_nbrs[pos], rows, ls.nbrs)
            row_map_rows = dirty["layer_rows"].get(l)
            if row_map_rows:
                upper_rows[pos] = self._scatter_into(
                    upper_rows[pos], row_map_rows, ls.row_of
                )
        a["upper_nbrs"] = tuple(upper_nbrs)
        a["upper_rows"] = tuple(upper_rows)


class DeviceIndex:
    """Batched search dispatch over a DeviceGraph mirror."""

    def __init__(self, dtype: str = "float32", max_batch: int = 256,
                 graph: Optional[DeviceGraph] = None):
        self.graph = graph or DeviceGraph(dtype)
        self.max_batch = max_batch

    def sync(self, store: GraphStore) -> None:
        self.graph.sync(store)

    @property
    def _arrays(self):
        return self.graph.arrays

    def search(
        self,
        store: GraphStore,
        queries: np.ndarray,
        k: int,
        ef: int,
        max_steps: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (slots [B, k] i64, dists [B, k] f32); -1/inf padding."""
        self.sync(store)
        B = queries.shape[0]
        ef = max(ef, k)
        if max_steps is None:
            # generous bound; convergence normally stops the loop much earlier
            max_steps = 4 * ef + 32
        out_slots = np.empty((B, k), np.int64)
        out_dists = np.empty((B, k), np.float32)
        a = self.graph.arrays
        for start in range(0, B, self.max_batch):
            chunk = queries[start : start + self.max_batch]
            n = chunk.shape[0]
            padded = 1 << (n - 1).bit_length()  # next pow2
            if padded > n:
                chunk = np.concatenate(
                    [chunk, np.zeros((padded - n, chunk.shape[1]), np.float32)]
                )
            d, s, _ = _search_kernel(
                jnp.asarray(chunk, jnp.float32),
                a["vectors"],
                a["sq_norms"],
                a["deleted"],
                a["neighbors0"],
                a["upper_nbrs"],
                a["upper_rows"],
                jnp.int32(store.entry_slot),
                metric=int(store.metric),
                ef=ef,
                k=k,
                max_steps=max_steps,
            )
            out_dists[start : start + n] = np.asarray(d)[:n]
            out_slots[start : start + n] = np.asarray(s)[:n]
        return out_slots, out_dists

    def build_descent(
        self,
        store: GraphStore,
        queries: np.ndarray,  # [B, D]
        levels: np.ndarray,  # [B]
        efc: int,
        max_steps: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Descent for a chunk of new vectors against the frozen synced graph.
        Returns (slots [L+1, B, efc], dists [L+1, B, efc])."""
        self.sync(store)
        a = self.graph.arrays
        if max_steps is None:
            max_steps = 4 * efc + 32
        ef_upper = min(efc, max(2 * store.m, 32))
        slots, dists = _build_descent_kernel(
            jnp.asarray(queries, jnp.float32),
            jnp.asarray(levels, jnp.int32),
            a["vectors"],
            a["sq_norms"],
            a["deleted"],
            a["neighbors0"],
            a["upper_nbrs"],
            a["upper_rows"],
            jnp.int32(store.entry_slot),
            metric=int(store.metric),
            efc=efc,
            ef_upper=ef_upper,
            m=store.m,
            max_steps=max_steps,
        )
        return np.asarray(slots), np.asarray(dists)
