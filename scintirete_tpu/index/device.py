"""Batched HNSW kernels on TPU + the incrementally-synced device graph.

The reference answers one query at a time by chasing pointers through Go maps
under a RWMutex (reference: hnsw.go:292-350, :487-557). Here search AND build
descent run as jitted programs over whole batches against flat graph arrays
in HBM.

Upper-layer adjacency is CONCATENATED into one table (`up_nbrs_cat`
[sum cap_l, M]) with a flat node->row map per layer (`up_rows_flat`
[L * cap], values pre-offset into the concatenated table). This makes every
traversal loop layer-agnostic: ONE `lax.while_loop` descends all layers
(each query tracks its own current layer), so compiled program size is O(1)
in the number of layers and queries never barrier at layer boundaries.

Kernels:
- `_search_kernel`: fused greedy descent (all upper layers, one loop) +
  multi-expansion ef-beam at layer 0.
- `_build_descent_kernel`: the insert path against a frozen graph — fused
  greedy above each new vector's level, then ONE multi-layer beam loop in
  which each query collects ef_upper candidates at its own layer, records
  them, reseeds with its top-M (reference: selected neighbors become the
  next layer's entry points, hnsw.go:216-249), and moves down; finally the
  full-width efc beam at layer 0.

The beam keeps a sorted top-ef candidate list per query and expands the
`expand` nearest unexpanded candidates per step (multi-expansion: ~expand x
fewer sequential steps). No visited set is needed: the list is monotone (an
item only enters by beating the current worst, and the worst only improves),
so a displaced candidate can never re-enter; duplicate adds are blocked by an
in-list membership mask plus an intra-block first-occurrence mask. The
convergence predicate mirrors the reference's stop rule (frontier head worse
than the worst kept candidate, hnsw.go:516-518), and deleted nodes never
enter the candidate list (hnsw.go:527-530).

Distances use "comparison form" inside the loops (squared L2, true cosine,
negated dot) and are finalized (sqrt for L2) once at the end, matching the
reference's returned values (reference: distance.go:21-116).

`DeviceGraph` mirrors a host `GraphStore` in HBM and re-syncs lazily: full
upload when shapes change (capacity growth), donated scatter updates of just
the dirty rows otherwise — chunked builds touch HBM proportionally to the
rows they modify, not to the collection size.
"""

from __future__ import annotations

import functools
import os
import threading
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scintirete_tpu.index.store import GraphStore
from scintirete_tpu.types import DistanceMetric

_L2 = int(DistanceMetric.L2)
_COSINE = int(DistanceMetric.COSINE)
_IP = int(DistanceMetric.INNER_PRODUCT)

# numpy scalar, NOT a device array: a jnp scalar here becomes a device
# constant embedded in every kernel's jaxpr, and each per-process
# lowering then BLOCKS on a device fetch for its value (~1 s over the
# tunneled TPU, times every kernel variant)
_INF = np.float32(np.inf)

# candidates expanded per beam step. Search uses 4 (thin fast steps win at
# serving batch sizes); the build beams use 8 (fewer, fatter steps suit the
# long-running build). Measured on v5e, see docs/architecture.md.
SEARCH_EXPAND = 4
BUILD_EXPAND = 8


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
# fused traversal building blocks (traced inline by the kernels)
# ---------------------------------------------------------------------------


def _fused_greedy(
    dist_to, up_nbrs_cat, up_rows_flat, cap, deleted,
    cur, cur_d, lvl, stop_lvl, max_iters,
):
    """Hill-climb each query at its own layer; on local convergence move one
    layer down; finish when lvl == stop_lvl (per query). Equivalent to the
    reference's per-layer searchLayer(ef=1) descent, with no layer barriers.
    """

    def cond(st):
        return jnp.any(st[2] > stop_lvl) & (st[3] < max_iters)

    def body(st):
        cur, cur_d, lvl, it = st
        active = lvl > stop_lvl
        flat = (jnp.maximum(lvl, 1) - 1) * cap + cur
        row = up_rows_flat[flat]
        row = jnp.where(active, row, -1)
        nbrs = up_nbrs_cat[jnp.maximum(row, 0)]  # [B, M]
        safe = jnp.maximum(nbrs, 0)
        ok = (nbrs >= 0) & (row >= 0)[:, None] & ~deleted[safe]
        d = jnp.where(ok, dist_to(safe), _INF)
        best = jnp.argmin(d, axis=1)
        best_d = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
        improve = (best_d < cur_d) & active
        cur = jnp.where(
            improve, jnp.take_along_axis(nbrs, best[:, None], axis=1)[:, 0], cur
        )
        cur_d = jnp.where(improve, best_d, cur_d)
        lvl = jnp.where(active & ~improve, lvl - 1, lvl)
        return cur, cur_d, lvl, it + 1

    cur, cur_d, lvl, _ = jax.lax.while_loop(
        cond, body, (cur, cur_d, lvl, jnp.int32(0))
    )
    return cur, cur_d


def _fused_beam_descent(
    dist_to, up_nbrs_cat, up_rows_flat, cap, deleted,
    cur, cur_d, lvl, ef_upper, max_iters, expand,
):
    """Beam descent through the upper layers: searchLayer(ef_upper) per
    layer instead of the reference's greedy ef=1 walk (hnsw.go:216-249),
    with the whole descent fused into one while_loop (each query sits at
    its own layer). On per-query convergence at a layer the candidate list
    carries over as the next layer's entry set and its expansion flags
    reset — the HNSW multi-entry handoff. The payoff at scale: the bulk
    kNN-built upper layers misroute a SINGLE greedy walker on clustered
    corpora (entry lands outside the query's cluster and the layer-0 beam
    can't cross; benchmarks/results_round4.md §3), while ef_upper
    candidate paths keep alternatives alive and hand layer 0 ef_upper
    entries instead of one."""
    B = cur.shape[0]
    cand_s = jnp.concatenate(
        [cur[:, None], jnp.full((B, ef_upper - 1), -1, jnp.int32)], axis=1
    )
    cand_d = jnp.concatenate(
        [cur_d[:, None], jnp.full((B, ef_upper - 1), _INF)], axis=1
    )
    return _fused_beam_descent_lists(
        dist_to, up_nbrs_cat, up_rows_flat, cap, deleted,
        cand_s, cand_d, lvl, max_iters, expand,
    )


def _fused_beam_descent_lists(
    dist_to, up_nbrs_cat, up_rows_flat, cap, deleted,
    cand_s, cand_d, lvl, max_iters, expand,
):
    """Beam descent seeded with full candidate LISTS (mid-layer entry hands
    ef_upper entries at once; _fused_beam_descent wraps this for the
    single-entry top-down walk)."""
    B, ef_upper = cand_s.shape
    expand = min(expand, ef_upper)
    expanded = jnp.zeros((B, ef_upper), bool)

    def cond(st):
        return jnp.any(st[3] > 0) & (st[4] < max_iters)

    def body(st):
        cand_s, cand_d, expanded, lvl, it = st
        at_layer = lvl > 0
        converged = _beam_converged(cand_s, cand_d, expanded)
        active = at_layer & ~converged
        flat_base = (jnp.maximum(lvl, 1) - 1) * cap
        cand_s, cand_d, expanded = _beam_step(
            dist_to, deleted, cand_s, cand_d, expanded,
            rows_of_slots=lambda s: jnp.where(
                s >= 0, up_rows_flat[flat_base[:, None] + jnp.maximum(s, 0)], -1
            ),
            nbr_lookup=lambda rows: up_nbrs_cat[rows],
            active=active, expand=expand,
        )
        # converged-at-layer queries move down; their candidates become the
        # next layer's entries, so expansion flags reset (a slot expanded
        # at layer l has different neighbors at l-1)
        step_down = at_layer & _beam_converged(cand_s, cand_d, expanded)
        lvl = jnp.where(step_down, lvl - 1, lvl)
        expanded = expanded & ~step_down[:, None]
        return cand_s, cand_d, expanded, lvl, it + 1

    cand_s, cand_d, _, _, _ = jax.lax.while_loop(
        cond, body, (cand_s, cand_d, expanded, lvl, jnp.int32(0))
    )
    return cand_s, cand_d


def _beam_step(
    dist_to, deleted, cand_s, cand_d, expanded, rows_of_slots, nbr_lookup,
    active, expand,
):
    """One multi-expansion beam step (shared by the layer-0 and multi-layer
    beams). `rows_of_slots(slots [B, E]) -> rows`, `nbr_lookup(rows) ->
    neighbor slots [B, E, deg]`."""
    B, ef = cand_s.shape
    unexp_d = jnp.where(expanded | (cand_s < 0), _INF, cand_d)
    neg_top, i_stars = jax.lax.top_k(-unexp_d, expand)  # [B, expand]
    sel_ok = jnp.isfinite(-neg_top) & active[:, None]
    slot_stars = jnp.maximum(jnp.take_along_axis(cand_s, i_stars, axis=1), 0)
    old_flags = jnp.take_along_axis(expanded, i_stars, axis=1)
    b_idx = jnp.arange(B)
    expanded = expanded.at[b_idx[:, None], i_stars].set(old_flags | sel_ok)

    rows = rows_of_slots(slot_stars)  # [B, expand]
    nbrs3 = nbr_lookup(jnp.maximum(rows, 0))  # [B, expand, deg]
    deg = nbrs3.shape[2]
    K = expand * deg
    nbrs = nbrs3.reshape(B, K)
    safe = jnp.maximum(nbrs, 0)
    ok = (nbrs >= 0) & jnp.repeat(sel_ok & (rows >= 0), deg, axis=1)
    ok = ok & ~deleted[safe]
    d = jnp.where(ok, dist_to(safe), _INF)
    all_d = jnp.concatenate([cand_d, d], axis=1)
    all_s = jnp.concatenate([cand_s, jnp.where(ok, nbrs, -1)], axis=1)
    all_e = jnp.concatenate([expanded, jnp.zeros((B, K), bool)], axis=1)
    # SORT-BASED dedup + merge. The first cut used O(K^2) pairwise
    # equality masks per step (dup-in-list + dup-in-block); at build
    # shapes (B=8192, K=128) those masks were ~200M bool lanes per step
    # and dominated the whole upper-build kernel. Instead: sort by
    # (packed slot, distance) — slot-majority, so copies of the same slot
    # are ALWAYS adjacent, even when their distances disagree (pivot/upper
    # entry distances come from a different program than dist_to and can
    # differ by ~1e-3: a distance-majority sort let re-proposed entry
    # slots survive as duplicates and crowd the beam — measured 0.9956 ->
    # 0.9866 recall@10 at 1M in pivot mode). The flag bit is INVERTED in
    # the key so a slot's EXPANDED copy sorts first within its duplicate
    # group and survives — a re-proposed in-list member must keep its
    # expansion flag or the loop would re-expand forever.
    packed = (all_s << 1) | (1 - all_e.astype(jnp.int32))
    sp, sd = jax.lax.sort((packed, all_d), num_keys=2)
    slot = sp >> 1
    dup = jnp.concatenate(
        [
            jnp.zeros((B, 1), bool),
            (slot[:, 1:] == slot[:, :-1]) & (slot[:, 1:] >= 0),
        ],
        axis=1,
    )
    sd = jnp.where(dup, _INF, sd)
    sp = jnp.where(dup, -1, sp)  # slot -1, unexpanded
    sd, sp = jax.lax.sort((sd, sp), num_keys=1)
    sd, sp = sd[:, :ef], sp[:, :ef]
    return sp >> 1, sd, (1 - (sp & 1)).astype(bool)


def _beam_converged(cand_s, cand_d, expanded):
    unexp_d = jnp.where(expanded | (cand_s < 0), _INF, cand_d)
    best_unexp = jnp.min(unexp_d, axis=1)
    worst = cand_d[:, -1]
    return ~((best_unexp <= worst) & jnp.isfinite(best_unexp))


def _ef_beam_layer0(
    dist_to, neighbors0, deleted, entry_slots, entry_dists, ef, max_steps,
    expand=SEARCH_EXPAND,
):
    """Layer-0 ef-beam. Entries [B, E]; returns sorted (slots, dists,
    steps). (A post-convergence "spill" re-expansion was removed in round
    3: a neighbor displaced from the ef list is by definition worse than
    the converged ef-th candidate, so no post-pass over the kept
    candidates' neighborhoods can change the top-k — measured exactly
    recall-neutral at every operating point.)"""
    B, E = entry_slots.shape
    expand = min(expand, ef)
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

    def cond(st):
        return jnp.any(~_beam_converged(st[0], st[1], st[2])) & (st[3] < max_steps)

    def body(st):
        cand_s, cand_d, expanded, steps = st
        active = ~_beam_converged(cand_s, cand_d, expanded)
        cand_s, cand_d, expanded = _beam_step(
            dist_to, deleted, cand_s, cand_d, expanded,
            rows_of_slots=lambda s: s,
            nbr_lookup=lambda rows: neighbors0[rows],
            active=active, expand=expand,
        )
        return cand_s, cand_d, expanded, steps + 1

    cand_s, cand_d, expanded, steps = jax.lax.while_loop(
        cond, body, (cand_s, cand_d, expanded, jnp.int32(0))
    )
    return jnp.where(jnp.isinf(cand_d), -1, cand_s), cand_d, steps


# ---------------------------------------------------------------------------
# search kernels
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "ef", "k", "max_steps", "expand",
        "use_pallas", "interpret",
    ),
)
def _search_kernel_pivot(
    queries,  # [B, D] f32
    vectors,  # [cap, D]
    sq_norms,  # [cap] f32
    deleted,  # [cap] bool
    neighbors0,  # [cap, 2M] i32
    pivots,  # [R] i32 — sampled live slots
    pivot_vecs,  # [R, D]
    pivot_sq,  # [R] f32
    metric: int,
    ef: int,
    k: int,
    max_steps: int,
    expand: int = SEARCH_EXPAND,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """TPU-first entry: ONE matmul against R sampled pivots replaces the
    upper-layer greedy descent (a pointer-chase of ~layers x moves serialized
    iterations). The true nearest pivot is a better entry than the descent's
    local optimum, and the MXU computes all B x R distances in one shot.
    Parity note: result distances and candidate semantics are unchanged —
    only the entry point selection differs (the reference's descent is kept
    as the `descent` entry mode and remains the build path).

    ``use_pallas`` selects the fused Pallas scan (ops/pallas_pivot.py): the
    [B, R] score matrix never leaves VMEM (6x the XLA scan at R=16k on one
    v5e). Requires R % 512 == 0; cosine uses pre-normalized pivots (the
    mirror uploads them normalized) and normalized queries, so the kernel's
    1 - dot equals the XLA path's comparison form."""
    B = queries.shape[0]
    q32 = queries.astype(jnp.float32)
    q_sq = jnp.sum(q32 * q32, axis=-1)
    q_norm = jnp.sqrt(q_sq)
    dist_to = _make_dist_fn(queries, vectors, sq_norms, metric)

    if use_pallas:
        from scintirete_tpu.ops.pallas_pivot import pivot_entry_scan

        pdel = deleted[pivots].astype(jnp.float32)
        if metric == _COSINE:
            qn = jnp.where(
                q_norm[:, None] > 1e-30,
                q32 / jnp.maximum(q_norm[:, None], 1e-30),
                0.0,
            )
            cur_d, best = pivot_entry_scan(
                qn, pivot_vecs, pivot_sq, pdel,
                metric=metric, interpret=interpret,
            )
        else:
            cur_d, best = pivot_entry_scan(
                q32, pivot_vecs, pivot_sq, pdel,
                metric=metric, interpret=interpret,
            )
        cur = pivots[best]
    else:
        # pivot distances: [B, R] in one dot_general
        dots = jax.lax.dot_general(
            q32,
            pivot_vecs.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if metric == _IP:
            pdist = -dots
        elif metric == _L2:
            pdist = q_sq[:, None] + pivot_sq[None, :] - 2.0 * dots
        else:
            denom = q_norm[:, None] * jnp.sqrt(pivot_sq)[None, :]
            cos = jnp.where(
                denom > 1e-30, dots / jnp.maximum(denom, 1e-30), 0.0
            )
            cos = jnp.clip(cos, -1.0, 1.0)
            zero = (q_sq[:, None] <= 1e-30) | (pivot_sq[None, :] <= 1e-30)
            pdist = jnp.where(zero, 1.0, 1.0 - cos)
        pdist = jnp.where(deleted[pivots][None, :], _INF, pdist)
        best = jnp.argmin(pdist, axis=1)  # [B]
        cur = pivots[best]
        cur_d = jnp.take_along_axis(pdist, best[:, None], axis=1)[:, 0]
    # degenerate case: every pivot tombstoned -> empty entry, empty results
    cur = jnp.where(jnp.isfinite(cur_d), cur, -1)

    cand_s, cand_d, steps = _ef_beam_layer0(
        dist_to, neighbors0, deleted, cur[:, None], cur_d[:, None], ef,
        max_steps, expand=expand,
    )
    out_d = _finalize(cand_d[:, :k], metric)
    out_s = cand_s[:, :k]
    out_d = jnp.where(out_s < 0, _INF, out_d)
    return out_d, out_s, steps


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "ef", "k", "max_steps", "expand", "use_pallas",
    ),
)
def _search_kernel_pivot_chunked(
    queries3,  # [C, mb, D] — C sub-batches of mb queries
    vectors,
    sq_norms,
    deleted,
    neighbors0,
    pivots,
    pivot_vecs,
    pivot_sq,
    metric: int,
    ef: int,
    k: int,
    max_steps: int,
    expand: int = SEARCH_EXPAND,
    use_pallas: bool = False,
):
    """One-dispatch serving pass: lax.scan drives the pivot search kernel
    over C sub-batches INSIDE one program, so a whole pass pays ONE tunnel
    dispatch + ONE query upload instead of C of each (SCNT_FUSE_SUBBATCH).
    Per-chunk math is exactly _search_kernel_pivot; only the dispatch
    granularity changes. Returns (dists [C, mb, k], slots [C, mb, k])."""

    def step(_, q):
        d, s, _steps = _search_kernel_pivot(
            q, vectors, sq_norms, deleted, neighbors0, pivots,
            pivot_vecs, pivot_sq, metric=metric, ef=ef, k=k,
            max_steps=max_steps, expand=expand, use_pallas=use_pallas,
        )
        return None, (d, s)

    _, (ds, ss) = jax.lax.scan(step, None, queries3)
    return ds, ss


@functools.partial(
    jax.jit,
    static_argnames=("metric", "ef", "k", "max_steps", "expand", "ef_upper"),
)
def _search_kernel(
    queries,  # [B, D] f32
    vectors,  # [cap, D] f32/bf16
    sq_norms,  # [cap] f32
    deleted,  # [cap] bool
    neighbors0,  # [cap, 2M] i32
    up_nbrs_cat,  # [R_total, M] i32 (concatenated upper adjacency)
    up_rows_flat,  # [L * cap] i32 (pre-offset rows, -1 absent)
    entry_slot,  # scalar i32
    entry_level,  # scalar i32
    metric: int,
    ef: int,
    k: int,
    max_steps: int,
    expand: int = SEARCH_EXPAND,
    ef_upper: int = 1,
):
    B = queries.shape[0]
    cap = vectors.shape[0]
    dist_to = _make_dist_fn(queries, vectors, sq_norms, metric)

    cur = jnp.full((B,), entry_slot, jnp.int32)
    cur_d = dist_to(cur[:, None])[:, 0]
    lvl = jnp.full((B,), entry_level, jnp.int32)
    if ef_upper <= 1:
        cur, cur_d = _fused_greedy(
            dist_to, up_nbrs_cat, up_rows_flat, cap, deleted,
            cur, cur_d, lvl, jnp.zeros((B,), jnp.int32), max_iters=16 * 64,
        )
        entries_s, entries_d = cur[:, None], cur_d[:, None]
    else:
        entries_s, entries_d = _fused_beam_descent(
            dist_to, up_nbrs_cat, up_rows_flat, cap, deleted,
            cur, cur_d, lvl, ef_upper=ef_upper, max_iters=16 * 64,
            expand=expand,
        )

    cand_s, cand_d, steps = _ef_beam_layer0(
        dist_to, neighbors0, deleted, entries_s, entries_d, ef,
        max_steps, expand=expand,
    )
    out_d = _finalize(cand_d[:, :k], metric)
    out_s = cand_s[:, :k]
    out_d = jnp.where(out_s < 0, _INF, out_d)
    return out_d, out_s, steps


def _entry_scan_xla(q32, q_sq, q_norm, vecs, sq, metric):
    """[B, R] comparison-form distances of every query against R candidate
    rows in one dot_general (the XLA pivot-scan formula)."""
    dots = jax.lax.dot_general(
        q32,
        vecs.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == _IP:
        return -dots
    if metric == _L2:
        return q_sq[:, None] + sq[None, :] - 2.0 * dots
    denom = q_norm[:, None] * jnp.sqrt(sq)[None, :]
    cos = jnp.where(denom > 1e-30, dots / jnp.maximum(denom, 1e-30), 0.0)
    cos = jnp.clip(cos, -1.0, 1.0)
    zero = (q_sq[:, None] <= 1e-30) | (sq[None, :] <= 1e-30)
    return jnp.where(zero, 1.0, 1.0 - cos)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "ef", "k", "max_steps", "expand", "ef_upper"),
)
def _search_kernel_mid(
    queries,  # [B, D] f32
    vectors,  # [cap, D] f32/bf16
    sq_norms,  # [cap] f32
    deleted,  # [cap] bool
    neighbors0,  # [cap, 2M] i32
    up_nbrs_cat,  # [R_total, M] i32
    up_rows_flat,  # [L * cap] i32
    mid_slots,  # [R] i32 — members of layer mid_level (-1 padded)
    mid_level,  # scalar i32 (dynamic: layer growth must not recompile)
    metric: int,
    ef: int,
    k: int,
    max_steps: int,
    expand: int = SEARCH_EXPAND,
    ef_upper: int = 4,
):
    """Hierarchical mid-layer entry for descent serving: exact-scan the
    members of the highest layer that fits one MXU pass (~n/128 nodes at
    the default cap), hand the best ef_upper to the beam descent, and walk
    only the remaining mid_level-1 layers down to the layer-0 ef beam.

    Routing still comes from the graph hierarchy alone (layer membership +
    upper adjacency — no auxiliary pivot table); per-layer semantics match
    the reference's searchLayer descent (hnsw.go:309-311). The entry is the
    TRUE nearest layer-l* member instead of wherever the top-down walk
    lands at l* — strictly better routing than the walk it replaces, at
    ~1/3 of its serial while-loop steps (the descent-mode QPS wall over a
    tunneled chip)."""
    B = queries.shape[0]
    cap = vectors.shape[0]
    q32 = queries.astype(jnp.float32)
    q_sq = jnp.sum(q32 * q32, axis=-1)
    q_norm = jnp.sqrt(q_sq)
    dist_to = _make_dist_fn(queries, vectors, sq_norms, metric)

    safe = jnp.maximum(mid_slots, 0)
    bad = (mid_slots < 0) | deleted[safe]
    pdist = _entry_scan_xla(
        q32, q_sq, q_norm, vectors[safe], sq_norms[safe], metric
    )
    pdist = jnp.where(bad[None, :], _INF, pdist)
    kk = min(ef_upper, mid_slots.shape[0])
    neg, sel = jax.lax.top_k(-pdist, kk)
    ent_d = -neg  # [B, kk]
    ent_s = jnp.where(jnp.isfinite(ent_d), mid_slots[sel], -1)
    if kk < ef_upper:
        ent_s = jnp.pad(ent_s, ((0, 0), (0, ef_upper - kk)),
                        constant_values=-1)
        ent_d = jnp.pad(ent_d, ((0, 0), (0, ef_upper - kk)),
                        constant_values=_INF)
    lvl = jnp.full((B,), jnp.maximum(mid_level - 1, 0), jnp.int32)
    if ef_upper <= 1:
        cur, cur_d = _fused_greedy(
            dist_to, up_nbrs_cat, up_rows_flat, cap, deleted,
            ent_s[:, 0], ent_d[:, 0], lvl, jnp.zeros((B,), jnp.int32),
            max_iters=16 * 64,
        )
        entries_s, entries_d = cur[:, None], cur_d[:, None]
    else:
        entries_s, entries_d = _fused_beam_descent_lists(
            dist_to, up_nbrs_cat, up_rows_flat, cap, deleted,
            ent_s, ent_d, lvl, max_iters=16 * 64, expand=expand,
        )

    cand_s, cand_d, steps = _ef_beam_layer0(
        dist_to, neighbors0, deleted, entries_s, entries_d, ef,
        max_steps, expand=expand,
    )
    out_d = _finalize(cand_d[:, :k], metric)
    out_s = cand_s[:, :k]
    out_d = jnp.where(out_s < 0, _INF, out_d)
    return out_d, out_s, steps


# ---------------------------------------------------------------------------
# build-descent kernel (the insert path against a frozen graph)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("metric", "efc", "ef_upper", "m", "n_layers", "max_steps"),
)
def _build_descent_kernel(
    queries,  # [B, D] the new vectors
    levels,  # [B] i32 target level per new vector
    vectors,
    sq_norms,
    deleted,
    neighbors0,
    up_nbrs_cat,
    up_rows_flat,
    entry_slot,
    entry_level,
    metric: int,
    efc: int,
    ef_upper: int,
    m: int,
    n_layers: int,  # L: number of allocated upper layers
    max_steps: int,
):
    """Returns (upper_slots [L+1, B, ef_upper], upper_dists, ground_slots
    [B, efc], ground_dists). upper_*[l] holds layer-l candidates for queries
    with level >= l (-1/inf otherwise); index 0 of the leading axis is
    unused. Distances are finalized."""
    B = queries.shape[0]
    cap = vectors.shape[0]
    L = n_layers
    expand = min(BUILD_EXPAND, ef_upper)
    dist_to = _make_dist_fn(queries, vectors, sq_norms, metric)

    # phase 1: greedy descent to each query's own start layer
    cur = jnp.full((B,), entry_slot, jnp.int32)
    cur_d = dist_to(cur[:, None])[:, 0]
    lvl0 = jnp.full((B,), entry_level, jnp.int32)
    cur, cur_d = _fused_greedy(
        dist_to, up_nbrs_cat, up_rows_flat, cap, deleted,
        cur, cur_d, lvl0, jnp.minimum(levels, entry_level), max_iters=16 * 64,
    )

    # phase 2: one multi-layer beam loop — each query beams at its own layer,
    # records its candidates, reseeds with top-m, moves down
    out_s = jnp.full((L + 1, B, ef_upper), -1, jnp.int32)
    out_d = jnp.full((L + 1, B, ef_upper), _INF)
    cand_s = jnp.full((B, ef_upper), -1, jnp.int32).at[:, 0].set(cur)
    cand_d = jnp.full((B, ef_upper), _INF).at[:, 0].set(cur_d)
    expanded = jnp.zeros((B, ef_upper), bool)
    cur_lvl = jnp.minimum(levels, entry_level)  # collection starts here
    b_idx = jnp.arange(B)

    def up_cond(st):
        return jnp.any(st[5] >= 1) & (st[6] < max_steps)

    def up_body(st):
        cand_s, cand_d, expanded, o_s, o_d, cur_lvl, steps = st
        in_layers = cur_lvl >= 1
        converged = _beam_converged(cand_s, cand_d, expanded)
        transition = in_layers & converged
        stepping = in_layers & ~converged

        # beam step at each query's current layer
        def rows_of(slots):
            flat = (jnp.maximum(cur_lvl, 1)[:, None] - 1) * cap + slots
            return up_rows_flat[flat]

        new_s, new_d, new_e = _beam_step(
            dist_to, deleted, cand_s, cand_d, expanded,
            rows_of_slots=rows_of,
            nbr_lookup=lambda rows: up_nbrs_cat[rows],
            active=stepping, expand=expand,
        )
        cand_s = jnp.where(stepping[:, None], new_s, cand_s)
        cand_d = jnp.where(stepping[:, None], new_d, cand_d)
        expanded = jnp.where(stepping[:, None], new_e, expanded)

        # record converged layers: out[cur_lvl, b] = candidate list
        rec_s = jnp.where(transition[:, None], cand_s, o_s[cur_lvl, b_idx])
        rec_d = jnp.where(transition[:, None], cand_d, o_d[cur_lvl, b_idx])
        o_s = o_s.at[cur_lvl, b_idx].set(rec_s)
        o_d = o_d.at[cur_lvl, b_idx].set(rec_d)

        # reseed with the top-m for the next layer (entries stay valid: any
        # layer-l member is a member of every lower layer)
        keep = jnp.arange(ef_upper) < m
        seed_s = jnp.where(keep[None, :], cand_s, -1)
        seed_d = jnp.where(keep[None, :], cand_d, _INF)
        cand_s = jnp.where(transition[:, None], seed_s, cand_s)
        cand_d = jnp.where(transition[:, None], seed_d, cand_d)
        expanded = jnp.where(transition[:, None], False, expanded)
        cur_lvl = jnp.where(transition, cur_lvl - 1, cur_lvl)
        return cand_s, cand_d, expanded, o_s, o_d, cur_lvl, steps + 1

    cand_s, cand_d, expanded, out_s, out_d, cur_lvl, _ = jax.lax.while_loop(
        up_cond,
        up_body,
        (cand_s, cand_d, expanded, out_s, out_d, cur_lvl, jnp.int32(0)),
    )

    # phase 3: ground layer, full efc width, seeded from each query's final list
    g_s, g_d, _ = _ef_beam_layer0(
        dist_to, neighbors0, deleted,
        jnp.where(jnp.arange(ef_upper)[None, :] < m, cand_s, -1),
        jnp.where(jnp.arange(ef_upper)[None, :] < m, cand_d, _INF),
        efc, max_steps, expand=BUILD_EXPAND,
    )
    return (
        jnp.where(jnp.isinf(out_d), -1, out_s),
        _finalize(out_d, metric),
        g_s,
        _finalize(g_d, metric),
    )


# ---------------------------------------------------------------------------
# scatter updates (incremental device sync)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(arr, idx, vals):
    """Row scatter with out-of-bounds padding dropped (idx = len(arr) pads)."""
    return arr.at[idx].set(vals, mode="drop")


def _pack_deferred(dists: list, slots: list):
    """Enqueue the device-side packing of per-sub-batch (dist f32, slot int)
    results into ONE buffer. Runs as a device program — call it at SUBMIT
    time so it lands in the device queue right behind the producing kernels;
    deferring it to collect time would enqueue it behind whatever the next
    pass already dispatched (measured 3-4x pass inflation under depth-2
    pipelining)."""
    d = jnp.concatenate(dists) if len(dists) > 1 else dists[0]
    s = jnp.concatenate(slots) if len(slots) > 1 else slots[0]
    return jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(d.astype(jnp.float32), jnp.int32),
            s.astype(jnp.int32),
        ],
        axis=1,
    )


def _unpack_host(packed) -> tuple[np.ndarray, np.ndarray]:
    """Fetch a _pack_deferred buffer (one device->host transfer) and split
    it back into (dists f32, slots int32)."""
    host = np.asarray(packed)
    k = host.shape[1] // 2
    return host[:, :k].copy().view(np.float32), host[:, k:]


def _fetch_packed(dists: list, slots: list) -> tuple[np.ndarray, np.ndarray]:
    """Materialize per-sub-batch (dist f32, slot int) device results with ONE
    device->host transfer. Every separate fetch pays a full transfer round
    trip (~20 ms over a tunneled TPU); packing the f32 bits next to the slot
    ints makes the whole batch one buffer."""
    return _unpack_host(_pack_deferred(dists, slots))


@jax.jit
def _pack_idx(slots: list):
    """Device-side concat of index-only results into ONE buffer. Used by
    flushes whose host writeback needs only the selected ids (the append's
    reverse-reprune never reads the distances back) — half the tunnel fetch
    of packing (dist, slot) pairs."""
    return jnp.concatenate(slots) if len(slots) > 1 else slots[0]


def _fetch_packed_idx(slots: list) -> np.ndarray:
    return np.asarray(_pack_idx(slots))


def _pad_pow2(n: int, minimum: int = 64) -> int:
    n = max(n, minimum)
    return 1 << (n - 1).bit_length()


def build_cat_tables(store: GraphStore):
    """Host-side concatenated upper adjacency + flat pre-offset row map.
    Returns (cat [R_total, M], rows_flat [L * cap], offsets)."""
    offsets = []
    off = 0
    for ls in store.layers:
        offsets.append(off)
        off += ls.cap
    L = len(store.layers)
    if L == 0:
        return (
            np.full((1, store.m), -1, np.int32),
            np.full(store.cap, -1, np.int32),
            offsets,
        )
    cat = np.concatenate([ls.nbrs for ls in store.layers], axis=0)
    rows = np.full(L * store.cap, -1, np.int32)
    for l, ls in enumerate(store.layers):
        valid = ls.row_of >= 0
        seg = rows[l * store.cap : (l + 1) * store.cap]
        seg[valid] = ls.row_of[valid] + offsets[l]
    return cat, rows, offsets


def pivot_sample_host(store: GraphStore) -> dict[str, Any]:
    """Entry pivots: a strided sample of PUBLISHED slots — the linked
    watermark, not the allocation count. The chunked build allocates a
    chunk's slots before their links apply; an unlinked pivot would become
    a dead-end entry (no out-edges -> single bogus result).

    Host-side numpy (shared by the single-chip mirror's _pivot_arrays and
    the sharded stacked parts, parallel/sharded.py). Returns
    pivots [R] i32, pivot_vecs [R, D] f32, pivot_sq [R] f32, n_pub int."""
    n_pub = max(store.linked_count, 1)
    vecs = store.vectors
    # R targets ~16 points/pivot (pow2): the entry matmul costs ~1/16 of
    # a flat scan per dispatch, and the beam starts inside (or next to)
    # the query's own neighborhood. The round-3 cap of 16,384 silently
    # degraded coverage past 1M (488 points/pivot at 8M) and was the
    # large-N recall collapse: recall@10 at ef=12 fell 0.991 -> 0.938 ->
    # 0.862 (1M/4M/8M); re-measured at 4M with R=65536 it is 0.9894 at
    # HIGHER QPS (25.0k vs 23.9k — nearer entries mean shorter walks).
    # benchmarks/entry_modes_4000000.json. The cap now only bounds HBM
    # (262144 x 128 f32 pivots = 134 MB) and stays env-overridable.
    cap = int(os.environ.get("SCNT_PIVOT_CAP", 262144))
    R = max(64, min(1 << int(np.ceil(np.log2(n_pub / 16 + 1))), cap))
    stride = max(n_pub // R, 1)
    pivots = np.arange(0, n_pub, stride, dtype=np.int32)[:R]
    if len(pivots) < R:
        pivots = np.pad(pivots, (0, R - len(pivots)), mode="edge")
    pvecs = vecs[pivots].astype(np.float32)
    if int(store.metric) == int(DistanceMetric.COSINE):
        # pre-normalized pivots: comparison-form cosine is then 1 - dot
        # (the Pallas fused scan relies on this; the XLA path's
        # norm-based formula is unchanged — pivot_sq becomes 1 for
        # non-zero pivots, 0 for zero pivots which keep distance 1)
        norms = np.linalg.norm(pvecs, axis=1, keepdims=True)
        pvecs = np.where(norms > 1e-30, pvecs / np.maximum(norms, 1e-30), 0.0)
    return {
        "pivots": pivots,
        "pivot_vecs": pvecs,
        "pivot_sq": np.sum(pvecs * pvecs, axis=1),
        "n_pub": n_pub,
    }


def descent_mid_cap(n_pub: int) -> int:
    """Effective SCNT_DESCENT_MID_CAP: explicit env wins; otherwise scale
    with the corpus — n/256, floored at 8192 and capped at 65536. The 8M
    entry-mode A/B (benchmarks/curve_8000000_r5.json) showed the fixed 8k
    default under-covers large corpora (descent recall 0.979 @ 8M) while
    32k restores it (0.9978) at BETTER QPS than the smaller beam the 8k
    entry needs — one extra MXU pass is cheaper than wider beams."""
    env = os.environ.get("SCNT_DESCENT_MID_CAP")
    if env:
        return int(env)
    return max(8192, min(65536, n_pub // 256))


def mid_layer_host(store: GraphStore) -> dict[str, Any]:
    """Mid-entry layer for hierarchical descent serving: the LOWEST upper
    layer whose member count fits one cheap MXU pass (<=
    descent_mid_cap(n) — ~2-16 MB of gathered vectors, ~1/256 of the
    corpus). Scanning its members exactly and descending only the
    layers below replaces ~log2(N) serial walk layers with one matmul +
    ~log2(cap_env) layers. Members are filtered to the PUBLISHED watermark
    (same rule as pivot_sample_host — an unlinked member would be a
    dead-end entry). Returns {} when no upper layer qualifies (descent
    then walks from the top entrypoint as before)."""
    n_pub = max(store.linked_count, 1)
    cap_env = descent_mid_cap(n_pub)
    for l, ls in enumerate(store.layers, start=1):
        if ls.count == 0 or ls.count > cap_env:
            continue
        members = ls.node_slot[: ls.count]
        members = members[(members >= 0) & (members < n_pub)]
        if members.size == 0:
            continue
        R = _pad_pow2(int(members.size))
        arr = np.full(R, -1, np.int32)
        arr[: members.size] = members
        return {"mid_slots": arr, "mid_level": l}
    return {}


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
        self._pivot_count = 0
        self.mid_level = 0  # 0 = no mid-entry layer (see mid_layer_host)
        self._mid_cap = -1  # SCNT_DESCENT_MID_CAP the mid table was built at
        self.arrays: dict[str, Any] = {}
        self._offsets: list[int] = []
        # concurrent READERS of an index may both hit the lazy sync; the
        # mirror mutation (and the store's take_dirty bookkeeping) must be
        # serialized — the loser of the race sees a matching version and
        # no-ops
        self._sync_mu = threading.Lock()

    def _signature(self, store: GraphStore):
        # keyed to the ALLOCATED layer tables (not max_layer) so that entry
        # level growth during a build never changes device shapes
        return (store.cap, tuple(ls.cap for ls in store.layers))

    @property
    def n_layers(self) -> int:
        return len(self._offsets)

    def sync(self, store: GraphStore) -> None:
        with self._sync_mu:
            cap_env = descent_mid_cap(max(store.linked_count, 1))
            if store.version == self._version:
                # the mid-entry cap knob changed since the mirror synced
                # (A/B scripts flip it between serving modes): re-derive
                # the tiny mid table without touching anything else
                if cap_env != self._mid_cap and self.arrays:
                    self.arrays.pop("mid_slots", None)
                    self.arrays.update(self._mid_arrays(store))
                return
            sig = self._signature(store)
            dirty = store.take_dirty()
            try:
                if (
                    self._shape_sig is None
                    or dirty is None
                    or sig[0] != self._shape_sig[0]
                ):
                    self._full_upload(store)
                elif sig[1] != self._shape_sig[1]:
                    # a layer table grew: the concatenated offsets shift,
                    # so the STRUCTURE tables re-upload — but the per-slot
                    # arrays (vectors/sq_norms/neighbors0/deleted) keep
                    # their incremental scatters. The old full-upload
                    # response made the first append batches after an 8M
                    # build ~12 GB of tunnel traffic each (every layer's
                    # count sits on a pow2 boundary there) — the round-4
                    # "unexplained 8M append decay" (33-99 vec/s).
                    cat, rows = self._cat_tables(store)
                    self.arrays["up_nbrs_cat"] = jnp.asarray(cat)
                    self.arrays["up_rows_flat"] = jnp.asarray(rows)
                    dirty["layers"].clear()
                    dirty["layer_rows"].clear()
                    self.arrays.pop("mid_slots", None)
                    self.arrays.update(self._mid_arrays(store))
                    self._incremental(store, dirty)
                else:
                    self._incremental(store, dirty)
            except BaseException:
                # the dirty set was consumed but not applied (e.g. a
                # transient transfer error mid-scatter): those rows are
                # unrecoverable as a delta, so force a FULL upload on the
                # next sync instead of leaving the mirror silently stale
                self._shape_sig = None
                raise
            self._version = store.version
            self._shape_sig = sig

    def _cat_tables(self, store: GraphStore):
        cat, rows, self._offsets = build_cat_tables(store)
        return cat, rows

    def _pivot_arrays(self, store: GraphStore) -> dict[str, Any]:
        host = pivot_sample_host(store)
        self._pivot_count = host.pop("n_pub")
        return {k: jnp.asarray(v) for k, v in host.items()}

    def _mid_arrays(self, store: GraphStore) -> dict[str, Any]:
        host = mid_layer_host(store)
        self.mid_level = int(host.pop("mid_level", 0))
        self._mid_cap = descent_mid_cap(max(store.linked_count, 1))
        return {k: jnp.asarray(v) for k, v in host.items()}

    def _full_upload(self, store: GraphStore) -> None:
        vecs = store.vectors
        cat, rows = self._cat_tables(store)
        self.arrays = {
            "vectors": jnp.asarray(vecs, dtype=self.dtype),
            "sq_norms": jnp.asarray(
                np.sum(vecs.astype(np.float32) ** 2, axis=1), dtype=jnp.float32
            ),
            "deleted": jnp.asarray(store.deleted),
            "neighbors0": jnp.asarray(store.neighbors0),
            "up_nbrs_cat": jnp.asarray(cat),
            "up_rows_flat": jnp.asarray(rows),
            **self._pivot_arrays(store),
            **self._mid_arrays(store),
        }

    @staticmethod
    def _scatter_into(device_arr, idx: np.ndarray, vals: np.ndarray):
        """Scatter host values into the (donated) device array; indices are
        padded to power-of-two buckets with out-of-bounds sentinels (dropped
        by the scatter) to bound compile variants."""
        oob = device_arr.shape[0]
        pad = _pad_pow2(len(idx)) - len(idx)
        if pad:
            idx = np.concatenate([idx, np.full(pad, oob, np.int32)])
            fill = np.zeros((pad,) + vals.shape[1:], vals.dtype)
            vals = np.concatenate([vals, fill])
        vals_j = jnp.asarray(vals).astype(device_arr.dtype)
        return _scatter_rows(device_arr, jnp.asarray(idx), vals_j)

    def _incremental(self, store: GraphStore, dirty: dict) -> None:
        a = self.arrays
        # the pivot sample only covers slots [0, _pivot_count); appended
        # batches past ~25% growth would otherwise leave entry points
        # sampled solely from old data (recall degrades progressively
        # until a capacity doubling forces a full upload) — refresh the
        # (small) pivot arrays whenever the live prefix has outgrown them
        if store.linked_count > self._pivot_count + max(self._pivot_count // 4, 16):
            a.update(self._pivot_arrays(store))
        # mid-entry layer membership changed (appends draw upper levels):
        # the mid table is tiny (<=8k i32), so refresh on any layer-row
        # dirt rather than tracking the specific layer
        if dirty["layer_rows"]:
            a.pop("mid_slots", None)
            a.update(self._mid_arrays(store))
        if dirty["vectors"]:
            rows = np.fromiter(dirty["vectors"], np.int32, len(dirty["vectors"]))
            a["vectors"] = self._scatter_into(
                a["vectors"], rows, store.vectors[rows]
            )
            norms = np.sum(store.vectors[rows].astype(np.float32) ** 2, axis=1)
            a["sq_norms"] = self._scatter_into(a["sq_norms"], rows, norms)
        if dirty["neighbors0"]:
            rows = np.fromiter(
                dirty["neighbors0"], np.int32, len(dirty["neighbors0"])
            )
            a["neighbors0"] = self._scatter_into(
                a["neighbors0"], rows, store.neighbors0[rows]
            )
        if dirty["deleted"]:
            rows = np.fromiter(dirty["deleted"], np.int32, len(dirty["deleted"]))
            a["deleted"] = self._scatter_into(
                a["deleted"], rows, store.deleted[rows]
            )
        # upper layers: adjacency rows into the concatenated table, row-map
        # entries into the flat (pre-offset) map
        cat_idx, cat_vals = [], []
        map_idx, map_vals = [], []
        for l, ls in enumerate(store.layers, start=1):
            off = self._offsets[l - 1]
            rows = dirty["layers"].get(l)
            if rows:
                r = np.fromiter(rows, np.int32, len(rows))
                cat_idx.append(r + off)
                cat_vals.append(ls.nbrs[r])
            slots = dirty["layer_rows"].get(l)
            if slots:
                s = np.fromiter(slots, np.int32, len(slots))
                map_idx.append((l - 1) * store.cap + s)
                vals = np.where(ls.row_of[s] >= 0, ls.row_of[s] + off, -1)
                map_vals.append(vals.astype(np.int32))
        if cat_idx:
            a["up_nbrs_cat"] = self._scatter_into(
                a["up_nbrs_cat"],
                np.concatenate(cat_idx),
                np.concatenate(cat_vals),
            )
        if map_idx:
            a["up_rows_flat"] = self._scatter_into(
                a["up_rows_flat"],
                np.concatenate(map_idx),
                np.concatenate(map_vals),
            )


class DeviceIndex:
    """Batched search + build-descent dispatch over a DeviceGraph mirror."""

    def __init__(self, dtype: str = "float32", max_batch: int = 256,
                 graph: Optional[DeviceGraph] = None):
        self.graph = graph or DeviceGraph(dtype)
        self.max_batch = max_batch

    def sync(self, store: GraphStore) -> None:
        self.graph.sync(store)

    @property
    def _arrays(self):
        return self.graph.arrays

    @staticmethod
    def _entry_info(store: GraphStore):
        entry = max(store.entry_slot, 0)
        level = int(store.levels[entry]) if store.entry_slot >= 0 else 0
        return jnp.int32(entry), jnp.int32(max(level, 0))

    def search(
        self,
        store: GraphStore,
        queries: np.ndarray,
        k: int,
        ef: int,
        max_steps: int | None = None,
        entry_mode: str = "pivot",  # "pivot" (MXU entry) | "descent" (reference)
        expand: int = SEARCH_EXPAND,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (slots [B, k] i64, dists [B, k] f32); -1/inf padding."""
        return self.search_collect(
            self.search_submit(
                store, queries, k, ef, max_steps=max_steps,
                entry_mode=entry_mode, expand=expand,
            )
        )

    def search_submit(
        self,
        store: GraphStore,
        queries: np.ndarray,
        k: int,
        ef: int,
        max_steps: int | None = None,
        entry_mode: str = "pivot",
        expand: int = SEARCH_EXPAND,
    ):
        """Upload + dispatch WITHOUT fetching; pair with search_collect.
        Lets a serving loop overlap the next batch's upload/kernel with
        the previous batch's result fetch (the tunnel transfer dominates
        the pass; see scripts/prof_tunnel_floor.py)."""
        self.sync(store)
        B = queries.shape[0]
        ef = max(ef, k)
        env_entry = os.environ.get("SCNT_SEARCH_ENTRY")
        if env_entry in ("pivot", "descent"):
            entry_mode = env_entry
        # descent entry-beam width (1 = reference greedy walk; >1 = beam
        # descent, the scale-recall fix for bulk-built upper layers —
        # results_round4.md §3). Pivot mode ignores it.
        ef_upper = max(int(os.environ.get("SCNT_SEARCH_EF_UPPER", "1")), 1)
        if max_steps is None:
            env_steps = os.environ.get("SCNT_SEARCH_MAXSTEPS")
            # generous bound; convergence normally stops the loop much earlier
            max_steps = int(env_steps) if env_steps else ef + 64
        a = self.graph.arrays
        entry, entry_level = self._entry_info(store)
        # dispatch every sub-batch first (jax dispatch is async), then
        # materialize — sub-batches pipeline through the device instead of
        # paying a full dispatch+transfer round trip each
        in_flight = []
        # f16 query upload (same contract as index/flat.py _QUERY_F16):
        # kernels cast up to f32, so only query rounding deviates
        up_dtype = (
            jnp.float16
            if os.environ.get("SCNT_QUERY_F16", "0") == "1"
            else jnp.float32
        )
        # sub-batch width override: descent mode amortizes its serial
        # while-loop step overhead over more queries per dispatch (the
        # pivot default of 256 is tuned for transfer pipelining)
        mb_env = int(os.environ.get("SCNT_SEARCH_SUBBATCH", "0") or 0)
        sub_b = mb_env if mb_env > 0 else self.max_batch
        # fused sub-batches: scan the pivot kernel over chunks inside ONE
        # program — one dispatch + one query upload per pass instead of
        # B/max_batch of each (the tunnel charges per transfer/dispatch)
        fuse = (
            os.environ.get("SCNT_FUSE_SUBBATCH", "0") == "1"
            and entry_mode == "pivot"
            and B > sub_b
            and sub_b & (sub_b - 1) == 0
        )
        if fuse:
            mb = sub_b
            padded_b = max(1 << (B - 1).bit_length(), mb)
            chunk = queries
            if padded_b > B:
                chunk = np.concatenate(
                    [queries,
                     np.zeros((padded_b - B, queries.shape[1]), np.float32)]
                )
            q3 = jnp.asarray(chunk, up_dtype).reshape(
                padded_b // mb, mb, queries.shape[1]
            )
            use_pallas = (
                jax.default_backend() == "tpu"
                and a["pivots"].shape[0] % 512 == 0
            )
            d, s = _search_kernel_pivot_chunked(
                q3, a["vectors"], a["sq_norms"], a["deleted"],
                a["neighbors0"], a["pivots"], a["pivot_vecs"], a["pivot_sq"],
                metric=int(store.metric), ef=ef, k=k, max_steps=max_steps,
                expand=expand, use_pallas=use_pallas,
            )
            d = d.reshape(padded_b, k)
            s = s.reshape(padded_b, k)
            packed = _pack_deferred([d], [s])
            return (B, k, [(0, B, padded_b)], packed)
        for start in range(0, B, sub_b):
            chunk = queries[start : start + sub_b]
            n = chunk.shape[0]
            # next pow2, >= 8: one f32 sublane — the Pallas pivot scan
            # rejects query blocks smaller than a sublane on real TPUs
            padded = max(1 << (n - 1).bit_length(), 8)
            if padded > n:
                chunk = np.concatenate(
                    [chunk, np.zeros((padded - n, chunk.shape[1]), np.float32)]
                )
            if entry_mode == "pivot":
                # fused Pallas pivot scan on real TPUs (score matrix stays
                # in VMEM); XLA path on CPU / odd pivot counts
                use_pallas = (
                    jax.default_backend() == "tpu"
                    and a["pivots"].shape[0] % 512 == 0
                )
                d, s, _ = _search_kernel_pivot(
                    jnp.asarray(chunk, up_dtype),
                    a["vectors"],
                    a["sq_norms"],
                    a["deleted"],
                    a["neighbors0"],
                    a["pivots"],
                    a["pivot_vecs"],
                    a["pivot_sq"],
                    metric=int(store.metric),
                    ef=ef,
                    k=k,
                    max_steps=max_steps,
                    expand=expand,
                    use_pallas=use_pallas,
                )
            elif (
                os.environ.get("SCNT_DESCENT_MID", "1") == "1"
                and "mid_slots" in a
                and self.graph.mid_level >= 1
            ):
                # hierarchical mid-layer entry: one MXU pass over the
                # members of the highest small-enough layer replaces the
                # top-down walk's first ~log2(N/8k) serial layers
                # (SCNT_DESCENT_MID=0 restores the pure reference walk)
                d, s, _ = _search_kernel_mid(
                    jnp.asarray(chunk, up_dtype),
                    a["vectors"],
                    a["sq_norms"],
                    a["deleted"],
                    a["neighbors0"],
                    a["up_nbrs_cat"],
                    a["up_rows_flat"],
                    a["mid_slots"],
                    jnp.int32(self.graph.mid_level),
                    metric=int(store.metric),
                    ef=ef,
                    k=k,
                    max_steps=max_steps,
                    expand=expand,
                    ef_upper=ef_upper,
                )
            else:
                d, s, _ = _search_kernel(
                    jnp.asarray(chunk, up_dtype),
                    a["vectors"],
                    a["sq_norms"],
                    a["deleted"],
                    a["neighbors0"],
                    a["up_nbrs_cat"],
                    a["up_rows_flat"],
                    entry,
                    entry_level,
                    metric=int(store.metric),
                    ef=ef,
                    k=k,
                    max_steps=max_steps,
                    expand=expand,
                    ef_upper=ef_upper,
                )
            in_flight.append((start, n, d.shape[0], d, s))
        # pack NOW so the concat program sits right behind the kernels in
        # the device queue (see _pack_deferred)
        packed = _pack_deferred(
            [d for _, _, _, d, _ in in_flight],
            [s for _, _, _, _, s in in_flight],
        )
        metas = [(start, n, rows) for start, n, rows, _, _ in in_flight]
        return (B, k, metas, packed)

    def search_collect(self, payload) -> tuple[np.ndarray, np.ndarray]:
        """Fetch a search_submit handle: one packed transfer, sliced."""
        B, k, metas, packed = payload
        out_slots = np.empty((B, k), np.int64)
        out_dists = np.empty((B, k), np.float32)
        d_host, s_host = _unpack_host(packed)
        row = 0
        for start, n, rows in metas:
            out_dists[start : start + n] = d_host[row : row + n]
            out_slots[start : start + n] = s_host[row : row + n]
            row += rows
        return out_slots, out_dists

    def build_descent_raw(
        self,
        store: GraphStore,
        queries: np.ndarray,  # [B, D]
        levels: np.ndarray,  # [B]
        efc: int,
        max_steps: int | None = None,
    ):
        """Dispatch the descent (ASYNC — returns device arrays immediately,
        letting the caller overlap host work with device compute)."""
        self.sync(store)
        a = self.graph.arrays
        ef_upper = min(efc, max(2 * store.m, 32))
        if max_steps is None:
            # every query pays ~(ef / expand) steps per layer it collects at
            max_steps = (len(store.layers) + 2) * (ef_upper + 64) + efc
        entry, entry_level = self._entry_info(store)
        return _build_descent_kernel(
            jnp.asarray(queries, jnp.float32),
            jnp.asarray(levels, jnp.int32),
            a["vectors"],
            a["sq_norms"],
            a["deleted"],
            a["neighbors0"],
            a["up_nbrs_cat"],
            a["up_rows_flat"],
            entry,
            entry_level,
            metric=int(store.metric),
            efc=efc,
            ef_upper=ef_upper,
            m=store.m,
            n_layers=len(store.layers),
            max_steps=max_steps,
        )

    @staticmethod
    def assemble_descent(raw, efc: int) -> tuple[np.ndarray, np.ndarray]:
        """Materialize a build_descent_raw result (blocks on the device) into
        unified (slots [L+1, B, efc], dists) arrays — upper layers occupy the
        first ef_upper columns, the ground layer the full efc."""
        u_s, u_d, g_s, g_d = (np.asarray(x) for x in raw)
        L1, B = u_s.shape[0], u_s.shape[1]
        slots = np.full((L1, B, efc), -1, np.int32)
        dists = np.full((L1, B, efc), np.inf, np.float32)
        slots[:, :, : u_s.shape[2]] = u_s
        dists[:, :, : u_d.shape[2]] = u_d
        slots[0] = g_s
        dists[0] = g_d
        return slots, dists

    def build_descent(
        self,
        store: GraphStore,
        queries: np.ndarray,
        levels: np.ndarray,
        efc: int,
        max_steps: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Synchronous descent (dispatch + materialize)."""
        raw = self.build_descent_raw(store, queries, levels, efc, max_steps)
        return self.assemble_descent(raw, efc)
