"""Batched HNSW search on TPU.

The reference answers one query at a time by chasing pointers through Go maps
under a RWMutex (reference: hnsw.go:292-350, :487-557). Here search runs as
ONE jitted program over a whole batch of queries against the flat graph
arrays in HBM:

- upper layers: lockstep greedy descent (`ef=1`) — a `lax.while_loop` that
  moves every query to its best neighbor until none improves,
- layer 0: masked ef-beam — each step expands, per query, the nearest
  unexpanded candidate, gathers its <=2M neighbor rows, computes distances as
  one batched gather+einsum (f32 accumulation), and merges into the kept
  top-ef list with `lax.top_k`.

Distances use "comparison form" inside the loops (squared L2, true cosine,
negated dot) and are finalized (sqrt for L2) once at the end, matching the
reference's returned values (reference: distance.go:21-116).

All shapes are static: capacity grows in powers of two, neighbor slots are
-1-padded and masked, the visited set is a per-query byte array, and the beam
runs under `lax.while_loop` with a convergence predicate equivalent to the
reference's stop rule (frontier head worse than the worst kept candidate,
hnsw.go:516-518). Deleted nodes never enter the candidate list
(hnsw.go:527-530).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from scintirete_tpu.index.store import GraphStore
from scintirete_tpu.types import DistanceMetric

_L2 = int(DistanceMetric.L2)
_COSINE = int(DistanceMetric.COSINE)
_IP = int(DistanceMetric.INNER_PRODUCT)

_INF = jnp.float32(jnp.inf)


def _cmp_dist(q, q_sq, q_norm, vecs, v_sq, metric):
    """Comparison-form distance of q [B, D] against gathered vecs [B, K, D].

    v_sq: [B, K] f32 squared norms. Returns [B, K] f32 (lower = closer).
    """
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


@functools.partial(
    jax.jit, static_argnames=("metric", "ef", "k", "max_steps")
)
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
    B, D = queries.shape
    cap = vectors.shape[0]

    q32 = queries.astype(jnp.float32)
    q_sq = jnp.sum(q32 * q32, axis=-1)  # [B]
    q_norm = jnp.sqrt(q_sq)

    def dist_to(slots):  # slots [B, K] -> [B, K] cmp distances
        vecs = vectors[slots]  # gather [B, K, D]
        v_sq = sq_norms[slots]
        return _cmp_dist(queries, q_sq, q_norm, vecs, v_sq, metric)

    # ---- upper-layer greedy descent (reference: searchLayer with ef=1) ----
    cur = jnp.full((B,), entry_slot, jnp.int32)
    cur_d = dist_to(cur[:, None])[:, 0]

    for nbrs_l, rows_l in zip(upper_nbrs, upper_rows):
        def cond(state):
            _, _, moved = state
            return jnp.any(moved)

        def body(state):
            cur, cur_d, _ = state
            rows = rows_l[cur]  # [B]
            nbrs = nbrs_l[rows]  # [B, M]
            ok = (nbrs >= 0) & (rows >= 0)[:, None]
            ok = ok & ~deleted[jnp.maximum(nbrs, 0)]
            d = jnp.where(ok, dist_to(jnp.maximum(nbrs, 0)), _INF)
            best = jnp.argmin(d, axis=1)
            best_d = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
            improve = best_d < cur_d
            new_cur = jnp.where(
                improve, jnp.take_along_axis(nbrs, best[:, None], axis=1)[:, 0], cur
            )
            new_d = jnp.where(improve, best_d, cur_d)
            return new_cur, new_d, improve

        cur, cur_d, _ = jax.lax.while_loop(
            cond, body, (cur, cur_d, jnp.ones((B,), bool))
        )

    # ---- layer-0 ef-beam ----
    m0 = neighbors0.shape[1]
    cand_s = jnp.full((B, ef), -1, jnp.int32).at[:, 0].set(cur)
    cand_d = jnp.full((B, ef), _INF).at[:, 0].set(cur_d)
    expanded = jnp.zeros((B, ef), bool)
    visited = jnp.zeros((B, cap), jnp.bool_)
    b_idx = jnp.arange(B)
    visited = visited.at[b_idx, cur].set(True)

    def beam_cond(state):
        cand_s, cand_d, expanded, visited, steps = state
        unexp_d = jnp.where(expanded | (cand_s < 0), _INF, cand_d)
        best_unexp = jnp.min(unexp_d, axis=1)
        worst = cand_d[:, -1]  # kept list is sorted ascending
        active = (best_unexp <= worst) & jnp.isfinite(best_unexp)
        return jnp.any(active) & (steps < max_steps)

    def beam_body(state):
        cand_s, cand_d, expanded, visited, steps = state
        unexp_d = jnp.where(expanded | (cand_s < 0), _INF, cand_d)
        best_unexp = jnp.min(unexp_d, axis=1)
        worst = cand_d[:, -1]
        active = (best_unexp <= worst) & jnp.isfinite(best_unexp)  # [B]

        i_star = jnp.argmin(unexp_d, axis=1)  # [B]
        slot_star = jnp.take_along_axis(cand_s, i_star[:, None], axis=1)[:, 0]
        slot_star = jnp.maximum(slot_star, 0)
        expanded = expanded.at[b_idx, i_star].set(
            jnp.take_along_axis(expanded, i_star[:, None], axis=1)[:, 0] | active
        )

        nbrs = neighbors0[slot_star]  # [B, 2M]
        safe = jnp.maximum(nbrs, 0)
        seen = jnp.take_along_axis(visited, safe, axis=1)
        fresh = (nbrs >= 0) & ~seen & active[:, None]
        visited = visited.at[b_idx[:, None], safe].set(
            jnp.take_along_axis(visited, safe, axis=1) | fresh
        )
        usable = fresh & ~deleted[safe]

        d = jnp.where(usable, dist_to(safe), _INF)
        all_d = jnp.concatenate([cand_d, d], axis=1)
        all_s = jnp.concatenate([cand_s, jnp.where(usable, nbrs, -1)], axis=1)
        all_e = jnp.concatenate(
            [expanded, jnp.zeros((B, nbrs.shape[1]), bool)], axis=1
        )
        top_negd, sel = jax.lax.top_k(-all_d, ef)
        cand_d = -top_negd
        cand_s = jnp.take_along_axis(all_s, sel, axis=1)
        expanded = jnp.take_along_axis(all_e, sel, axis=1)
        return cand_s, cand_d, expanded, visited, steps + 1

    cand_s, cand_d, expanded, visited, steps = jax.lax.while_loop(
        beam_cond,
        beam_body,
        (cand_s, cand_d, expanded, visited, jnp.int32(0)),
    )

    out_d = _finalize(cand_d[:, :k], metric)
    out_s = jnp.where(jnp.isinf(cand_d[:, :k]), -1, cand_s[:, :k])
    out_d = jnp.where(out_s < 0, _INF, out_d)
    return out_d, out_s, steps


class DeviceIndex:
    """Device mirror of a GraphStore + jitted batched search dispatch.

    Sync is lazy and version-keyed: mutations bump `store.version`; the next
    search uploads fresh arrays. Queries are padded to power-of-two batch
    sizes to bound the number of compiled variants.
    """

    def __init__(self, dtype: str = "float32", max_batch: int = 256):
        self.dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.max_batch = max_batch
        self._version = -1
        self._arrays: dict[str, Any] = {}

    def sync(self, store: GraphStore) -> None:
        if store.version == self._version:
            return
        vecs = store.vectors
        self._arrays = {
            "vectors": jnp.asarray(vecs, dtype=self.dtype),
            "sq_norms": jnp.asarray(
                np.sum(vecs.astype(np.float32) ** 2, axis=1), dtype=jnp.float32
            ),
            "deleted": jnp.asarray(store.deleted),
            "neighbors0": jnp.asarray(store.neighbors0),
            # layers ordered top..1 to match descent order
            "upper_nbrs": tuple(
                jnp.asarray(ls.nbrs) for ls in reversed(store.layers[: store.max_layer])
            ),
            "upper_rows": tuple(
                jnp.asarray(ls.row_of)
                for ls in reversed(store.layers[: store.max_layer])
            ),
        }
        self._version = store.version

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
        a = self._arrays
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
