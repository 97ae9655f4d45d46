"""Exact brute-force top-k scan over the base matrix.

The exact-search baseline required by BASELINE.json ("brute-force flat-scan
rerank baseline") and the recall oracle for HNSW tests. Tiles the base matrix
so arbitrary collection sizes stream through a bounded [B, TILE] distance
block: a lax.scan over tiles carries a running top-k that is merged with each
tile's candidates (concat + top_k), keeping peak memory at
O(B * (TILE + k)) instead of O(B * N).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from scintirete_tpu.ops.distance import pairwise_distance

_DEFAULT_TILE = 65536
_INF = jnp.inf


@functools.partial(jax.jit, static_argnames=("metric", "k", "tile"))
def brute_force_topk(
    queries: jax.Array,  # [B, D]
    base: jax.Array,  # [N, D] (N padded to any size; mask invalid rows)
    valid: jax.Array,  # [N] bool — False for empty/deleted slots
    metric: int,
    k: int,
    base_sq_norms: jax.Array | None = None,
    tile: int = _DEFAULT_TILE,
) -> tuple[jax.Array, jax.Array]:
    """Returns (distances [B, k] f32 asc, slot indices [B, k] i32).

    Invalid slots surface as +inf distance with index -1 (callers drop them).
    """
    B = queries.shape[0]
    N = base.shape[0]
    if base_sq_norms is None:
        from scintirete_tpu.ops.distance import preprocess_norms

        base_sq_norms = preprocess_norms(base)

    if N <= tile:
        dists = pairwise_distance(queries, base, metric, base_sq_norms)
        dists = jnp.where(valid[None, :], dists, _INF)
        top_d, top_i = jax.lax.top_k(-dists, min(k, N))
        top_d, top_i = -top_d, top_i.astype(jnp.int32)
        if k > N:  # pad out to k
            pad = k - N
            top_d = jnp.pad(top_d, ((0, 0), (0, pad)), constant_values=_INF)
            top_i = jnp.pad(top_i, ((0, 0), (0, pad)), constant_values=-1)
        return top_d, jnp.where(jnp.isinf(top_d), -1, top_i)

    # Pad N up to a multiple of tile with invalid rows.
    num_tiles = -(-N // tile)
    padded = num_tiles * tile
    base_p = jnp.pad(base, ((0, padded - N), (0, 0)))
    norms_p = jnp.pad(base_sq_norms, (0, padded - N))
    valid_p = jnp.pad(valid, (0, padded - N), constant_values=False)
    base_t = base_p.reshape(num_tiles, tile, -1)
    norms_t = norms_p.reshape(num_tiles, tile)
    valid_t = valid_p.reshape(num_tiles, tile)

    init_d = jnp.full((B, k), _INF, dtype=jnp.float32)
    init_i = jnp.full((B, k), -1, dtype=jnp.int32)

    def body(carry, xs):
        best_d, best_i = carry
        tile_base, tile_norms, tile_valid, tile_idx = xs
        d = pairwise_distance(queries, tile_base, metric, tile_norms)
        d = jnp.where(tile_valid[None, :], d, _INF)
        idx = tile_idx * tile + jax.lax.broadcasted_iota(jnp.int32, (B, tile), 1)
        all_d = jnp.concatenate([best_d, d], axis=1)
        all_i = jnp.concatenate([best_i, idx], axis=1)
        new_d, sel = jax.lax.top_k(-all_d, k)
        new_i = jnp.take_along_axis(all_i, sel, axis=1)
        return (-new_d, new_i), None

    (best_d, best_i), _ = jax.lax.scan(
        body,
        (init_d, init_i),
        (base_t, norms_t, valid_t, jnp.arange(num_tiles, dtype=jnp.int32)),
    )
    return best_d, jnp.where(jnp.isinf(best_d), -1, best_i)
