"""Serving-grade exact flat scan: MXU distance matmul + TPU approx top-k.

The TPU-first inversion of the reference's whole design: on a CPU, exact
search at 1M vectors is ~100 ms/query (hence HNSW); on one TPU chip the MXU
scores a query batch against the entire collection in milliseconds. This op
is the compute path of `index.FlatIndex`.

Selection uses `jax.lax.approx_min_k` — the hardware-native partial-reduction
top-k (PartialReduce) that avoids a full sort of the [B, N] score matrix.
Only *selection* is approximate (recall_target on which candidates surface);
the returned distances are computed by the same formulas as
`ops.distance.pairwise_distance` and match the reference's values exactly
(reference: internal/core/algorithm/distance.go:21-116).

Two regimes:
- single-shot: one [B, N] score matrix when it fits comfortably in HBM;
- tiled: a lax.scan over base tiles, each tile reduced with approx_min_k and
  merged exactly into the running top-k, so peak memory is O(B * tile).

`brute_force_topk` (ops/topk.py) stays the exact oracle used by tests and
ground-truth tooling; this op is the serving path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from scintirete_tpu.ops.distance import pairwise_distance
from scintirete_tpu.types import DistanceMetric

# max elements of the [B, N] score matrix we allow in one shot (f32): 1 GiB
_SINGLE_SHOT_ELEMS = 256 * 1024 * 1024
_TILE = 262144


@functools.partial(
    jax.jit, static_argnames=("metric", "k", "recall_target", "tile")
)
def flat_topk(
    queries: jax.Array,  # [B, D]
    base: jax.Array,  # [N, D] f32 or bf16 (dot runs in the storage dtype)
    valid: jax.Array,  # [N] bool — False for empty/deleted slots
    metric: int,
    k: int,
    base_sq_norms: jax.Array | None = None,
    recall_target: float = 0.95,
    tile: int = _TILE,
) -> tuple[jax.Array, jax.Array]:
    """Returns (distances [B, k] f32 asc, slot indices [B, k] i32).

    Invalid slots surface as +inf distance with index -1.
    """
    B = queries.shape[0]
    N = base.shape[0]
    if base_sq_norms is None:
        from scintirete_tpu.ops.distance import preprocess_norms

        base_sq_norms = preprocess_norms(base)
    kk = min(k, N)

    if B * N <= _SINGLE_SHOT_ELEMS or N <= tile:
        d = pairwise_distance(queries, base, metric, base_sq_norms)
        d = jnp.where(valid[None, :], d, jnp.inf)
        top_d, top_i = jax.lax.approx_min_k(d, kk, recall_target=recall_target)
        top_i = top_i.astype(jnp.int32)
    else:
        num_tiles = -(-N // tile)
        padded = num_tiles * tile
        base_p = jnp.pad(base, ((0, padded - N), (0, 0)))
        norms_p = jnp.pad(base_sq_norms, (0, padded - N))
        valid_p = jnp.pad(valid, (0, padded - N), constant_values=False)
        base_t = base_p.reshape(num_tiles, tile, -1)
        norms_t = norms_p.reshape(num_tiles, tile)
        valid_t = valid_p.reshape(num_tiles, tile)

        def body(carry, xs):
            best_d, best_i = carry
            tile_base, tile_norms, tile_valid, tile_idx = xs
            d = pairwise_distance(queries, tile_base, metric, tile_norms)
            d = jnp.where(tile_valid[None, :], d, jnp.inf)
            td, ti = jax.lax.approx_min_k(d, kk, recall_target=recall_target)
            ti = ti.astype(jnp.int32) + tile_idx * tile
            all_d = jnp.concatenate([best_d, td], axis=1)
            all_i = jnp.concatenate([best_i, ti], axis=1)
            nd, sel = jax.lax.top_k(-all_d, kk)  # exact merge of tile winners
            return (-nd, jnp.take_along_axis(all_i, sel, axis=1)), None

        init = (
            jnp.full((B, kk), jnp.inf, jnp.float32),
            jnp.full((B, kk), -1, jnp.int32),
        )
        (top_d, top_i), _ = jax.lax.scan(
            body,
            init,
            (base_t, norms_t, valid_t, jnp.arange(num_tiles, dtype=jnp.int32)),
        )

    if k > kk:
        pad = k - kk
        top_d = jnp.pad(top_d, ((0, 0), (0, pad)), constant_values=jnp.inf)
        top_i = jnp.pad(top_i, ((0, 0), (0, pad)), constant_values=-1)
    return top_d, jnp.where(jnp.isinf(top_d), -1, top_i)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "k", "width", "interpret", "tps"),
)
def flat_topk_fused(
    queries: jax.Array,  # [B, D] f32 (or f16/int8 — cast up; cuts upload bytes)
    scan_base: jax.Array,  # [N, D] bf16 or int8, pre-normalized for cosine
    exact_base: jax.Array,  # [N, D] f32 — rerank source
    valid: jax.Array,  # [N] bool — False for deleted/empty slots
    metric: int,
    k: int,
    base_sq_norms: jax.Array,  # [N] f32 (of the SCAN-form f32 rows)
    width: int = 64,
    base_scale: jax.Array | None = None,  # [N] f32, required for int8
    interpret: bool = False,
    tps: int = 1,  # scan tiles per grid step (N % (tps*LANES) == 0)
    query_scale: jax.Array | None = None,  # [B] f32 — int8 query upload
) -> tuple[jax.Array, jax.Array]:
    """Exact search via the fused Pallas lane scan (ops/pallas_scan.py):
    one corpus-streaming pass selects ~2*LANES winners per query with the
    score matrix held in VMEM, then the top `width` are reranked against
    the f32 matrix — returned distances are pairwise_distance's values.
    Requires N % LANES == 0 (callers pad capacity to a power of two)."""
    from scintirete_tpu.ops.distance import dist_from_dots
    from scintirete_tpu.ops.pallas_scan import (
        lane_topk_scan_packed,
        lane_topk_scan_packed_int8,
    )

    B, D = queries.shape
    q32 = queries.astype(jnp.float32)
    if query_scale is not None:
        # int8 query upload (SCNT_QUERY_DTYPE=int8): queries arrive as
        # per-row symmetric int8 + f32 scale (132 B/query at D=128 vs 256
        # f16 / 512 f32 — upload is the dominant serving cost over a
        # tunneled chip). Dequantize on device; ~0.4% relative input
        # rounding, absorbed the same way as f16 (rank decided at f32-dot
        # precision of the rounded query; recall is gated by the bench).
        q32 = q32 * query_scale[:, None]
    invalid = 1.0 - valid.astype(jnp.float32)  # kernels mask on 1.0
    if metric == int(DistanceMetric.COSINE):
        qn = jnp.sqrt(jnp.sum(q32 * q32, axis=1, keepdims=True))
        q_scan = jnp.where(qn > 1e-30, q32 / jnp.maximum(qn, 1e-30), 0.0)
    else:
        q_scan = q32
    # ONE kernel dispatch for the whole batch: the kernels take a 2D grid
    # (query blocks x base tiles), so any B that is a multiple of the
    # kernels' _MAX_B sub-block (or smaller than it) runs as a single
    # program — no Python sub-batch loop. The
    # packed-key kernels fold each score block in 3 VPU ops (the unpacked
    # top-2 fold was ~4x the matmul time and capped the scan at ~4% of
    # int8 peak); ranking scores carry tile ids in their low mantissa
    # bits, harmless at candidate-selection precision, and the f32 rerank
    # below makes returned distances exact regardless.
    if scan_base.dtype == jnp.int8:
        assert base_scale is not None, "int8 scan needs per-row scales"
        lane_d, lane_i = lane_topk_scan_packed_int8(
            q_scan, scan_base, base_scale, base_sq_norms, invalid, metric,
            interpret=interpret, tps=tps,
        )
    else:
        lane_d, lane_i = lane_topk_scan_packed(
            q_scan, scan_base, base_sq_norms, invalid, metric,
            interpret=interpret, tps=tps,
        )
    width = min(width, lane_d.shape[1])
    # approx_min_k (PartialReduce) instead of a sort-based top_k: selecting
    # 64 of 2048 lane winners was ~60% of the device pass at B=4096. The
    # pool is reranked exactly below, so selection recall (>=0.99 here, and
    # misses are confined to candidates ranked near `width` — far below the
    # returned k) is the only approximation.
    _, sel = jax.lax.approx_min_k(lane_d, width, recall_target=0.99)
    ti = jnp.take_along_axis(lane_i, sel, axis=1)  # [B, W] rows (-1 empty)

    # rerank source may be bf16 (int8-only HBM mode: FlatIndex
    # device_dtype="bfloat16" drops the f32 corpus copy at 16M+ scale);
    # compute exact distances in f32 regardless — only the gathered
    # [B, W, D] candidate block is cast, not the corpus
    cand = exact_base[jnp.maximum(ti, 0)].astype(jnp.float32)
    dots = jnp.einsum(
        "bd,bwd->bw", q32, cand,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    q_sq = jnp.sum(q32 * q32, axis=-1, keepdims=True)
    c_sq = jnp.sum(cand * cand, axis=-1)
    d = dist_from_dots(dots, q_sq, c_sq, metric)
    d = jnp.where(ti < 0, jnp.inf, d)
    kk = min(k, width)
    top_d, sel2 = jax.lax.top_k(-d, kk)
    top_d = -top_d
    top_i = jnp.take_along_axis(ti, sel2, axis=1)
    if k > kk:
        top_d = jnp.pad(top_d, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        top_i = jnp.pad(top_i, ((0, 0), (0, k - kk)), constant_values=-1)
    return top_d, jnp.where(jnp.isinf(top_d), -1, top_i)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "k", "width", "recall_target", "tile"),
)
def flat_topk_rerank(
    queries: jax.Array,  # [B, D] f32
    scan_base: jax.Array,  # [N, D] bf16 — the wide first-pass matrix
    exact_base: jax.Array,  # [N, D] f32 — rerank source
    valid: jax.Array,  # [N] bool
    metric: int,
    k: int,
    base_sq_norms: jax.Array,  # [N] f32 (exact, from f32 vectors)
    width: int = 64,
    recall_target: float = 0.95,
    tile: int = _TILE,
) -> tuple[jax.Array, jax.Array]:
    """Two-pass exact search at bf16 scan speed: the full-corpus scan runs
    at the MXU's native bf16 rate (half the HBM traffic, 2x+ the matmul
    rate) over a top-`width` candidate pool, then those candidates are
    re-scored against the f32 matrix — the returned distances are
    pairwise_distance's f32 values (up to summation order, ~1 ULP), and
    recall@k is limited only by a true neighbor falling more than
    `width - k` bf16-ranks below its f32 rank (input rounding is ~0.4%
    relative; immeasurable at width >= 4k)."""
    from scintirete_tpu.ops.distance import dist_from_dots

    width = min(width, scan_base.shape[0])
    _, ti = flat_topk(
        queries, scan_base, valid, metric, width, base_sq_norms,
        recall_target=recall_target, tile=tile,
    )  # [B, W] candidate slots (-1 padded)
    cand = exact_base[jnp.maximum(ti, 0)].astype(jnp.float32)  # [B, W, D]
    q32 = queries.astype(jnp.float32)
    dots = jnp.einsum(
        "bd,bwd->bw", q32, cand,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    q_sq = jnp.sum(q32 * q32, axis=-1, keepdims=True)  # [B, 1]
    c_sq = jnp.sum(cand * cand, axis=-1)  # [B, W]
    d = dist_from_dots(dots, q_sq, c_sq, metric)
    d = jnp.where(ti < 0, jnp.inf, d)
    kk = min(k, width)
    top_d, sel = jax.lax.top_k(-d, kk)
    top_d = -top_d
    top_i = jnp.take_along_axis(ti, sel, axis=1)
    if k > kk:
        top_d = jnp.pad(top_d, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        top_i = jnp.pad(top_i, ((0, 0), (0, k - kk)), constant_values=-1)
    return top_d, jnp.where(jnp.isinf(top_d), -1, top_i)
