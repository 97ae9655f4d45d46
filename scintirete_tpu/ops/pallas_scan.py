"""Pallas kernel: fused whole-corpus scan (distance matmul + lane top-2).

The XLA flat scan (ops/flat_scan.py) materializes [B, tile] score blocks in
HBM between the matmul and approx_min_k — at 1M x 128 that is ~8 GB of HBM
write+read traffic per 1k-query batch, an order of magnitude more than the
256 MB needed to stream the corpus itself. This kernel fuses scoring and
selection: each grid step loads one [TILE, D] bf16 base tile into VMEM,
scores it on the MXU, and folds the [B, TILE] block into per-lane running
(best, second-best) minima held in VMEM — the score matrix never exists in
HBM, so the scan runs at corpus-streaming bandwidth + MXU rate.

Selection semantics: lane j tracks the two smallest ranking scores among
base rows {j, j+TILE, j+2*TILE, ...}. The 2*TILE lane winners per query are
then exactly top-k'd and reranked in f32 by the caller
(ops/flat_scan.flat_topk_fused). A true top-k item is lost only if THREE
of the query's true top-k land in the same lane (expected loss at k=10,
TILE=512: C(10,3)/512^2 ~ 0.05% of one item — far above any recall gate).

Scores are RANKING-form, not reference distances (per-query monotone):
  L2     : b_sq - 2*dot        (q_sq dropped — constant per query row)
  cosine : -dot                 (base tile and queries pre-normalized)
  IP     : -dot
The caller reranks winners against the f32 matrix with the reference
formulas (reference: internal/core/algorithm/distance.go:21-116), so
returned distances are exact; the kernel only selects candidates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scintirete_tpu.types import DistanceMetric

_L2 = int(DistanceMetric.L2)
_COSINE = int(DistanceMetric.COSINE)
_IP = int(DistanceMetric.INNER_PRODUCT)

# lane count = base rows per grid step. 1024 (not 512): the scan's wall
# is ~60% per-grid-step fixed overhead (measured: halving fold ops moved
# steady-state QPS <15%), so fewer/fatter steps beat leaner folds. With
# SUB=1024 x LANES=1024 a 16k-query 1M-row scan is 16384 steps instead
# of 65536. VMEM: resident packed outs 2 x [1024, 1024] f32 = 8 MB (the
# scoped-vmem limit is 16 MB — 2048x1024 OOMs).
LANES = 1024
# query rows per grid block. Kernels take a 2D grid (B // _MAX_B query
# blocks x N // LANES base tiles): one dispatch covers the WHOLE query
# batch — round 2 split batches into 512-row calls from Python, and the
# per-call dispatch overhead over the tunneled TPU dominated the scan
# (~3% MFU, VERDICT r2 item 3).
_MAX_B = 1024


def _init_lane_outs(d1_ref, i1_ref, d2_ref, i2_ref):
    """Grid-step-0 initialization of the running lane state."""
    d1_ref[:] = jnp.full_like(d1_ref, jnp.inf)
    i1_ref[:] = jnp.full_like(i1_ref, -1)
    d2_ref[:] = jnp.full_like(d2_ref, jnp.inf)
    i2_ref[:] = jnp.full_like(i2_ref, -1)


def _fold_best_two(s, si, d1_ref, i1_ref, d2_ref, i2_ref):
    """Fold a [B, LANES] score block into the per-lane (best, second-best)
    running minima. The displaced best becomes a second-best candidate, so
    two items per lane survive any number of folds."""
    b1_d, b1_i = d1_ref[:], i1_ref[:]
    promoted = s < b1_d
    mid_d = jnp.where(promoted, b1_d, s)
    mid_i = jnp.where(promoted, b1_i, si)
    d1_ref[:] = jnp.where(promoted, s, b1_d)
    i1_ref[:] = jnp.where(promoted, si, b1_i)
    second = mid_d < d2_ref[:]
    d2_ref[:] = jnp.where(second, mid_d, d2_ref[:])
    i2_ref[:] = jnp.where(second, mid_i, i2_ref[:])


def _lane_scan_kernel(
    q_ref,  # [B, D] bf16 (VMEM, resident)
    base_ref,  # [LANES, D] bf16 (VMEM, per grid step)
    bsq_ref,  # [1, LANES] f32 (L2 only; zeros otherwise)
    inv_ref,  # [1, LANES] f32 (1.0 = invalid slot)
    d1_ref,  # out [B, LANES] f32 — lane best
    i1_ref,  # out [B, LANES] i32
    d2_ref,  # out [B, LANES] f32 — lane second-best
    i2_ref,  # out [B, LANES] i32
    *,
    metric: int,
):
    step = pl.program_id(1)  # base-tile index (dim 0 is the query block)

    @pl.when(step == 0)
    def _init():
        _init_lane_outs(d1_ref, i1_ref, d2_ref, i2_ref)

    dots = jax.lax.dot_general(
        q_ref[:],
        base_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, LANES]
    if metric == _L2:
        s = bsq_ref[:] - 2.0 * dots
    else:  # cosine (pre-normalized) / IP: rank by negated dot
        s = -dots
    s = jnp.where(inv_ref[:] > 0.5, jnp.inf, s)
    si = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + step * s.shape[1]

    _fold_best_two(s, si, d1_ref, i1_ref, d2_ref, i2_ref)


def _lane_scan_kernel_int8(
    q_ref,  # [B, D] i8 (VMEM, resident)
    qs_ref,  # [B, 1] f32 per-query dequant scale
    base_ref,  # [LANES, D] i8 (VMEM, per grid step)
    bs_ref,  # [1, LANES] f32 per-row dequant scale
    bsq_ref,  # [1, LANES] f32 (L2 only)
    inv_ref,  # [1, LANES] f32
    d1_ref, i1_ref, d2_ref, i2_ref,  # out [B, LANES]
    *,
    metric: int,
):
    step = pl.program_id(1)  # base-tile index (dim 0 is the query block)

    @pl.when(step == 0)
    def _init():
        _init_lane_outs(d1_ref, i1_ref, d2_ref, i2_ref)

    dots = jax.lax.dot_general(
        q_ref[:],
        base_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)  # [B, LANES] int32 exact -> f32
    if metric == _L2:
        # true dot ~= dots * (qs * bs); q_sq dropped (rank-invariant)
        s = bsq_ref[:] - 2.0 * dots * (qs_ref[:] * bs_ref[:])
    else:  # cosine (pre-normalized) / IP: qs is rank-invariant per query
        s = -dots * bs_ref[:]
    s = jnp.where(inv_ref[:] > 0.5, jnp.inf, s)
    si = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + step * s.shape[1]

    _fold_best_two(s, si, d1_ref, i1_ref, d2_ref, i2_ref)


# --- packed-key lane scan -------------------------------------------------
#
# The top-2 fold above costs ~9 VPU ops per score — at D=128 that is ~4x
# the MXU time of the score matmul itself, and the measured serving scan
# runs at ~4% of int8 peak (52k QPS at 1M / B=8192). Packing the tile id
# into the low mantissa bits of the f32 ranking score turns the fold into
# THREE min/max ops on ONE array pair:
#
#   key = f32(score) with low _TILE_BITS mantissa bits = tile index
#   k1  = min(k1, key);  k2 = min(k2, max(k1_old, key))
#
# f32 ordering survives the mangling for any sign (mantissa bits only
# perturb the value by <= 2^-10 relative), candidates are reranked in
# exact f32 downstream, and the winner's tile index is recovered from its
# own bit pattern. Invalid rows use a large FINITE sentinel (inf's
# exponent + nonzero mantissa would be NaN).

_TILE_BITS = 13  # supports 2^13 tiles = 8M rows at LANES=1024
_TILE_MASK = (1 << _TILE_BITS) - 1
_SENTINEL = 3.0e38  # "no candidate"; stays finite after bit-mangling
# int8 kernel: tiles pre-reduced per pack+fold (see _lane_scan_kernel_
# packed_int8). 4 balances VPU savings against the (negligible) same-
# lane-same-group candidate-collision loss.
_PREMIN = 4
# per-row/per-query dequant scales are clamped here so the kernel's
# score arithmetic cannot overflow f32 even at the joint worst case:
# |2*dots*(qs*bs)| <= 2 * 127*127*D * _SCALE_CAP^2 = 6.6e37 for
# D <= 8192, and |bsq| <= _BSQ_CAP = 7e37, so |s| <= 1.4e38 < f32 max
# — the finiteness invariant _pack_tile_ids relies on (an inf score
# would OR tile bits into a NaN key and latch that lane's minimum for
# the rest of the scan). Rows with a larger true scale (|elements| >
# ~6e16) lose first-pass ranking fidelity only; the exact f32 rerank
# still returns exact distances.
_SCALE_CAP = 5.0e14
# squared-norm clamp: keeps bsq + dots-term < f32 max at the caps
_BSQ_CAP = 7.0e37


def _pack_tile(s, step):
    # inf/NaN-safe: an infinite score would OR the tile bits into inf's
    # zero mantissa and produce a NaN key, which the jnp.minimum fold then
    # latches onto for that lane for the REST of the scan (a silent recall
    # hole for every row sharing the lane). Scores can legitimately hit
    # +/-inf when f32 norms/dots overflow (finite elements ~2e19), so
    # clamp to the finite sentinel band; NaN scores rank last. Downstream
    # reranks in exact f32, so clamped candidates still sort correctly.
    s = jnp.clip(s, -_SENTINEL, _SENTINEL)
    s = jnp.where(s != s, _SENTINEL, s)
    bits = jax.lax.bitcast_convert_type(s, jnp.int32)
    bits = jnp.bitwise_or(
        jnp.bitwise_and(bits, jnp.int32(~_TILE_MASK)), jnp.int32(step)
    )
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _pack_tile_ids(s, ids):
    """Pack per-score tile ids (i32 scalar or array) into the low mantissa
    bits of FINITE scores. Unlike _pack_tile this does NO clamp/NaN
    defense — callers must establish the finiteness invariant outside the
    hot loop (see lane_topk_scan_packed_int8: scales and norms are clamped
    per-row at the wrapper, so every score the kernel forms is finite by
    construction and the ~9 VPU-ops-per-score safety tax is paid once per
    [N] array instead of once per [B, N] score)."""
    bits = jax.lax.bitcast_convert_type(s, jnp.int32)
    bits = jnp.bitwise_or(
        jnp.bitwise_and(bits, jnp.int32(~_TILE_MASK)), ids
    )
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def unpack_lane_keys(keys, lanes: int = LANES):
    """[B, 2*lanes] packed keys -> (scores f32, rows i32, valid bool).
    Row = embedded tile index * lanes + lane position; scores keep the
    mangled low bits (callers rerank in exact f32)."""
    bits = jax.lax.bitcast_convert_type(keys, jnp.int32)
    tile = jnp.bitwise_and(bits, jnp.int32(_TILE_MASK))
    lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1) % lanes
    rows = tile * lanes + lane
    valid = keys < (_SENTINEL * 0.5)
    return keys, jnp.where(valid, rows, -1), valid


def _fold_best_two_packed(key, k1_ref, k2_ref):
    k1_old = k1_ref[:]
    k1_ref[:] = jnp.minimum(k1_old, key)
    k2_ref[:] = jnp.minimum(k2_ref[:], jnp.maximum(k1_old, key))


def _lane_scan_kernel_packed(
    q_ref,  # [B, D] bf16 (VMEM, resident)
    base_ref,  # [tps*LANES, D] bf16 (VMEM, per grid step)
    bsq_ref,  # [1, tps*LANES] f32 (L2 only; zeros otherwise)
    inv_ref,  # [1, tps*LANES] f32 (1.0 = invalid slot)
    k1_ref,  # out [B, LANES] f32 — packed lane best
    k2_ref,  # out [B, LANES] f32 — packed lane second-best
    *,
    metric: int,
    tps: int = 1,
):
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        k1_ref[:] = jnp.full_like(k1_ref, _SENTINEL)
        k2_ref[:] = jnp.full_like(k2_ref, _SENTINEL)

    # tps base tiles per grid step (unrolled): same fold math, 1/tps the
    # per-step fixed overhead — measured ~half the kernel wall at tps=1
    for t in range(tps):
        rows = slice(t * LANES, (t + 1) * LANES)
        dots = jax.lax.dot_general(
            q_ref[:],
            base_ref[rows, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if metric == _L2:
            s = bsq_ref[:, rows] - 2.0 * dots
        else:
            s = -dots
        s = jnp.where(inv_ref[:, rows] > 0.5, _SENTINEL, s)
        _fold_best_two_packed(_pack_tile(s, step * tps + t), k1_ref, k2_ref)


def _lane_scan_kernel_packed_int8(
    q_ref,  # [B, D] i8 (VMEM, resident)
    qs2_ref,  # [B, 1] f32: 2 * clamped per-query dequant scale (L2 only)
    base_ref,  # [tps*LANES, D] i8 (VMEM, per grid step)
    bs_ref,  # [1, tps*LANES] f32 per-row scale; 0.0 on invalid rows
    bsq_ref,  # [1, tps*LANES] f32; _SENTINEL on invalid rows (all metrics)
    k1_ref, k2_ref,  # out [B, LANES] f32 packed
    *,
    metric: int,
    tps: int = 1,
):
    """Serving-path score+fold (the >=256k exact-scan hot loop).

    VPU budget per score (the kernel's wall next to the int8 MXU matmul —
    VERDICT r3 item 5): the wrapper folds invalid-row masking into bs/bsq
    and clamps scales/norms so scores are finite by construction; groups
    of _PREMIN tiles pre-reduce with winner-id selects and pack ONCE per
    group. ~6 VPU ops/score vs ~15 for the mask+safe-pack+fold-per-tile
    formulation (measured 2026-08-19, chained-fetch A/B at 1M on the v5e,
    scripts/prof_scan_ab_old.py: 128 -> 184 TOPS device-only, 1.43x; 46.7%
    of the 394-TOPS int8 peak). The pre-min loses a candidate only when
    two of a query's true
    top-k share BOTH a lane and a tile group (expected ~1e-4 of one item
    per query at k=10) — far below the recall gate, and the exact f32
    rerank downstream is unaffected."""
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        k1_ref[:] = jnp.full_like(k1_ref, _SENTINEL)
        k2_ref[:] = jnp.full_like(k2_ref, _SENTINEL)

    g = min(_PREMIN, tps)
    for t0 in range(0, tps, g):
        m = None
        mi = None
        for t in range(t0, t0 + g):
            rows = slice(t * LANES, (t + 1) * LANES)
            dots = jax.lax.dot_general(
                q_ref[:],
                base_ref[rows, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            if metric == _L2:
                # 2x folded into qs2 at the wrapper; bsq finite-clamped
                s = bsq_ref[:, rows] - dots * (qs2_ref[:] * bs_ref[:, rows])
            else:
                # cos/IP: qs is rank-invariant per query; bsq carries only
                # the invalid-row sentinel (0.0 on valid rows)
                s = bsq_ref[:, rows] - dots * bs_ref[:, rows]
            tid = jnp.int32(step * tps + t)
            if m is None:
                m, mi = s, tid
            else:
                closer = s < m
                mi = jnp.where(closer, tid, mi)
                m = jnp.minimum(s, m)
        _fold_best_two_packed(_pack_tile_ids(m, mi), k1_ref, k2_ref)


@functools.partial(jax.jit, static_argnames=("metric", "interpret", "tps"))
def lane_topk_scan_packed(
    queries,  # [B, D] f32 (pre-normalized for cosine); B % 8 == 0
    base,  # [N, D] bf16; N % LANES == 0
    base_sq,  # [N] f32
    invalid,  # [N] f32 (1.0 = deleted/empty slot)
    metric: int,
    interpret: bool = False,
    tps: int = 1,  # base tiles folded per grid step (N % (tps*LANES) == 0)
):
    """Packed-key variant of lane_topk_scan. Returns (keys [B, 2*LANES]
    f32 ranking-form with embedded tile ids, rows [B, 2*LANES] i32,
    -1 = empty)."""
    B, D = queries.shape
    N = base.shape[0]
    assert N % (tps * LANES) == 0 and N // LANES <= (1 << _TILE_BITS)
    SUB = min(B, _MAX_B)
    assert B % SUB == 0, f"B must be a multiple of {SUB} (or < {_MAX_B})"
    qb = queries.astype(jnp.bfloat16)

    grid = (B // SUB, N // (tps * LANES))
    kernel = functools.partial(
        _lane_scan_kernel_packed, metric=metric, tps=tps
    )
    k1, k2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (SUB, D), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tps * LANES, D), lambda b, i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tps * LANES), lambda b, i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tps * LANES), lambda b, i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (SUB, LANES), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            )
            for _ in range(2)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, LANES), jnp.float32),
        ),
        interpret=interpret,
    )(qb, base, base_sq.reshape(1, N), invalid.reshape(1, N))
    keys = jnp.concatenate([k1, k2], axis=1)
    _, rows, _ = unpack_lane_keys(keys)
    return keys, rows


@functools.partial(jax.jit, static_argnames=("metric", "interpret", "tps"))
def lane_topk_scan_packed_int8(
    queries,  # [B, D] f32 (pre-normalized for cosine); B % 8 == 0
    base8,  # [N, D] i8 per-row quantized
    base_scale,  # [N] f32 dequant scales
    base_sq,  # [N] f32
    invalid,  # [N] f32
    metric: int,
    interpret: bool = False,
    tps: int = 1,  # base tiles folded per grid step (N % (tps*LANES) == 0)
):
    """Packed-key variant of lane_topk_scan_int8.

    The finiteness + masking invariants the kernel relies on are
    established here, on [N]/[B]-sized arrays (one pass, negligible next
    to the [B, N] score volume):
      - scales clamped to [0, _SCALE_CAP], NaN -> 0 (a NaN packed key
        would latch its lane via jnp.minimum for the rest of the scan);
      - bsq finite-clamped (f32 norms of finite rows can still be inf);
      - invalid rows: bs = 0 (kills the dot term regardless of base8
        bits) and bsq = _SENTINEL, so their score is exactly the "no
        candidate" sentinel with no per-score mask in the hot loop."""
    B, D = queries.shape
    N = base8.shape[0]
    assert N % (tps * LANES) == 0 and N // LANES <= (1 << _TILE_BITS)
    assert D <= 8192, "score-overflow clamp sized for D <= 8192"
    SUB = min(B, _MAX_B)
    assert B % SUB == 0, f"B must be a multiple of {SUB} (or < {_MAX_B})"
    q8, q_scale = quantize_rows(queries.astype(jnp.float32))

    bad = invalid > 0.5
    bs = jnp.nan_to_num(base_scale, nan=0.0, posinf=_SCALE_CAP, neginf=0.0)
    bs = jnp.where(bad, 0.0, jnp.clip(bs, 0.0, _SCALE_CAP))
    if metric == _L2:
        bsq = jnp.nan_to_num(base_sq, nan=_BSQ_CAP, posinf=_BSQ_CAP)
        bsq = jnp.clip(bsq, -_BSQ_CAP, _BSQ_CAP)
    else:
        bsq = jnp.zeros_like(base_sq)
    bsq = jnp.where(bad, _SENTINEL, bsq)
    qs2 = 2.0 * jnp.clip(
        jnp.nan_to_num(q_scale, nan=0.0, posinf=_SCALE_CAP, neginf=0.0),
        0.0, _SCALE_CAP,
    )

    grid = (B // SUB, N // (tps * LANES))
    kernel = functools.partial(
        _lane_scan_kernel_packed_int8, metric=metric, tps=tps
    )
    k1, k2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (SUB, D), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUB, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tps * LANES, D), lambda b, i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tps * LANES), lambda b, i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tps * LANES), lambda b, i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (SUB, LANES), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            )
            for _ in range(2)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, LANES), jnp.float32),
        ),
        interpret=interpret,
    )(
        q8,
        qs2.reshape(B, 1),
        base8,
        bs.reshape(1, N),
        bsq.reshape(1, N),
    )
    keys = jnp.concatenate([k1, k2], axis=1)
    _, rows, _ = unpack_lane_keys(keys)
    return keys, rows


def _knn_lane_kernel(
    nvalid_ref,  # [1, 1] i32 (SMEM) — true prefix length
    q_ref,  # [B, D] bf16 (VMEM, resident)
    self_ref,  # [B, 1] i32 — member index of each row (self-exclusion)
    base_ref,  # [LANES, D] bf16 (VMEM, per grid step)
    bsq_ref,  # [1, LANES] f32 (L2 only)
    d1_ref, i1_ref, d2_ref, i2_ref,  # out [B, LANES]
    *,
    metric: int,
):
    step = pl.program_id(1)  # base-tile index (dim 0 is the query block)

    @pl.when(step == 0)
    def _init():
        _init_lane_outs(d1_ref, i1_ref, d2_ref, i2_ref)

    dots = jax.lax.dot_general(
        q_ref[:],
        base_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, LANES]
    if metric == _L2:
        s = bsq_ref[:] - 2.0 * dots
    else:
        s = -dots
    si = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + step * s.shape[1]
    bad = (si >= nvalid_ref[0, 0]) | (si == self_ref[:])
    s = jnp.where(bad, jnp.inf, s)

    _fold_best_two(s, si, d1_ref, i1_ref, d2_ref, i2_ref)


def _knn_lane_kernel_masked(
    q_ref,  # [B, D] bf16 (VMEM, resident)
    self_ref,  # [B, 1] i32 — base row of each query (self-exclusion)
    base_ref,  # [LANES, D] bf16 (VMEM, per grid step)
    bsq_ref,  # [1, LANES] f32 (L2 only)
    inv_ref,  # [1, LANES] f32 — 1.0 = masked-out base row
    d1_ref, i1_ref, d2_ref, i2_ref,  # out [B, LANES]
    *,
    metric: int,
):
    """knn kernel with an arbitrary per-row validity mask instead of the
    prefix bound — lets the append path scan ONE cached full-corpus base
    for any layer's member subset (mask = membership & ~deleted)."""
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        _init_lane_outs(d1_ref, i1_ref, d2_ref, i2_ref)

    dots = jax.lax.dot_general(
        q_ref[:],
        base_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, LANES]
    if metric == _L2:
        s = bsq_ref[:] - 2.0 * dots
    else:
        s = -dots
    si = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + step * s.shape[1]
    bad = (inv_ref[:] > 0.5) | (si == self_ref[:])
    s = jnp.where(bad, jnp.inf, s)

    _fold_best_two(s, si, d1_ref, i1_ref, d2_ref, i2_ref)


@functools.partial(
    jax.jit, static_argnames=("metric", "c", "grid_tiles", "interpret")
)
def knn_lane_topc_masked(
    queries,  # [B, D] f32 SCAN-form (normalized for cosine); B % 8 == 0
    self_idx,  # [B] i32 base row per query (-1 = no exclusion)
    base,  # [N, D] bf16 SCAN-form; N % LANES == 0
    base_sq,  # [N] f32 squared norms of the f32 scan-form rows
    invalid,  # [N] f32 — 1.0 = masked-out row (non-member/deleted/padding)
    metric: int,
    c: int,
    grid_tiles: int,
    interpret: bool = False,
):
    """Masked-subset variant of knn_lane_topc: top-c over base rows whose
    mask is 0, self-excluded, TRUE finalized distances. One program serves
    every layer of the append path against the same cached base."""
    B, D = queries.shape
    N = base.shape[0]
    assert N % LANES == 0 and grid_tiles <= N // LANES
    SUB = min(B, _MAX_B)
    assert B % SUB == 0, f"B must be a multiple of {SUB} (or < {_MAX_B})"
    q32 = queries.astype(jnp.float32)
    qb = q32.astype(jnp.bfloat16)

    grid = (B // SUB, grid_tiles)
    kernel = functools.partial(_knn_lane_kernel_masked, metric=metric)
    d1, i1, d2, i2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (SUB, D), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUB, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (LANES, D), lambda b, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, LANES), lambda b, i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, LANES), lambda b, i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (SUB, LANES), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            )
            for _ in range(4)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(
        qb,
        jnp.asarray(self_idx, jnp.int32).reshape(B, 1),
        base,
        base_sq.reshape(1, N),
        invalid.reshape(1, N),
    )
    lane_d = jnp.concatenate([d1, d2], axis=1)
    lane_i = jnp.concatenate([i1, i2], axis=1)
    neg_d, sel = jax.lax.top_k(-lane_d, c)
    cd = -neg_d
    ci = jnp.take_along_axis(lane_i, sel, axis=1)
    if metric == _L2:
        q_sq = jnp.sum(q32 * q32, axis=1, keepdims=True)
        cd = jnp.sqrt(jnp.maximum(cd + q_sq, 0.0))
    elif metric == _COSINE:
        cd = 1.0 + cd  # -cos -> 1 - cos
    cd = jnp.where(ci < 0, jnp.inf, cd)
    return cd, ci


@functools.partial(
    jax.jit, static_argnames=("metric", "c", "grid_tiles", "interpret")
)
def knn_lane_topc(
    queries,  # [B, D] f32 SCAN-form (normalized for cosine); B % 8 == 0
    self_idx,  # [B] i32 member index per row (-1 = no exclusion)
    base,  # [N, D] bf16 SCAN-form; N % LANES == 0
    base_sq,  # [N] f32 squared norms of the f32 scan-form rows
    n_valid,  # scalar i32 — columns >= n_valid are masked out
    metric: int,
    c: int,
    grid_tiles: int,  # tiles scanned; grid_tiles * LANES covers n_valid
    interpret: bool = False,
    q_sq=None,  # [B] f32 — true squared norms of the queries (L2 only);
    # lets device-sliced bf16 query blocks keep f32-exact finalization
):
    """Exact-ish top-c prefix neighbors for the bulk builder: the fused
    lane scan over the first grid_tiles * LANES base rows, self-excluded,
    then an exact top-c over the 2*LANES lane winners. Returns TRUE
    distances (reference finalized form — q_sq re-added and sqrt'ed for
    L2), comparable across query rows, so reverse-edge capping and
    selection downstream see the same values as the XLA scan (up to bf16
    input rounding). Selection loss needs 3 of a row's true top-c in one
    lane — immaterial for candidate pools (c<=64 from 1024 winners)."""
    B, D = queries.shape
    N = base.shape[0]
    assert N % LANES == 0 and grid_tiles <= N // LANES
    SUB = min(B, _MAX_B)
    assert B % SUB == 0, f"B must be a multiple of {SUB} (or < {_MAX_B})"
    q32 = queries.astype(jnp.float32)
    qb = q32.astype(jnp.bfloat16)

    grid = (B // SUB, grid_tiles)
    kernel = functools.partial(_knn_lane_kernel, metric=metric)
    d1, i1, d2, i2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (SUB, D), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUB, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (LANES, D), lambda b, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, LANES), lambda b, i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (SUB, LANES), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            )
            for _ in range(4)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(
        jnp.asarray(n_valid, jnp.int32).reshape(1, 1),
        qb,
        jnp.asarray(self_idx, jnp.int32).reshape(B, 1),
        base,
        base_sq.reshape(1, N),
    )
    lane_d = jnp.concatenate([d1, d2], axis=1)
    lane_i = jnp.concatenate([i1, i2], axis=1)
    neg_d, sel = jax.lax.top_k(-lane_d, c)
    cd = -neg_d
    ci = jnp.take_along_axis(lane_i, sel, axis=1)
    # ranking-form -> reference finalized distances (cross-row comparable)
    if metric == _L2:
        if q_sq is None:
            q_sq = jnp.sum(q32 * q32, axis=1)
        cd = jnp.sqrt(jnp.maximum(cd + q_sq[:, None], 0.0))
    elif metric == _COSINE:
        cd = 1.0 + cd  # -cos -> 1 - cos
    cd = jnp.where(ci < 0, jnp.inf, cd)
    return cd, ci


def quantize_rows(v):
    """Per-row symmetric int8: returns (q8 [N, D] i8, scale [N] f32) with
    v ~= q8 * scale[:, None]. Zero rows quantize to zeros with scale 0."""
    amax = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
    scale = amax / 127.0
    q = jnp.where(
        scale > 0.0,
        jnp.round(v / jnp.maximum(scale, 1e-30)),
        0.0,
    )
    return (
        jnp.clip(q, -127, 127).astype(jnp.int8),
        scale[..., 0].astype(jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def lane_topk_scan_int8(
    queries,  # [B, D] f32 (pre-normalized for cosine); B % 8 == 0
    base8,  # [N, D] i8 per-row quantized (pre-normalized for cosine)
    base_scale,  # [N] f32 dequant scales
    base_sq,  # [N] f32 squared norms of the f32 scan-form rows (L2)
    invalid,  # [N] f32
    metric: int,
    interpret: bool = False,
):
    """int8 variant of lane_topk_scan: half the scan-copy HBM traffic and
    the MXU's double int8 rate. Ranking error vs bf16 is bounded by the
    per-row quantization step (~0.8%); the caller's exact f32 rerank makes
    returned results exact either way."""
    B, D = queries.shape
    N = base8.shape[0]
    assert N % LANES == 0, f"N must be a multiple of {LANES}"
    SUB = min(B, _MAX_B)
    assert B % SUB == 0, f"B must be a multiple of {SUB} (or < {_MAX_B})"
    q8, q_scale = quantize_rows(queries.astype(jnp.float32))

    grid = (B // SUB, N // LANES)
    kernel = functools.partial(_lane_scan_kernel_int8, metric=metric)
    d1, i1, d2, i2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (SUB, D), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (SUB, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (LANES, D), lambda b, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, LANES), lambda b, i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, LANES), lambda b, i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, LANES), lambda b, i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (SUB, LANES), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            )
            for _ in range(4)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(
        q8,
        q_scale.reshape(B, 1),
        base8,
        base_scale.reshape(1, N),
        base_sq.reshape(1, N),
        invalid.reshape(1, N),
    )
    return (
        jnp.concatenate([d1, d2], axis=1),
        jnp.concatenate([i1, i2], axis=1),
    )


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def lane_topk_scan(
    queries,  # [B, D] f32 (pre-normalized for cosine); B % 8 == 0
    base,  # [N, D] bf16 (pre-normalized for cosine); N % LANES == 0
    base_sq,  # [N] f32 squared norms (used for L2 ranking)
    invalid,  # [N] f32 (1.0 = deleted/empty slot)
    metric: int,
    interpret: bool = False,
):
    """Returns (scores [B, 2*LANES] ranking-form asc-unsorted, rows [B,
    2*LANES] i32, -1 = empty). Each query's true top-k are among the
    winners except for 3-in-a-lane collisions (see module docstring)."""
    B, D = queries.shape
    N = base.shape[0]
    assert N % LANES == 0, f"N must be a multiple of {LANES}"
    SUB = min(B, _MAX_B)
    assert B % SUB == 0, f"B must be a multiple of {SUB} (or < {_MAX_B})"
    qb = queries.astype(jnp.bfloat16)

    grid = (B // SUB, N // LANES)
    kernel = functools.partial(_lane_scan_kernel, metric=metric)
    d1, i1, d2, i2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (SUB, D), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (LANES, D), lambda b, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, LANES), lambda b, i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, LANES), lambda b, i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (SUB, LANES), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            )
            for _ in range(4)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(qb, base, base_sq.reshape(1, N), invalid.reshape(1, N))
    return (
        jnp.concatenate([d1, d2], axis=1),
        jnp.concatenate([i1, i2], axis=1),
    )
