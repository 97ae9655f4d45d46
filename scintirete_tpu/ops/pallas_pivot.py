"""Pallas kernel: fused pivot-entry scan (distance matmul + running argmin).

The pivot entry (index/device.py::_search_kernel_pivot) computes a [B, R]
distance matrix against R sampled pivots and takes the per-query argmin. For
large R the [B, R] intermediate costs HBM bandwidth twice (write + read).
This kernel tiles the pivot matrix through VMEM: each grid step computes one
[B, TILE] distance block on the MXU and folds it into a running
(best_dist, best_idx) pair held in VMEM scratch — the score matrix never
exists in HBM.

Used when R is large enough to matter; the XLA path remains the fallback
(`use_pallas=False`, and automatically on CPU where Mosaic is unavailable).
Comparison-form distances (squared L2 / negated dot / cosine via
pre-normalized pivots) keep the kernel branch-free; see ops/distance.py for
the forms.
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

_TILE = 512  # pivots per grid step; [B, TILE] f32 scores stay in VMEM


def _pivot_scan_kernel(
    q_ref,  # [B, D] f32 (VMEM, whole)
    qsq_ref,  # [B, 1] f32
    piv_ref,  # [TILE, D] f32 (VMEM, per grid step)
    psq_ref,  # [1, TILE] f32
    pdel_ref,  # [1, TILE] f32 (1.0 = deleted)
    best_d_ref,  # out [B, 1] f32
    best_i_ref,  # out [B, 1] i32
    *,
    metric: int,
):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        best_d_ref[:] = jnp.full_like(best_d_ref, jnp.inf)
        best_i_ref[:] = jnp.full_like(best_i_ref, -1)

    dots = jax.lax.dot_general(
        q_ref[:],
        piv_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, TILE]
    if metric == _IP:
        d = -dots
    elif metric == _L2:
        d = qsq_ref[:] + psq_ref[:] - 2.0 * dots
    else:  # cosine with pre-normalized pivots and queries: 1 - dot
        d = 1.0 - dots
    d = jnp.where(pdel_ref[:] > 0.5, jnp.inf, d)

    tile_best = jnp.min(d, axis=1, keepdims=True)  # [B, 1]
    tile_arg = jnp.argmin(d, axis=1).reshape(-1, 1).astype(jnp.int32)
    tile_idx = tile_arg + step * d.shape[1]
    improve = tile_best < best_d_ref[:]
    best_i_ref[:] = jnp.where(improve, tile_idx, best_i_ref[:])
    best_d_ref[:] = jnp.where(improve, tile_best, best_d_ref[:])


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def pivot_entry_scan(
    queries,  # [B, D] f32 (pre-normalized for cosine)
    pivot_vecs,  # [R, D] f32 (pre-normalized for cosine), R % TILE == 0
    pivot_sq,  # [R] f32 squared norms
    pivot_deleted,  # [R] f32 (1.0 = deleted)
    metric: int,
    interpret: bool = False,
):
    """Returns (best_dist [B] f32 comparison-form, best_pivot_row [B] i32)."""
    B, D = queries.shape
    R = pivot_vecs.shape[0]
    assert R % _TILE == 0, f"R must be a multiple of {_TILE}"
    q32 = queries.astype(jnp.float32)
    qsq = jnp.sum(q32 * q32, axis=1, keepdims=True)

    grid = (R // _TILE,)
    best_d, best_i = pl.pallas_call(
        functools.partial(_pivot_scan_kernel, metric=metric),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        interpret=interpret,
    )(q32, qsq, pivot_vecs.astype(jnp.float32),
      pivot_sq.reshape(1, R), pivot_deleted.reshape(1, R))
    return best_d[:, 0], best_i[:, 0]
