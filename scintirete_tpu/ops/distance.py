"""Batched distance computation.

The reference computes distances one scalar loop at a time
(reference: internal/core/algorithm/distance.go:21-116) and spends ~71% of
search CPU there (reference: memory-bank/performanceAnalysis.md). Here the
same three metrics are computed as query-block x candidate-block matmuls that
XLA maps onto the MXU:

  L2:      sqrt(max(|q|^2 + |v|^2 - 2 q.v, 0))        (reference returns sqrt)
  COSINE:  1 - clamp(q.v / (|q| |v|), -1, 1); any zero vector -> 1.0
           (reference: distance.go:53-82)
  IP:      -(q.v)  (negated so lower-is-better everywhere,
           reference: distance.go:104-116)

Squared norms of the base matrix are precomputed once per sync
(`preprocess_norms`) so a search touches each base row only through the
single fused matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from scintirete_tpu.types import DistanceMetric

# Static ints (hashable for jit static_argnums) — jnp arrays of metric codes
# are never traced; the metric selects the formula at trace time.
_L2 = int(DistanceMetric.L2)
_COSINE = int(DistanceMetric.COSINE)
_IP = int(DistanceMetric.INNER_PRODUCT)

_EPS = 1e-30


def preprocess_norms(base: jax.Array) -> jax.Array:
    """Squared L2 row norms of the base matrix, f32 [N]."""
    b = base.astype(jnp.float32)
    return jnp.sum(b * b, axis=-1)


@functools.partial(jax.jit, static_argnames=("metric",))
def pairwise_distance(
    queries: jax.Array,  # [B, D] float
    base: jax.Array,  # [N, D] float (f32 or bf16)
    metric: int,
    base_sq_norms: jax.Array | None = None,  # [N] f32, optional precompute
) -> jax.Array:
    """All-pairs distances [B, N], f32, lower is better for every metric."""
    q = queries
    # MXU path: accumulate in f32 regardless of storage dtype.
    # f32 inputs get HIGHEST precision (full-f32 multiplies; the backend
    # default rounds operands to bf16). bf16 inputs get DEFAULT — HIGHEST on
    # bf16 would trigger multi-pass emulation and forfeit the native-rate
    # MXU win that is the whole point of bf16 storage.
    bf16_in = q.dtype == jnp.bfloat16 or base.dtype == jnp.bfloat16
    if q.dtype != base.dtype:
        # lax.dot_general requires matching dtypes; meet at the base's
        # storage dtype (casting [B,D] queries is free next to the scan)
        q = q.astype(base.dtype)
    dots = jax.lax.dot_general(
        q,
        base,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.DEFAULT if bf16_in else jax.lax.Precision.HIGHEST
        ),
    )  # [B, N]
    if metric == _IP:
        return -dots
    if base_sq_norms is None:
        base_sq_norms = preprocess_norms(base)
    q32 = queries.astype(jnp.float32)  # norms from the ORIGINAL precision
    q_sq = jnp.sum(q32 * q32, axis=-1, keepdims=True)  # [B, 1]
    return dist_from_dots(dots, q_sq, base_sq_norms[None, :], metric)


def dist_from_dots(dots, q_sq, b_sq, metric: int):
    """Metric formulas given dot products and squared norms (broadcastable).

    Shared by the full scans and the exact-rerank pass so distances match
    the reference's values bit-for-bit wherever the dots are f32-exact."""
    if metric == _IP:
        return -dots
    if metric == _L2:
        sq = q_sq + b_sq - 2.0 * dots
        return jnp.sqrt(jnp.maximum(sq, 0.0))
    if metric == _COSINE:
        denom = jnp.sqrt(q_sq) * jnp.sqrt(b_sq)
        cos = jnp.where(denom > _EPS, dots / jnp.maximum(denom, _EPS), 0.0)
        cos = jnp.clip(cos, -1.0, 1.0)
        # reference: zero query or zero base vector -> distance 1.0
        zero = (q_sq <= _EPS) | (b_sq <= _EPS)
        return jnp.where(zero, 1.0, 1.0 - cos)
    raise ValueError(f"unsupported metric code: {metric}")


# ---------------------------------------------------------------------------
# Host (numpy) versions — the correctness oracle and the host-side build path.
# ---------------------------------------------------------------------------


def distance_np(
    queries: np.ndarray, base: np.ndarray, metric: int | DistanceMetric
) -> np.ndarray:
    """Numpy mirror of `pairwise_distance`; accepts [D] or [B,D] queries."""
    metric = int(metric)
    q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
    b = np.asarray(base, dtype=np.float32)
    single = np.asarray(queries).ndim == 1
    dots = q @ b.T
    if metric == _IP:
        out = -dots
    else:
        q_sq = np.sum(q * q, axis=-1, keepdims=True)
        b_sq = np.sum(b * b, axis=-1)
        if metric == _L2:
            out = np.sqrt(np.maximum(q_sq + b_sq[None, :] - 2.0 * dots, 0.0))
        elif metric == _COSINE:
            denom = np.sqrt(q_sq) * np.sqrt(b_sq[None, :])
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > _EPS, dots / np.maximum(denom, _EPS), 0.0)
            cos = np.clip(cos, -1.0, 1.0)
            zero = (q_sq <= _EPS) | (b_sq[None, :] <= _EPS)
            out = np.where(zero, 1.0, 1.0 - cos)
        else:
            raise ValueError(f"unsupported metric code: {metric}")
    return out[0] if single else out


def normalize_np(v: np.ndarray) -> np.ndarray:
    """Unit-normalize rows; zero rows stay zero
    (reference: distance.go:154-170 NormalizeVector)."""
    v = np.asarray(v, dtype=np.float32)
    norm = np.linalg.norm(v, axis=-1, keepdims=True)
    return np.where(norm > _EPS, v / np.maximum(norm, _EPS), v)
