"""Profile the exact flat-scan path on the real TPU.

Measures brute_force_topk QPS at 100k / 1M (f32 and bf16 base), and a
lax.approx_min_k per-tile variant, to establish the MXU speed-of-light for
exact search on one chip.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import functools

import jax
import jax.numpy as jnp

from scintirete_tpu.ops import brute_force_topk
from scintirete_tpu.ops.distance import pairwise_distance
from scintirete_tpu.types import DistanceMetric

COSINE = int(DistanceMetric.COSINE)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("metric", "k", "tile"))
def flat_approx_topk(queries, base, base_sq, metric: int, k: int, tile: int):
    """Tiled scan with approx_min_k per tile + exact merge of tile winners."""
    B = queries.shape[0]
    N = base.shape[0]
    num_tiles = N // tile
    base_t = base.reshape(num_tiles, tile, -1)
    norms_t = base_sq.reshape(num_tiles, tile)

    def body(carry, xs):
        best_d, best_i = carry
        tile_base, tile_norms, tile_idx = xs
        d = pairwise_distance(queries, tile_base, metric, tile_norms)
        td, ti = jax.lax.approx_min_k(d, k)
        ti = ti.astype(jnp.int32) + tile_idx * tile
        all_d = jnp.concatenate([best_d, td], axis=1)
        all_i = jnp.concatenate([best_i, ti], axis=1)
        nd, sel = jax.lax.top_k(-all_d, k)
        return (-nd, jnp.take_along_axis(all_i, sel, axis=1)), None

    init = (jnp.full((B, k), jnp.inf, jnp.float32), jnp.full((B, k), -1, jnp.int32))
    (bd, bi), _ = jax.lax.scan(
        body, init, (base_t, norms_t, jnp.arange(num_tiles, dtype=jnp.int32))
    )
    return bd, bi


@functools.partial(jax.jit, static_argnames=("metric", "k"))
def flat_single_approx(queries, base, base_sq, metric: int, k: int):
    """One [B, N] distance matrix + one approx_min_k (no tiling)."""
    d = pairwise_distance(queries, base, metric, base_sq)
    td, ti = jax.lax.approx_min_k(d, k)
    return td, ti.astype(jnp.int32)


def bench(fn, *args, reps=5):
    # NOTE: under the axon tunnel block_until_ready returns early; force a
    # device->host materialization to get a true end-to-end time.
    out = fn(*args)
    np.asarray(out[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    return min(times), out


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    K = 10

    for N in (100_000, 1_000_000):
        D = 128
        base = rng.standard_normal((N, D)).astype(np.float32)
        pad_unit = 131072 if N > 131072 else 8192
        Np = ((N + pad_unit - 1) // pad_unit) * pad_unit
        base_pad = np.zeros((Np, D), np.float32)
        base_pad[:N] = base
        for B in (1024, 4096):
            queries = rng.standard_normal((B, D)).astype(np.float32)
            q = jnp.asarray(queries)
            for dtype in (jnp.float32, jnp.bfloat16):
                b = jnp.asarray(base_pad, dtype)
                bsq = jnp.sum(jnp.asarray(base_pad) ** 2, axis=1)
                valid = jnp.arange(Np) < N

                t, _ = bench(
                    brute_force_topk, q, b, valid, COSINE, K, bsq
                )
                log(f"N={N} B={B} {dtype.__name__}: brute_force_topk "
                    f"{t*1e3:.1f} ms -> {B/t:.0f} QPS")

                t, _ = bench(
                    flat_approx_topk, q, b, bsq, COSINE, K, 131072 if N > 131072 else Np
                )
                log(f"N={N} B={B} {dtype.__name__}: flat_approx_topk "
                    f"{t*1e3:.1f} ms -> {B/t:.0f} QPS")

                if B * Np * 4 <= 4 << 30:
                    t, _ = bench(flat_single_approx, q, b, bsq, COSINE, K)
                    log(f"N={N} B={B} {dtype.__name__}: single approx_min_k "
                        f"{t*1e3:.1f} ms -> {B/t:.0f} QPS")
            del b, bsq
        del base, base_pad

    log("done")


if __name__ == "__main__":
    main()
