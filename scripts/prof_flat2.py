"""Flat-scan deep dive: precision modes, approx_min_k recall, batch sweep.

Answers:
1. Does dropping precision=HIGHEST for bf16 storage speed up the 1M scan?
2. What recall@10 does approx_min_k actually deliver (f32/bf16 scoring vs
   exact f32 ground truth) on a realistic clustered workload?
3. QPS/latency vs batch size (1 .. 8192) at 1M.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scintirete_tpu.types import DistanceMetric

COSINE = int(DistanceMetric.COSINE)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("k", "precision", "rt"))
def scan_cosine(q, base_n, k: int, precision, rt: float):
    """Cosine scan over a pre-normalized base: d = 1 - q_n . base_n."""
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    dots = jax.lax.dot_general(
        qn.astype(base_n.dtype), base_n,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    d = 1.0 - dots
    td, ti = jax.lax.approx_min_k(d, k, recall_target=rt)
    return td, ti.astype(jnp.int32)


def bench(fn, *args, reps=5):
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
    rng = np.random.default_rng(7)
    N, D, K = 1_000_000, 128, 10
    # clustered workload (same shape as bench.py)
    centers = rng.standard_normal((1000, D)).astype(np.float32) * 2.0
    assign = rng.integers(0, 1000, N)
    base = (centers[assign] + 0.4 * rng.standard_normal((N, D))).astype(np.float32)
    qi = rng.integers(0, N, 4096)
    queries = (base[qi] + 0.2 * rng.standard_normal((4096, D))).astype(np.float32)

    base_norm = base / np.maximum(
        np.linalg.norm(base, axis=1, keepdims=True), 1e-30
    )

    # exact ground truth on device (f32, exact top_k over tiles)
    from scintirete_tpu.ops import brute_force_topk

    b32 = jnp.asarray(base)
    valid = jnp.ones(N, bool)
    true_i = np.empty((4096, K), np.int64)
    for s in range(0, 4096, 512):
        _, ti = brute_force_topk(
            jnp.asarray(queries[s:s+512]), b32, valid, COSINE, K)
        true_i[s:s+512] = np.asarray(ti)
    del b32
    log("ground truth done")

    q1024 = jnp.asarray(queries[:1024])
    for dtype in (jnp.float32, jnp.bfloat16):
        bn = jnp.asarray(base_norm, dtype)
        for prec in ("default", "highest"):
            p = (jax.lax.Precision.HIGHEST if prec == "highest"
                 else jax.lax.Precision.DEFAULT)
            for rt in (0.95, 0.99):
                t, (td, ti) = bench(scan_cosine, q1024, bn, K, p, rt)
                got = np.asarray(ti)
                hits = sum(
                    len(set(got[b].tolist()) & set(true_i[b].tolist()))
                    for b in range(1024)
                )
                rec = hits / (1024 * K)
                log(f"1M {dtype.__name__} prec={prec} rt={rt}: "
                    f"{t*1e3:.1f} ms -> {1024/t:.0f} QPS recall={rec:.4f}")
        del bn

    # batch sweep, bf16 default precision rt=0.95
    bn = jnp.asarray(base_norm, jnp.bfloat16)
    for B in (1, 16, 64, 256, 1024, 4096):
        q = jnp.asarray(queries[:B].reshape(B, D))
        t, _ = bench(scan_cosine, q, bn, K,
                     jax.lax.Precision.DEFAULT, 0.95)
        log(f"1M bf16 B={B}: {t*1e3:.2f} ms -> {B/t:.0f} QPS")

    log("done")


if __name__ == "__main__":
    main()
