"""Program prewarm: compile/load every device program a workload needs.

Over the tunneled TPU every distinct jit/Pallas variant pays per-process
lowering + executable-load latency (~1-5 s each) even when the persistent
compilation cache already holds the binary. A fresh process's FIRST bulk
build therefore stalls on program loads mid-build — the round-2 driver
bench measured ~6 minutes of exactly this inside its first 100k build
(VERDICT r3 item 1). The shared-base builder cut the variant count ~5x;
`warm_build()` loads the remaining manifest up front and CONCURRENTLY
(loads overlap; measured ~1.8x for 2 threads), so builds run at
steady-state speed from the first call. bench.py warms per scale before
timing; a server can warm at startup for its collections' capacities.

The manifest mirrors the call sites in index/knn_build.py; the pinning
test (tests/test_prewarm.py) builds after warming and asserts the build
compiles nothing new, so drift between the two shows up in CI.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def build_manifest(
    n: int,
    dim: int,
    metric: int,
    m: int = 16,
    heuristic: bool = True,
) -> list:
    """Zero-arg callables covering every device program of a bulk build at
    this scale (shape-keyed: values are dummy zeros, shapes/dtypes real)."""
    import jax
    import jax.numpy as jnp

    from scintirete_tpu.index import knn_build as kb
    from scintirete_tpu.ops.pallas_scan import LANES, knn_lane_topc

    K = kb._kernels()
    dtype = kb._scan_dtype()
    npad = kb._pad_pow4(n, minimum=max(kb._ROUND0 * 2, 2048))
    fused = (
        jax.default_backend() == "tpu"
        and npad % LANES == 0
        and dtype == jnp.bfloat16
    )
    B = kb._QBLOCK
    m0 = 2 * m
    c = kb.KNN_CANDIDATES
    ns = min(24, kb._ROUND0 - 1)

    base = jnp.zeros((npad, dim), dtype)
    base_sq = jnp.zeros((npad,), jnp.float32)
    sp = jnp.zeros((kb._ROUND0 * 2, dim), dtype)
    sp_sq = jnp.zeros((kb._ROUND0 * 2,), jnp.float32)
    qb = jnp.zeros((B, dim), dtype)
    qsq = jnp.zeros((B,), jnp.float32)
    si = jnp.zeros((B,), jnp.int32)

    def done(x):
        jax.block_until_ready(x)

    jobs = [
        lambda: done(
            K["slice_block"](base, base_sq, np.int32(0), block=B)
        ),
        # hub (long-range) candidate scan
        lambda: done(
            K["knn_block"](
                qb, si, sp, sp_sq, jnp.int32(1), metric=metric, c=ns,
                tile=kb._ROUND0 * 2,
            )
        ),
    ]
    if fused:
        mt = npad // LANES
        for g in sorted({mt, max(mt // 16, 1)}):
            jobs.append(
                lambda g=g: done(
                    knn_lane_topc(
                        qb, si, base, base_sq, jnp.int32(1), metric=metric,
                        c=c, grid_tiles=g, q_sq=qsq,
                    )
                )
            )
    else:
        jobs.append(
            lambda: done(
                K["knn_block"](
                    qb, si, base, base_sq, jnp.int32(1), metric=metric,
                    c=c, tile=min(kb._TILE, npad),
                )
            )
        )

    def pair(w):
        return (
            jnp.zeros((B, w), jnp.int32),
            jnp.zeros((B, w), jnp.float32),
        )

    # merge widths: (scan c | hub ns), then (fwd deg | incoming deg)
    merge_widths = {(c, ns), (m0, m0), (m, m)}
    for w1, w2 in sorted(merge_widths):
        a_i, a_d = pair(w1)
        b_i, b_d = pair(w2)
        jobs.append(
            lambda a=(a_i, a_d, b_i, b_d): done(K["merge_dedupe"](*a))
        )
    # selection: merged-candidate widths x (layer0 rule, upper-layer rule)
    sel_combos = {
        (c + ns, m0, heuristic),
        (c + ns, m, True),
        (2 * m0, m0, heuristic),
        (2 * m, m, True),
    }
    for width, deg, h in sorted(sel_combos):
        ci, cd = pair(width)
        jobs.append(
            lambda ci=ci, cd=cd, deg=deg, h=h: done(
                K["select_block"](
                    ci, cd, base, metric=metric, max_deg=deg, heuristic=h
                )
            )
        )
    # packed-fetch concats: arity ladder x result widths
    from scintirete_tpu.index.device import _fetch_packed

    for arity in (4, 16, 64):
        for w in sorted({m0, m}):
            ds = [jnp.zeros((B, w), jnp.float32)] * arity
            ss = [jnp.zeros((B, w), jnp.int32)] * arity
            jobs.append(lambda ds=ds, ss=ss: _fetch_packed(ds, ss))
    return jobs


def warm(jobs: list, threads: int = 8) -> float:
    """Run manifest jobs concurrently; returns elapsed seconds."""
    t0 = time.perf_counter()
    with ThreadPoolExecutor(threads) as ex:
        for f in [ex.submit(j) for j in jobs]:
            f.result()
    return time.perf_counter() - t0


def warm_build(
    n: int,
    dim: int,
    metric: int,
    m: int = 16,
    heuristic: bool = True,
    threads: int = 8,
) -> float:
    """Load every bulk-build program for (n, dim, metric, m) up front."""
    return warm(build_manifest(n, dim, metric, m=m, heuristic=heuristic),
                threads=threads)
