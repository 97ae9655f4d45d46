"""Decompose warm_build() wall time on the real TPU: which program loads
dominate the fresh-process prewarm of a 100k-scale build?

Run in a FRESH process (program loads are per-process):
    python scripts/prof_prewarm.py [n]
"""

import sys
import time

import numpy as np

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
dim, metric, m = 128, 2, 16

import jax
import jax.numpy as jnp

from scintirete_tpu.index import knn_build as kb
from scintirete_tpu.ops.pallas_scan import LANES, knn_lane_topc

t_all = time.perf_counter()
K = kb._kernels()
dtype = kb._scan_dtype()
npad = kb._pad_pow4(n, minimum=max(kb._ROUND0 * 2, 2048))
B = kb._QBLOCK
m0 = 2 * m
c = kb.KNN_CANDIDATES
ns = min(24, kb._ROUND0 - 1)
mt = npad // LANES
grids = sorted({mt, max(mt // 16, 1)})


def step(label, f):
    t0 = time.perf_counter()
    r = f()
    jax.block_until_ready(r)
    print(f"{label:38s} {time.perf_counter() - t0:7.2f}s", flush=True)
    return r


base = step("zeros base", lambda: jnp.zeros((npad, dim), dtype))
base_sq = step("zeros base_sq", lambda: jnp.zeros((npad,), jnp.float32))
sp = jnp.zeros((kb._ROUND0 * 2, dim), dtype)
sp_sq = jnp.zeros((kb._ROUND0 * 2,), jnp.float32)
jax.block_until_ready((sp, sp_sq))

qb, qsq, si = step(
    "slice_block", lambda: K["slice_block"](base, base_sq, np.int32(0), block=B)
)
scd, sci = step(
    "hub knn_block",
    lambda: K["knn_block"](
        qb, si, sp, sp_sq, jnp.int32(1), metric=metric, c=ns,
        tile=kb._ROUND0 * 2,
    ),
)

for g in grids:
    cd, ci = step(
        f"knn_lane_topc grid={g}",
        lambda g=g: knn_lane_topc(
            qb, si, base, base_sq, jnp.int32(1), metric=metric, c=c,
            grid_tiles=g, q_sq=qsq,
        ),
    )

for deg, h in ((m0, True), (m, True)):
    mi, md = step(
        f"merge scan+hub deg={deg}",
        lambda: K["merge_dedupe"](ci, cd, sci, scd),
    )
    si_, sd_ = step(
        f"select deg={deg}",
        lambda deg=deg, h=h: K["select_block"](
            mi, md, base, metric=metric, max_deg=deg, heuristic=h
        ),
    )
    ii = jnp.asarray(np.full((B, deg), -1, np.int32))
    dd = jnp.asarray(np.full((B, deg), np.inf, np.float32))
    mi2, md2 = step(
        f"merge incoming deg={deg}",
        lambda si_=si_, sd_=sd_, ii=ii, dd=dd: K["merge_dedupe"](
            si_, sd_, ii, dd
        ),
    )
    fi, fd = step(
        f"final select deg={deg}",
        lambda mi2=mi2, md2=md2, deg=deg, h=h: K["select_block"](
            mi2, md2, base, metric=metric, max_deg=deg, heuristic=h
        ),
    )
    from scintirete_tpu.index.device import _fetch_packed

    for arity in (4, 16, 64):
        step(
            f"fetch_packed arity={arity} deg={deg}",
            lambda fd=fd, fi=fi, arity=arity: _fetch_packed(
                [fd] * arity, [fi] * arity
            ),
        )

print(f"{'TOTAL':38s} {time.perf_counter() - t_all:7.2f}s")
