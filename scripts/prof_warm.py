"""Where does fresh-process warmup time go?

Times, for the large build/search program shapes, the split between
Python tracing/lowering, compile (disk-cache hit), and first execution
(device program load over the tunnel), plus whether two loads overlap
when issued from two threads.

Run on the real TPU:  python scripts/prof_warm.py
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

print(f"devices: {jax.devices()}", file=sys.stderr)

from scintirete_tpu.ops.pallas_scan import LANES, knn_lane_topc

DIM = 128
C = 64


def timeit(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s", file=sys.stderr, flush=True)
    return out


def warm_one(npad, grid_tiles, metric=2):
    q = jnp.zeros((2048, DIM), jnp.bfloat16)
    si = jnp.full((2048,), -1, jnp.int32)
    base = jnp.zeros((npad, DIM), jnp.bfloat16)
    sq = jnp.zeros((npad,), jnp.float32)
    d, i = knn_lane_topc(
        q, si, base, sq, jnp.int32(npad), metric=metric, c=C,
        grid_tiles=grid_tiles,
    )
    d.block_until_ready()


# 1M-build layer-0 shapes: npad=2097152, grid ladder 1,16,256,4096,16384
t_all = time.perf_counter()
timeit("warm npad=2M grid=2048 (big)", lambda: warm_one(2097152, 2048))
timeit("warm npad=2M grid=256", lambda: warm_one(2097152, 256))
timeit("warm npad=2M grid=16", lambda: warm_one(2097152, 16))
# threaded: two distinct programs at once
t0 = time.perf_counter()
with ThreadPoolExecutor(2) as ex:
    f1 = ex.submit(warm_one, 2097152, 16)
    f2 = ex.submit(warm_one, 2097152, 1)
    f1.result()
    f2.result()
print(
    f"threaded warm of 2 programs: {time.perf_counter() - t0:.2f}s",
    file=sys.stderr,
)
# repeat one (already warm in-process) — pure dispatch+run
timeit("re-run npad=2M grid=256 (warm)", lambda: warm_one(2097152, 16))
print(f"total: {time.perf_counter() - t_all:.2f}s", file=sys.stderr)
