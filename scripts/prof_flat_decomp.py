"""Decompose the fused flat-scan serving pass on the real TPU.

Times, at 1M x 128-d cosine:
  A. packed int8 lane-scan kernel ONLY (device time via block_until_ready)
  B. kernel + selection epilogue (flat_topk_fused: top_k(2048->64) + f32
     rerank), device time
  C. full FlatIndex.search_batch (adds host assembly + tunnel fetch)
at B in {4096, 16384}. The gap C-B is tunnel/host; B-A is the epilogue.

Usage: python scripts/prof_flat_decomp.py [n] [passes]
"""

import sys
import time

import numpy as np

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scintirete_tpu.index.flat import FlatIndex  # noqa: E402
from scintirete_tpu.ops.flat_scan import flat_topk_fused  # noqa: E402
from scintirete_tpu.ops.pallas_scan import (  # noqa: E402
    lane_topk_scan_packed_int8,
    quantize_rows,
)
from scintirete_tpu.types import DistanceMetric, SearchParams  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 5
DIM, K = 128, 10
METRIC = int(DistanceMetric.COSINE)

print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(42)
n_clusters = max(1000 * N // 100_000, 100)
centers = rng.standard_normal((n_clusters, DIM)).astype(np.float32) * 2.0
assign = rng.integers(0, n_clusters, N)
base = (centers[assign] + 0.4 * rng.standard_normal((N, DIM))).astype(
    np.float32
)

idx = FlatIndex(dim=DIM, metric=DistanceMetric.COSINE, use_device=True)
idx.bulk_insert(list(range(1, N + 1)), base)
idx._sync()  # device arrays ready
dev = idx._dev
pad = dev["vectors"].shape[0]
print(f"capacity pad: {pad}", flush=True)

# scan-form arrays as FlatIndex holds them
scan8 = dev["scan"]
assert scan8.dtype == jnp.int8, scan8.dtype
scale8 = dev["scan_scale"]
sqn = dev["scan_sq"]
valid = dev["valid"]
exact = dev["vectors"]
invalid = 1.0 - valid.astype(jnp.float32)


def timed(fn, label):
    out = fn()  # warm/compile
    jax.block_until_ready(out)
    ts = []
    for _ in range(PASSES):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    best, avg = min(ts), sum(ts) / len(ts)
    print(
        f"{label}: best {best * 1e3:.1f}ms avg {avg * 1e3:.1f}ms "
        f"(passes {[round(t * 1e3) for t in ts]})",
        flush=True,
    )
    return best


for B in (4096, 16384):
    qi = rng.integers(0, N, B)
    queries = (
        base[qi] + 0.2 * rng.standard_normal((B, DIM))
    ).astype(np.float32)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    qj = jax.device_put(jnp.asarray(qn))
    jax.block_until_ready(qj)

    print(f"--- B={B} n={N} ---", flush=True)
    t_a = timed(
        lambda: lane_topk_scan_packed_int8(
            qj, scan8, scale8, sqn, invalid, METRIC
        ),
        "A kernel-only",
    )
    t_b = timed(
        lambda: flat_topk_fused(
            qj, scan8, exact, valid, METRIC, K, sqn,
            base_scale=scale8,
        ),
        "B kernel+epilogue",
    )
    qps_b = B / t_b
    print(f"  -> epilogue {1e3 * (t_b - t_a):.1f}ms; device QPS {qps_b:.0f}",
          flush=True)

    params = SearchParams(top_k=K)
    res = idx.search_batch(queries, params)  # warm
    ts = []
    for _ in range(PASSES):
        t0 = time.time()
        res = idx.search_batch(queries, params)
        ts.append(time.time() - t0)
    best = min(ts)
    print(
        f"C search_batch: best {best * 1e3:.1f}ms avg "
        f"{1e3 * sum(ts) / len(ts):.1f}ms -> QPS {B / best:.0f} "
        f"(passes {[round(t * 1e3) for t in ts]})",
        flush=True,
    )
    print(f"  -> host+tunnel {1e3 * (best - t_b):.1f}ms", flush=True)
