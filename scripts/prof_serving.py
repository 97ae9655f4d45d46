"""Serving-rate profile on the real TPU: sequential vs depth-2 pipelined
flat scans at several batch widths, with pack-at-submit + vectorized
assembly (round-3 serving fixes).

Usage: python scripts/prof_serving.py [n] [passes]
"""

import sys
import time

import numpy as np

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from scintirete_tpu.index.flat import FlatIndex  # noqa: E402
from scintirete_tpu.index.hnsw import HNSWIndex  # noqa: E402
from scintirete_tpu.types import (  # noqa: E402
    DistanceMetric,
    HNSWParams,
    SearchParams,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 6
DIM, K = 128, 10

print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(42)
n_clusters = max(1000 * N // 100_000, 100)
centers = rng.standard_normal((n_clusters, DIM)).astype(np.float32) * 2.0
assign = rng.integers(0, n_clusters, N)
base = (centers[assign] + 0.4 * rng.standard_normal((N, DIM))).astype(
    np.float32
)

idx = FlatIndex(dim=DIM, metric=DistanceMetric.COSINE, use_device=True,
                search_batch_size=4096)
t0 = time.time()
idx.bulk_insert(list(range(1, N + 1)), base)
print(f"flat build {time.time() - t0:.1f}s", flush=True)
params = SearchParams(top_k=K)

for B in (4096, 16384, 32768):
    qi = rng.integers(0, N, B)
    queries = (base[qi] + 0.2 * rng.standard_normal((B, DIM))).astype(
        np.float32
    )
    idx.search_batch(queries, params)  # warm this shape
    print(f"--- B={B} n={N} ---", flush=True)

    ts = []
    for _ in range(PASSES):
        t0 = time.time()
        idx.search_batch(queries, params)
        ts.append(time.time() - t0)
    best, avg = min(ts), sum(ts) / len(ts)
    print(
        f"sequential: best {best * 1e3:.1f}ms avg {avg * 1e3:.1f}ms "
        f"-> best QPS {B / best:.0f} avg {B / avg:.0f} "
        f"(ms {[round(t * 1e3) for t in ts]})",
        flush=True,
    )

    for depth in (2, 3):
        t0 = time.time()
        idx.search_batch_pipelined([queries] * PASSES, params, depth=depth)
        per = (time.time() - t0) / PASSES
        print(
            f"depth{depth} pipelined: {per * 1e3:.1f}ms/pass "
            f"-> QPS {B / per:.0f}",
            flush=True,
        )

# HNSW at the bench operating point (SCNT_HNSW_DTYPE=bfloat16 halves the
# device graph's vector bytes: cheaper beam gathers + sync uploads, at
# ~0.4%-relative distance rounding)
import os  # noqa: E402

hidx = HNSWIndex(
    dim=DIM,
    params=HNSWParams(m=16, ef_construction=200, ef_search=16, seed=42,
                      neighbor_heuristic=True),
    metric=DistanceMetric.COSINE,
    use_device=True,
    search_batch_size=256,
    device_dtype=os.environ.get("SCNT_HNSW_DTYPE", "float32"),
)
t0 = time.time()
hidx.bulk_insert(list(range(1, N + 1)), base)
print(f"hnsw build {time.time() - t0:.1f}s", flush=True)
for B in (4096, 16384):
    qi = rng.integers(0, N, B)
    queries = (base[qi] + 0.2 * rng.standard_normal((B, DIM))).astype(
        np.float32
    )
    hparams = SearchParams(top_k=K, ef_search=16)
    hidx.search_batch(queries, hparams)  # warm
    print(f"--- HNSW B={B} ---", flush=True)
    ts = []
    for _ in range(PASSES):
        t0 = time.time()
        hidx.search_batch(queries, hparams)
        ts.append(time.time() - t0)
    best, avg = min(ts), sum(ts) / len(ts)
    print(
        f"sequential: best {best * 1e3:.1f}ms avg {avg * 1e3:.1f}ms "
        f"-> best QPS {B / best:.0f} avg {B / avg:.0f}",
        flush=True,
    )
    t0 = time.time()
    hidx.search_batch_pipelined([queries] * PASSES, hparams, depth=2)
    per = (time.time() - t0) / PASSES
    print(f"depth2 pipelined: {per * 1e3:.1f}ms/pass -> QPS {B / per:.0f}",
          flush=True)
