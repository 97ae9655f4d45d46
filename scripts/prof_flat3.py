"""Round-3 flat-scan profiling: single-dispatch 2D-grid lane scan.

Measures, on the real TPU, the end-to-end FlatIndex.search_batch rate at
1M (and optionally 100k) with the whole 4096-query batch dispatched as ONE
program + ONE packed fetch, against the round-2 sub-batched numbers
(25.9-36.8k QPS). Usage: python scripts/prof_flat3.py [n] [passes]
"""

import sys
import time

import numpy as np

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from scintirete_tpu.index.flat import FlatIndex  # noqa: E402
from scintirete_tpu.types import DistanceMetric, SearchParams  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 5
DIM, K, NQ = 128, 10, 4096

print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(42)
n_clusters = max(1000 * N // 100_000, 100)
centers = rng.standard_normal((n_clusters, DIM)).astype(np.float32) * 2.0
assign = rng.integers(0, n_clusters, N)
base = (centers[assign] + 0.4 * rng.standard_normal((N, DIM))).astype(
    np.float32
)
qi = rng.integers(0, N, NQ)
queries = (base[qi] + 0.2 * rng.standard_normal((NQ, DIM))).astype(np.float32)

idx = FlatIndex(dim=DIM, metric=DistanceMetric.COSINE, use_device=True)
t0 = time.time()
idx.bulk_insert(list(range(1, N + 1)), base)
print(f"insert {time.time() - t0:.1f}s", flush=True)

params = SearchParams(top_k=K)
t0 = time.time()
res = idx.search_batch(queries, params)
print(f"warm pass (compile+run) {time.time() - t0:.1f}s", flush=True)

passes = []
for _ in range(PASSES):
    t0 = time.time()
    res = idx.search_batch(queries, params)
    passes.append(time.time() - t0)
qps = NQ / (sum(passes) / len(passes))
print(
    f"n={N}: fused single-dispatch: {qps:.0f} QPS "
    f"(passes {[round(p, 3) for p in passes]})",
    flush=True,
)

# ground-truth recall check on a 512-query sample
import jax.numpy as jnp  # noqa: E402

from scintirete_tpu.ops import brute_force_topk  # noqa: E402

bj = jnp.asarray(base)
valid = jnp.ones(N, bool)
_, ti = brute_force_topk(
    jnp.asarray(queries[:512]), bj, valid, int(DistanceMetric.COSINE), K
)
ti = np.asarray(ti)
hits = 0
for b in range(512):
    want = set((ti[b] + 1).tolist())
    got = {r[0] for r in res[b]}
    hits += len(want & got)
print(f"recall@{K} (512-query sample): {hits / ti[:512].size:.4f}", flush=True)
