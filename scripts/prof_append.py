"""Append-path throughput on the real TPU (VERDICT r3 item 5).

Builds an N-vector graph, then measures batched appends of `batch`
vectors through the public bulk_insert path (device-resident scan cache,
dirty-row sync). Reports vec/s per trial and appended-node self-recall.

Usage: python scripts/prof_append.py [n] [batch] [trials]
"""

import sys
import time

import numpy as np

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from scintirete_tpu.index.hnsw import HNSWIndex  # noqa: E402
from scintirete_tpu.types import (  # noqa: E402
    DistanceMetric,
    HNSWParams,
    SearchParams,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
TRIALS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
DIM, K = 128, 10

print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(42)
n_clusters = max(1000 * N // 100_000, 100)
centers = rng.standard_normal((n_clusters, DIM)).astype(np.float32) * 2.0


def draw(n, seed):
    r = np.random.default_rng(seed)
    assign = r.integers(0, n_clusters, n)
    return (centers[assign] + 0.4 * r.standard_normal((n, DIM))).astype(
        np.float32
    )


base = draw(N, 1)
from scintirete_tpu.utils import prewarm  # noqa: E402

t0 = time.time()
prewarm.warm_build(N, DIM, int(DistanceMetric.COSINE), m=16, heuristic=True)
prewarm.warm_append(N, DIM, int(DistanceMetric.COSINE), m=16,
                    heuristic=True)
print(f"prewarm {time.time() - t0:.1f}s", flush=True)
idx = HNSWIndex(
    dim=DIM,
    params=HNSWParams(m=16, ef_construction=200, ef_search=16, seed=42,
                      neighbor_heuristic=True),
    metric=DistanceMetric.COSINE,
    use_device=True,
    search_batch_size=256,
)
t0 = time.time()
idx.bulk_insert(list(range(1, N + 1)), base)
print(f"build {N}: {time.time() - t0:.1f}s", flush=True)

params = SearchParams(top_k=K, ef_search=16)
next_id = N + 1
for trial in range(TRIALS):
    new = draw(BATCH, 100 + trial)
    ids = list(range(next_id, next_id + BATCH))
    next_id += BATCH
    t0 = time.time()
    idx.bulk_insert(ids, new)
    dt = time.time() - t0
    # self-recall: does each appended vector find itself in its top-10?
    res = idx.search_batch(new[:256], params)
    hits = sum(
        1 for want, row in zip(ids[:256], res)
        if any(got == want for got, _ in row)
    )
    print(
        f"append {BATCH} onto {N + trial * BATCH} (trial {trial}): "
        f"{dt:.1f}s ({BATCH / dt:.0f} vec/s), self-recall {hits}/256",
        flush=True,
    )

# old-query recall sanity after appends
qi = rng.integers(0, N, 1024)
queries = (base[qi] + 0.2 * rng.standard_normal((1024, DIM))).astype(
    np.float32
)
t0 = time.time()
res = idx.search_batch(queries, params)
print(f"post-append search: 1024 queries in {time.time() - t0:.2f}s",
      flush=True)
