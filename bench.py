"""Driver benchmark: batched HNSW search QPS + recall on the real TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
plus human-readable detail lines on stderr.

Baseline: the reference (Go, single node) targets <50 ms per top-10 query at
1M vectors and ~71% of search CPU in distance computation
(BASELINE.md). For the ratio we take an optimistic reference throughput of
2,000 QPS (0.5 ms/query, concurrent goroutines on a multicore host) — beating
that by 10x is the BASELINE.json north star.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_QPS = 2000.0  # optimistic single-node estimate for the Go reference


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    from scintirete_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from scintirete_tpu.index import HNSWIndex
    from scintirete_tpu.ops import brute_force_topk
    from scintirete_tpu.types import DistanceMetric, HNSWParams, SearchParams

    log(f"devices: {jax.devices()}")

    # SIFT-like synthetic workload (128-d); size bounded by builder speed —
    # grows as the device-assisted builder lands.
    n, dim, n_queries, k = 20_000, 128, 1024, 10
    batch = 256
    rng = np.random.default_rng(42)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((n_queries, dim)).astype(np.float32)

    idx = HNSWIndex(
        dim=dim,
        params=HNSWParams(m=16, ef_construction=200, ef_search=100, seed=42),
        metric=DistanceMetric.COSINE,
        use_device=True,
    )
    t0 = time.time()
    idx.bulk_insert(list(range(1, n + 1)), base)
    build_s = time.time() - t0
    log(f"build: {n} vectors in {build_s:.1f}s ({n / build_s:.0f} vec/s)")

    params = SearchParams(top_k=k)

    # warmup (compile)
    t0 = time.time()
    idx.search_batch(queries[:batch], params)
    log(f"first batch (compile+run): {time.time() - t0:.1f}s")

    # timed run
    t0 = time.time()
    results = []
    for start in range(0, n_queries, batch):
        results.extend(idx.search_batch(queries[start : start + batch], params))
    elapsed = time.time() - t0
    qps = n_queries / elapsed
    log(f"search: {n_queries} queries in {elapsed:.3f}s -> {qps:.0f} QPS")

    # ground truth on device (exact scan)
    import jax.numpy as jnp

    true_d, true_i = brute_force_topk(
        jnp.asarray(queries),
        jnp.asarray(base),
        jnp.ones(n, bool),
        int(DistanceMetric.COSINE),
        k,
    )
    true_i = np.asarray(true_i)
    hits = 0
    for b in range(n_queries):
        want = set((true_i[b] + 1).tolist())
        got = {r[0] for r in results[b]}
        hits += len(want & got)
    recall = hits / (n_queries * k)
    log(f"recall@{k}: {recall:.4f}")

    value = round(qps * min(1.0, recall / 0.95), 1)  # recall-penalized QPS
    print(
        json.dumps(
            {
                "metric": f"hnsw_search_qps_{n//1000}k_sift_cosine_recall_gated",
                "value": value,
                "unit": "qps (recall-gated@0.95)",
                "vs_baseline": round(value / REFERENCE_QPS, 3),
                "detail": {
                    "recall_at_10": round(recall, 4),
                    "raw_qps": round(qps, 1),
                    "build_seconds": round(build_s, 1),
                    "n": n,
                    "dim": dim,
                    "batch": batch,
                    "ef_search": 100,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
