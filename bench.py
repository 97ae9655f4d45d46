"""Driver benchmark: batched HNSW search QPS + recall on the real TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
plus human-readable detail lines on stderr.

Workload: 100k 128-d SIFT-like clustered vectors (mixture of Gaussians —
random isotropic Gaussians at this dimension concentrate distances and make
recall meaningless for ANY graph index), cosine top-10, M=16 / efc=200 /
ef=100 (BASELINE.json config "HNSW insert + cosine top-10 search").

Baseline: the reference (Go, single node) targets <50 ms per top-10 query at
1M vectors and spends ~71% of search CPU in scalar distance loops
(BASELINE.md). For the ratio we take an optimistic reference throughput of
2,000 QPS (0.5 ms/query across concurrent goroutines on a multicore host) —
beating that 10x is the BASELINE.json north star.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_QPS = 2000.0  # optimistic single-node estimate for the Go reference

N, DIM, N_QUERIES, K = 100_000, 128, 4096, 10
BATCH = 1024
EF_SEARCH = 24  # pivot-entry graph holds recall >= 0.95 here (gate is 0.90)
N_CLUSTERS = 1000


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_dataset(rng):
    """Clustered SIFT-like data: cluster centers + per-point noise; queries
    are perturbed near-duplicates of base points (realistic ANN workload)."""
    centers = rng.standard_normal((N_CLUSTERS, DIM)).astype(np.float32) * 2.0
    assign = rng.integers(0, N_CLUSTERS, N)
    base = (centers[assign] + 0.4 * rng.standard_normal((N, DIM))).astype(
        np.float32
    )
    qi = rng.integers(0, N, N_QUERIES)
    queries = (
        base[qi] + 0.2 * rng.standard_normal((N_QUERIES, DIM))
    ).astype(np.float32)
    return base, queries


def main() -> None:
    from scintirete_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from scintirete_tpu.index import HNSWIndex
    from scintirete_tpu.ops import brute_force_topk
    from scintirete_tpu.types import DistanceMetric, HNSWParams, SearchParams

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(42)
    base, queries = make_dataset(rng)

    idx = HNSWIndex(
        dim=DIM,
        params=HNSWParams(
            m=16, ef_construction=200, ef_search=EF_SEARCH, seed=42,
            neighbor_heuristic=True,  # quality edge over the reference
        ),
        metric=DistanceMetric.COSINE,
        use_device=True,
        search_batch_size=BATCH,
    )
    t0 = time.time()
    idx.bulk_insert(list(range(1, N + 1)), base)
    build_s = time.time() - t0
    log(f"build: {N} vectors in {build_s:.1f}s ({N / build_s:.0f} vec/s)")

    params = SearchParams(top_k=K)

    # warmup (compile)
    t0 = time.time()
    idx.search_batch(queries[:BATCH], params)
    log(f"first batch (compile+run): {time.time() - t0:.1f}s")

    # timed: 3 full passes (one search_batch call each; the device index
    # pipelines the sub-batches), report the mean
    passes = []
    for _ in range(3):
        t0 = time.time()
        results = idx.search_batch(queries, params)
        passes.append(time.time() - t0)
    elapsed = sum(passes) / len(passes)
    qps = N_QUERIES / elapsed
    log(f"search: {N_QUERIES} queries, mean of 3 passes {elapsed:.3f}s -> "
        f"{qps:.0f} QPS (passes: {[round(p, 3) for p in passes]})")

    # ground truth via the exact device scan
    true_i = np.empty((N_QUERIES, K), np.int64)
    for start in range(0, N_QUERIES, 512):
        _, ti = brute_force_topk(
            jnp.asarray(queries[start : start + 512]),
            jnp.asarray(base),
            jnp.ones(N, bool),
            int(DistanceMetric.COSINE),
            K,
        )
        true_i[start : start + 512] = np.asarray(ti)
    hits = 0
    for b in range(N_QUERIES):
        want = set((true_i[b] + 1).tolist())
        got = {r[0] for r in results[b]}
        hits += len(want & got)
    recall = hits / (N_QUERIES * K)
    log(f"recall@{K}: {recall:.4f}")

    value = round(qps * min(1.0, recall / 0.90), 1)  # recall-gated QPS
    print(
        json.dumps(
            {
                "metric": f"hnsw_search_qps_{N//1000}k_sift_cosine_recall_gated",
                "value": value,
                "unit": "qps (recall-gated@0.90)",
                "vs_baseline": round(value / REFERENCE_QPS, 3),
                "detail": {
                    "recall_at_10": round(recall, 4),
                    "raw_qps": round(qps, 1),
                    "build_seconds": round(build_s, 1),
                    "build_vecs_per_s": round(N / build_s, 1),
                    "n": N,
                    "dim": DIM,
                    "batch": BATCH,
                    "ef_search": EF_SEARCH,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
