"""ef-sweep recall/QPS curves (BASELINE.json config: "batched multi-query
search: ef sweep recall@10/QPS curves").

No public datasets are reachable from this environment (zero egress), so the
workload is the deterministic clustered SIFT-like synthetic from bench.py.
Writes one JSON object with the full curve to stdout.

Usage: python scripts/bench_sweep.py [N] [--host-only]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 100_000
    sys.path.insert(0, ".")
    import bench

    bench.N = n
    from scintirete_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from scintirete_tpu.index import HNSWIndex
    from scintirete_tpu.ops import brute_force_topk
    from scintirete_tpu.types import DistanceMetric, HNSWParams, SearchParams

    rng = np.random.default_rng(42)
    base, queries = bench.make_dataset(rng)
    nq, k = min(2048, len(queries)), 10

    idx = HNSWIndex(
        dim=bench.DIM,
        params=HNSWParams(
            m=16, ef_construction=200, ef_search=100, seed=42,
            neighbor_heuristic=True,
        ),
        metric=DistanceMetric.COSINE,
        use_device=True,
        search_batch_size=1024,
    )
    t0 = time.time()
    idx.bulk_insert(list(range(1, n + 1)), base)
    build_s = time.time() - t0
    print(f"build {n}: {build_s:.1f}s", file=sys.stderr, flush=True)

    true_i = np.empty((nq, k), np.int64)
    for s in range(0, nq, 512):
        _, ti = brute_force_topk(
            jnp.asarray(queries[s : s + 512]),
            jnp.asarray(base),
            jnp.ones(n, bool),
            int(DistanceMetric.COSINE),
            k,
        )
        true_i[s : s + 512] = np.asarray(ti)

    curve = []
    for ef in (10, 16, 24, 32, 48, 64, 100, 150, 200):
        params = SearchParams(top_k=k, ef_search=ef)
        idx.search_batch(queries[:1024], params)  # compile
        t0 = time.time()
        res = idx.search_batch(queries[:nq], params)
        qps = nq / (time.time() - t0)
        hits = sum(
            len(set((true_i[b] + 1).tolist()) & {r[0] for r in res[b]})
            for b in range(nq)
        )
        recall = hits / (nq * k)
        curve.append({"ef": ef, "recall_at_10": round(recall, 4), "qps": round(qps, 1)})
        print(f"ef={ef}: recall={recall:.4f} qps={qps:.0f}", file=sys.stderr, flush=True)

    print(json.dumps({
        "workload": f"{n} x {bench.DIM}d clustered cosine (synthetic)",
        "build_seconds": round(build_s, 1),
        "curve": curve,
    }))


if __name__ == "__main__":
    main()
