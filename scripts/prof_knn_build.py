"""kNN bulk builder on the real TPU: build time + searchability at 100k/1M."""

from __future__ import annotations

import sys
import time

import numpy as np

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scintirete_tpu.index import HNSWIndex
from scintirete_tpu.ops import brute_force_topk
from scintirete_tpu.types import DistanceMetric, HNSWParams, SearchParams


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_dataset(rng, n, dim, nq):
    centers = rng.standard_normal((1000, dim)).astype(np.float32) * 2.0
    assign = rng.integers(0, 1000, n)
    base = (centers[assign] + 0.4 * rng.standard_normal((n, dim))).astype(
        np.float32
    )
    qi = rng.integers(0, n, nq)
    queries = (base[qi] + 0.2 * rng.standard_normal((nq, dim))).astype(
        np.float32
    )
    return base, queries


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(42)
    K, NQ = 10, 4096
    sizes = [100_000] if "--small" in sys.argv else [100_000, 1_000_000]
    for N in sizes:
        D = 128
        base, queries = make_dataset(rng, N, D, NQ)
        idx = HNSWIndex(
            dim=D,
            params=HNSWParams(m=16, ef_construction=200, ef_search=100,
                              seed=42, neighbor_heuristic=True),
            metric=DistanceMetric.COSINE,
            use_device=True,
            search_batch_size=1024,
        )
        t0 = time.time()
        idx.bulk_insert(list(range(1, N + 1)), base)
        build_s = time.time() - t0
        log(f"N={N}: build {build_s:.1f}s ({N/build_s:.0f} vec/s)")

        # ground truth
        bj = jnp.asarray(base)
        valid = jnp.ones(N, bool)
        true_i = np.empty((NQ, K), np.int64)
        for s in range(0, NQ, 512):
            _, ti = brute_force_topk(
                jnp.asarray(queries[s : s + 512]), bj, valid,
                int(DistanceMetric.COSINE), K,
            )
            true_i[s : s + 512] = np.asarray(ti)
        del bj

        for ef in (24, 50, 100):
            params = SearchParams(top_k=K, ef_search=ef)
            idx.search_batch(queries[:1024], params)  # warm
            times = []
            for _ in range(3):
                t0 = time.time()
                results = idx.search_batch(queries, params)
                times.append(time.time() - t0)
            t = min(times)
            hits = 0
            for b in range(NQ):
                want = set((true_i[b] + 1).tolist())
                got = {r[0] for r in results[b]}
                hits += len(want & got)
            recall = hits / (NQ * K)
            log(f"N={N} ef={ef}: {NQ/t:.0f} QPS recall@10={recall:.4f}")
        del idx, base, queries

    log("done")


if __name__ == "__main__":
    main()
