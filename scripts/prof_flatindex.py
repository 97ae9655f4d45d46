"""FlatIndex end-to-end on the real TPU: build rate, QPS, recall at 100k/1M."""

from __future__ import annotations

import sys
import time

import numpy as np

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scintirete_tpu.index.flat import FlatIndex
from scintirete_tpu.ops import brute_force_topk
from scintirete_tpu.types import DistanceMetric, SearchParams


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_dataset(rng, n, dim, n_queries):
    centers = rng.standard_normal((1000, dim)).astype(np.float32) * 2.0
    assign = rng.integers(0, 1000, n)
    base = (centers[assign] + 0.4 * rng.standard_normal((n, dim))).astype(
        np.float32
    )
    qi = rng.integers(0, n, n_queries)
    queries = (base[qi] + 0.2 * rng.standard_normal((n_queries, dim))).astype(
        np.float32
    )
    return base, queries


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(42)
    K = 10
    for N in (100_000, 1_000_000):
        D = 128
        base, queries = make_dataset(rng, N, D, 4096)
        idx = FlatIndex(
            dim=D, metric=DistanceMetric.COSINE, use_device=True,
            search_batch_size=1024,
        )
        t0 = time.time()
        idx.bulk_insert(list(range(1, N + 1)), base)
        log(f"N={N}: insert {time.time()-t0:.2f}s")
        params = SearchParams(top_k=K)
        t0 = time.time()
        idx.search_batch(queries[:1024], params)
        log(f"N={N}: first batch (compile+sync) {time.time()-t0:.1f}s")
        times = []
        for _ in range(3):
            t0 = time.time()
            results = idx.search_batch(queries, params)
            times.append(time.time() - t0)
        qps = 4096 / (sum(times) / len(times))
        # ground truth
        bj = jnp.asarray(base)
        valid = jnp.ones(N, bool)
        true_i = np.empty((4096, K), np.int64)
        for s in range(0, 4096, 512):
            _, ti = brute_force_topk(
                jnp.asarray(queries[s : s + 512]), bj, valid,
                int(DistanceMetric.COSINE), K,
            )
            true_i[s : s + 512] = np.asarray(ti)
        del bj
        hits = 0
        for b in range(4096):
            want = set((true_i[b] + 1).tolist())
            got = {r[0] for r in results[b]}
            hits += len(want & got)
        recall = hits / (4096 * K)
        log(f"N={N}: {qps:.0f} QPS recall@10={recall:.4f} "
            f"(passes {[round(t,3) for t in times]})")
        del idx, base, queries

    log("done")


if __name__ == "__main__":
    main()
