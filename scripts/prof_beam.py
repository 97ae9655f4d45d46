"""HNSW layer-0 beam profiling on the real TPU (100k clustered cosine).

Builds the 100k graph once and caches it (pickle); then sweeps
(ef, expand) measuring end-to-end QPS, recall@10, and beam step counts.
"""

from __future__ import annotations

import os
import pickle
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

CACHE = os.path.expanduser("~/.cache/scintirete_tpu/prof_hnsw100k.pkl")
N, DIM, NQ, K = 100_000, 128, 4096, 10


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_dataset(rng):
    centers = rng.standard_normal((1000, DIM)).astype(np.float32) * 2.0
    assign = rng.integers(0, 1000, N)
    base = (centers[assign] + 0.4 * rng.standard_normal((N, DIM))).astype(
        np.float32
    )
    qi = rng.integers(0, N, NQ)
    queries = (base[qi] + 0.2 * rng.standard_normal((NQ, DIM))).astype(
        np.float32
    )
    return base, queries


def get_index(base) -> HNSWIndex:
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            state = pickle.load(f)
        return HNSWIndex.import_graph_state(state)
    idx = HNSWIndex(
        dim=DIM,
        params=HNSWParams(
            m=16, ef_construction=200, ef_search=100, seed=42,
            neighbor_heuristic=True,
        ),
        metric=DistanceMetric.COSINE,
        use_device=True,
        search_batch_size=1024,
    )
    t0 = time.time()
    idx.bulk_insert(list(range(1, N + 1)), base)
    log(f"build: {time.time()-t0:.0f}s")
    with open(CACHE, "wb") as f:
        pickle.dump(idx.export_graph_state(), f)
    return idx


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(42)
    base, queries = make_dataset(rng)
    idx = get_index(base)
    idx.search_batch_size = 1024
    dev = idx._get_device()
    dev.sync(idx.store)

    # ground truth
    true_i = np.empty((NQ, K), np.int64)
    bj = jnp.asarray(base)
    valid = jnp.ones(N, bool)
    for s in range(0, NQ, 512):
        _, ti = brute_force_topk(
            jnp.asarray(queries[s : s + 512]), bj, valid,
            int(DistanceMetric.COSINE), K,
        )
        true_i[s : s + 512] = np.asarray(ti)
    del bj
    log("ground truth done")

    from scintirete_tpu.index.device import _search_kernel_pivot

    a = dev.graph.arrays
    for ef in (24, 50, 100):
        for expand in (4, 8, 16, 32):
            if expand > ef:
                continue
            max_steps = ef + 64
            # steps taken (one sub-batch, direct kernel call)
            d, s, steps = _search_kernel_pivot(
                jnp.asarray(queries[:1024]), a["vectors"], a["sq_norms"],
                a["deleted"], a["neighbors0"], a["pivots"], a["pivot_vecs"],
                a["pivot_sq"], metric=int(idx.store.metric), ef=ef, k=K,
                max_steps=max_steps, expand=expand,
            )
            nsteps = int(np.asarray(steps))
            # timed full passes through DeviceIndex.search
            times = []
            for _ in range(3):
                t0 = time.time()
                slots, _d = dev.search(
                    idx.store, queries, K, ef, expand=expand
                )
                times.append(time.time() - t0)
            t = min(times)
            hits = 0
            for b in range(NQ):
                want = set(true_i[b].tolist())
                got = set(int(x) for x in slots[b] if x >= 0)
                hits += len(want & got)
            recall = hits / (NQ * K)
            log(f"ef={ef:3d} expand={expand:2d}: {NQ/t:7.0f} QPS "
                f"recall={recall:.4f} steps={nsteps} "
                f"({t*1e3:.0f} ms / {NQ} q)")
    log("done")


if __name__ == "__main__":
    main()
