"""Focused round-3 re-measurement on a QUIET box with a WARM compile cache.

The full matrix (r3_hw_matrix.py) ran once on this image with a cold disk
cache while CPU-heavy work shared the single host core — its pipelined
legs were starved (depth2 slower than sequential, which contradicts every
clean measurement) and the append trials were still climbing through
warmup. This script re-measures ONLY what decides bench.py defaults:

  1. 1M flat + HNSW build walls (warm cache, quiet box — the record)
  2. flat serving: the knob shortlist at B=4096 and B=16384
  3. HNSW serving at the bench point (ef=12) x depth
  4. append steady state: 6 x 4096 trials (target >= 1,000 vec/s)

Usage: python scripts/r3_hw_focus.py > /tmp/hw_focus.log 2>&1 &
"""

import os
import sys
import time
import traceback

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
DIM, K = 128, 10
PASSES = 5

print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(42)
n_clusters = max(1000 * N // 100_000, 100)
centers = rng.standard_normal((n_clusters, DIM)).astype(np.float32) * 2.0
assign = rng.integers(0, n_clusters, N)
base = (centers[assign] + 0.4 * rng.standard_normal((N, DIM))).astype(
    np.float32
)
params = SearchParams(top_k=K)


def queries_of(b, seed=7):
    r = np.random.default_rng(seed)
    qi = r.integers(0, N, b)
    return (base[qi] + 0.2 * r.standard_normal((b, DIM))).astype(np.float32)


def env(key, val):
    if val is None:
        os.environ.pop(key, None)
    else:
        os.environ[key] = str(val)


def guard(name, fn):
    print(f"\n=== {name} === ({time.strftime('%H:%M:%S')})", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print("(section failed; continuing)", flush=True)


def serve(idx, q, label, depth, sp=params):
    idx.search_batch(q, sp)  # warm this shape+config
    B = q.shape[0]
    if depth == 0:
        ts = []
        for _ in range(PASSES):
            t0 = time.time()
            idx.search_batch(q, sp)
            ts.append(time.time() - t0)
        per = sum(ts) / len(ts)
        best = min(ts)
        print(f"  {label} seq: best {best*1e3:.0f}ms avg {per*1e3:.0f}ms"
              f" -> {B/per:.0f} QPS", flush=True)
    else:
        t0 = time.time()
        idx.search_batch_pipelined([q] * PASSES, sp, depth=depth)
        per = (time.time() - t0) / PASSES
        print(f"  {label} depth{depth}: {per*1e3:.0f}ms/pass -> "
              f"{B/per:.0f} QPS", flush=True)


flat = FlatIndex(dim=DIM, metric=DistanceMetric.COSINE, use_device=True,
                 search_batch_size=4096)
hidx = HNSWIndex(
    dim=DIM,
    params=HNSWParams(m=16, ef_construction=200, ef_search=12, seed=42,
                      neighbor_heuristic=True),
    metric=DistanceMetric.COSINE,
    use_device=True,
    search_batch_size=256,
)


def s1_builds():
    t0 = time.time()
    flat.bulk_insert(list(range(1, N + 1)), base)
    print(f"flat build {time.time()-t0:.1f}s", flush=True)
    from scintirete_tpu.utils import prewarm

    t0 = time.time()
    prewarm.warm_build(N, DIM, int(DistanceMetric.COSINE), m=16,
                       heuristic=True)
    print(f"hnsw prewarm {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    hidx.bulk_insert(list(range(1, N + 1)), base)
    print(f"hnsw build {time.time()-t0:.1f}s", flush=True)


def s2_flat():
    for B in (4096, 16384):
        q = queries_of(B)
        for f16, tps, depths in (
            (0, None, (0, 2, 3)),
            (0, 2, (0, 2, 3)),
            (1, 4, (2, 3)),
        ):
            env("SCNT_QUERY_F16", f16 or None)
            env("SCNT_SCAN_TPS", tps)
            for d in depths:
                serve(flat, q, f"flat B={B} f16={f16} tps={tps or 1}", d)
        env("SCNT_QUERY_F16", None)
        env("SCNT_SCAN_TPS", None)


def s3_hnsw():
    hp = SearchParams(top_k=K, ef_search=12)
    for B in (4096, 16384):
        q = queries_of(B)
        for d in (0, 2, 3):
            serve(hidx, q, f"hnsw ef=12 B={B}", d, sp=hp)


def s4_append():
    hp = SearchParams(top_k=K, ef_search=16)
    next_id = N + 1
    for trial in range(6):
        r = np.random.default_rng(100 + trial)
        a = r.integers(0, n_clusters, 4096)
        new = (centers[a] + 0.4 * r.standard_normal((4096, DIM))).astype(
            np.float32
        )
        ids = list(range(next_id, next_id + 4096))
        next_id += 4096
        t0 = time.time()
        hidx.bulk_insert(ids, new)
        dt = time.time() - t0
        res = hidx.search_batch(new[:256], hp)
        hits = sum(
            1 for want, row in zip(ids[:256], res)
            if any(got == want for got, _ in row)
        )
        print(f"  append 4096 (trial {trial}): {dt:.1f}s "
              f"({4096/dt:.0f} vec/s), self-recall {hits}/256", flush=True)


guard("1. builds", s1_builds)
guard("2. flat serving", s2_flat)
guard("3. hnsw serving", s3_hnsw)
guard("4. append steady state", s4_append)
print("\nfocus DONE", flush=True)
