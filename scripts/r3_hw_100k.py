"""Round-3 hardware A/B at 100k scale — ONE process, run when the TPU is up.

At 100k vectors the flat capacity (131072) sits below _FUSED_MIN_CAP
(262144), so serving takes the XLA bf16 two-pass path in 1024-query
sub-batches — 4 dispatches per 4096-query pass. The crossover was picked
on KERNEL time; end-to-end over the tunnel the dispatch overhead may now
dominate. This script A/Bs:
  1. flat 100k: default path vs SCNT_FUSED_MIN_CAP=65536 (fused int8 lane
     scan, one dispatch per pass) x {f32, f16 upload} x depth {seq, 2}
  2. hnsw 100k: {fuse sub-batches} x {f16} at B=4096

Usage: python scripts/r3_hw_100k.py
"""

import os
import sys
import time
import traceback

import numpy as np

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from scintirete_tpu.types import (  # noqa: E402
    DistanceMetric,
    HNSWParams,
    SearchParams,
)

N, DIM, K, B = 100_000, 128, 10, 4096
PASSES = 5

print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(42)
n_clusters = 1000
centers = rng.standard_normal((n_clusters, DIM)).astype(np.float32) * 2.0
assign = rng.integers(0, n_clusters, N)
base = (centers[assign] + 0.4 * rng.standard_normal((N, DIM))).astype(
    np.float32
)
qr = np.random.default_rng(7)
qi = qr.integers(0, N, B)
queries = (base[qi] + 0.2 * qr.standard_normal((B, DIM))).astype(np.float32)
params = SearchParams(top_k=K)


def env(key, val):
    if val is None:
        os.environ.pop(key, None)
    else:
        os.environ[key] = str(val)


def guard(fn):
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print("(section failed; continuing)", flush=True)


def measure(idx, label):
    idx.search_batch(queries, params)  # warm
    ts = []
    for _ in range(PASSES):
        t0 = time.time()
        idx.search_batch(queries, params)
        ts.append(time.time() - t0)
    avg = sum(ts) / len(ts)
    t0 = time.time()
    idx.search_batch_pipelined([queries] * PASSES, params, depth=2)
    per = (time.time() - t0) / PASSES
    print(f"  {label}: seq {B/avg:.0f} QPS, depth2 {B/per:.0f} QPS",
          flush=True)


def s_flat():
    # (min_cap, search_batch_size): default XLA path at its 1024-step,
    # XLA path with a 4096-wide step (ONE dispatch per pass), and the
    # fused int8 lane scan forced below its capacity crossover
    for min_cap, sbs in ((None, 1024), (None, 4096), (65536, 1024)):
        env("SCNT_FUSED_MIN_CAP", min_cap)
        # _FUSED_MIN_CAP is read at import; reload the module chain
        import importlib

        import scintirete_tpu.index.flat as flat_mod

        importlib.reload(flat_mod)
        idx = flat_mod.FlatIndex(
            dim=DIM, metric=DistanceMetric.COSINE, use_device=True,
            search_batch_size=sbs,
        )
        t0 = time.time()
        idx.bulk_insert(list(range(1, N + 1)), base)
        print(f"flat build (min_cap={min_cap} sbs={sbs}): "
              f"{time.time()-t0:.1f}s", flush=True)
        for f16 in (0, 1):
            env("SCNT_QUERY_F16", f16 or None)
            measure(idx, f"flat min_cap={min_cap} sbs={sbs} f16={f16}")
        env("SCNT_QUERY_F16", None)
    env("SCNT_FUSED_MIN_CAP", None)


def s_hnsw():
    from scintirete_tpu.index.hnsw import HNSWIndex
    from scintirete_tpu.utils import prewarm

    t0 = time.time()
    prewarm.warm_build(N, DIM, int(DistanceMetric.COSINE), m=16,
                       heuristic=True)
    print(f"hnsw prewarm {time.time()-t0:.1f}s", flush=True)
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
    print(f"hnsw build {time.time()-t0:.1f}s", flush=True)
    hp = SearchParams(top_k=K, ef_search=16)
    for f16 in (0, 1):
        env("SCNT_QUERY_F16", f16 or None)
        for fuse in (0, 1):
            env("SCNT_FUSE_SUBBATCH", fuse or None)
            idx.search_batch(queries, hp)  # warm
            t0 = time.time()
            idx.search_batch_pipelined([queries] * PASSES, hp, depth=2)
            per = (time.time() - t0) / PASSES
            print(f"  hnsw f16={f16} fuse={fuse} depth2: {B/per:.0f} QPS",
                  flush=True)
    env("SCNT_QUERY_F16", None)
    env("SCNT_FUSE_SUBBATCH", None)


print("\n=== flat 100k ===", flush=True)
guard(s_flat)
print("\n=== hnsw 100k ===", flush=True)
guard(s_hnsw)
print("\n100k matrix DONE", flush=True)
