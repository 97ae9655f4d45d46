"""Append-at-scale profile (VERDICT r4 item 2): build at N, then run
batched appends with per-phase wall breakdowns (SCNT_BUILD_PROFILE must
be set by the caller) and per-batch timings, including the layer-growth
batches that used to trigger a full device-mirror re-upload (the round-4
"unexplained 8M decay": every layer count sits on a pow2 boundary right
after a pow2-sized build, so the first appends each doubled one layer
table -> invalidated dirty tracking -> ~12 GB full upload at 8M).

Usage: SCNT_BUILD_PROFILE=1 python scripts/r5_append_prof.py [N] [batches]
Writes benchmarks/append_prof_{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scintirete_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402

from scintirete_tpu.index.hnsw import HNSWIndex  # noqa: E402
from scintirete_tpu.types import (  # noqa: E402
    DistanceMetric,
    HNSWParams,
    SearchParams,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 6
BATCH, DIM = 4096, 128
OUT = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                   f"append_prof_{N}.json")
result: dict = {"n": N, "dim": DIM, "batch": BATCH,
                "started": time.strftime("%Y-%m-%dT%H:%M:%S"), "trials": []}


def flush():
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")


print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(42)
n_clusters = max(1000 * N // 100_000, 100)
centers = rng.standard_normal((n_clusters, DIM)).astype(np.float32) * 2.0
assign = rng.integers(0, n_clusters, N + N_BATCHES * BATCH)
noise_scale = 0.4
base = np.empty((N, DIM), np.float32)
for s in range(0, N, 500_000):
    e = min(s + 500_000, N)
    base[s:e] = centers[assign[s:e]] + noise_scale * rng.standard_normal(
        (e - s, DIM)
    ).astype(np.float32)

from scintirete_tpu.utils import prewarm  # noqa: E402

t0 = time.time()
prewarm.warm_build(N, DIM, int(DistanceMetric.COSINE), m=16, heuristic=True)
prewarm.warm_append(N, DIM, int(DistanceMetric.COSINE), m=16, heuristic=True)
result["prewarm_seconds"] = round(time.time() - t0, 1)
flush()

idx = HNSWIndex(
    dim=DIM,
    params=HNSWParams(m=16, ef_construction=200, ef_search=12, seed=42,
                      neighbor_heuristic=True),
    metric=DistanceMetric.COSINE,
    use_device=True,
    search_batch_size=256,
)
t0 = time.time()
idx.bulk_insert(list(range(1, N + 1)), base)
result["build_seconds"] = round(time.time() - t0, 1)
print(f"build {result['build_seconds']}s", flush=True)
flush()

sp = SearchParams(top_k=10, ef_search=12)
next_id = N + 1
for t in range(N_BATCHES):
    lo = N + t * BATCH
    newv = (
        centers[assign[lo : lo + BATCH]]
        + noise_scale * rng.standard_normal((BATCH, DIM))
    ).astype(np.float32)
    t0 = time.time()
    idx.bulk_insert(list(range(next_id, next_id + BATCH)), newv)
    dt = time.time() - t0
    next_id += BATCH
    # self-recall: every appended vector must find itself
    res = idx.search_batch(newv[:256], sp)
    hits = sum(
        1 for i, r in enumerate(res) if any(h[0] == N + t * BATCH + i + 1
                                            for h in r)
    )
    row = {"seconds": round(dt, 1), "vecs_per_s": round(BATCH / dt, 1),
           "self_recall_256": hits}
    result["trials"].append(row)
    print(f"append {t}: {row}", flush=True)
    flush()

result["finished"] = time.strftime("%Y-%m-%dT%H:%M:%S")
flush()
print("append prof DONE", flush=True)
