"""Isolate the large-N recall collapse (r4): entry mode x step budget x R.

Observed: recall@10 at ef=12 falls 0.991 (1M) -> 0.938 (4M) -> 0.862 (8M)
with per-cluster difficulty constant (clusters scale with N). Suspect: the
serving default is PIVOT entry with R capped at 16,384 — coverage degrades
from 61 points/pivot (1M) to 488 (8M) while the layer-0 beam's step budget
stays ef+64. The upper-layer descent (reference routing) has no such cap.

Build ONCE at N, then A/B serving configs on the same graph:
  1. pivot R=16k, default steps   (the curve_4m baseline)
  2. pivot R=16k, max_steps=256   (is it the step budget?)
  3. descent entry                (is it entry coverage at all?)
  4. pivot R=64k, default steps   (is it pivot density?)

Usage: python scripts/r4_entry_modes.py [N] > /tmp/r4_entry.log 2>&1 &
Writes benchmarks/entry_modes_{N}.json incrementally.
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
import jax.numpy as jnp  # noqa: E402

from scintirete_tpu.index.hnsw import HNSWIndex  # noqa: E402
from scintirete_tpu.ops import brute_force_topk  # noqa: E402
from scintirete_tpu.types import (  # noqa: E402
    DistanceMetric,
    HNSWParams,
    SearchParams,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
DIM, K, NQ, PASSES = 128, 10, 4096, 3
OUT = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                   f"entry_modes_{N}.json")
result: dict = {"n": N, "dim": DIM, "workload": "clustered_v2",
                "started": time.strftime("%Y-%m-%dT%H:%M:%S"), "modes": []}


def flush():
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")


print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(42)
n_clusters = max(1000 * N // 100_000, 100)
centers = rng.standard_normal((n_clusters, DIM)).astype(np.float32) * 2.0
assign = rng.integers(0, n_clusters, N)
base = np.empty((N, DIM), np.float32)
for s in range(0, N, 500_000):
    e = min(s + 500_000, N)
    base[s:e] = centers[assign[s:e]] + 0.4 * rng.standard_normal(
        (e - s, DIM)
    ).astype(np.float32)
qi = rng.integers(0, N, NQ)
queries = (base[qi] + 0.2 * rng.standard_normal((NQ, DIM))).astype(np.float32)

from scintirete_tpu.utils import prewarm  # noqa: E402

t0 = time.time()
prewarm.warm_build(N, DIM, int(DistanceMetric.COSINE), m=16, heuristic=True)
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


def recall_of(results):
    hits = 0
    for b in range(NQ):
        want = set((true_i[b] + 1).tolist())
        got = {r[0] for r in results[b]}
        hits += len(want & got)
    return hits / true_i.size


def run_mode(label, env, efs=(12, 24)):
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        if "SCNT_PIVOT_CAP" in env:
            # force a pivot re-sample at the new cap on the live mirror
            dev = idx._get_device()
            dev.graph.arrays.update(dev.graph._pivot_arrays(idx.store))
        for ef in efs:
            sp = SearchParams(top_k=K, ef_search=ef)
            idx.search_batch(queries, sp)  # warm shape+ef under this env
            t0 = time.time()
            outs = idx.search_batch_pipelined([queries] * PASSES, sp, depth=3)
            per = (time.time() - t0) / PASSES
            rec = recall_of(outs[-1])
            row = {"mode": label, "ef": ef, "recall_at_10": round(rec, 4),
                   "qps": round(NQ / per, 1), **env}
            result["modes"].append(row)
            print(f"{label} ef={ef}: recall={rec:.4f} {NQ/per:.0f} QPS",
                  flush=True)
            flush()
    finally:
        for k, v in saved.items():
            os.environ.pop(k, None) if v is None else os.environ.update(
                {k: v}
            )


if os.environ.get("SCNT_AB_BEAM_DESCENT") == "1":
    # post-fix A/B (r4, second half): greedy vs beam descent vs the scaled
    # pivot default on one graph — the beam-descent repair at hardware scale
    run_mode("descent_greedy", {"SCNT_SEARCH_ENTRY": "descent"})
    run_mode("descent_beam4", {"SCNT_SEARCH_ENTRY": "descent",
                               "SCNT_SEARCH_EF_UPPER": "4"})
    run_mode("descent_beam8", {"SCNT_SEARCH_ENTRY": "descent",
                               "SCNT_SEARCH_EF_UPPER": "8"})
    run_mode("pivot_default", {})
else:
    run_mode("pivot_r16k", {})
    run_mode("pivot_r16k_steps256", {"SCNT_SEARCH_MAXSTEPS": "256"})
    run_mode("descent", {"SCNT_SEARCH_ENTRY": "descent"})
    run_mode("pivot_r64k", {"SCNT_PIVOT_CAP": "65536"})
# restore default pivots for any later use
dev = idx._get_device()
os.environ.pop("SCNT_PIVOT_CAP", None)
dev.graph.arrays.update(dev.graph._pivot_arrays(idx.store))

result["finished"] = time.strftime("%Y-%m-%dT%H:%M:%S")
flush()
print(f"entry-mode A/B DONE -> {OUT}", flush=True)
