"""Round-5 verdict run: does the sequential-semantics upper hierarchy
route a reference-semantics walker at scale?

Builds ONCE at N with the new upper-layer constructor
(knn_build._build_upper_sequential), then A/Bs serving entry modes on the
same graph in ONE process (tunnel discipline — scripts/r3_hw_focus.py):

  descent_greedy : SCNT_SEARCH_ENTRY=descent, ef_upper=1 — the reference's
                   routing exactly (hnsw.go:309-311). Round-4 state:
                   recall 0.7495 @ 1M, 0.5373 @ 4M.
  descent_beam2/4: ef_upper in {2, 4} (the VERDICT gate allows <= 4).
  pivot_default  : the TPU-native MXU entry (round-4 serving default).

Done-gate (VERDICT r4 #1): descent (ef_upper <= 4) recall@10 >= 0.99 @ 1M
at >= 50% of pivot-mode QPS.

Usage: python scripts/r5_upper_ab.py [N] > /tmp/r5_upper.log 2>&1 &
Writes benchmarks/upper_seq_{N}.json incrementally.
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM, K, NQ, PASSES = 128, 10, 4096, 3
# SCNT_UPPER_MODE=knn A/Bs the round-4 exact-kNN upper build instead of
# the sequential one (fast builds; routing must then come from mid entry)
_UPPER = os.environ.get("SCNT_UPPER_MODE", "seq")
# R5_MODES=descent_greedy_mid,pivot_default restricts the serving matrix
_MODES = set(m for m in os.environ.get("R5_MODES", "").split(",") if m)
OUT = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                   f"upper_{_UPPER}_{N}.json")
result: dict = {"n": N, "dim": DIM, "workload": "clustered_v2",
                "upper_mode": _UPPER,
                "upper_efc": os.environ.get("SCNT_UPPER_EFC", "64"),
                "round_cap": os.environ.get("SCNT_UPPER_ROUND_CAP", ""),
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
    if _MODES and label not in _MODES:
        return
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
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


run_mode("descent_greedy", {"SCNT_SEARCH_ENTRY": "descent",
                            "SCNT_SEARCH_EF_UPPER": "1",
                            "SCNT_DESCENT_MID": "0"})
run_mode("descent_beam2", {"SCNT_SEARCH_ENTRY": "descent",
                           "SCNT_SEARCH_EF_UPPER": "2",
                           "SCNT_DESCENT_MID": "0"})
run_mode("descent_beam4", {"SCNT_SEARCH_ENTRY": "descent",
                           "SCNT_SEARCH_EF_UPPER": "4",
                           "SCNT_DESCENT_MID": "0"})
# hierarchical mid-layer entry (the shipped descent serving default):
# exact-scan the highest MXU-scannable layer's members, then beam-descend
# only the remaining layers — same graph-only routing, ~1/3 the serial
# steps
run_mode("descent_beam4_mid", {"SCNT_SEARCH_ENTRY": "descent",
                               "SCNT_SEARCH_EF_UPPER": "4",
                               "SCNT_DESCENT_MID": "1"})
run_mode("descent_greedy_mid", {"SCNT_SEARCH_ENTRY": "descent",
                                "SCNT_SEARCH_EF_UPPER": "1",
                                "SCNT_DESCENT_MID": "1"})
# wider sub-batches amortize the descent's serial while-loop overhead
run_mode("descent_beam4_mid_b1024", {"SCNT_SEARCH_ENTRY": "descent",
                                     "SCNT_SEARCH_EF_UPPER": "4",
                                     "SCNT_DESCENT_MID": "1",
                                     "SCNT_SEARCH_SUBBATCH": "1024"})
run_mode("pivot_default", {})

result["finished"] = time.strftime("%Y-%m-%dT%H:%M:%S")
flush()
print(f"upper-seq A/B DONE -> {OUT}", flush=True)
