"""Flat e2e ceiling push, pass 3 (VERDICT r4 item 6): the arrays path.

Pass 2 (`flat_push2_1m.json`, quiet box) found the knee at f16 B=65536
depth3 tps=16 (47.1k in a window running its anchor at 0.80x of round-4's
37.5k). At that width the per-hit tuple assembly (assemble_results) costs
~430 ms of one-core host wall per batch — ~30% of the 1.39 s/batch — so
this pass A/Bs the new `search_batch_pipelined_arrays` collect (packed
u64/f32 arrays, no Python per-hit objects; the same shape the BatchSearch
RPC serves) against the tuple collect, plus int8 upload at the leader
width and one wider B.

One process, one corpus; the round-4 best config runs FIRST as the
window anchor (tunnel discipline per scripts/r3_hw_focus.py).

Usage: python scripts/r5_flat_push3.py > /tmp/r5_flat3.log 2>&1 &
Writes benchmarks/flat_push3_1m.json incrementally.
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

from scintirete_tpu.index.flat import FlatIndex  # noqa: E402
from scintirete_tpu.ops import brute_force_topk  # noqa: E402
from scintirete_tpu.types import DistanceMetric, SearchParams  # noqa: E402

N, DIM, K = 1_000_000, 128, 10
NQ = 16384
OUT = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                   "flat_push3_1m.json")
result: dict = {"n": N, "dim": DIM, "workload": "clustered_v2",
                "started": time.strftime("%Y-%m-%dT%H:%M:%S"), "rows": []}


def flush():
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")


print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(42)
n_clusters = 10_000
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

flat = FlatIndex(dim=DIM, metric=DistanceMetric.COSINE, use_device=True)
t0 = time.time()
flat.bulk_insert(list(range(1, N + 1)), base)
result["build_seconds"] = round(time.time() - t0, 1)
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
true_ids = (true_i + 1).astype(np.uint64)  # slot s -> id s+1 by construction


def recall_tuples(res_batch):
    hits = 0
    for b, res in enumerate(res_batch):
        want = set((true_i[b % NQ] + 1).tolist())
        got = {r[0] for r in res}
        hits += len(want & got)
    return hits / (len(res_batch) * K)


def recall_arrays(ids_b):
    B = ids_b.shape[0]
    want = true_ids[np.arange(B) % NQ]  # [B, K]
    hits = (ids_b[:, :, None] == want[:, None, :]).any(axis=1).sum()
    return float(hits) / (B * K)


params = SearchParams(top_k=K)
TOTAL = 393216

CONFIGS = [
    # window anchor: the round-4 best config (37.5k in BENCH_r04's window)
    ("f16", 4096, 3, 4, "tuples"),
    # pass-2 leader, replicated
    ("f16", 65536, 3, 16, "tuples"),
    # the arrays collect at the leader config
    ("f16", 65536, 3, 16, "arrays"),
    ("int8", 65536, 3, 16, "arrays"),
    ("f16", 131072, 3, 16, "arrays"),
    ("f16", 65536, 4, 16, "arrays"),
    ("int8", 131072, 3, 16, "arrays"),
]

for dtype, B, depth, tps, collect in CONFIGS:
    os.environ["SCNT_QUERY_DTYPE"] = dtype
    os.environ["SCNT_SCAN_TPS"] = str(tps)
    nq = len(queries)
    batches = []
    i = 0
    while len(batches) * B < TOTAL:
        s = i % nq
        if s + B <= nq:
            batches.append(queries[s : s + B])
        else:
            reps = (B + nq - 1) // nq + 1
            batches.append(np.concatenate([queries] * reps)[s : s + B])
        i += B
    flat.search_batch(batches[0][:4096], params)  # warm knob programs
    t0 = time.time()
    if collect == "arrays":
        outs = flat.search_batch_pipelined_arrays(batches, params,
                                                  depth=depth)
        rec = recall_arrays(outs[0][0])
    else:
        outs = flat.search_batch_pipelined(batches, params, depth=depth)
        rec = recall_tuples(outs[0])
    wall = time.time() - t0
    qps = len(batches) * B / wall
    row = {"dtype": dtype, "B": B, "depth": depth, "tps": tps,
           "collect": collect, "qps": round(qps, 1),
           "recall_at_10_firstbatch": round(rec, 4)}
    result["rows"].append(row)
    print(row, flush=True)
    flush()

best = max(result["rows"], key=lambda r: r["qps"])
result["best"] = best
result["finished"] = time.strftime("%Y-%m-%dT%H:%M:%S")
flush()
print(f"flat push3 DONE best={best}", flush=True)
