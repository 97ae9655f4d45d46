"""Flat e2e ceiling push (VERDICT r4 item 6): one process, one 1M corpus,
A/B of batch width x pipeline depth x query dtype on the real TPU.

Round-4 state: 37.5k e2e gated QPS at B=4096 depth 3 vs 668k device-only —
the gap is tunnel round trips, not kernel. The levers measured here:
  - batch width B in {4096, 8192, 16384, 32768}: RT amortizes over B
  - pipeline depth in {3, 6}
  - query upload dtype: f16 (round-4 default), int8+scale (new: 132
    B/query at D=128 — the upload is the dominant tunnel cost), f32
    control

Gate: >= 60k gated QPS at 1M (recall >= 0.95).

Usage: python scripts/r5_flat_push.py > /tmp/r5_flat.log 2>&1 &
Writes benchmarks/flat_push_1m.json incrementally.
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
                   "flat_push_1m.json")
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


def recall_of(outs_concat):
    hits = 0
    for b, res in enumerate(outs_concat):
        want = set((true_i[b % NQ] + 1).tolist())
        got = {r[0] for r in res}
        hits += len(want & got)
    return hits / (len(outs_concat) * K)


params = SearchParams(top_k=K)
os.environ["SCNT_SCAN_TPS"] = "4"
TOTAL = 98304  # queries per measured config (~6 x 16384)

for dtype in ("f16", "int8", "f32"):
    os.environ["SCNT_QUERY_DTYPE"] = dtype
    for B in (4096, 8192, 16384, 32768):
        qsrc = queries if B <= NQ else np.concatenate([queries, queries])
        nq = len(qsrc)
        batches = [qsrc[i % nq : i % nq + B]
                   if (i % nq) + B <= nq else
                   np.concatenate([qsrc[i % nq :],
                                   qsrc[: (i % nq) + B - nq]])
                   for i in range(0, TOTAL, B)]
        batches = [b for b in batches if len(b) == B]
        flat.search_batch(batches[0], params)  # warm shape
        for depth in (3, 6):
            t0 = time.time()
            outs = flat.search_batch_pipelined(batches, params, depth=depth)
            wall = time.time() - t0
            qps = len(batches) * B / wall
            rec = recall_of(outs[0])
            row = {"dtype": dtype, "B": B,
                   "depth": depth, "qps": round(qps, 1),
                   "recall_at_10_firstbatch": round(rec, 4)}
            result["rows"].append(row)
            print(row, flush=True)
            flush()

best = max(result["rows"], key=lambda r: r["qps"])
result["best"] = best
result["finished"] = time.strftime("%Y-%m-%dT%H:%M:%S")
flush()
print(f"flat push DONE best={best}", flush=True)
