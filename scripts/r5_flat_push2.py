"""Flat e2e ceiling push, pass 2 (VERDICT r4 item 6) — QUIET BOX ONLY.

Pass 1 (`flat_push_1m.json`) ran concurrently with a CPU-pinned pytest
build, which contaminated the host-side work (query pad/convert, result
unpack, pipelining bookkeeping all fight for the one core) — the f16
upload LOSING to f32 at B>=16k is the tell (half the upload bytes can't
be slower unless the host-side f16 conversion was starved). This pass
re-measures the promising corner on an idle box, adds B=65536 (the
B-scaling trend had not flattened at 32k), and A/Bs the int8-scan
tile-group knob (SCNT_SCAN_TPS 4 vs 16 — the round-4 kernel A/B found 16
best for the int8 scan kernel-only; e2e never re-measured it).

Every config runs in THIS one process against one corpus (tunnel
discipline per scripts/r3_hw_focus.py); the round-4 best config
(f16, B=4096, depth 3) runs FIRST as the window anchor.

Usage: python scripts/r5_flat_push2.py > /tmp/r5_flat2.log 2>&1 &
Writes benchmarks/flat_push2_1m.json incrementally.
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
                   "flat_push2_1m.json")
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
TOTAL = 196608

CONFIGS = [
    # window anchor: the round-4 best config (37.5k in BENCH_r04's window)
    ("f16", 4096, 3, 4),
    # pass-1 leaders, quiet box
    ("f32", 32768, 3, 4),
    ("f16", 32768, 3, 4),
    ("f32", 65536, 3, 4),
    ("f16", 65536, 3, 4),
    ("f32", 65536, 6, 4),
    ("f16", 65536, 6, 4),
    # tile-group knob at the leader width
    ("f32", 32768, 3, 16),
    ("f16", 65536, 3, 16),
    # int8 upload at the leader width (recall ~0.978 — separate story)
    ("int8", 32768, 3, 16),
]

for dtype, B, depth, tps in CONFIGS:
    os.environ["SCNT_QUERY_DTYPE"] = dtype
    os.environ["SCNT_SCAN_TPS"] = str(tps)
    qsrc = queries
    nq = len(qsrc)
    batches = []
    i = 0
    while len(batches) * B < TOTAL:
        s = i % nq
        if s + B <= nq:
            batches.append(qsrc[s : s + B])
        else:
            reps = (B + nq - 1) // nq + 1
            batches.append(np.concatenate([qsrc] * reps)[s : s + B])
        i += B
    flat.search_batch(batches[0][:4096], params)  # warm knob programs
    t0 = time.time()
    outs = flat.search_batch_pipelined(batches, params, depth=depth)
    wall = time.time() - t0
    qps = len(batches) * B / wall
    rec = recall_of(outs[0])
    row = {"dtype": dtype, "B": B, "depth": depth, "tps": tps,
           "qps": round(qps, 1), "recall_at_10_firstbatch": round(rec, 4)}
    result["rows"].append(row)
    print(row, flush=True)
    flush()

best = max(result["rows"], key=lambda r: r["qps"])
result["best"] = best
result["finished"] = time.strftime("%Y-%m-%dT%H:%M:%S")
flush()
print(f"flat push2 DONE best={best}", flush=True)
