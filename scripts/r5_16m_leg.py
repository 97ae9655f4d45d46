"""Round-5 16M-on-one-chip leg (VERDICT r4 item 9): the int8-only HBM
serving mode — FlatIndex at device_dtype="bfloat16" drops the f32 exact
copy (rerank reads the bf16 corpus rows, cast per candidate block), so the
device budget at 16.78M cap x 128-d is:

    bf16 vectors  4.29 GB   (rerank source)
    int8 scan     2.15 GB   (fused first pass)
    sq_norms f32  0.07 GB
    scan_sq  f32  0.07 GB
    valid    bool 0.02 GB
    --------------------- ~6.6 GB of 16 GB HBM

vs ~13.1 GB for the default f32+int8 layout — 16M stops "pressing the HBM
budget" (round-4 sizing note) and leaves room for the query/result
working set.

Gate: recall@10 >= 0.95 vs exact f32 ground truth (computed on-device in
streamed chunks before the index is built, then freed).

Usage: python scripts/r5_16m_leg.py > /tmp/r5_16m.log 2>&1 &
Writes benchmarks/flat16m.json incrementally.
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

N, DIM, K, NQ = 16_000_000, 128, 10, 2048
CHUNK = 2_000_000  # ground-truth streaming chunk (1 GB f32 on device)
OUT = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                   "flat16m.json")
result: dict = {"n": N, "dim": DIM, "workload": "clustered_v2",
                "mode": "int8_only_bf16_rerank",
                "started": time.strftime("%Y-%m-%dT%H:%M:%S")}


def flush():
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")


print(f"devices: {jax.devices()}", flush=True)
t0 = time.time()
rng = np.random.default_rng(42)
n_clusters = 1000 * N // 100_000
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
result["datagen_seconds"] = round(time.time() - t0, 1)
print(f"datagen {result['datagen_seconds']}s", flush=True)
flush()

# ---- exact ground truth, streamed in chunks (before the index holds HBM)
t0 = time.time()
qj = jnp.asarray(queries)
best_d = np.full((NQ, K), np.inf, np.float32)
best_i = np.full((NQ, K), -1, np.int64)
for s in range(0, N, CHUNK):
    e = min(s + CHUNK, N)
    bj = jnp.asarray(base[s:e])
    d, i = brute_force_topk(
        qj, bj, jnp.ones(e - s, bool), int(DistanceMetric.COSINE), K
    )
    d = np.asarray(d)
    i = np.asarray(i, np.int64) + s
    md = np.concatenate([best_d, d], axis=1)
    mi = np.concatenate([best_i, i], axis=1)
    order = np.argsort(md, axis=1, kind="stable")[:, :K]
    best_d = np.take_along_axis(md, order, axis=1)
    best_i = np.take_along_axis(mi, order, axis=1)
    del bj
    print(f"gt chunk {s}-{e} done t={time.time()-t0:.0f}s", flush=True)
true_i = best_i
result["gt_seconds"] = round(time.time() - t0, 1)
flush()

# ---- build the int8-only index ----
t0 = time.time()
idx = FlatIndex(
    dim=DIM, metric=DistanceMetric.COSINE, device_dtype="bfloat16",
    scan_dtype="int8", use_device=True, search_batch_size=1024,
)
idx.bulk_insert(list(range(1, N + 1)), base)
result["host_build_seconds"] = round(time.time() - t0, 1)
print(f"host build {result['host_build_seconds']}s", flush=True)
flush()

sp = SearchParams(top_k=K)
knobs = {"SCNT_QUERY_F16": "1", "SCNT_SCAN_TPS": "8"}
os.environ.update(knobs)
result["knobs"] = {**knobs, "depth": 3}
t0 = time.time()
idx.search_batch(queries, sp)  # sync (quantize + upload) + warm
result["first_search_seconds"] = round(time.time() - t0, 1)
print(f"first search (sync+warm) {result['first_search_seconds']}s",
      flush=True)
flush()


def recall_of(results):
    hits = 0
    for b in range(NQ):
        want = set((true_i[b] + 1).tolist())
        got = {r[0] for r in results[b]}
        hits += len(want & got)
    return hits / true_i.size


PASSES = 6
t0 = time.time()
outs = idx.search_batch_pipelined([queries] * PASSES, sp, depth=3)
per = (time.time() - t0) / PASSES
rec = recall_of(outs[-1])
result["qps"] = round(NQ / per, 1)
result["recall_at_10"] = round(rec, 4)
result["gated_qps"] = round(NQ / per * min(1.0, rec / 0.95), 1)
print(f"16M int8-only: {NQ/per:.0f} QPS recall@{K}={rec:.4f}", flush=True)

# HBM accounting (what the device mirror actually holds)
a = idx._dev
result["hbm_gb"] = round(
    sum(float(np.prod(v.shape)) * v.dtype.itemsize for v in a.values())
    / 2**30, 2,
)
result["device_arrays"] = {
    k: [list(v.shape), str(v.dtype)] for k, v in a.items()
}
result["finished"] = time.strftime("%Y-%m-%dT%H:%M:%S")
flush()
print(f"16M leg DONE -> {OUT}", flush=True)
