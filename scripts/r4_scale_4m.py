"""Round-4 scale leg: the HNSW-vs-flat crossover at 4M (VERDICT r3 item 1).

Flat exact scan is O(N)/query — its 1M rate (~46.8k QPS) must fall ~4x at
4M, while HNSW's beam cost grows ~log N and should hold ~25k. This run is
the existence proof for the graph engine. Build once, then:

  1. HNSW build wall + flat build wall (4M x 128-d clustered cosine)
  2. ground truth (exact top-10) for 4096 queries
  3. HNSW ef sweep (recall + pipelined QPS at B=4096, depth 3)
  4. flat serving at the measured-winner knobs (f16 query + tps4, depth 3)
  5. p50 single-query / b=32 latency for both
  6. append trials (3 x 4096) at 4M

Results are flushed to benchmarks/curve_4m.json after EVERY section so a
tunnel outage can't eat the run (the round-3 4M leg died that way).

Usage: python scripts/r4_scale_4m.py [N] > /tmp/r4_4m.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("BENCH_FORCE_CPU") == "1":
    # must run before backend init (sitecustomize pins a TPU platform;
    # env vars alone don't switch)
    import jax

    jax.config.update("jax_platforms", "cpu")

from scintirete_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scintirete_tpu.index.flat import FlatIndex  # noqa: E402
from scintirete_tpu.index.hnsw import HNSWIndex  # noqa: E402
from scintirete_tpu.ops import brute_force_topk  # noqa: E402
from scintirete_tpu.types import (  # noqa: E402
    DistanceMetric,
    HNSWParams,
    SearchParams,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
DIM, K, NQ = 128, 10, 4096
PASSES = 5
REFINE = os.environ.get("SCNT_BUILD_REFINE")
# R4_SECTIONS=hnsw,append reruns just the graph half (flat numbers for the
# same N/workload/seed are already committed); default runs everything.
SECTIONS = set(
    s for s in os.environ.get("R4_SECTIONS", "").split(",") if s
)
_suffix = f"_refine{REFINE}" if REFINE else ""
if os.environ.get("R4_TAG"):
    _suffix += f"_{os.environ['R4_TAG']}"
OUT = os.path.join(
    os.path.dirname(__file__), "..", "benchmarks",
    (f"curve_4m{_suffix}.json" if N == 4_000_000
     else f"curve_{N}{_suffix}.json"),
)

result: dict = {"n": N, "dim": DIM, "workload": "clustered_v2",
                "started": time.strftime("%Y-%m-%dT%H:%M:%S")}
if SECTIONS and os.path.exists(OUT):
    # partial rerun (R4_SECTIONS): keep the committed sections' numbers —
    # same N/workload/seed, so merging is sound
    with open(OUT) as f:
        prior = json.load(f)
    if prior.get("n") == N:
        prior.pop("finished", None)
        prior.pop("failed_sections", None)
        result = {**prior, **result}
if REFINE:
    result["refine_rounds"] = int(REFINE)


def flush():
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")


def guard(name, fn, *, tags=()):
    if SECTIONS and not (SECTIONS & set(tags)):
        print(f"\n=== {name} === SKIPPED (R4_SECTIONS)", flush=True)
        return
    print(f"\n=== {name} === ({time.strftime('%H:%M:%S')})", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        result.setdefault("failed_sections", []).append(name)
    flush()


print(f"devices: {jax.devices()}", flush=True)

# bench.make_dataset semantics (workload v2), chunked to keep host RSS sane
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
print(f"dataset ready ({base.nbytes / 1e9:.1f} GB host)", flush=True)

hidx = HNSWIndex(
    dim=DIM,
    params=HNSWParams(m=16, ef_construction=200, ef_search=12, seed=42,
                      neighbor_heuristic=True),
    metric=DistanceMetric.COSINE,
    use_device=True,
    search_batch_size=256,
)
flat = FlatIndex(dim=DIM, metric=DistanceMetric.COSINE, use_device=True,
                 search_batch_size=4096)
true_i = np.empty((NQ, K), np.int64)


def s0_prewarm():
    from scintirete_tpu.utils import prewarm

    t0 = time.time()
    prewarm.warm_build(N, DIM, int(DistanceMetric.COSINE), m=16,
                       heuristic=True)
    result["prewarm_seconds"] = round(time.time() - t0, 1)
    print(f"prewarm {result['prewarm_seconds']}s", flush=True)


def s1_build_hnsw():
    t0 = time.time()
    hidx.bulk_insert(list(range(1, N + 1)), base)
    dt = time.time() - t0
    result["hnsw_build_seconds"] = round(dt, 1)
    result["hnsw_build_vecs_per_s"] = round(N / dt, 1)
    print(f"hnsw build {dt:.1f}s ({N/dt:.0f} vec/s)", flush=True)


def s2_build_flat():
    t0 = time.time()
    flat.bulk_insert(list(range(1, N + 1)), base)
    dt = time.time() - t0
    result["flat_build_seconds"] = round(dt, 1)
    print(f"flat build {dt:.1f}s", flush=True)


def s3_ground_truth():
    t0 = time.time()
    bj = jnp.asarray(base)
    valid = jnp.ones(N, bool)
    for s in range(0, NQ, 512):
        _, ti = brute_force_topk(
            jnp.asarray(queries[s : s + 512]), bj, valid,
            int(DistanceMetric.COSINE), K,
        )
        true_i[s : s + 512] = np.asarray(ti)
    del bj
    print(f"ground truth {time.time()-t0:.1f}s", flush=True)


def recall_of(results):
    hits = 0
    for b in range(NQ):
        want = set((true_i[b] + 1).tolist())
        got = {r[0] for r in results[b]}
        hits += len(want & got)
    return hits / true_i.size


def s4_hnsw_sweep():
    curve = []
    for ef in (8, 10, 12, 16, 24, 32):
        sp = SearchParams(top_k=K, ef_search=ef)
        hidx.search_batch(queries, sp)  # warm shape+ef
        t0 = time.time()
        outs = hidx.search_batch_pipelined([queries] * PASSES, sp, depth=3)
        per = (time.time() - t0) / PASSES
        rec = recall_of(outs[-1])
        curve.append({"ef": ef, "recall_at_10": round(rec, 4),
                      "qps": round(NQ / per, 1)})
        print(f"hnsw ef={ef}: {NQ/per:.0f} QPS recall@10={rec:.4f}",
              flush=True)
    result["hnsw_curve"] = curve
    # headline = best gated point
    gated = [c for c in curve if c["recall_at_10"] >= 0.95]
    if gated:
        best = max(gated, key=lambda c: c["qps"])
        result["hnsw_qps"] = best["qps"]
        result["hnsw_recall_at_10"] = best["recall_at_10"]
        result["hnsw_ef"] = best["ef"]


def s4b_entry_modes():
    """Round-5 VERDICT item 1 at scale: descent serving (graph-only
    routing — mid-layer entry + beam descent, no pivot table) vs the
    pivot default, on the SAME graph in one process. Gate at 8M:
    descent recall@10 >= 0.95 at >= 50% of pivot QPS."""
    ef = result.get("hnsw_ef", 16)
    modes = [
        ("descent_greedy_mid", {"SCNT_SEARCH_ENTRY": "descent",
                                "SCNT_SEARCH_EF_UPPER": "1",
                                "SCNT_DESCENT_MID": "1",
                                "SCNT_SEARCH_SUBBATCH": "1024"}),
        ("descent_beam4_mid", {"SCNT_SEARCH_ENTRY": "descent",
                               "SCNT_SEARCH_EF_UPPER": "4",
                               "SCNT_DESCENT_MID": "1",
                               "SCNT_SEARCH_SUBBATCH": "1024"}),
        ("descent_beam4_walk", {"SCNT_SEARCH_ENTRY": "descent",
                                "SCNT_SEARCH_EF_UPPER": "4",
                                "SCNT_DESCENT_MID": "0",
                                "SCNT_SEARCH_SUBBATCH": "1024"}),
        # hedge at 8M: enter one layer lower (l*=2, ~31k members — one
        # [B, 32k] MXU pass, still graph-membership routing) so only the
        # layer-1 edges are walked
        ("descent_beam4_mid_cap32k", {"SCNT_SEARCH_ENTRY": "descent",
                                      "SCNT_SEARCH_EF_UPPER": "4",
                                      "SCNT_DESCENT_MID": "1",
                                      "SCNT_DESCENT_MID_CAP": "32768",
                                      "SCNT_SEARCH_SUBBATCH": "1024"}),
    ]
    rows = []
    for label, env in modes:
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            sp = SearchParams(top_k=K, ef_search=ef)
            hidx.search_batch(queries, sp)  # warm under this env
            t0 = time.time()
            outs = hidx.search_batch_pipelined([queries] * 3, sp, depth=3)
            per = (time.time() - t0) / 3
            rec = recall_of(outs[-1])
            rows.append({"mode": label, "ef": ef,
                         "recall_at_10": round(rec, 4),
                         "qps": round(NQ / per, 1)})
            print(f"{label} ef={ef}: recall={rec:.4f} {NQ/per:.0f} QPS",
                  flush=True)
        finally:
            for k, v in saved.items():
                os.environ.pop(k, None) if v is None else os.environ.update(
                    {k: v}
                )
        result["entry_modes"] = rows
        flush()


def s5_flat_serving():
    knobs = {"SCNT_QUERY_F16": "1", "SCNT_SCAN_TPS": "4"}
    saved = {k: os.environ.get(k) for k in knobs}
    os.environ.update(knobs)
    try:
        sp = SearchParams(top_k=K)
        flat.search_batch(queries, sp)  # warm
        t0 = time.time()
        outs = flat.search_batch_pipelined([queries] * PASSES, sp, depth=3)
        per = (time.time() - t0) / PASSES
        rec = recall_of(outs[-1])
        result["flat_qps"] = round(NQ / per, 1)
        result["flat_recall_at_10"] = round(rec, 4)
        result["flat_knobs"] = {**knobs, "depth": 3}
        result["flat_achieved_tops"] = round(
            (NQ / per) * N * DIM * 2 / 1e12, 2
        )
        print(f"flat: {NQ/per:.0f} QPS recall@10={rec:.4f} "
              f"({result['flat_achieved_tops']} TOPS e2e)", flush=True)
    finally:
        for k, v in saved.items():
            os.environ.pop(k, None) if v is None else os.environ.update(
                {k: v}
            )


def s6_latency(which=("hnsw", "flat")):
    ef = result.get("hnsw_ef", 12)
    for name, idx, sp in (
        ("hnsw", hidx, SearchParams(top_k=K, ef_search=ef)),
        ("flat", flat, SearchParams(top_k=K)),
    ):
        if name not in which:
            continue
        for b in (1, 32):
            idx.search_batch(queries[:b], sp)  # warm this shape
            ts = []
            for i in range(20):
                s = (b * i) % max(NQ - b + 1, 1)
                q = queries[s : s + b]
                t0 = time.perf_counter()
                idx.search_batch(q, sp)
                ts.append(time.perf_counter() - t0)
            p50 = sorted(ts)[len(ts) // 2] * 1000
            result[f"{name}_p50_ms_b{b}"] = round(p50, 2)
            print(f"{name} b={b}: p50 {p50:.1f}ms", flush=True)


def s7_append():
    sp = SearchParams(top_k=K, ef_search=16)
    trials = []
    next_id = N + 1
    for trial in range(3):
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
        res = hidx.search_batch(new[:256], sp)
        hits = sum(
            1 for want, row in zip(ids[:256], res)
            if any(got == want for got, _ in row)
        )
        trials.append({"seconds": round(dt, 1),
                       "vecs_per_s": round(4096 / dt, 1),
                       "self_recall_256": hits})
        print(f"append trial {trial}: {dt:.1f}s ({4096/dt:.0f} vec/s) "
              f"self-recall {hits}/256", flush=True)
    result["append_trials"] = trials


ALL = ("hnsw", "flat", "append")
if N < 6_000_000:
    guard("0. prewarm", s0_prewarm, tags=ALL)
    guard("1. hnsw build", s1_build_hnsw, tags=("hnsw", "append"))
    guard("2. flat build", s2_build_flat, tags=("flat",))
    guard("3. ground truth", s3_ground_truth, tags=("hnsw", "flat"))
    guard("4. hnsw ef sweep", s4_hnsw_sweep, tags=("hnsw",))
    guard("4b. entry modes", s4b_entry_modes, tags=("hnsw", "entry"))
    guard("5. flat serving", s5_flat_serving, tags=("flat",))
    guard("6. latency", s6_latency, tags=("hnsw", "flat"))
    guard("7. append", s7_append, tags=("append",))
else:
    # HBM-safe order at 8M: flat (f32+int8 ~5 GB) and HNSW (~7 GB) don't
    # fit together with the ground-truth upload on one 16 GB chip, so the
    # flat half runs first and is freed before the graph is built.
    guard("0. prewarm", s0_prewarm, tags=ALL)
    guard("2. flat build", s2_build_flat, tags=("flat",))
    guard("3. ground truth", s3_ground_truth, tags=("hnsw", "flat"))
    guard("5. flat serving", s5_flat_serving, tags=("flat",))
    guard("6a. flat latency", lambda: s6_latency(("flat",)), tags=("flat",))
    if not SECTIONS or "flat" in SECTIONS:
        print("freeing flat device state before the graph build", flush=True)
        flat._dev = {}  # drop device corpus buffers
        flat._dev_version = -1
        import gc

        gc.collect()
    guard("1. hnsw build", s1_build_hnsw, tags=("hnsw", "append"))
    guard("4. hnsw ef sweep", s4_hnsw_sweep, tags=("hnsw",))
    guard("4b. entry modes", s4b_entry_modes, tags=("hnsw", "entry"))
    guard("6b. hnsw latency", lambda: s6_latency(("hnsw",)),
          tags=("hnsw",))
    guard("7. append", s7_append, tags=("append",))

result["finished"] = time.strftime("%Y-%m-%dT%H:%M:%S")
if "hnsw_qps" in result and "flat_qps" in result:
    result["crossover"] = bool(result["hnsw_qps"] > result["flat_qps"])
flush()
print(f"\nr4 4M leg DONE -> {OUT}", flush=True)
