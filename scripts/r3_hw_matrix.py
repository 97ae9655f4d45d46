"""Round-3 hardware experiment matrix — ONE process, run when the TPU is up.

Covers, in order (each section guarded; failures don't stop the rest):
  1. flat 1M build (int8 scan copy)
  2. serving A/B at B=16384: {seq, depth2, depth3} x {f32, f16 query
     upload} x {tps 1, 2, 4}   (tps = scan tiles per grid step)
  3. winner confirmation + default config at B=4096 (the bench shape)
  4. f16 distance-deviation check vs f32 at 1M
  5. HNSW 1M build + serving A/B {f32, f16} at B=4096/16384
  6. append-throughput trials on the built 1M graph (VERDICT r3 item 5)

Usage: python scripts/r3_hw_matrix.py [n]   (default 1M)
Writes human-readable lines to stdout; run it in the background with a
log file and kill by PID if needed.
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


def section(name):
    print(f"\n=== {name} === ({time.strftime('%H:%M:%S')})", flush=True)


def guard(fn):
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print("(section failed; continuing)", flush=True)


def env(key, val):
    if val is None:
        os.environ.pop(key, None)
    else:
        os.environ[key] = str(val)


def measure(idx, queries, label, depths=(0, 2, 3)):
    out = {}
    idx.search_batch(queries, params)  # warm this shape+config
    B = queries.shape[0]
    for depth in depths:
        if depth == 0:
            ts = []
            for _ in range(PASSES):
                t0 = time.time()
                idx.search_batch(queries, params)
                ts.append(time.time() - t0)
            best, avg = min(ts), sum(ts) / len(ts)
            out["seq"] = B / avg
            print(
                f"  {label} seq: best {best*1e3:.0f}ms avg {avg*1e3:.0f}ms"
                f" -> {B/avg:.0f} QPS", flush=True,
            )
        else:
            t0 = time.time()
            idx.search_batch_pipelined([queries] * PASSES, params,
                                       depth=depth)
            per = (time.time() - t0) / PASSES
            out[f"d{depth}"] = B / per
            print(
                f"  {label} depth{depth}: {per*1e3:.0f}ms/pass -> "
                f"{B/per:.0f} QPS", flush=True,
            )
    return out


flat = FlatIndex(dim=DIM, metric=DistanceMetric.COSINE, use_device=True,
                 search_batch_size=4096)


def s1_build():
    t0 = time.time()
    flat.bulk_insert(list(range(1, N + 1)), base)
    print(f"flat build {time.time()-t0:.1f}s", flush=True)


def s2_matrix():
    q16 = queries_of(16384)
    results = {}
    for f16 in (0, 1):
        env("SCNT_QUERY_F16", f16 or None)
        for tps in (1, 2, 4):
            env("SCNT_SCAN_TPS", tps if tps > 1 else None)
            label = f"f16={f16} tps={tps}"
            results[(f16, tps)] = measure(flat, q16, label, depths=(0, 2))
    env("SCNT_QUERY_F16", None)
    env("SCNT_SCAN_TPS", None)
    best = max(results.items(), key=lambda kv: max(kv[1].values()))
    print(f"BEST @16384: f16={best[0][0]} tps={best[0][1]} "
          f"{max(best[1].values()):.0f} QPS", flush=True)


def s3_bench_shape():
    q4 = queries_of(4096)
    measure(flat, q4, "default B=4096", depths=(0, 2, 3))
    env("SCNT_QUERY_F16", 1)
    env("SCNT_SCAN_TPS", 4)
    measure(flat, q4, "f16+tps4 B=4096", depths=(0, 2, 3))
    env("SCNT_QUERY_F16", None)
    env("SCNT_SCAN_TPS", None)


def s4_f16_deviation():
    q = queries_of(2048, seed=11)
    r32 = flat.search_batch(q, params)
    env("SCNT_QUERY_F16", 1)
    r16 = flat.search_batch(q, params)
    env("SCNT_QUERY_F16", None)
    same_top = sum(1 for a, b in zip(r16, r32) if a and b and a[0][0] == b[0][0])
    recall = sum(
        len({x[0] for x in a} & {x[0] for x in b}) for a, b in zip(r16, r32)
    ) / (len(q) * K)
    dev = max(
        (abs(a[j][1] - b[j][1])
         for a, b in zip(r16, r32) for j in range(min(len(a), len(b)))),
        default=0.0,
    )
    print(f"f16 vs f32 @1M: top1 {same_top}/{len(q)}, overlap@10 "
          f"{recall:.4f}, max dist dev {dev:.2e}", flush=True)


hidx = HNSWIndex(
    dim=DIM,
    params=HNSWParams(m=16, ef_construction=200, ef_search=16, seed=42,
                      neighbor_heuristic=True),
    metric=DistanceMetric.COSINE,
    use_device=True,
    search_batch_size=256,
)


def s5_hnsw():
    from scintirete_tpu.utils import prewarm

    t0 = time.time()
    prewarm.warm_build(N, DIM, int(DistanceMetric.COSINE), m=16,
                       heuristic=True)
    print(f"hnsw prewarm {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    hidx.bulk_insert(list(range(1, N + 1)), base)
    print(f"hnsw build {time.time()-t0:.1f}s", flush=True)
    hp = SearchParams(top_k=K, ef_search=16)
    for b in (4096, 16384):
        q = queries_of(b)
        for f16 in (0, 1):
            env("SCNT_QUERY_F16", f16 or None)
            for fuse in (0, 1):
                # fuse=1: lax.scan over sub-batches in ONE program — one
                # dispatch + one query upload per pass instead of B/256
                env("SCNT_FUSE_SUBBATCH", fuse or None)
                hidx.search_batch(q, hp)  # warm
                t0 = time.time()
                hidx.search_batch_pipelined([q] * PASSES, hp, depth=2)
                per = (time.time() - t0) / PASSES
                print(
                    f"  hnsw B={b} f16={f16} fuse={fuse} depth2: "
                    f"{per*1e3:.0f}ms/pass -> {b/per:.0f} QPS", flush=True,
                )
        env("SCNT_QUERY_F16", None)
        env("SCNT_FUSE_SUBBATCH", None)
    # bf16 device graph: halves the beam's gather bytes; returned
    # distances shift ~1e-3 relative (opt-in, like f16 upload). Forces a
    # full re-upload + bf16 kernel variants (fresh compiles) — last.
    q4 = queries_of(4096)
    r32 = hidx.search_batch(q4[:2048], hp)
    hidx.device_dtype = "bfloat16"
    hidx._device = None  # next search builds a bf16 mirror (full upload)
    t0 = time.time()
    hidx.search_batch(q4, hp)  # warm: upload + compiles
    print(f"  bf16 graph warm (upload+compiles) {time.time()-t0:.1f}s",
          flush=True)
    r16 = hidx.search_batch(q4[:2048], hp)
    overlap = sum(
        len({x[0] for x in a} & {x[0] for x in b})
        for a, b in zip(r16, r32)
    ) / (2048 * K)
    t0 = time.time()
    hidx.search_batch_pipelined([q4] * PASSES, hp, depth=2)
    per = (time.time() - t0) / PASSES
    print(f"  hnsw bf16-graph B=4096 depth2: {per*1e3:.0f}ms/pass -> "
          f"{4096/per:.0f} QPS, overlap@10 vs f32 {overlap:.4f}",
          flush=True)
    hidx.device_dtype = "float32"
    hidx._device = None


def s6_append():
    hp = SearchParams(top_k=K, ef_search=16)
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
        res = hidx.search_batch(new[:256], hp)
        hits = sum(
            1 for want, row in zip(ids[:256], res)
            if any(got == want for got, _ in row)
        )
        print(f"  append 4096 (trial {trial}): {dt:.1f}s "
              f"({4096/dt:.0f} vec/s), self-recall {hits}/256", flush=True)


section("1. flat build"); guard(s1_build)
section("2. serving matrix @16384"); guard(s2_matrix)
section("3. bench shape @4096"); guard(s3_bench_shape)
section("4. f16 deviation"); guard(s4_f16_deviation)
section("5. hnsw build + serving"); guard(s5_hnsw)
section("6. append"); guard(s6_append)
print("\nmatrix DONE", flush=True)
