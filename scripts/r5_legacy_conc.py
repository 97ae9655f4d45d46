"""Diagnose the legacy-Search concurrency wall (VERDICT r4 item 5).

The round-5 socket run measured 244.8 QPS at 64 concurrent b=1 legacy
clients (gate: >=1,000) while the raw grpc echo floor on this box is
~2.7k RPC/s and the in-process handler costs 0.35 ms — so the wall is
between the handler and the device. This runs the service IN PROCESS
(no sockets) with N threads looping svc.Search, and prints the
batcher's wave log (width x wall per coalesced device launch): whether
waves are too narrow (coalescing failure) or too slow (device round
trip not pipelined) decides the fix.

Usage: python scripts/r5_legacy_conc.py [--n 1000000] [--cpu]
Writes benchmarks/legacy_conc_diag.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=1_000_000)
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--seconds", type=float, default=20.0)
args = ap.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

from scintirete_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import tempfile  # noqa: E402

from scintirete_tpu.config import Config  # noqa: E402
from scintirete_tpu.proto import scintirete_pb2 as pb  # noqa: E402
from scintirete_tpu.server.service import ScintireteService  # noqa: E402

cfg = Config()
cfg.server.passwords = ["pw"]
cfg.persistence.data_dir = tempfile.mkdtemp(prefix="legacy_conc_")
svc = ScintireteService(cfg, use_device=not args.cpu)
svc.start()
auth = pb.AuthInfo(password="pw")
svc.CreateDatabase(pb.CreateDatabaseRequest(auth=auth, name="d"))
svc.CreateCollection(
    pb.CreateCollectionRequest(
        auth=auth, db_name="d", collection_name="c",
        metric_type=pb.COSINE, index_type="flat",
    )
)

rng = np.random.default_rng(42)
DIM = 128
n_clusters = max(1000 * args.n // 100_000, 100)
centers = rng.standard_normal((n_clusters, DIM)).astype(np.float32) * 2.0
assign = rng.integers(0, n_clusters, args.n)
base = np.empty((args.n, DIM), np.float32)
for s in range(0, args.n, 500_000):
    e = min(s + 500_000, args.n)
    base[s:e] = centers[assign[s:e]] + 0.4 * rng.standard_normal(
        (e - s, DIM)
    ).astype(np.float32)
queries = (base[rng.integers(0, args.n, 4096)]
           + 0.2 * rng.standard_normal((4096, DIM))).astype(np.float32)

col = svc.engine.get_database("d").get_collection("c")
t0 = time.time()
for s in range(0, args.n, 262144):
    col.insert([(row, None) for row in base[s : s + 262144]])
print(f"built {args.n} in {time.time()-t0:.1f}s", flush=True)

from scintirete_tpu.types import SearchParams  # noqa: E402

t0 = time.time()
for b in (1, 8, 16, 32, 64, 128):
    col.search_batch_arrays(queries[:b], SearchParams(top_k=10))
print(f"warmed pow2 widths in {time.time()-t0:.1f}s", flush=True)

out = {"n": args.n, "device": not args.cpu, "rows": []}

for n_threads in (16, 64):
    svc.batcher.wave_log.clear()
    stop = [False]
    counts = [0] * n_threads
    lats: list = []
    llock = threading.Lock()

    def worker(w):
        my = []
        i = w * 53
        while not stop[0]:
            req = pb.SearchRequest(
                auth=auth, db_name="d", collection_name="c",
                query_vector=queries[i % 4096].tolist(), top_k=10,
            )
            t1 = time.perf_counter()
            svc.Search(req)
            my.append(time.perf_counter() - t1)
            counts[w] += 1
            i += 1
        with llock:
            lats.extend(my)

    threads = [
        threading.Thread(target=worker, args=(w,)) for w in range(n_threads)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(args.seconds)
    stop[0] = True
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    waves = list(svc.batcher.wave_log)
    widths = [w for w, _ in waves]
    walls = [s for _, s in waves]
    lats.sort()
    row = {
        "threads": n_threads,
        "qps": round(sum(counts) / wall, 1),
        "p50_ms": round(lats[len(lats) // 2] * 1000, 1) if lats else None,
        "p99_ms": round(lats[int(len(lats) * 0.99)] * 1000, 1)
        if lats else None,
        "waves": len(waves),
        "wave_width_mean": round(float(np.mean(widths)), 1) if widths else 0,
        "wave_width_p90": int(np.percentile(widths, 90)) if widths else 0,
        "wave_wall_ms_mean": round(float(np.mean(walls)) * 1000, 1)
        if walls else 0,
        "wave_wall_ms_p90": round(
            float(np.percentile(walls, 90)) * 1000, 1
        ) if walls else 0,
    }
    out["rows"].append(row)
    print(row, flush=True)

with open(os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                       "legacy_conc_diag.json"), "w") as f:
    json.dump(out, f, indent=1)
    f.write("\n")
print("DONE", flush=True)
