"""Real-socket batched-search throughput (VERDICT r3 item 6).

Measures the full client->gRPC->engine->response path on a real TCP
socket, comparing:

  1. legacy Search (reference-compatible, repeated float + per-hit
     messages), b=1 and b=64-via-sequential-RPCs
  2. BatchSearch (packed bytes payloads), B in {256, 1024, 4096},
     sequential and with `--inflight` concurrent requests

The server runs in a SUBPROCESS (it owns the TPU when --device is on;
proto work and engine dispatch live on its core), the client in this
process. On this 1-core box client+server share the core — that is the
honest single-box number; the engine-only rate is bench.py's.

Usage:
  python scripts/bench_grpc_batch.py --n 100000 --cpu        # CPU smoke
  python scripts/bench_grpc_batch.py --n 1000000             # TPU run
  (internal) --serve: run the server child
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PASSWORD = "benchpw"
DIM = 128


def make_corpus(n, nq=4096, seed=42):
    rng = np.random.default_rng(seed)
    n_clusters = max(1000 * n // 100_000, 100)
    centers = rng.standard_normal((n_clusters, DIM)).astype(np.float32) * 2.0
    assign = rng.integers(0, n_clusters, n)
    base = (centers[assign] + 0.4 * rng.standard_normal((n, DIM))).astype(
        np.float32
    )
    qi = rng.integers(0, n, nq)
    queries = (base[qi] + 0.2 * rng.standard_normal((nq, DIM))).astype(
        np.float32
    )
    return base, queries


def serve(args):
    """Child: build the corpus in-process, then serve gRPC until killed."""
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from scintirete_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from scintirete_tpu.config import Config
    from scintirete_tpu.server.grpc_server import GrpcServer
    from scintirete_tpu.server.service import ScintireteService
    from scintirete_tpu.proto import scintirete_pb2 as pb

    cfg = Config()
    cfg.server.passwords = [PASSWORD]
    cfg.persistence.data_dir = args.data_dir
    svc = ScintireteService(cfg, use_device=not args.cpu)
    svc.start()
    auth = pb.AuthInfo(password=PASSWORD)
    svc.CreateDatabase(pb.CreateDatabaseRequest(auth=auth, name="bench"))
    print("SERVE engine up", flush=True)
    svc.CreateCollection(
        pb.CreateCollectionRequest(
            auth=auth, db_name="bench", collection_name="c",
            metric_type=pb.COSINE, index_type=args.index,
        )
    )
    base, queries = make_corpus(args.n)
    col = svc.engine.get_database("bench").get_collection("c")
    t0 = time.time()
    for s in range(0, args.n, 65536):
        chunk = base[s : s + 65536]
        col.insert([(row, None) for row in chunk])
    print(f"SERVE built {args.n} in {time.time()-t0:.1f}s", flush=True)
    # warm the serving shapes so the client measures steady state
    from scintirete_tpu.types import SearchParams

    for b in (1, 256, 1024, 4096):
        col.search_batch_arrays(queries[:b], SearchParams(top_k=10))
    server = GrpcServer(svc, port=args.port, max_workers=128)
    server.start()
    print(f"READY {server.port}", flush=True)
    threading.Event().wait()  # until killed


def bench_client(args, port):
    import grpc

    from scintirete_tpu.proto import scintirete_pb2 as pb
    from scintirete_tpu.server.grpc_server import GrpcClient

    _, queries = make_corpus(args.n)
    client = GrpcClient(f"127.0.0.1:{port}", timeout=args.timeout)
    auth = pb.AuthInfo(password=PASSWORD)
    out = {"n": args.n, "index": args.index, "dim": DIM,
           "device": not args.cpu}

    # legacy Search, b=1 (the latency envelope)
    def legacy(i):
        return client.Search(
            pb.SearchRequest(
                auth=auth, db_name="bench", collection_name="c",
                query_vector=queries[i % len(queries)].tolist(), top_k=10,
            )
        )

    legacy(0)  # warm
    ts = []
    for i in range(30):
        t0 = time.perf_counter()
        legacy(i)
        ts.append(time.perf_counter() - t0)
    out["legacy_search_p50_ms_b1"] = round(
        sorted(ts)[len(ts) // 2] * 1000, 2
    )
    # legacy Search, sequential stream (per-RPC proto wall)
    t0 = time.perf_counter()
    n_seq = max(min(args.work // 200, 100), 20)
    for i in range(n_seq):
        legacy(i)
    out["legacy_search_qps_seq"] = round(
        n_seq / (time.perf_counter() - t0), 1
    )

    # legacy Search under CONCURRENCY (VERDICT r4 item 5): N independent
    # b=1 clients — the server's SearchBatcher coalesces their in-flight
    # RPCs into shared device launches. A migrated Go client fleet gets
    # THIS number, not the sequential one.
    for n_clients in (16, args.legacy_clients):
        n_per = max(args.work // (n_clients * 8), 8)
        errs: list = []
        lats: list = []
        lock = threading.Lock()

        def lworker(w):
            try:
                my = []
                for i in range(n_per):
                    t1 = time.perf_counter()
                    legacy(w * n_per + i)
                    my.append(time.perf_counter() - t1)
                with lock:
                    lats.extend(my)
            except Exception as exc:  # pragma: no cover
                errs.append(exc)

        threads = [
            threading.Thread(target=lworker, args=(w,))
            for w in range(n_clients)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        if errs:
            raise errs[0]
        lats.sort()
        row = {
            "clients": n_clients,
            "qps": round(len(lats) / wall, 1),
            "p50_ms": round(lats[len(lats) // 2] * 1000, 1),
            "p99_ms": round(lats[int(len(lats) * 0.99)] * 1000, 1),
        }
        out.setdefault("legacy_concurrent", []).append(row)
        print(f"legacy concurrent: {row}", flush=True)

    def batch_req(i, b, f16):
        q = queries[(i * b) % max(len(queries) - b, 1) :][:b]
        payload = (q.astype(np.float16) if f16 else q).tobytes()
        return pb.BatchSearchRequest(
            auth=auth, db_name="bench", collection_name="c",
            queries_packed=payload, num_queries=b, dim=DIM, top_k=10,
            dtype="f16" if f16 else "f32",
        )

    def bench_config(b, f16):
        client.BatchSearch(batch_req(0, b, f16))  # warm
        # sequential
        n_iter = max(args.work // b, 4)
        t0 = time.perf_counter()
        for i in range(n_iter):
            client.BatchSearch(batch_req(i, b, f16))
        seq_qps = n_iter * b / (time.perf_counter() - t0)
        # concurrent in-flight (a loaded server pipelines)
        infl = args.inflight
        errs = []
        lock = threading.Lock()
        cnt = [0]

        def worker(w):
            try:
                for i in range(n_iter):
                    client.BatchSearch(batch_req(w * n_iter + i, b, f16))
                    with lock:
                        cnt[0] += 1
            except Exception as exc:  # pragma: no cover
                errs.append(exc)

        t0 = time.perf_counter()
        threads = [
            threading.Thread(target=worker, args=(w,))
            for w in range(infl)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        conc_qps = cnt[0] * b / (time.perf_counter() - t0)
        if errs:
            raise errs[0]
        return {"batch": b, "dtype": "f16" if f16 else "f32",
                "seq_qps": round(seq_qps, 1),
                f"qps_inflight{infl}": round(conc_qps, 1)}

    results = []
    for b in (256, 1024, 4096):
        if b > len(queries):
            continue
        for f16 in (False, True):
            try:
                row = bench_config(b, f16)
            except Exception as exc:
                # a config that can't finish inside the deadline (slow CPU
                # smoke boxes) shouldn't void the configs that already ran
                row = {"batch": b, "dtype": "f16" if f16 else "f32",
                       "error": repr(exc)}
            results.append(row)
            print(row, flush=True)
    out["batch_search"] = [r for r in results if "error" not in r]
    out["errors"] = [r for r in results if "error" in r]
    ok = out["batch_search"]
    out["best_qps"] = max(
        max(r["seq_qps"], r[f"qps_inflight{args.inflight}"]) for r in ok
    ) if ok else 0.0
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--index", default="flat", choices=["flat", "hnsw"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--inflight", type=int, default=4)
    ap.add_argument("--legacy-clients", type=int, default=64)
    ap.add_argument("--work", type=int, default=20480,
                    help="queries per measured config (sets iteration count)")
    ap.add_argument("--timeout", type=int, default=300,
                    help="per-RPC client deadline (seconds)")
    ap.add_argument("--serve", action="store_true")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.serve:
        serve(args)
        return

    if args.data_dir is None:
        # fresh dir every run: a stale AOF would replay last run's state
        # into the child and break CreateDatabase
        import tempfile

        args.data_dir = tempfile.mkdtemp(prefix="bench_grpc_")
    os.makedirs(args.data_dir, exist_ok=True)
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--serve",
         "--n", str(args.n), "--index", args.index,
         "--data-dir", args.data_dir, "--port", str(args.port)]
        + (["--cpu"] if args.cpu else []),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    port = None
    try:
        deadline = time.time() + 3600
        for line in child.stdout:
            print(f"[server] {line}", end="", file=sys.stderr, flush=True)
            if line.startswith("READY"):
                port = int(line.split()[1])
                break
            if time.time() > deadline or child.poll() is not None:
                raise RuntimeError("server failed to start")
        # drain server stdout in the background so it never blocks
        threading.Thread(
            target=lambda: [None for _ in child.stdout], daemon=True
        ).start()
        out = bench_client(args, port)
        print(json.dumps(out, indent=1))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(out, f, indent=1)
                f.write("\n")
    finally:
        child.terminate()
        try:
            child.wait(timeout=10)
        except subprocess.TimeoutExpired:
            child.kill()


if __name__ == "__main__":
    main()
