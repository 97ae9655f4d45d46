"""End-to-end serving benchmark: concurrent gRPC clients against a real
socket, TPU-backed collection, SearchBatcher coalescing.

Measures what a client actually sees — protobuf + socket + auth + batcher
+ device dispatch — unlike bench.py's library-level numbers. Prints one
JSON line: sustained QPS and latency percentiles.

Usage:
    python scripts/bench_serving.py            # 100k vectors, 32 clients
    SERVING_N=1000000 SERVING_CLIENTS=64 python scripts/bench_serving.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

N = int(os.environ.get("SERVING_N", 100_000))
DIM = 128
N_CLIENTS = int(os.environ.get("SERVING_CLIENTS", 32))
QUERIES_PER_CLIENT = int(os.environ.get("SERVING_QPC", 200))
TOP_K = 10


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from scintirete_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from scintirete_tpu.config import load_config
    from scintirete_tpu.proto import scintirete_pb2 as pb
    from scintirete_tpu.server.grpc_server import GrpcClient, GrpcServer
    from scintirete_tpu.server.service import ScintireteService

    cfg = load_config(None)
    cfg.server.passwords = ["bench"]
    tmp = tempfile.mkdtemp(prefix="scnt-serving-")
    cfg.persistence.data_dir = tmp

    service = ScintireteService(cfg, use_device=True)
    server = GrpcServer(service, host="127.0.0.1", port=0)
    server.start()
    addr = f"127.0.0.1:{server.port}"
    log(f"server on {addr}")

    auth = pb.AuthInfo(password="bench")
    client = GrpcClient(addr)
    client.call(
        "CreateDatabase", pb.CreateDatabaseRequest(auth=auth, name="db")
    )
    client.call(
        "CreateCollection",
        pb.CreateCollectionRequest(
            auth=auth, db_name="db", collection_name="col",
            metric_type=pb.COSINE,
        ),
    )

    rng = np.random.default_rng(42)
    n_clusters = max(N // 100, 100)
    centers = rng.standard_normal((n_clusters, DIM)).astype(np.float32) * 2.0
    assign = rng.integers(0, n_clusters, N)
    base = (centers[assign] + 0.4 * rng.standard_normal((N, DIM))).astype(
        np.float32
    )

    # bulk load straight through the engine (the wire path would spend
    # minutes JSON-encoding 100k vectors; load isn't what we measure)
    col = service.engine.get_database("db").get_collection("col")
    t0 = time.time()
    col.insert([(v, None) for v in base])
    log(f"loaded {N} vectors in {time.time() - t0:.1f}s")

    queries = (
        base[rng.integers(0, N, N_CLIENTS * QUERIES_PER_CLIENT)]
        + 0.2 * rng.standard_normal((N_CLIENTS * QUERIES_PER_CLIENT, DIM))
    ).astype(np.float32)

    # warm: compile the search kernel at the batcher's shapes
    warm = pb.SearchRequest(
        auth=auth, db_name="db", collection_name="col",
        query_vector=queries[0].tolist(), top_k=TOP_K,
    )
    client.call("Search", warm)

    latencies: list[float] = []
    errors: list[str] = []
    lat_mu = threading.Lock()
    barrier = threading.Barrier(N_CLIENTS + 1)

    def worker(wid: int):
        try:
            c = GrpcClient(addr)
            qs = queries[
                wid * QUERIES_PER_CLIENT : (wid + 1) * QUERIES_PER_CLIENT
            ]
            reqs = [
                pb.SearchRequest(
                    auth=auth, db_name="db", collection_name="col",
                    query_vector=q.tolist(), top_k=TOP_K,
                )
                for q in qs
            ]
            barrier.wait()
            mine = []
            for req in reqs:
                t0 = time.perf_counter()
                resp = c.call("Search", req)
                mine.append(time.perf_counter() - t0)
                if len(resp.results) != TOP_K:
                    raise RuntimeError(
                        f"got {len(resp.results)} results, want {TOP_K}"
                    )
            with lat_mu:
                latencies.extend(mine)
        except Exception as exc:  # a dead worker must fail the benchmark
            with lat_mu:
                errors.append(f"worker {wid}: {exc!r}")
            barrier.abort()
            raise

    threads = [
        threading.Thread(target=worker, args=(i,), daemon=True)
        for i in range(N_CLIENTS)
    ]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.time()
    for t in threads:
        t.join()
    wall = time.time() - t0

    total = N_CLIENTS * QUERIES_PER_CLIENT
    if errors or len(latencies) != total:
        log(f"FAILED: {len(latencies)}/{total} queries ok; errors: {errors[:5]}")
        server.stop()
        service.stop()
        sys.exit(1)
    lat = np.sort(np.asarray(latencies))
    out = {
        "metric": "serving_grpc_search_qps",
        "value": round(total / wall, 1),
        "unit": "qps",
        "detail": {
            "n_vectors": N,
            "clients": N_CLIENTS,
            "queries": total,
            "wall_seconds": round(wall, 2),
            "latency_ms": {
                "p50": round(float(lat[int(0.50 * len(lat))]) * 1000, 1),
                "p95": round(float(lat[int(0.95 * len(lat))]) * 1000, 1),
                "p99": round(float(lat[int(0.99 * len(lat))]) * 1000, 1),
            },
        },
    }
    print(json.dumps(out))
    server.stop()
    service.stop()


if __name__ == "__main__":
    main()
