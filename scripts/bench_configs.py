"""BASELINE.json config-matrix benchmarks -> benchmarks/configs_round2.json.

Covers the driver's non-headline configs on the real TPU:
  A) L2 / inner-product metrics at 100k: HNSW + exact flat rerank baseline
  B) GloVe-100d-like 1M ef-sweep (recall@10 / QPS curve)
  C) delete + tombstone compaction timing and post-compact recall
  D) snapshot save/load of a 1M engine collection (RDB restore, no rebuild)

Usage: python scripts/bench_configs.py [A B C D]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (dataset generator + recall helpers)

K = 10


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_hnsw(n, dim, base, metric, ef_default=16):
    from scintirete_tpu.index import HNSWIndex
    from scintirete_tpu.types import HNSWParams

    idx = HNSWIndex(
        dim=dim,
        params=HNSWParams(
            m=16, ef_construction=200, ef_search=ef_default, seed=42,
            neighbor_heuristic=True,
        ),
        metric=metric,
        use_device=True,
        search_batch_size=256,
    )
    t0 = time.time()
    idx.bulk_insert(list(range(1, n + 1)), base)
    return idx, time.time() - t0


def timed_search(idx, queries, params, passes=3):
    idx.search_batch(queries, params)  # warm
    ts = []
    for _ in range(passes):
        t0 = time.time()
        results = idx.search_batch(queries, params)
        ts.append(time.time() - t0)
    return results, len(queries) / min(ts)


def config_a(out, rng):
    """L2 / IP at 100k: HNSW + flat exact."""
    from scintirete_tpu.index.flat import FlatIndex
    from scintirete_tpu.types import DistanceMetric, SearchParams

    n, dim = 100_000, 128
    base, queries = bench.make_dataset(rng, n, 2048)
    for metric in (DistanceMetric.L2, DistanceMetric.INNER_PRODUCT):
        name = metric.name.lower()
        true_i = bench.ground_truth(queries, base, int(metric), K)
        idx, build_s = build_hnsw(n, dim, base, metric)
        params = SearchParams(top_k=K, ef_search=16)
        results, qps = timed_search(idx, queries, params)
        recall = bench.recall_of(results, true_i)
        flat = FlatIndex(dim=dim, metric=metric, use_device=True)
        flat.bulk_insert(list(range(1, n + 1)), base)
        fresults, fqps = timed_search(flat, queries, params)
        frecall = bench.recall_of(fresults, true_i)
        out[f"100k_{name}"] = {
            "hnsw_build_s": round(build_s, 1),
            "hnsw_qps_ef16": round(qps, 1),
            "hnsw_recall": round(recall, 4),
            "flat_qps": round(fqps, 1),
            "flat_recall": round(frecall, 4),
        }
        log(f"A {name}: build {build_s:.0f}s hnsw {qps:.0f} QPS @ {recall:.4f}"
            f" | flat {fqps:.0f} @ {frecall:.4f}")
        del idx, flat


def config_b(out, rng):
    """GloVe-100d-like: 1M x 100d cosine ef sweep."""
    from scintirete_tpu.types import DistanceMetric, SearchParams

    n, dim = 1_000_000, 100
    old_dim = bench.DIM
    bench.DIM = dim
    try:
        base, queries = bench.make_dataset(rng, n, 2048)
    finally:
        bench.DIM = old_dim
    true_i = bench.ground_truth(queries, base, int(DistanceMetric.COSINE), K)
    idx, build_s = build_hnsw(n, dim, base, DistanceMetric.COSINE)
    curve = []
    for ef in (12, 16, 24, 32, 48):
        results, qps = timed_search(
            idx, queries, SearchParams(top_k=K, ef_search=ef)
        )
        recall = bench.recall_of(results, true_i)
        curve.append({"ef": ef, "qps": round(qps, 1),
                      "recall": round(recall, 4)})
        log(f"B glove-like ef={ef}: {qps:.0f} QPS @ {recall:.4f}")
    # the 100-d workload's knee sits BELOW the 0.95 gate at the 128-d
    # serving ef (VERDICT r3 item 8): report the gated operating point
    # explicitly so this can't lurk — operators serve 100-d at gated_ef
    gated = [c for c in curve if c["recall"] >= bench.RECALL_GATE]
    head = max(gated, key=lambda c: c["qps"]) if gated else None
    out["glove100d_like_1m"] = {
        "build_s": round(build_s, 1),
        "build_vecs_per_s": round(n / build_s, 1),
        "curve": curve,
        "recall_gate": bench.RECALL_GATE,
        "gated_qps": head["qps"] if head else None,
        "gated_ef": head["ef"] if head else None,
        "gated_recall": head["recall"] if head else None,
    }
    del idx


def config_c(out, rng):
    """Delete 10% + compact on a 100k engine collection."""
    from scintirete_tpu.engine import Engine
    from scintirete_tpu.types import (
        CollectionConfig,
        DistanceMetric,
        HNSWParams,
        SearchParams,
    )

    n, dim = 100_000, 128
    base, queries = bench.make_dataset(rng, n, 2048)
    eng = Engine(use_device=True)
    col = eng.create_database("c").create_collection(
        CollectionConfig(
            name="c", metric=DistanceMetric.COSINE,
            hnsw=HNSWParams(m=16, ef_construction=200, ef_search=16, seed=42,
                            neighbor_heuristic=True),
        )
    )
    col.insert([(v, None) for v in base])  # ids 1..n
    params = SearchParams(top_k=K, ef_search=16)

    def timed(passes=3):
        col.search_batch(queries, params)
        ts = []
        for _ in range(passes):
            t0 = time.time()
            results = col.search_batch(queries, params)
            ts.append(time.time() - t0)
        return results, len(queries) / min(ts)

    victims = rng.choice(np.arange(1, n + 1), n // 10, replace=False)
    t0 = time.time()
    deleted = col.delete([int(v) for v in victims])
    delete_s = time.time() - t0
    assert deleted == len(victims), deleted
    live = np.setdiff1d(np.arange(n), victims - 1)
    true_i = bench.ground_truth(
        queries, base[live], int(DistanceMetric.COSINE), K
    )

    def recall(results):
        hits = 0
        for b in range(len(queries)):
            want = {int(live[j]) + 1 for j in true_i[b]}
            hits += len(want & {r.id for r in results[b]})
        return hits / true_i.size

    results, qps = timed()
    recall_after_delete = recall(results)
    t0 = time.time()
    purged = col.compact()
    compact_s = time.time() - t0
    results, qps2 = timed()
    recall_after_compact = recall(results)
    out["delete_compact_100k"] = {
        "delete_10pct_s": round(delete_s, 2),
        "purged": int(purged),
        "recall_after_delete": round(recall_after_delete, 4),
        "search_qps_with_tombstones": round(qps, 1),
        "compact_s": round(compact_s, 1),
        "recall_after_compact": round(recall_after_compact, 4),
        "search_qps_after_compact": round(qps2, 1),
    }
    log(f"C: delete {delete_s:.1f}s, compact {compact_s:.0f}s, "
        f"recall {recall_after_delete:.4f} -> {recall_after_compact:.4f}")


def config_d(out, rng):
    """1M engine collection snapshot save + recover (no rebuild)."""
    from scintirete_tpu.engine import Engine
    from scintirete_tpu.persistence import PersistenceManager
    from scintirete_tpu.types import (
        CollectionConfig,
        DistanceMetric,
        HNSWParams,
        SearchParams,
    )

    n, dim = 1_000_000, 128
    base, queries = bench.make_dataset(rng, n, 256)
    eng = Engine(use_device=True)
    db = eng.create_database("d")
    col = db.create_collection(
        CollectionConfig(
            name="c", metric=DistanceMetric.COSINE,
            hnsw=HNSWParams(m=16, ef_construction=200, ef_search=16, seed=42,
                            neighbor_heuristic=True),
        )
    )
    t0 = time.time()
    col.insert([(v, None) for v in base])
    build_s = time.time() - t0
    tmp = tempfile.mkdtemp(prefix="scnt-bench-rdb-")
    mgr = PersistenceManager(eng, tmp)
    t0 = time.time()
    mgr.save_snapshot()
    save_s = time.time() - t0
    rdb_path = os.path.join(tmp, "vector.rdb")
    size_gb = os.path.getsize(rdb_path) / 1e9

    eng2 = Engine(use_device=True)
    mgr2 = PersistenceManager(eng2, tmp)
    t0 = time.time()
    mgr2.recover()
    load_s = time.time() - t0
    col2 = eng2.get_database("d").get_collection("c")
    res = col2.search_batch(queries[:64], SearchParams(top_k=1))
    ok = sum(1 for r in res if r) == 64
    out["snapshot_1m"] = {
        "engine_build_s": round(build_s, 1),
        "save_s": round(save_s, 1),
        "rdb_gb": round(size_gb, 2),
        "load_s": round(load_s, 1),
        "restored_searchable": ok,
    }
    log(f"D: save {save_s:.1f}s ({size_gb:.2f} GB), load {load_s:.1f}s, "
        f"searchable={ok}")
    mgr.stop()
    mgr2.stop()


def main():
    from scintirete_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    which = set(sys.argv[1:]) or {"A", "B", "C", "D"}
    rng = np.random.default_rng(42)
    out = {}
    path = "benchmarks/configs_round2.json"
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    for key, fn in (("A", config_a), ("B", config_b), ("C", config_c),
                    ("D", config_d)):
        if key in which:
            fn(out, rng)
            with open(path, "w") as f:
                json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
