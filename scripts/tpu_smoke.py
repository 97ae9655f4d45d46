"""One-command hardware validation on the real TPU.

The test suite runs on a virtual CPU mesh (conftest forces cpu), so the
Mosaic/TPU-only paths — fused lane scans, the pivot-entry kernel, int8
quantized first pass, sublane padding — are exercised only here. Run after
any kernel or mirror change before trusting TPU benchmarks:

    python scripts/tpu_smoke.py

Exits nonzero on any failure. ~2-4 minutes warm (compile cache populated),
longer on first run.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def check(name, ok, detail=""):
    status = "ok" if ok else "FAIL"
    print(f"[{status}] {name} {detail}", flush=True)
    if not ok:
        sys.exit(1)


def main():
    from scintirete_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    check("backend", jax.default_backend() == "tpu", str(jax.devices()))

    from scintirete_tpu.engine import Engine
    from scintirete_tpu.types import (
        CollectionConfig,
        DistanceMetric,
        HNSWParams,
        SearchParams,
    )

    rng = np.random.default_rng(7)

    # --- engine-level HNSW on TPU: insert, search, delete, single query ---
    eng = Engine(use_device=True)
    db = eng.create_database("smoke")
    col = db.create_collection(
        CollectionConfig(
            name="h",
            metric=DistanceMetric.COSINE,
            hnsw=HNSWParams(m=16, ef_construction=100, ef_search=16, seed=1),
        )
    )
    n, dim = 6000, 128
    base = rng.standard_normal((n, dim)).astype(np.float32)
    t0 = time.time()
    ids = col.insert([(v, None) for v in base])
    check("hnsw bulk insert", len(ids) == n, f"{n} in {time.time()-t0:.1f}s")

    res = col.search_batch(base[:64], SearchParams(top_k=5))
    hits = sum(1 for i, r in enumerate(res) if r and r[0].id == ids[i])
    check("hnsw self-search (batched, pivot+Pallas entry)", hits >= 62,
          f"{hits}/64")

    one = col.search(base[7], SearchParams(top_k=3))  # B=1 sublane padding
    check("hnsw single-query search", one[0].id == ids[7])

    col.delete([ids[7]])
    res = col.search(base[7], SearchParams(top_k=3))
    check("delete excluded from results", all(r.id != ids[7] for r in res))

    extra = rng.standard_normal((2500, dim)).astype(np.float32)
    t0 = time.time()
    ids2 = col.insert([(v, None) for v in extra])  # batched kNN append
    res = col.search_batch(extra[:32], SearchParams(top_k=3))
    hits = sum(1 for i, r in enumerate(res) if r and r[0].id == ids2[i])
    check("batched append self-search", hits >= 30,
          f"{hits}/32 in {time.time()-t0:.1f}s")

    # --- flat index on TPU: below/above the fused crossover ---
    from scintirete_tpu.index.flat import _FUSED_MIN_CAP, FlatIndex

    flat = FlatIndex(dim=dim, metric=DistanceMetric.COSINE, use_device=True)
    fn = _FUSED_MIN_CAP + 1024  # forces the fused int8 path
    fbase = rng.standard_normal((fn, dim)).astype(np.float32)
    t0 = time.time()
    flat.bulk_insert(list(range(1, fn + 1)), fbase)
    fres = flat.search_batch(fbase[:64], SearchParams(top_k=5))
    hits = sum(1 for i, r in enumerate(fres) if r and r[0][0] == i + 1)
    check("flat fused int8 self-search", hits == 64,
          f"{fn} vectors, {time.time()-t0:.1f}s incl. build")
    flat.delete(3)
    fres = flat.search_batch(fbase[2:3], SearchParams(top_k=5))
    check("flat fused delete mask", all(x[0] != 3 for x in fres[0]))

    small = FlatIndex(dim=dim, metric=DistanceMetric.L2, use_device=True)
    small.bulk_insert(list(range(1, 2001)), fbase[:2000])
    sres = small.search_batch(fbase[:32], SearchParams(top_k=3))
    hits = sum(1 for i, r in enumerate(sres) if r and r[0][0] == i + 1)
    check("flat bf16 two-pass (below crossover, L2)", hits == 32)

    # --- odd dimensions through the fused kernels ---
    for d_odd in (100, 384):
        f = FlatIndex(dim=d_odd, metric=DistanceMetric.COSINE,
                      use_device=True)
        ob = rng.standard_normal((_FUSED_MIN_CAP, d_odd)).astype(np.float32)
        f.bulk_insert(list(range(1, _FUSED_MIN_CAP + 1)), ob)
        r = f.search_batch(ob[:16], SearchParams(top_k=1))
        hits = sum(1 for i, row in enumerate(r) if row and row[0][0] == i + 1)
        check(f"fused scan at dim={d_odd}", hits == 16)

    # --- pipelined serving: depth-2 results match sequential on TPU ---
    want = flat.search_batch(fbase[:64], SearchParams(top_k=5))
    got = flat.search_batch_pipelined(
        [fbase[:64]] * 3, SearchParams(top_k=5), depth=2
    )
    check("flat pipelined == sequential", all(g == want for g in got))

    # --- f16 query upload: same top-1, distances within ~1e-3 ---
    import os as _os

    _os.environ["SCNT_QUERY_F16"] = "1"
    try:
        r16 = flat.search_batch(fbase[:64], SearchParams(top_k=5))
    finally:
        _os.environ.pop("SCNT_QUERY_F16", None)
    same_top = sum(1 for a, b in zip(r16, want) if a[0][0] == b[0][0])
    dev = max(
        abs(a[j][1] - b[j][1])
        for a, b in zip(r16, want)
        for j in range(min(len(a), len(b)))
    )
    check("f16 query upload", same_top >= 62 and dev < 5e-3,
          f"top1 {same_top}/64, max dist dev {dev:.2e}")

    print("TPU smoke: ALL OK", flush=True)


if __name__ == "__main__":
    main()
