"""Scale-shaped sharded-mesh gate (VERDICT r4 item 7).

The round-4 suite proved sharded correctness only at toy N; the growth
story (SURVEY §5 last bullet — capacity beyond one chip's HBM rides the
``shard`` mesh axis) needs a recall gate at a size where upper-layer
routing actually matters per shard.  This builds 65,536 vectors on the
8-device virtual CPU mesh (8 shards x 8,192 rows) through the real bulk
device path and gates merged-across-shards recall@10.

Config and gate are probe-measured (2026-08-20, this box): build ~790 s
on one CPU core, recall@10 0.9938 at ef=32 (0.9969 at ef=64) on a
256-cluster corpus.  The gate leaves margin below both.

This is deliberately the slowest test in the suite (~10-15 min on a
1-core box; the mesh is virtual so all 8 shard builds serialize onto one
core — a real pod runs them concurrently per chip).

Reference parity: sharding has no counterpart in the Go reference
(single-process, internal/core/algorithm/hnsw.go); this is the extension
SURVEY §5 prescribes for TPU pods.
"""

from __future__ import annotations

import numpy as np
import pytest

from scintirete_tpu.ops.distance import distance_np
from scintirete_tpu.parallel.sharded import ShardedHNSWIndex, make_default_mesh
from scintirete_tpu.types import DistanceMetric, HNSWParams, SearchParams

N, DIM, NQ, K = 65536, 16, 64, 10


@pytest.mark.slow
def test_sharded_64k_recall_gate():
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((256, DIM)).astype(np.float32) * 2.0
    assign = rng.integers(0, 256, N)
    vecs = (centers[assign]
            + 0.3 * rng.standard_normal((N, DIM))).astype(np.float32)

    mesh = make_default_mesh(8, dp=1)
    idx = ShardedHNSWIndex(
        dim=DIM,
        params=HNSWParams(m=8, ef_construction=100, ef_search=32, seed=3),
        metric=DistanceMetric.COSINE,
        mesh=mesh,
    )
    idx.bulk_insert(list(range(1, N + 1)), vecs)
    assert idx.size() == N

    queries = (centers[rng.integers(0, 256, NQ)]
               + 0.3 * rng.standard_normal((NQ, DIM))).astype(np.float32)
    want = distance_np(queries, vecs, DistanceMetric.COSINE)
    true_sets = [set((np.argsort(want[b])[:K] + 1).tolist())
                 for b in range(NQ)]

    res = idx.search_batch(queries, SearchParams(top_k=K, ef_search=32))
    hits = 0
    for b in range(NQ):
        got = [r[0] for r in res[b]]
        dists = [r[1] for r in res[b]]
        assert dists == sorted(dists), "merged results must stay sorted"
        hits += len(true_sets[b] & set(got))
    recall = hits / (NQ * K)
    assert recall >= 0.97, f"sharded 64k recall@10 {recall:.4f} < 0.97"
