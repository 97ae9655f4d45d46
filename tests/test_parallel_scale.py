"""Scale-shaped sharding evidence on the 8-device virtual CPU mesh
(VERDICT r4 item 7): a 64k-vector 8-shard build with a recall gate, plus
cross-shard-count restore at the same scale.

Everything else in tests/test_parallel.py runs at toy N; this file is the
"does the sharded path hold up at a size where graph quality actually
matters" check. Reference scaling analogue: the Go reference is
single-node (no sharding; SURVEY §5 last bullet) — this is the extension
surface, so the gate is against brute force, not the reference.
"""

import numpy as np
import pytest

from scintirete_tpu.ops.distance import distance_np
from scintirete_tpu.parallel import ShardedHNSWIndex, make_default_mesh
from scintirete_tpu.types import DistanceMetric, HNSWParams, SearchParams

N, DIM, NQ, K = 65_536, 64, 256, 10


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    # clustered corpus (same family as bench.py's workload v2): recall
    # against brute force is meaningless on isotropic Gaussians at this
    # dimension (distance concentration), so give the graph real local
    # neighborhoods to find
    n_clusters = 656
    centers = rng.standard_normal((n_clusters, DIM)).astype(np.float32) * 2.0
    assign = rng.integers(0, n_clusters, N)
    base = (
        centers[assign] + 0.4 * rng.standard_normal((N, DIM))
    ).astype(np.float32)
    qi = rng.integers(0, N, NQ)
    queries = (
        base[qi] + 0.2 * rng.standard_normal((NQ, DIM))
    ).astype(np.float32)
    want = distance_np(queries, base, DistanceMetric.COSINE)
    true_ids = np.argsort(want, axis=1)[:, :K] + 1  # ids are 1-based
    return base, queries, true_ids


def _recall(res, true_ids):
    hits = 0
    for b in range(len(true_ids)):
        hits += len(set(true_ids[b].tolist()) & {r[0] for r in res[b]})
    return hits / true_ids.size


@pytest.fixture(scope="module")
def built(corpus):
    base, _, _ = corpus
    mesh = make_default_mesh(8, dp=1)  # 8 shards, ~8,192 vectors each
    idx = ShardedHNSWIndex(
        dim=DIM,
        params=HNSWParams(
            m=16, ef_construction=100, ef_search=32, seed=11,
            neighbor_heuristic=True,
        ),
        metric=DistanceMetric.COSINE,
        mesh=mesh,
    )
    idx.bulk_insert(list(range(1, N + 1)), base)
    return idx


class TestShardedAtScale:
    def test_recall_gate_64k_8shards(self, corpus, built):
        _, queries, true_ids = corpus
        res = built.search_batch(queries, SearchParams(top_k=K, ef_search=32))
        rec = _recall(res, true_ids)
        # union-of-shards merge should comfortably clear the bench gate
        assert rec >= 0.95, f"sharded recall@{K} {rec:.4f} < 0.95 at 64k"

    def test_restore_across_shard_counts_64k(self, corpus, built):
        """Snapshot written on an 8-shard mesh restores on a 4-shard mesh
        (changed tpu.shard_devices / different pod slice) and still clears
        the recall gate — the re-shard rebuild path at a real size."""
        _, queries, true_ids = corpus
        state = built.export_graph_state()
        assert len(state["shards"]) == 8
        mesh4 = make_default_mesh(8, dp=2)  # shard axis = 4
        idx4 = ShardedHNSWIndex.import_graph_state(
            state, params=built.params, mesh=mesh4
        )
        assert idx4.S == 4
        assert idx4.size() == N
        res = idx4.search_batch(queries, SearchParams(top_k=K, ef_search=32))
        rec = _recall(res, true_ids)
        assert rec >= 0.95, f"re-sharded recall@{K} {rec:.4f} < 0.95"
