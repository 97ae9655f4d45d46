"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

from scintirete_tpu.ops.distance import distance_np
from scintirete_tpu.parallel import (
    ShardedFlatIndex,
    ShardedHNSWIndex,
    make_default_mesh,
)
from scintirete_tpu.types import DistanceMetric, HNSWParams, SearchParams


class TestShardedFlat:
    @pytest.mark.parametrize("metric", [DistanceMetric.L2, DistanceMetric.COSINE])
    def test_exact_vs_numpy(self, rng, metric):
        mesh = make_default_mesh(8, dp=2)
        idx = ShardedFlatIndex(dim=16, metric=metric, mesh=mesh)
        vecs = rng.standard_normal((200, 16)).astype(np.float32)
        ids = list(range(100, 300))
        idx.build(ids, vecs)
        queries = rng.standard_normal((6, 16)).astype(np.float32)
        res = idx.search(queries, k=5)
        want = distance_np(queries, vecs, metric)
        for b in range(6):
            order = np.argsort(want[b], kind="stable")[:5]
            got_ids = [r[0] for r in res[b]]
            assert got_ids == [ids[i] for i in order]
            np.testing.assert_allclose(
                [r[1] for r in res[b]], want[b][order], rtol=1e-4, atol=1e-4
            )

    def test_batch_not_multiple_of_dp(self, rng):
        mesh = make_default_mesh(8, dp=4)
        idx = ShardedFlatIndex(dim=8, metric=DistanceMetric.L2, mesh=mesh)
        vecs = rng.standard_normal((50, 8)).astype(np.float32)
        idx.build(list(range(50)), vecs)
        res = idx.search(rng.standard_normal((5, 8)).astype(np.float32), k=3)
        assert len(res) == 5
        assert all(len(r) == 3 for r in res)


class TestShardedHNSW:
    def test_recall_vs_bruteforce(self, rng):
        mesh = make_default_mesh(8, dp=1)
        idx = ShardedHNSWIndex(
            dim=16,
            params=HNSWParams(m=8, ef_construction=60, ef_search=60, seed=9),
            metric=DistanceMetric.L2,
            mesh=mesh,
        )
        n = 400
        vecs = rng.standard_normal((n, 16)).astype(np.float32)
        ids = list(range(1, n + 1))
        idx.bulk_insert(ids, vecs)
        assert idx.size() == n

        queries = rng.standard_normal((8, 16)).astype(np.float32)
        res = idx.search_batch(queries, SearchParams(top_k=10))
        want = distance_np(queries, vecs, DistanceMetric.L2)
        hits = 0
        for b in range(8):
            true_ids = {ids[i] for i in np.argsort(want[b])[:10]}
            got_ids = {r[0] for r in res[b]}
            assert len(res[b]) == 10
            hits += len(true_ids & got_ids)
        assert hits / 80 >= 0.9

    def test_delete_across_shards(self, rng):
        idx = ShardedHNSWIndex(
            dim=8,
            params=HNSWParams(m=8, ef_construction=40, ef_search=40, seed=2),
            metric=DistanceMetric.L2,
        )
        vecs = rng.standard_normal((40, 8)).astype(np.float32)
        idx.bulk_insert(list(range(1, 41)), vecs)
        for vid in (1, 2, 3, 9, 17):
            idx.delete(vid)
        assert idx.size() == 35
        res = idx.search_batch(vecs[:4], SearchParams(top_k=5))
        for r in res:
            assert not ({1, 2, 3, 9, 17} & {x[0] for x in r})

    def test_results_sorted(self, rng):
        idx = ShardedHNSWIndex(
            dim=8, params=HNSWParams(m=8, seed=1), metric=DistanceMetric.COSINE
        )
        vecs = rng.standard_normal((64, 8)).astype(np.float32)
        idx.bulk_insert(list(range(1, 65)), vecs)
        res = idx.search_batch(vecs[:2], SearchParams(top_k=8))
        for r in res:
            dists = [x[1] for x in r]
            assert dists == sorted(dists)
