"""Device-assisted chunked builder tests: recall gates vs brute force and
vs the sequential host oracle, incremental device sync correctness."""

import numpy as np
import pytest

from scintirete_tpu.index import HNSWIndex
from scintirete_tpu.index.bulk import BOOTSTRAP_SIZE
from scintirete_tpu.ops.distance import distance_np
from scintirete_tpu.types import DistanceMetric, HNSWParams, SearchParams

PARAMS = HNSWParams(m=12, ef_construction=80, ef_search=80, seed=21)


def recall_at_k(idx, base, queries, metric, k=10):
    res = idx.search_batch(queries, SearchParams(top_k=k))
    want = distance_np(queries, base, metric)
    hits = 0
    for b in range(len(queries)):
        true_ids = {int(i) + 1 for i in np.argsort(want[b], kind="stable")[:k]}
        hits += len(true_ids & {r[0] for r in res[b]})
    return hits / (len(queries) * k)


class TestChunkedBuild:
    @pytest.mark.parametrize(
        "metric", [DistanceMetric.L2, DistanceMetric.COSINE]
    )
    def test_recall_matches_sequential(self, rng, metric):
        n, dim = BOOTSTRAP_SIZE + 1200, 24  # forces multiple device chunks
        base = rng.standard_normal((n, dim)).astype(np.float32)
        queries = rng.standard_normal((24, dim)).astype(np.float32)
        ids = list(range(1, n + 1))

        chunked = HNSWIndex(dim=dim, params=PARAMS, metric=metric, use_device=True)
        chunked.bulk_insert(ids, base)
        assert chunked.size() == n
        r_chunked = recall_at_k(chunked, base, queries, metric)

        sequential = HNSWIndex(dim=dim, params=PARAMS, metric=metric, use_device=False)
        sequential.bulk_insert(ids, base)
        r_seq = recall_at_k(sequential, base, queries, metric)

        assert r_chunked >= 0.9, f"chunked recall too low: {r_chunked}"
        assert r_chunked >= r_seq - 0.05, (
            f"chunked build lost recall: {r_chunked} vs sequential {r_seq}"
        )

    def test_degree_bounds_after_chunked_build(self, rng):
        n, dim = BOOTSTRAP_SIZE + 600, 16
        base = rng.standard_normal((n, dim)).astype(np.float32)
        idx = HNSWIndex(
            dim=dim, params=PARAMS, metric=DistanceMetric.L2, use_device=True
        )
        idx.bulk_insert(list(range(1, n + 1)), base)
        s = idx.store
        assert ((s.neighbors0[: s.count] >= 0).sum(axis=1) <= s.m0).all()
        for ls in s.layers:
            assert ((ls.nbrs[: ls.count] >= 0).sum(axis=1) <= s.m).all()
        # no self-loops, no dangling references
        nbrs = s.neighbors0[: s.count]
        rows = np.arange(s.count)[:, None]
        assert not np.any(nbrs == rows)
        assert nbrs.max() < s.count

    def test_incremental_sync_after_mutations(self, rng):
        n, dim = BOOTSTRAP_SIZE + 300, 16
        base = rng.standard_normal((n, dim)).astype(np.float32)
        idx = HNSWIndex(
            dim=dim, params=PARAMS, metric=DistanceMetric.L2, use_device=True
        )
        idx.bulk_insert(list(range(1, n + 1)), base)
        # search once (device synced), then mutate, then search again: the
        # incremental scatter path must reflect deletes and new inserts
        q = base[:8]
        res1 = idx.search_batch(q, SearchParams(top_k=1))
        assert [r[0][0] for r in res1[:4]] == [1, 2, 3, 4]
        idx.delete(1)
        idx.delete(2)
        extra = rng.standard_normal((40, dim)).astype(np.float32)
        idx.bulk_insert(list(range(n + 1, n + 41)), extra)
        res2 = idx.search_batch(np.concatenate([q[:4], extra[:4]]),
                                SearchParams(top_k=1))
        assert res2[0][0][0] != 1 and res2[1][0][0] != 2
        got_new = [r[0][0] for r in res2[4:]]
        assert got_new == [n + 1, n + 2, n + 3, n + 4]

    def test_incremental_vs_full_sync_equivalence(self, rng):
        """The scatter-updated device graph must equal a fresh full upload."""
        from scintirete_tpu.index.device import DeviceIndex

        n, dim = BOOTSTRAP_SIZE + 200, 16
        base = rng.standard_normal((n, dim)).astype(np.float32)
        idx = HNSWIndex(
            dim=dim, params=PARAMS, metric=DistanceMetric.L2, use_device=True
        )
        idx.bulk_insert(list(range(1, n + 1)), base)
        idx.delete(5)
        incremental = idx._get_device()
        incremental.sync(idx.store)

        idx.store.invalidate_dirty()
        fresh = DeviceIndex()
        fresh.sync(idx.store)

        a, b = incremental.graph.arrays, fresh.graph.arrays
        for key in (
            "vectors", "sq_norms", "deleted", "neighbors0",
            "up_nbrs_cat", "up_rows_flat",
        ):
            np.testing.assert_array_equal(np.asarray(a[key]), np.asarray(b[key]), key)


class TestOnlineInsertLatency:
    def test_small_batches_stay_on_host(self, rng, monkeypatch):
        """Online single inserts must not pay device-chunk machinery."""
        import scintirete_tpu.index.bulk as bulkmod

        n, dim = BOOTSTRAP_SIZE + 400, 16
        idx = HNSWIndex(dim=dim, params=PARAMS, metric=DistanceMetric.L2,
                        use_device=True)
        idx.bulk_insert(
            list(range(1, n + 1)),
            rng.standard_normal((n, dim)).astype(np.float32),
        )
        calls = []
        orig = bulkmod._dispatch_chunk
        monkeypatch.setattr(
            bulkmod, "_dispatch_chunk",
            lambda *a, **k: calls.append(1) or orig(*a, **k),
        )
        # single online insert: no device dispatch
        idx.insert(n + 1, rng.standard_normal(dim).astype(np.float32))
        assert not calls
        # large batch still uses the device path
        idx.bulk_insert(
            list(range(n + 2, n + 2 + 128)),
            rng.standard_normal((128, dim)).astype(np.float32),
        )
        assert calls
