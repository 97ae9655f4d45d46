"""FlatIndex tests: exact-scan index surface, collection wiring, persistence.

The flat index is the TPU-first serving path (ops/flat_scan.py); these tests
run it on the CPU mesh where approx_min_k lowers to an exact reduction, so
results must match the brute-force oracle exactly.
"""

import numpy as np
import pytest

from scintirete_tpu.engine import Collection, Engine
from scintirete_tpu.errors import ErrorCode, ScintireteError
from scintirete_tpu.index.flat import FlatIndex
from scintirete_tpu.ops.distance import distance_np
from scintirete_tpu.types import (
    CollectionConfig,
    DistanceMetric,
    HNSWParams,
    SearchParams,
)


def oracle_topk(queries, base, deleted, metric, k):
    d = distance_np(queries, base, metric)
    d = np.where(np.asarray(deleted)[None, :], np.inf, d)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


@pytest.fixture(params=[True, False], ids=["device", "host"])
def use_device(request):
    return request.param


class TestFlatIndex:
    @pytest.mark.parametrize(
        "metric",
        [DistanceMetric.L2, DistanceMetric.COSINE, DistanceMetric.INNER_PRODUCT],
    )
    def test_exact_results_all_metrics(self, rng, metric, use_device):
        base = rng.standard_normal((500, 16)).astype(np.float32)
        idx = FlatIndex(dim=16, metric=metric, use_device=use_device)
        idx.bulk_insert(list(range(1, 501)), base)
        queries = rng.standard_normal((32, 16)).astype(np.float32)
        res = idx.search_batch(queries, SearchParams(top_k=5))
        want_i, want_d = oracle_topk(
            queries, base, np.zeros(500, bool), metric, 5
        )
        for b in range(32):
            got_ids = [r[0] for r in res[b]]
            assert got_ids == [int(i) + 1 for i in want_i[b]]
            np.testing.assert_allclose(
                [r[1] for r in res[b]], want_d[b], rtol=1e-4, atol=1e-5
            )

    def test_delete_and_tombstone_semantics(self, rng, use_device):
        base = rng.standard_normal((50, 8)).astype(np.float32)
        idx = FlatIndex(dim=8, metric=DistanceMetric.L2, use_device=use_device)
        idx.bulk_insert(list(range(1, 51)), base)
        assert idx.delete(7) is True
        assert idx.delete(7) is False  # double delete reports not-live
        assert not idx.contains(7)
        assert idx.has_id(7)
        assert idx.size() == 49
        with pytest.raises(ScintireteError):
            idx.get_vector(7)
        res = idx.search(base[6], SearchParams(top_k=50))
        assert 7 not in [r[0] for r in res]
        with pytest.raises(ScintireteError) as exc:
            idx.delete(9999)
        assert exc.value.code == ErrorCode.VECTOR_NOT_FOUND

    def test_duplicate_id_rejected(self, rng):
        idx = FlatIndex(dim=4, use_device=False)
        idx.insert(1, [1, 0, 0, 0])
        with pytest.raises(ScintireteError):
            idx.insert(1, [0, 1, 0, 0])

    def test_incremental_device_sync(self, rng):
        """Inserts and deletes after the first search must be visible
        (dirty-row scatter path)."""
        idx = FlatIndex(dim=8, metric=DistanceMetric.L2, use_device=True)
        base = rng.standard_normal((40, 8)).astype(np.float32)
        idx.bulk_insert(list(range(1, 41)), base)
        idx.search(base[0], SearchParams(top_k=1))  # forces first sync
        extra = rng.standard_normal((8,)).astype(np.float32)
        idx.insert(41, extra)
        idx.delete(1)
        res = idx.search(extra, SearchParams(top_k=41))
        ids = [r[0] for r in res]
        assert ids[0] == 41
        assert 1 not in ids

    def test_capacity_growth(self, rng):
        idx = FlatIndex(dim=4, use_device=False)
        data = rng.standard_normal((600, 4)).astype(np.float32)
        idx.bulk_insert(list(range(1, 601)), data)  # > _MIN_CAP forces growth
        assert idx.size() == 600
        res = idx.search(data[599], SearchParams(top_k=1))
        assert res[0][0] == 600

    def test_state_roundtrip(self, rng, use_device):
        base = rng.standard_normal((100, 8)).astype(np.float32)
        idx = FlatIndex(dim=8, metric=DistanceMetric.COSINE, use_device=use_device)
        idx.bulk_insert(list(range(1, 101)), base)
        idx.delete(5)
        state = idx.export_graph_state()
        assert state["kind"] == "flat"
        idx2 = FlatIndex.import_graph_state(state, use_device=use_device)
        assert idx2.size() == 99
        assert not idx2.contains(5)
        q = rng.standard_normal((4, 8)).astype(np.float32)
        r1 = idx.search_batch(q, SearchParams(top_k=7))
        r2 = idx2.search_batch(q, SearchParams(top_k=7))
        assert [[x[0] for x in row] for row in r1] == [
            [x[0] for x in row] for row in r2
        ]


class TestFlatCollection:
    CFG = lambda self: CollectionConfig(  # noqa: E731
        name="c",
        metric=DistanceMetric.L2,
        hnsw=HNSWParams(seed=3),
        index_type="flat",
    )

    def test_collection_lifecycle(self, rng):
        col = Collection(self.CFG(), use_device=False)
        data = rng.standard_normal((30, 8)).astype(np.float32)
        ids = col.insert([(v, {"i": i}) for i, v in enumerate(data)])
        assert col.info().index_type == "flat"
        res = col.search(data[3], SearchParams(top_k=1))
        assert res[0].id == ids[3]
        assert col.delete([ids[0]]) == 1
        assert col.delete([ids[0]]) == 0
        assert col.count() == 29
        purged = col.compact()
        assert purged == 1
        assert col.count() == 29

    def test_snapshot_roundtrip_keeps_flat(self, rng):
        engine = Engine(use_device=False)
        db = engine.create_database("db")
        col = db.create_collection(self.CFG())
        data = rng.standard_normal((20, 8)).astype(np.float32)
        ids = col.insert([(v, None) for v in data])
        col.delete(ids[:3])
        state = engine.export_state()
        engine2 = Engine(use_device=False)
        engine2.restore_state(state)
        col2 = engine2.get_database("db").get_collection("c")
        assert col2.config.index_type == "flat"
        assert isinstance(col2._index, FlatIndex)
        assert col2.count() == 17
        res = col2.search(data[5], SearchParams(top_k=1))
        assert res[0].id == ids[5]

    def test_rdb_roundtrip_flat(self, rng, tmp_path):
        """Full RDB save -> validate -> recover cycle with a flat collection
        (regression: the validator assumed the HNSW graph schema)."""
        from scintirete_tpu.persistence import PersistenceManager

        engine = Engine(use_device=False)
        pm = PersistenceManager(engine, str(tmp_path / "d"))
        db = engine.create_database("db")
        col = db.create_collection(self.CFG())
        data = rng.standard_normal((25, 8)).astype(np.float32)
        ids = col.insert([(v, None) for v in data])
        col.delete([ids[0]])
        pm.save_snapshot()
        pm.stop()

        engine2 = Engine(use_device=False)
        pm2 = PersistenceManager(engine2, str(tmp_path / "d"))
        info = pm2.recover()
        assert info["rdb_loaded"]
        col2 = engine2.get_database("db").get_collection("c")
        assert col2.config.index_type == "flat"
        assert isinstance(col2._index, FlatIndex)
        assert col2.count() == 24
        res = col2.search(data[3], SearchParams(top_k=1))
        assert res[0].id == ids[3]
        pm2.stop()

    def test_aof_replay_keeps_flat(self, rng, tmp_path):
        from scintirete_tpu.persistence import PersistenceManager

        engine = Engine(use_device=False)
        pm = PersistenceManager(engine, str(tmp_path / "d"))
        engine.create_database("db")
        pm.log_create_database("db")
        engine.get_database("db").create_collection(self.CFG())
        pm.log_create_collection(
            "db", "c",
            {"metric": int(DistanceMetric.L2), "hnsw": {"seed": 3},
             "index_type": "flat"},
        )
        pm.stop()
        engine2 = Engine(use_device=False)
        pm2 = PersistenceManager(engine2, str(tmp_path / "d"))
        pm2.recover()
        col2 = engine2.get_database("db").get_collection("c")
        assert col2.config.index_type == "flat"
        pm2.stop()


class TestFastScanRerank:
    def test_rerank_distances_exact_and_recall_full(self, rng):
        """bf16 first pass + f32 rerank: distances must equal the pure-f32
        scan's values exactly; recall vs the exact oracle stays 1.0 here."""
        from scintirete_tpu.types import SearchParams

        vecs = rng.standard_normal((3000, 24)).astype(np.float32)
        queries = rng.standard_normal((32, 24)).astype(np.float32)
        fast = FlatIndex(dim=24, metric=DistanceMetric.COSINE,
                         use_device=True, fast_scan=True)
        slow = FlatIndex(dim=24, metric=DistanceMetric.COSINE,
                         use_device=True, fast_scan=False)
        ids = list(range(1, 3001))
        fast.bulk_insert(ids, vecs)
        slow.bulk_insert(ids, vecs)
        assert "scan" not in slow._dev or not slow._dev
        rf = fast.search_batch(queries, SearchParams(top_k=10))
        assert "scan" in fast._dev  # two-pass mode engaged
        rs = slow.search_batch(queries, SearchParams(top_k=10))
        for a, b in zip(rf, rs):
            assert [x[0] for x in a] == [x[0] for x in b]
            # f32-exact up to summation order (~1 ULP)
            np.testing.assert_allclose(
                np.float32([x[1] for x in a]),
                np.float32([x[1] for x in b]),
                rtol=1e-6,
            )

    def test_bf16_collections_stay_single_pass(self, rng):
        from scintirete_tpu.types import SearchParams

        idx = FlatIndex(dim=8, metric=DistanceMetric.L2, use_device=True,
                        device_dtype="bfloat16", fast_scan=True)
        idx.bulk_insert([1, 2, 3], rng.standard_normal((3, 8)).astype(np.float32))
        idx.search_batch(rng.standard_normal((2, 8)).astype(np.float32),
                         SearchParams(top_k=2))
        assert "scan" not in idx._dev  # no redundant bf16 copy


class TestPipelinedServing:
    """search_batch_pipelined must return exactly what sequential
    search_batch returns — it only overlaps upload/kernel/fetch across
    batches (the payload format is pack-at-submit; see index/device.py
    _pack_deferred)."""

    @pytest.mark.parametrize("depth", [2, 3])
    def test_flat_pipelined_matches_sequential(self, rng, depth):
        base = rng.standard_normal((700, 16)).astype(np.float32)
        idx = FlatIndex(dim=16, metric=DistanceMetric.COSINE, use_device=True,
                        search_batch_size=64)
        idx.bulk_insert(list(range(1, 701)), base)
        for vid in (5, 100, 699):  # deletions: -1 slots flow through packing
            idx.delete(vid)
        params = SearchParams(top_k=7)
        batches = [
            rng.standard_normal((48, 16)).astype(np.float32) for _ in range(5)
        ]
        want = [idx.search_batch(q, params) for q in batches]
        got = idx.search_batch_pipelined(batches, params, depth=depth)
        assert got == want

    @pytest.mark.parametrize("depth", [2, 3])
    def test_hnsw_pipelined_matches_sequential(self, rng, depth):
        from scintirete_tpu.index.hnsw import HNSWIndex

        base = rng.standard_normal((400, 12)).astype(np.float32)
        idx = HNSWIndex(
            dim=12,
            params=HNSWParams(m=8, ef_construction=60, ef_search=40, seed=3),
            metric=DistanceMetric.L2,
            use_device=True,
            search_batch_size=64,
        )
        idx.bulk_insert(list(range(1, 401)), base)
        params = SearchParams(top_k=5, ef_search=40)
        batches = [
            rng.standard_normal((40, 12)).astype(np.float32) for _ in range(4)
        ]
        want = [idx.search_batch(q, params) for q in batches]
        got = idx.search_batch_pipelined(batches, params, depth=depth)
        assert got == want


class TestScanTpsSanitize:
    def test_sanitize_tps(self):
        from scintirete_tpu.index.flat import _sanitize_tps

        cap = 1 << 20
        assert _sanitize_tps(1, cap) == 1
        assert _sanitize_tps(4, cap) == 4
        assert _sanitize_tps(3, cap) == 2      # round down to pow2
        assert _sanitize_tps(0, cap) == 1      # clamp
        assert _sanitize_tps(-2, cap) == 1
        # oversized: clamp to the 8/VMEM ceiling, never cap//LANES
        assert _sanitize_tps(1 << 16, cap) == 8
        # wide rows shrink the VMEM-derived ceiling (4MB / (LANES*dim*2))
        assert _sanitize_tps(8, cap, dim=2048) == 1
        assert _sanitize_tps(8, cap, dim=256) == 8


class TestSubmitCollectSnapshot:
    def test_collect_after_delete_sees_submit_snapshot(self, rng):
        """search_submit snapshots the corpus (device arrays are
        version-keyed, slots stable under soft delete): a delete between
        submit and collect must NOT leak into the collected results."""
        base = rng.standard_normal((300, 8)).astype(np.float32)
        idx = FlatIndex(dim=8, metric=DistanceMetric.L2, use_device=True)
        idx.bulk_insert(list(range(1, 301)), base)
        params = SearchParams(top_k=3)
        q = base[9:10]
        want = idx.search_batch(q, params)
        pending = idx.search_submit(q, params)
        assert idx.delete(10) is True  # id 10 == base[9], the top-1 hit
        got = idx.search_collect(pending)
        assert got == want
        assert got[0][0][0] == 10
        # a fresh search reflects the delete
        after = idx.search_batch(q, params)
        assert after[0][0][0] != 10


class TestWithinBatchDuplicateIds:
    def test_flat_rejects_repeat_in_one_batch(self, rng):
        idx = FlatIndex(dim=4, use_device=False)
        with pytest.raises(ScintireteError) as exc:
            idx.bulk_insert([7, 7], rng.standard_normal((2, 4)).astype(np.float32))
        assert exc.value.code == ErrorCode.INVALID_PARAMETER
        assert idx.size() == 0  # nothing partially registered

    def test_hnsw_rejects_repeat_in_one_batch(self, rng):
        from scintirete_tpu.index.hnsw import HNSWIndex

        idx = HNSWIndex(dim=4, params=HNSWParams(m=4, seed=1),
                        use_device=False)
        with pytest.raises(ScintireteError):
            idx.bulk_insert([3, 3], rng.standard_normal((2, 4)).astype(np.float32))
        assert idx.size() == 0
