"""Engine-layer tests (SURVEY.md §2.2: collection/database semantics)."""

import numpy as np
import pytest

from scintirete_tpu.engine import Collection, Engine
from scintirete_tpu.engine.database import (
    CMD_CREATE_COLLECTION,
    CMD_CREATE_DATABASE,
    CMD_DELETE_VECTORS,
    CMD_DROP_COLLECTION,
    CMD_DROP_DATABASE,
    CMD_INSERT_VECTORS,
    make_command,
)
from scintirete_tpu.errors import ErrorCode, ScintireteError
from scintirete_tpu.types import (
    CollectionConfig,
    DistanceMetric,
    HNSWParams,
    SearchParams,
)

CFG = lambda name="c": CollectionConfig(  # noqa: E731
    name=name,
    metric=DistanceMetric.L2,
    hnsw=HNSWParams(m=8, ef_construction=40, ef_search=30, seed=5),
)


def make_collection(name="c"):
    return Collection(CFG(name), use_device=False)


def vecs(rng, n, dim=8):
    return rng.standard_normal((n, dim)).astype(np.float32)


class TestCollection:
    def test_auto_increment_ids(self, rng):
        col = make_collection()
        ids = col.insert([(v, None) for v in vecs(rng, 3)])
        assert ids == [1, 2, 3]
        ids2 = col.insert([(v, {"k": "v"}) for v in vecs(rng, 2)])
        assert ids2 == [4, 5]
        assert col.count() == 5

    def test_dimension_fixed_by_first_vector(self, rng):
        col = make_collection()
        col.insert([(v, None) for v in vecs(rng, 2, dim=8)])
        with pytest.raises(ScintireteError) as exc:
            col.insert([(np.zeros(4, np.float32), None)])
        assert exc.value.code == ErrorCode.DIMENSION_MISMATCH

    def test_mixed_dims_in_batch_rejected(self, rng):
        col = make_collection()
        with pytest.raises(ScintireteError):
            col.insert(
                [(np.zeros(4, np.float32), None), (np.zeros(8, np.float32), None)]
            )

    def test_metadata_roundtrip(self, rng):
        col = make_collection()
        meta = {"title": "hello", "tags": ["a", "b"], "rank": 3}
        (vid,) = col.insert([(vecs(rng, 1)[0], meta)])
        got = col.get(vid)
        assert got.metadata == meta
        res = col.search(col.get(vid).elements, SearchParams(top_k=1))
        assert res[0].metadata == meta
        assert res[0].vector is None  # include_vector defaults false

    def test_include_vector(self, rng):
        col = make_collection()
        v = vecs(rng, 1)[0]
        (vid,) = col.insert([(v, None)])
        res = col.search(v, SearchParams(top_k=1, include_vector=True))
        np.testing.assert_allclose(res[0].vector, v, rtol=1e-6)

    def test_delete_and_count(self, rng):
        col = make_collection()
        ids = col.insert([(v, None) for v in vecs(rng, 10)])
        n = col.delete(ids[:4] + [999])  # 999 missing -> skipped
        assert n == 4
        assert col.count() == 6
        assert col.info().deleted_count == 4
        with pytest.raises(ScintireteError):
            col.get(ids[0])

    def test_double_delete_not_counted(self, rng):
        """Regression: deleting an already-tombstoned id must not inflate
        deleted counts (reference returns 0 for already-deleted ids)."""
        col = make_collection()
        ids = col.insert([(v, None) for v in vecs(rng, 6)])
        assert col.delete([ids[0]]) == 1
        assert col.delete([ids[0]]) == 0  # tombstoned, not live
        assert col.delete([ids[0], ids[1]]) == 1  # only the live one counts
        assert col.count() == 4
        assert col.info().deleted_count == 2

    def test_compact_purges_and_preserves_search(self, rng):
        col = make_collection()
        data = vecs(rng, 40)
        ids = col.insert([(v, {"i": i}) for i, v in enumerate(data)])
        col.delete(ids[::2])
        purged = col.compact()
        assert purged == 20
        assert col.count() == 20
        assert col.info().deleted_count == 0
        # survivors still searchable with metadata
        res = col.search(data[1], SearchParams(top_k=1))
        assert res[0].id == ids[1]
        assert res[0].metadata == {"i": 1}
        # next_id not reset: new inserts continue above the high-water mark
        new_ids = col.insert([(vecs(rng, 1)[0], None)])
        assert new_ids[0] == 41

    def test_get_multiple_skips_missing(self, rng):
        col = make_collection()
        ids = col.insert([(v, None) for v in vecs(rng, 3)])
        out = col.get_multiple([ids[0], 777, ids[2]])
        assert [v.id for v in out] == [ids[0], ids[2]]

    def test_info(self, rng):
        col = make_collection()
        col.insert([(v, None) for v in vecs(rng, 5)])
        info = col.info()
        assert info.dimension == 8
        assert info.vector_count == 5
        assert info.metric == DistanceMetric.L2
        assert info.memory_bytes > 0

    def test_state_roundtrip(self, rng):
        col = make_collection()
        data = vecs(rng, 30)
        ids = col.insert([(v, {"n": i}) for i, v in enumerate(data)])
        col.delete(ids[:5])
        state = col.export_state()
        col2 = Collection.from_state(state, use_device=False)
        assert col2.count() == col.count()
        assert col2.get(ids[10]).metadata == {"n": 10}
        r1 = col.search(data[10], SearchParams(top_k=5))
        r2 = col2.search(data[10], SearchParams(top_k=5))
        assert [x.id for x in r1] == [x.id for x in r2]
        # auto-increment continues correctly after restore
        assert col2.insert([(data[0], None)])[0] == 31


class TestEngine:
    def test_database_lifecycle(self):
        eng = Engine(use_device=False)
        eng.create_database("db1")
        eng.create_database("db2")
        assert eng.list_databases() == ["db1", "db2"]
        with pytest.raises(ScintireteError) as exc:
            eng.create_database("db1")
        assert exc.value.code == ErrorCode.DATABASE_ALREADY_EXISTS
        eng.drop_database("db1")
        assert eng.list_databases() == ["db2"]
        with pytest.raises(ScintireteError) as exc:
            eng.get_database("db1")
        assert exc.value.code == ErrorCode.DATABASE_NOT_FOUND

    def test_collection_lifecycle(self, rng):
        eng = Engine(use_device=False)
        db = eng.create_database("db")
        db.create_collection(CFG("a"))
        db.create_collection(CFG("b"))
        assert db.list_collections() == ["a", "b"]
        with pytest.raises(ScintireteError) as exc:
            db.create_collection(CFG("a"))
        assert exc.value.code == ErrorCode.COLLECTION_ALREADY_EXISTS
        db.drop_collection("a")
        with pytest.raises(ScintireteError):
            db.get_collection("a")

    def test_stats(self, rng):
        eng = Engine(use_device=False)
        db = eng.create_database("db")
        col = db.create_collection(CFG("a"))
        col.insert([(v, None) for v in vecs(rng, 7)])
        st = eng.stats()
        assert st["databases"] == 1
        assert st["collections"] == 1
        assert st["vectors"] == 7

    def test_snapshot_roundtrip(self, rng):
        eng = Engine(use_device=False)
        db = eng.create_database("db")
        col = db.create_collection(CFG("a"))
        data = vecs(rng, 25)
        ids = col.insert([(v, {"i": i}) for i, v in enumerate(data)])
        col.delete(ids[:3])
        state = eng.export_state()

        eng2 = Engine(use_device=False)
        eng2.restore_state(state)
        col2 = eng2.get_database("db").get_collection("a")
        assert col2.count() == 22
        r1 = col.search(data[10], SearchParams(top_k=5))
        r2 = col2.search(data[10], SearchParams(top_k=5))
        assert [x.id for x in r1] == [x.id for x in r2]

    def test_restore_honors_tpu_serving_knobs(self, rng):
        """A restart must not change serving behavior: a restored index
        gets the same [tpu] knobs a fresh one does. Regression: restored
        HNSWIndex defaulted device_search_min_size to 0, so a 50-vector
        collection served off the device after restart (and hung whenever
        another process held the chip) while serving on host before it."""
        from scintirete_tpu.config import TPUConfig
        from scintirete_tpu.engine import Engine

        tpu = TPUConfig(device_search_min_size=123456, search_batch_size=64,
                        build_chunk_size=512)
        eng = Engine(use_device=True, tpu_config=tpu)
        db = eng.create_database("db")
        col = db.create_collection(CFG("a"))
        col.insert([(v, None) for v in vecs(rng, 10)])
        state = eng.export_state()

        eng2 = Engine(use_device=True, tpu_config=tpu)
        eng2.restore_state(state)
        idx = eng2.get_database("db").get_collection("a")._index
        assert idx.device_search_min_size == 123456
        assert idx.search_batch_size == 64
        assert idx.build_chunk_size == 512

    def test_restore_rejects_bad_version(self):
        eng = Engine(use_device=False)
        with pytest.raises(ScintireteError) as exc:
            eng.restore_state({"version": "0.9"})
        assert exc.value.code == ErrorCode.CORRUPTED_DATA


class TestApplyCommand:
    def test_full_replay(self, rng):
        data = vecs(rng, 6)
        cmds = [
            make_command(CMD_CREATE_DATABASE, "db"),
            make_command(
                CMD_CREATE_COLLECTION,
                "db",
                "c",
                {"config": {"metric": 1, "hnsw": {"m": 8, "seed": 5}}},
            ),
            make_command(
                CMD_INSERT_VECTORS,
                "db",
                "c",
                {
                    "vectors": [
                        {"id": i + 1, "elements": v.tolist(), "metadata": {"i": i}}
                        for i, v in enumerate(data)
                    ]
                },
            ),
            make_command(CMD_DELETE_VECTORS, "db", "c", {"ids": [1, 2]}),
        ]
        eng = Engine(use_device=False)
        for cmd in cmds:
            eng.apply_command(cmd)
        col = eng.get_database("db").get_collection("c")
        assert col.count() == 4
        assert col.get(3).metadata == {"i": 2}
        # next id continues above the replayed high-water mark
        assert col.insert([(data[0], None)])[0] == 7

    def test_replay_idempotent_creates(self):
        eng = Engine(use_device=False)
        cmd = make_command(CMD_CREATE_DATABASE, "db")
        eng.apply_command(cmd)
        eng.apply_command(cmd)  # no error
        assert eng.list_databases() == ["db"]

    def test_drop_commands(self, rng):
        eng = Engine(use_device=False)
        eng.apply_command(make_command(CMD_CREATE_DATABASE, "db"))
        eng.apply_command(
            make_command(CMD_CREATE_COLLECTION, "db", "c", {"config": {"metric": 1}})
        )
        eng.apply_command(make_command(CMD_DROP_COLLECTION, "db", "c"))
        assert eng.get_database("db").list_collections() == []
        eng.apply_command(make_command(CMD_DROP_DATABASE, "db"))
        assert eng.list_databases() == []

    def test_unknown_command_rejected(self):
        eng = Engine(use_device=False)
        with pytest.raises(ScintireteError) as exc:
            eng.apply_command(make_command("NOPE", "db"))
        assert exc.value.code == ErrorCode.CORRUPTED_DATA

    def test_optimized_commands_recreate_state(self, rng):
        eng = Engine(use_device=False)
        db = eng.create_database("db")
        col = db.create_collection(CFG("c"))
        data = vecs(rng, 250)  # > batch size of 100 -> multiple insert cmds
        ids = col.insert([(v, {"i": i}) for i, v in enumerate(data)])
        col.delete(ids[:50])

        cmds = eng.get_optimized_commands()
        inserts = [c for c in cmds if c["command_type"] == CMD_INSERT_VECTORS]
        assert len(inserts) == 2  # 200 live vectors in batches of 100
        eng2 = Engine(use_device=False)
        for cmd in cmds:
            eng2.apply_command(cmd)
        col2 = eng2.get_database("db").get_collection("c")
        assert col2.count() == 200
        assert col2.get(ids[100]).metadata == {"i": 100}
