"""Persistence tests: AOF/RDB unit tiers + engine-integration recovery
(SURVEY.md §4 tiers "Unit — persistence" and "Integration — persistence↔engine")."""

import os
import struct
import time

import numpy as np
import pytest

from scintirete_tpu.engine import Engine
from scintirete_tpu.engine.database import make_command, CMD_CREATE_DATABASE
from scintirete_tpu.errors import ErrorCode, ScintireteError
from scintirete_tpu.persistence import (
    AOFLogger,
    BackupManager,
    PersistenceManager,
    RDBManager,
    SyncStrategy,
)
from scintirete_tpu.types import CollectionConfig, DistanceMetric, HNSWParams, SearchParams

CFG = lambda name="c": CollectionConfig(  # noqa: E731
    name=name,
    metric=DistanceMetric.L2,
    hnsw=HNSWParams(m=8, ef_construction=40, ef_search=30, seed=5),
)


def make_manager(tmp_path, engine=None, **kw):
    engine = engine or Engine(use_device=False)
    return engine, PersistenceManager(engine, str(tmp_path / "data"), **kw)


def populate(engine, rng, n=30):
    db = engine.create_database("db")
    col = db.create_collection(CFG())
    data = rng.standard_normal((n, 8)).astype(np.float32)
    ids = col.insert([(v, {"i": i}) for i, v in enumerate(data)])
    return col, data, ids


class TestAOF:
    @pytest.mark.parametrize("strategy", ["always", "everysec", "no"])
    def test_write_replay_roundtrip(self, tmp_path, strategy):
        path = str(tmp_path / "a.aof")
        log = AOFLogger(path, strategy)
        cmds = [
            make_command(CMD_CREATE_DATABASE, f"db{i}", timestamp=float(i))
            for i in range(5)
        ]
        for c in cmds:
            log.write_command(c)
        log.flush()
        seen = []
        log.replay(seen.append)
        assert [c["database"] for c in seen] == [f"db{i}" for i in range(5)]
        assert seen[0]["timestamp"] == 0.0
        log.close()

    def test_replay_survives_reopen(self, tmp_path):
        path = str(tmp_path / "a.aof")
        log = AOFLogger(path, "always")
        log.write_command(make_command(CMD_CREATE_DATABASE, "db"))
        log.close()
        log2 = AOFLogger(path, "always")
        seen = []
        log2.replay(seen.append)
        assert len(seen) == 1
        log2.close()

    def test_truncate(self, tmp_path):
        log = AOFLogger(str(tmp_path / "a.aof"), "always")
        log.write_command(make_command(CMD_CREATE_DATABASE, "db"))
        assert log.size_bytes() > 0
        log.truncate()
        assert log.size_bytes() == 0
        seen = []
        log.replay(seen.append)
        assert seen == []
        log.close()

    def test_rewrite_atomic_replaces(self, tmp_path):
        log = AOFLogger(str(tmp_path / "a.aof"), "always")
        for i in range(10):
            log.write_command(make_command(CMD_CREATE_DATABASE, f"x{i}"))
        log.rewrite([make_command(CMD_CREATE_DATABASE, "compacted")])
        seen = []
        log.replay(seen.append)
        assert [c["database"] for c in seen] == ["compacted"]
        # log still appendable after rewrite
        log.write_command(make_command(CMD_CREATE_DATABASE, "after"))
        log.flush()
        seen = []
        log.replay(seen.append)
        assert len(seen) == 2
        log.close()

    def test_corrupted_length_rejected(self, tmp_path):
        path = str(tmp_path / "a.aof")
        with open(path, "wb") as fh:
            fh.write(struct.pack("<I", 2**31))  # absurd length
            fh.write(b"xx")
        log = AOFLogger(path, "no")
        with pytest.raises(ScintireteError) as exc:
            log.replay(lambda c: None)
        assert exc.value.code == ErrorCode.CORRUPTED_DATA
        log.close()

    def test_truncated_body_rejected(self, tmp_path):
        path = str(tmp_path / "a.aof")
        log = AOFLogger(path, "always")
        log.write_command(make_command(CMD_CREATE_DATABASE, "db"))
        log.close()
        data = open(path, "rb").read()
        with open(path, "wb") as fh:
            fh.write(data[:-3])  # chop the record body
        log2 = AOFLogger(path, "no")
        with pytest.raises(ScintireteError):
            log2.replay(lambda c: None)
        log2.close()

    def test_metadata_preserved(self, tmp_path):
        # the reference drops AOF metadata (aof.go:530-535); we must not
        log = AOFLogger(str(tmp_path / "a.aof"), "always")
        cmd = make_command(
            "INSERT_VECTORS",
            "db",
            "c",
            {"vectors": [{"id": 1, "elements": [1.0, 2.0], "metadata": {"k": "v"}}]},
        )
        log.write_command(cmd)
        seen = []
        log.replay(seen.append)
        assert seen[0]["args"]["vectors"][0]["metadata"] == {"k": "v"}
        log.close()

    def test_everysec_background_flush(self, tmp_path):
        log = AOFLogger(str(tmp_path / "a.aof"), "everysec")
        log.write_command(make_command(CMD_CREATE_DATABASE, "db"))
        time.sleep(1.5)
        assert os.path.getsize(str(tmp_path / "a.aof")) > 0
        log.close()


class TestRDB:
    def test_save_load_roundtrip(self, tmp_path, rng):
        engine = Engine(use_device=False)
        col, data, ids = populate(engine, rng)
        rdb = RDBManager(str(tmp_path / "v.rdb"))
        rdb.save(engine.export_state())

        state = rdb.load()
        engine2 = Engine(use_device=False)
        engine2.restore_state(state)
        col2 = engine2.get_database("db").get_collection("c")
        assert col2.count() == 30
        r1 = col.search(data[3], SearchParams(top_k=5))
        r2 = col2.search(data[3], SearchParams(top_k=5))
        assert [x.id for x in r1] == [x.id for x in r2]

    def test_missing_file_is_none(self, tmp_path):
        assert RDBManager(str(tmp_path / "none.rdb")).load() is None

    def test_bad_magic_rejected(self, tmp_path):
        path = tmp_path / "v.rdb"
        path.write_bytes(b"garbage-not-an-rdb")
        with pytest.raises(ScintireteError) as exc:
            RDBManager(str(path)).load()
        assert exc.value.code == ErrorCode.CORRUPTED_DATA

    def test_validation_rejects_inconsistent(self, tmp_path, rng):
        engine = Engine(use_device=False)
        populate(engine, rng, n=5)
        state = engine.export_state()
        graph = state["databases"]["db"]["collections"]["c"]["graph"]
        graph["count"] = 999  # inconsistent with array lengths
        with pytest.raises(ScintireteError):
            RDBManager.validate(state)

    def test_atomicity_temp_cleanup(self, tmp_path, rng):
        engine = Engine(use_device=False)
        populate(engine, rng, n=3)
        rdb = RDBManager(str(tmp_path / "v.rdb"))
        rdb.save(engine.export_state())
        assert not os.path.exists(str(tmp_path / "v.rdb.tmp"))

    def test_backups(self, tmp_path, rng):
        engine = Engine(use_device=False)
        populate(engine, rng, n=3)
        rdb = RDBManager(str(tmp_path / "v.rdb"))
        rdb.save(engine.export_state())
        bm = BackupManager(rdb)
        b1 = bm.create_backup()
        b2 = bm.create_backup()
        assert bm.list_backups() == sorted([b1, b2])
        os.remove(rdb.path)
        bm.restore_backup(b1)
        assert rdb.load() is not None


class TestManagerIntegration:
    def test_end_to_end_recovery_aof_only(self, tmp_path, rng):
        engine, pm = make_manager(tmp_path)
        db = engine.create_database("db")
        pm.log_create_database("db")
        col = db.create_collection(CFG())
        pm.log_create_collection(
            "db", "c", {"metric": 1, "hnsw": {"m": 8, "seed": 5}}
        )
        data = rng.standard_normal((10, 8)).astype(np.float32)
        ids = col.insert([(v, {"i": i}) for i, v in enumerate(data)])
        pm.log_insert_vectors(
            "db",
            "c",
            [
                {"id": vid, "elements": data[i].tolist(), "metadata": {"i": i}}
                for i, vid in enumerate(ids)
            ],
        )
        col.delete(ids[:2])
        pm.log_delete_vectors("db", "c", ids[:2])
        pm.stop()

        engine2, pm2 = make_manager(tmp_path)
        result = pm2.recover()
        assert result["rdb_loaded"] is False
        assert result["aof_commands"] == 4
        col2 = engine2.get_database("db").get_collection("c")
        assert col2.count() == 8
        assert col2.get(ids[5]).metadata == {"i": 5}
        pm2.stop()

    def test_snapshot_truncates_aof_and_combined_recovery(self, tmp_path, rng):
        engine, pm = make_manager(tmp_path)
        db = engine.create_database("db")
        pm.log_create_database("db")
        col = db.create_collection(CFG())
        pm.log_create_collection("db", "c", {"metric": 1, "hnsw": {"m": 8, "seed": 5}})
        data = rng.standard_normal((20, 8)).astype(np.float32)
        ids = col.insert([(v, None) for v in data])
        pm.log_insert_vectors(
            "db",
            "c",
            [{"id": vid, "elements": data[i].tolist()} for i, vid in enumerate(ids)],
        )
        pm.save_snapshot()
        assert pm.aof.size_bytes() == 0  # snapshot truncated the AOF

        # post-snapshot tail
        tail = rng.standard_normal((3, 8)).astype(np.float32)
        tail_ids = col.insert([(v, None) for v in tail])
        pm.log_insert_vectors(
            "db",
            "c",
            [{"id": vid, "elements": tail[i].tolist()} for i, vid in enumerate(tail_ids)],
        )
        pm.stop()

        engine2, pm2 = make_manager(tmp_path)
        result = pm2.recover()
        assert result["rdb_loaded"] is True
        assert result["aof_commands"] == 1
        col2 = engine2.get_database("db").get_collection("c")
        assert col2.count() == 23
        # search parity after combined recovery
        r1 = col.search(data[0], SearchParams(top_k=5))
        r2 = col2.search(data[0], SearchParams(top_k=5))
        assert [x.id for x in r1] == [x.id for x in r2]
        pm2.stop()

    def test_smart_snapshot_gate(self, tmp_path, rng):
        engine, pm = make_manager(
            tmp_path, snapshot_min_commands=5, snapshot_max_age_seconds=9999
        )
        engine.create_database("db")
        pm.log_create_database("db")
        assert pm.maybe_snapshot() is False  # 1 < 5 commands, young
        for i in range(5):
            pm.log_create_database(f"x{i}")  # log only; gate counts commands
        assert pm.maybe_snapshot() is True
        assert pm.maybe_snapshot() is False  # no longer dirty
        pm.stop()

    def test_smart_rewrite_gate(self, tmp_path, rng):
        engine, pm = make_manager(tmp_path, aof_rewrite_size_bytes=200)
        engine.create_database("db")
        for i in range(50):
            pm.log_create_database(f"noise{i}") if not engine.has_database(
                f"noise{i}"
            ) else None
        pm.aof.flush()
        assert pm.aof.size_bytes() > 200
        assert pm.maybe_rewrite_aof() is True
        # rewritten log replays to current state
        engine2, pm2 = make_manager(tmp_path)
        pm2.aof.close()
        pm2.aof = pm.aof  # same file
        seen = []
        pm.aof.replay(seen.append)
        assert any(c["database"] == "db" for c in seen)
        pm.stop()

    def test_rewrite_after_snapshot_preserves_deletes(self, tmp_path, rng):
        """Regression: a rewritten AOF is a full-state stream; replaying it on
        top of a stale RDB must not resurrect rows deleted since the
        snapshot. (insert 5 -> snapshot -> delete 1 -> rewrite -> recover)"""
        engine, pm = make_manager(tmp_path, aof_rewrite_size_bytes=1)
        col, data, ids = populate(engine, rng, n=5)
        pm.log_create_database("db")
        pm.log_create_collection(
            "db", "c", {"metric": int(DistanceMetric.L2),
                        "hnsw": {"m": 8, "seed": 5}}
        )
        pm.log_insert_vectors(
            "db", "c",
            [{"id": vid, "elements": data[i].tolist(), "metadata": {"i": i}}
             for i, vid in enumerate(ids)],
        )
        pm.save_snapshot()
        assert pm.rdb.exists()
        col.delete([ids[0]])
        pm.log_delete_vectors("db", "c", [ids[0]])
        pm.aof.flush()
        assert pm.maybe_rewrite_aof() is True
        pm.stop()

        engine2, pm2 = make_manager(tmp_path)
        pm2.recover()
        col2 = engine2.get_database("db").get_collection("c")
        assert col2.count() == 4
        with pytest.raises(ScintireteError):
            col2.get(ids[0])
        pm2.stop()

    def test_background_tasks_fire(self, tmp_path, rng):
        engine, pm = make_manager(
            tmp_path,
            rdb_interval_seconds=0.2,
            snapshot_min_commands=1,
            snapshot_max_age_seconds=0.0,
            aof_rewrite_check_seconds=60,
        )
        engine.create_database("db")
        pm.log_create_database("db")
        pm.start_background_tasks()
        deadline = time.time() + 5
        while time.time() < deadline and pm.stats()["snapshots"] == 0:
            time.sleep(0.05)
        pm.stop()
        assert pm.stats()["snapshots"] >= 1
        assert pm.rdb.exists()

    def test_bgsave_async(self, tmp_path, rng):
        engine, pm = make_manager(tmp_path)
        populate(engine, rng, n=5)
        t = pm.background_save()
        t.join(timeout=10)
        assert pm.rdb.exists()
        pm.stop()

    def test_stats(self, tmp_path):
        engine, pm = make_manager(tmp_path)
        engine.create_database("db")
        pm.log_create_database("db")
        st = pm.stats()
        assert st["aof_writes"] == 1
        assert st["dirty_commands"] == 1
        pm.stop()


class TestDegradedRecovery:
    """Corruption policy: warn + preserve + salvage instead of crash
    (reference degraded path: persistence.go:185-305)."""

    def _write_and_stop(self, tmp_path, rng, n=10):
        engine, pm = make_manager(tmp_path)
        db = engine.create_database("db")
        pm.log_create_database("db")
        db.create_collection(CFG())
        pm.log_create_collection(
            "db", "c", {"metric": 1, "hnsw": {"m": 8, "seed": 5}}
        )
        col = engine.get_database("db").get_collection("c")
        data = rng.standard_normal((n, 8)).astype(np.float32)
        ids = col.insert([(v, {"i": i}) for i, v in enumerate(data)])
        pm.log_insert_vectors(
            "db", "c",
            [{"id": vid, "elements": data[i].tolist(), "metadata": {"i": i}}
             for i, vid in enumerate(ids)],
        )
        pm.stop()
        return ids

    def test_corrupt_aof_tail_salvaged(self, tmp_path, rng):
        ids = self._write_and_stop(tmp_path, rng)
        aof_path = tmp_path / "data" / "appendonly.aof"
        good = aof_path.read_bytes()
        # crash mid-append: a record whose body was cut off
        aof_path.write_bytes(good + struct.pack("<I", 500) + b"partial")

        engine2, pm2 = make_manager(tmp_path)
        result = pm2.recover()
        assert result["aof_commands"] == 3  # all good records replayed
        assert result["degraded"] and result["degraded"][0]["source"] == "aof"
        detail = result["degraded"][0]
        assert detail["dropped_bytes"] == 4 + len(b"partial")
        assert os.path.exists(detail["preserved_as"])  # original kept
        # live log truncated back to a VALID file: replays cleanly now
        assert aof_path.read_bytes() == good
        col2 = engine2.get_database("db").get_collection("c")
        assert col2.count() == len(ids)
        # and stays appendable
        pm2.log_delete_vectors("db", "c", [ids[0]])
        pm2.stop()
        engine3, pm3 = make_manager(tmp_path)
        r3 = pm3.recover()
        assert r3["aof_commands"] == 4 and not r3["degraded"]
        pm3.stop()

    def test_corrupt_aof_tail_strict_raises(self, tmp_path, rng):
        self._write_and_stop(tmp_path, rng)
        aof_path = tmp_path / "data" / "appendonly.aof"
        aof_path.write_bytes(aof_path.read_bytes() + b"\x01")
        engine2, pm2 = make_manager(tmp_path, strict_recovery=True)
        with pytest.raises(ScintireteError) as exc:
            pm2.recover()
        assert exc.value.code == ErrorCode.CORRUPTED_DATA
        pm2.stop()

    def test_corrupt_rdb_set_aside(self, tmp_path, rng):
        engine, pm = make_manager(tmp_path)
        populate(engine, rng, n=5)
        pm.save_snapshot()
        # post-snapshot tail so AOF-only recovery still has something
        pm.log_create_database("after")
        engine.create_database("after")
        pm.stop()
        rdb_path = tmp_path / "data" / "vector.rdb"
        rdb_path.write_bytes(b"garbage-not-an-rdb")

        engine2, pm2 = make_manager(tmp_path)
        result = pm2.recover()
        assert result["rdb_loaded"] is False
        assert result["degraded"][0]["source"] == "rdb"
        assert os.path.exists(result["degraded"][0]["preserved_as"])
        assert not rdb_path.exists()  # moved aside, not deleted
        # AOF tail still recovered
        assert "after" in engine2.list_databases()
        pm2.stop()


class TestAdminCLI:
    def test_backup_create_list_restore_inspect(self, tmp_path, rng, capsys):
        from scintirete_tpu.cli.admin_main import main as admin

        engine, pm = make_manager(tmp_path)
        populate(engine, rng, n=5)
        pm.save_snapshot()
        pm.stop()
        data_dir = str(tmp_path / "data")

        assert admin(["-data-dir", data_dir, "backup", "create"]) == 0
        backup_path = capsys.readouterr().out.strip()
        assert os.path.exists(backup_path)

        assert admin(["-data-dir", data_dir, "backup", "list"]) == 0
        assert backup_path in capsys.readouterr().out

        # clobber the RDB, restore from backup, recover
        (tmp_path / "data" / "vector.rdb").write_bytes(b"junk")
        assert admin(
            ["-data-dir", data_dir, "backup", "restore", backup_path]
        ) == 0
        capsys.readouterr()
        engine2, pm2 = make_manager(tmp_path)
        result = pm2.recover()
        assert result["rdb_loaded"] is True
        assert engine2.get_database("db").get_collection("c").count() == 5
        pm2.stop()

        assert admin(["-data-dir", data_dir, "inspect"]) == 0
        import json as _json

        info = _json.loads(capsys.readouterr().out)
        assert info["rdb"]["exists"] and info["backups"]

    def test_memstat(self, tmp_path, rng, capsys):
        from scintirete_tpu.cli.admin_main import main as admin

        engine, pm = make_manager(tmp_path)
        populate(engine, rng, n=7)
        pm.save_snapshot()
        pm.stop()
        data_dir = str(tmp_path / "data")

        assert admin(["-data-dir", data_dir, "memstat"]) == 0
        import json as _json

        rep = _json.loads(capsys.readouterr().out)
        col = rep["databases"]["db"]["c"]
        assert col["count"] == 7 and col["live"] == 7
        assert col["snapshot_bytes"] > 0
        assert col["snapshot_arrays"]["vectors"] == 7 * col["dim"] * 4
        assert rep["totals"]["est_host_ram_bytes"] >= col["snapshot_bytes"]
        # missing RDB -> error exit
        assert admin(["-data-dir", str(tmp_path), "memstat"]) == 1


class TestReviewHardening:
    """Round-3 deep-review fixes: recovery must degrade, never crash, on
    log/snapshot damage or races the write path permits."""

    def test_metadata_nd_sentinel_key_roundtrips(self, tmp_path, rng):
        """User metadata containing the serializer's '__nd__' sentinel key
        must survive a save/recover cycle (a loose sentinel check used to
        raise at decode, classified as corruption -> silent data loss)."""
        engine, pm = make_manager(tmp_path)
        db = engine.create_database("db")
        col = db.create_collection(CFG())
        evil = {"__nd__": True, "note": "user data"}
        ids = col.insert([([1.0] * 8, evil)])
        pm.log_create_database("db")
        pm.log_create_collection("db", "c", {"metric": 1, "hnsw": {}})
        pm.log_insert_vectors("db", "c", [
            {"id": ids[0], "elements": [1.0] * 8, "metadata": evil}
        ])
        pm.stop()
        engine2, pm2 = make_manager(tmp_path)
        info = pm2.recover()
        assert not info["degraded"]
        got = engine2.get_database("db").get_collection("c").get(ids[0])
        assert got.metadata == evil
        pm2.stop()

    def test_structurally_damaged_rdb_sets_aside(self, tmp_path, rng):
        """A decodable snapshot with a missing required graph field must go
        down the degraded path (set aside + AOF-only recovery), not abort
        startup with a KeyError."""
        from scintirete_tpu.persistence import serde

        engine, pm = make_manager(tmp_path)
        populate(engine, rng, n=5)
        pm.save_snapshot()
        pm.stop()
        path = pm.rdb.path
        from scintirete_tpu.persistence.rdb import MAGIC
        raw = open(path, "rb").read()
        state = serde.loads(raw[len(MAGIC):])
        graph = next(
            iter(next(iter(state["databases"].values()))
                 ["collections"].values())
        )["graph"]
        del graph["count"]
        with open(path, "wb") as fh:
            fh.write(MAGIC)
            fh.write(serde.dumps(state))

        engine2, pm2 = make_manager(tmp_path)
        info = pm2.recover()
        assert any(d["source"] == "rdb" for d in info["degraded"])
        assert not info["rdb_loaded"]
        pm2.stop()

    def test_out_of_order_aof_degrades_not_aborts(self, tmp_path, rng):
        """Engine mutations and AOF appends are not atomic: a replay
        failure on one record (insert after drop) must warn and continue,
        not make the whole log unreplayable."""
        engine, pm = make_manager(tmp_path)
        col, data, ids = populate(engine, rng, n=3)
        pm.log_create_database("db")
        # simulate the race: the drop won the AOF gate before an insert
        pm.log_drop_collection("db", "c")
        pm.log_insert_vectors("db", "c", [
            {"id": 99, "elements": [0.0] * 8, "metadata": None}
        ])
        pm.stop()
        engine2, pm2 = make_manager(tmp_path)
        info = pm2.recover()
        assert any(d["source"] == "aof_apply" for d in info["degraded"])
        assert "db" in engine2.list_databases()
        pm2.stop()
        # strict mode still refuses
        engine3, pm3 = make_manager(tmp_path, strict_recovery=True)
        with pytest.raises(ScintireteError):
            pm3.recover()
        pm3.stop()

    def test_rewrite_preserves_next_id_high_water(self, tmp_path, rng):
        """AOF rewrite only streams live vectors; the auto-ID high-water
        mark must ride along or a restart reuses deleted vectors' ids."""
        engine, pm = make_manager(tmp_path, aof_rewrite_size_bytes=1)
        col, data, ids = populate(engine, rng, n=10)
        pm.log_create_database("db")
        pm.log_create_collection("db", "c", {"metric": 1, "hnsw": {}})
        col.delete([ids[-1]])  # delete the highest id
        assert pm.maybe_rewrite_aof()
        pm.stop()
        engine2, pm2 = make_manager(tmp_path)
        pm2.recover()
        col2 = engine2.get_database("db").get_collection("c")
        new_ids = col2.insert([([2.0] * 8, None)])
        assert new_ids[0] > max(ids)  # not a reused id
        pm2.stop()


class TestCorruptionFuzz:
    """Property-level corruption robustness: flip ONE random byte anywhere
    in the AOF or RDB and recovery (non-strict) must never raise — it
    either replays what it can (flip in a value), salvages a valid prefix
    (flip in framing), or sets the file aside (flip in the snapshot), and
    the engine stays usable afterwards. Neither format carries per-record
    checksums (same contract as the reference's FlatBuffers files), so
    silent value changes are allowed; crashes are not."""

    def _seed_state(self, tmp_path, rng, with_snapshot):
        engine, pm = make_manager(tmp_path)
        db = engine.create_database("db")
        pm.log_create_database("db")
        db.create_collection(CFG())
        pm.log_create_collection(
            "db", "c", {"metric": 1, "hnsw": {"m": 8, "seed": 5}}
        )
        col = engine.get_database("db").get_collection("c")
        data = rng.standard_normal((12, 8)).astype(np.float32)
        ids = col.insert([(v, {"i": i}) for i, v in enumerate(data)])
        pm.log_insert_vectors(
            "db", "c",
            [{"id": vid, "elements": data[i].tolist(), "metadata": {"i": i}}
             for i, vid in enumerate(ids)],
        )
        if with_snapshot:
            pm.save_snapshot()
            pm.log_delete_vectors("db", "c", [ids[0]])
        pm.stop()
        return ids

    @pytest.mark.parametrize("target", ["aof", "rdb"])
    def test_single_byte_flips_never_crash(self, tmp_path, target):
        rng = np.random.default_rng(1234)
        base_dir = tmp_path / "seedstate"
        base_dir.mkdir()
        self._seed_state(base_dir, rng, with_snapshot=(target == "rdb"))
        fname = "appendonly.aof" if target == "aof" else "vector.rdb"
        good = (base_dir / "data" / fname).read_bytes()
        assert len(good) > 0

        flips = np.random.default_rng(99).integers(
            0, len(good), 24
        )
        for trial, pos in enumerate(flips):
            tdir = tmp_path / f"t{target}{trial}"
            import shutil

            shutil.copytree(base_dir, tdir)
            p = tdir / "data" / fname
            buf = bytearray(good)
            buf[pos] ^= 0xFF
            p.write_bytes(bytes(buf))

            engine2, pm2 = make_manager(tdir)
            try:
                result = pm2.recover()  # must NOT raise in non-strict mode
                # engine stays usable: a fresh write-path round trip
                if not engine2.has_database("db"):
                    engine2.create_database("db")
                pm2.log_create_database("fuzzcheck")
                engine2.create_database("fuzzcheck")
                assert isinstance(result.get("degraded"), list)
            finally:
                pm2.stop()


class TestMemstatSharded:
    def test_memstat_aggregates_sharded_graphs(self):
        """Sharded snapshots nest per-shard graph dicts; memstat must
        aggregate them, not report ~zero for the whole collection."""
        from scintirete_tpu.cli.admin_main import _memstat

        sub = {
            "kind": "hnsw",
            "count": 1000,
            "live": 990,
            "dim": 16,
            "vectors": np.zeros((1000, 16), np.float32),
            "levels": np.zeros(1000, np.int8),
            "deleted": np.zeros(1000, bool),
            "neighbors0": np.zeros((1000, 16), np.int32),
            "params": {"m": 8},
        }
        state = {
            "version": "1.0",
            "databases": {
                "db": {
                    "collections": {
                        "c": {
                            "graph": {
                                "sharded": True,
                                "dim": 16,
                                "metric": 1,
                                "shards": [dict(sub), dict(sub)],
                            },
                            "metadata": {},
                        }
                    }
                }
            },
        }
        rep = _memstat(state)["databases"]["db"]["c"]
        assert rep["count"] == 2000
        assert rep["live"] == 1980
        assert rep["shards"] == 2
        assert rep["snapshot_bytes"] >= 2 * sub["vectors"].nbytes
