"""Reference FlatBuffers format interop (persistence/fbcompat.py).

The reference persists FlatBuffers AOF/RDB (schemas/flatbuffers/*.fbs);
these tests round-trip files through our hand-rolled writer/reader, import
them into a live Engine, and verify searches return the imported data.
The writer exists precisely so import can be tested without a Go binary:
it follows the generated Go builder call order (aof.go:339-346), which is
the same vtable slot layout the reference produces.
"""

import json
import os
import struct

import numpy as np
import pytest

from scintirete_tpu.engine import Engine
from scintirete_tpu.engine.database import make_command
from scintirete_tpu.persistence import fbcompat
from scintirete_tpu.types import (
    CollectionConfig,
    DistanceMetric,
    HNSWParams,
    SearchParams,
)


def _sample_commands():
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((12, 16)).astype(np.float32)
    return [
        make_command("CREATE_DATABASE", "mydb", args={"name": "mydb"},
                     timestamp=100.0),
        make_command(
            "CREATE_COLLECTION",
            "mydb",
            "vecs",
            {
                "name": "vecs",
                "config": {
                    "metric": int(DistanceMetric.L2),
                    "hnsw": {
                        "m": 8,
                        "ef_construction": 40,
                        "ef_search": 30,
                        "max_layers": 12,
                        "seed": 9,
                    },
                },
            },
            timestamp=101.0,
        ),
        make_command(
            "INSERT_VECTORS",
            "mydb",
            "vecs",
            {
                "vectors": [
                    {
                        "id": i + 1,
                        "elements": vecs[i],
                        "metadata": {"tag": f"v{i}"} if i % 2 == 0 else None,
                    }
                    for i in range(len(vecs))
                ]
            },
            timestamp=102.0,
        ),
        make_command(
            "DELETE_VECTORS", "mydb", "vecs", {"ids": ["3", "4"]},
            timestamp=103.0,
        ),
    ], vecs


class TestAOFRoundTrip:
    def test_commands_round_trip(self, tmp_path):
        cmds, vecs = _sample_commands()
        path = str(tmp_path / "ref.aof")
        assert fbcompat.write_aof(cmds, path) == 4
        back = list(fbcompat.iter_aof(path))
        assert [c["command_type"] for c in back] == [
            "CREATE_DATABASE",
            "CREATE_COLLECTION",
            "INSERT_VECTORS",
            "DELETE_VECTORS",
        ]
        assert back[0]["database"] == "mydb"
        assert back[0]["args"]["name"] == "mydb"
        assert back[0]["timestamp"] == 100.0
        cfg = back[1]["args"]["config"]
        assert cfg["metric"] == int(DistanceMetric.L2)
        assert cfg["hnsw"] == {
            "m": 8,
            "ef_construction": 40,
            "ef_search": 30,
            "max_layers": 12,
            "seed": 9,
        }
        ins = back[2]["args"]["vectors"]
        assert [v["id"] for v in ins] == list(range(1, 13))
        np.testing.assert_allclose(ins[0]["elements"], vecs[0])
        np.testing.assert_allclose(ins[11]["elements"], vecs[11])
        assert ins[0]["metadata"] == {"tag": "v0"}
        assert ins[1]["metadata"] is None  # "{}" -> None
        assert back[3]["args"]["ids"] == ["3", "4"]

    def test_framing_matches_reference(self, tmp_path):
        """u32 LE length prefix per record (aof.go:115-125)."""
        cmds, _ = _sample_commands()
        path = str(tmp_path / "ref.aof")
        fbcompat.write_aof(cmds[:1], path)
        raw = open(path, "rb").read()
        (length,) = struct.unpack_from("<I", raw, 0)
        assert length == len(raw) - 4

    def test_torn_record_is_an_error(self, tmp_path):
        cmds, _ = _sample_commands()
        path = str(tmp_path / "ref.aof")
        fbcompat.write_aof(cmds[:2], path)
        raw = open(path, "rb").read()
        with open(path, "wb") as f:
            f.write(raw[:-5])
        with pytest.raises(ValueError, match="truncated"):
            list(fbcompat.iter_aof(path))

    def test_import_aof_into_engine(self, tmp_path):
        cmds, vecs = _sample_commands()
        path = str(tmp_path / "ref.aof")
        fbcompat.write_aof(cmds, path)
        engine = Engine(use_device=False)
        stats = fbcompat.import_reference(engine, aof_path=path)
        assert stats["aof_commands"] == 4
        col = engine.get_database("mydb").get_collection("vecs")
        assert col.count() == 10  # 12 inserted - 2 deleted
        hits = col.search(vecs[0], SearchParams(top_k=1))
        assert hits[0].id == 1
        assert hits[0].metadata == {"tag": "v0"}
        # hnsw params survived the trip
        assert col.config.hnsw.m == 8
        assert col.config.hnsw.seed == 9


class TestRDBRoundTrip:
    def _populated_engine(self, n=40, dim=12, index_type="hnsw"):
        engine = Engine(use_device=False)
        db = engine.create_database("refdb")
        col = db.create_collection(
            CollectionConfig(
                name="c1",
                metric=DistanceMetric.COSINE,
                hnsw=HNSWParams(m=8, ef_construction=40, ef_search=30, seed=3),
                index_type=index_type,
            )
        )
        rng = np.random.default_rng(11)
        data = rng.standard_normal((n, dim)).astype(np.float32)
        ids = col.insert([(v, {"i": i}) for i, v in enumerate(data)])
        col.delete(ids[:3])
        return engine, col, data, ids

    def test_export_then_read(self, tmp_path):
        engine, col, data, ids = self._populated_engine()
        path = str(tmp_path / "ref.rdb")
        stats = fbcompat.export_rdb(engine, path)
        assert stats == {"databases": 1, "collections": 1, "vectors": 40}
        snap = fbcompat.read_rdb(path)
        assert snap["version"] == "1.0"
        col_state = snap["databases"]["refdb"]["collections"]["c1"]
        assert col_state["config"]["metric"] == int(DistanceMetric.COSINE)
        assert col_state["config"]["hnsw"]["m"] == 8
        nodes = col_state["vectors"]
        assert len(nodes) == 40
        deleted = [v for v in nodes if v["deleted"]]
        assert {v["id"] for v in deleted} == set(ids[:3])
        by_id = {v["id"]: v for v in nodes}
        np.testing.assert_allclose(by_id[ids[5]]["elements"], data[5],
                                   rtol=1e-6)
        assert by_id[ids[5]]["metadata"] == {"i": 5}
        assert col_state["vector_count"] == 37
        assert col_state["deleted_count"] == 3
        assert col_state["entrypoint_id"]  # hnsw export carries an entry

    def test_export_has_layer_connections(self, tmp_path):
        """Reference restore hard-errors without graph edges
        (database.go:461-463) — verify exported nodes carry adjacency."""
        engine, col, data, ids = self._populated_engine()
        path = str(tmp_path / "ref.rdb")
        fbcompat.export_rdb(engine, path)
        # walk the raw buffer: every live node must list >=1 neighbor at
        # layer 0 and every neighbor id must be a known node id
        buf = open(path, "rb").read()
        snap = fbcompat._Tbl(fbcompat._root(buf))
        graph = snap.vec_table(2, 0).vec_table(1, 0).table(3)
        all_ids = set()
        for k in range(graph.vec_len(0)):
            all_ids.add(int(graph.vec_table(0, k).string(0)))
        checked = 0
        for k in range(graph.vec_len(0)):
            node = graph.vec_table(0, k)
            if node.boolean(3):
                continue
            assert node.vec_len(4) >= 1  # layer_connections present
            layer0 = node.vec_table(4, 0)
            assert layer0.i32(0) == 0
            n_nbrs = layer0.vec_len(1)
            assert n_nbrs >= 1
            for j in range(n_nbrs):
                assert int(layer0.vec_string(1, j)) in all_ids
            checked += 1
        assert checked == 37

    def test_import_into_fresh_engine_and_search(self, tmp_path):
        engine, col, data, ids = self._populated_engine()
        path = str(tmp_path / "ref.rdb")
        fbcompat.export_rdb(engine, path)

        engine2 = Engine(use_device=False)
        stats = fbcompat.import_reference(engine2, rdb_path=path)
        assert stats["vectors"] == 37 and stats["deleted"] == 3
        col2 = engine2.get_database("refdb").get_collection("c1")
        assert col2.count() == 37
        # deleted ids stay dead, live ids searchable with metadata
        q = data[10]
        hits = col2.search(q, SearchParams(top_k=3))
        assert hits[0].id == ids[10]
        assert hits[0].metadata == {"i": 10}
        live3 = col2.get_multiple(ids[:3])
        assert live3 == []
        # auto-ID high-water survived: new inserts don't collide
        new_ids = col2.insert([(data[0] + 1.0, None)])
        assert new_ids[0] > max(ids)

    def test_import_flat_collection(self, tmp_path):
        engine, col, data, ids = self._populated_engine(index_type="flat")
        path = str(tmp_path / "ref.rdb")
        fbcompat.export_rdb(engine, path)
        engine2 = Engine(use_device=False)
        fbcompat.import_reference(engine2, rdb_path=path, index_type="flat")
        col2 = engine2.get_database("refdb").get_collection("c1")
        assert col2.count() == 37
        hits = col2.search(data[20], SearchParams(top_k=1))
        assert hits[0].id == ids[20]

    def test_rdb_then_aof_tail(self, tmp_path):
        """Reference startup order: snapshot first, AOF tail on top —
        overlapping inserts must be idempotent (persistence.go recovery)."""
        engine, col, data, ids = self._populated_engine()
        rdb_path = str(tmp_path / "ref.rdb")
        fbcompat.export_rdb(engine, rdb_path)
        tail = [
            # overlap: re-insert an id already in the snapshot
            make_command(
                "INSERT_VECTORS",
                "refdb",
                "c1",
                {"vectors": [
                    {"id": ids[5], "elements": data[5], "metadata": None},
                    {"id": 10_000, "elements": data[0] * 2, "metadata": None},
                ]},
            ),
            make_command("DELETE_VECTORS", "refdb", "c1",
                         {"ids": [str(ids[6])]}),
        ]
        aof_path = str(tmp_path / "ref.aof")
        fbcompat.write_aof(tail, aof_path)
        engine2 = Engine(use_device=False)
        fbcompat.import_reference(engine2, rdb_path=rdb_path,
                                  aof_path=aof_path)
        col2 = engine2.get_database("refdb").get_collection("c1")
        # 37 live + 1 new - 1 deleted
        assert col2.count() == 37
        assert col2.get_multiple([10_000])[0].id == 10_000
        assert col2.get_multiple([ids[6]]) == []

    def test_legacy_vectors_only_snapshot(self, tmp_path):
        """Old reference snapshots carry vectors without an hnsw_graph
        (rdb.fbs:64) — the reader falls back to the legacy list."""
        import flatbuffers as fb

        b = fb.Builder(1024)
        vec_off = fbcompat._wr_vector(
            b, {"id": 42, "elements": np.ones(4, np.float32),
                "metadata": {"a": 1}}
        )
        vecs_off = fbcompat._wr_offset_vec(b, [vec_off])
        cfg_off = fbcompat._wr_config(
            b, "legacy", {"metric": 1, "hnsw": {"m": 8}}
        )
        cname = b.CreateString("legacy")
        b.StartObject(8)
        b.PrependUOffsetTRelativeSlot(0, cname, 0)
        b.PrependUOffsetTRelativeSlot(1, cfg_off, 0)
        b.PrependUOffsetTRelativeSlot(2, vecs_off, 0)  # legacy field
        col_off = b.EndObject()
        cols_off = fbcompat._wr_offset_vec(b, [col_off])
        dbname = b.CreateString("old")
        b.StartObject(3)
        b.PrependUOffsetTRelativeSlot(0, dbname, 0)
        b.PrependUOffsetTRelativeSlot(1, cols_off, 0)
        db_off = b.EndObject()
        dbs_off = fbcompat._wr_offset_vec(b, [db_off])
        ver = b.CreateString("1.0")
        b.StartObject(4)
        b.PrependUOffsetTRelativeSlot(0, ver, 0)
        b.PrependUOffsetTRelativeSlot(2, dbs_off, 0)
        b.Finish(b.EndObject())
        path = str(tmp_path / "legacy.rdb")
        open(path, "wb").write(bytes(b.Output()))

        snap = fbcompat.read_rdb(path)
        nodes = snap["databases"]["old"]["collections"]["legacy"]["vectors"]
        assert len(nodes) == 1
        assert nodes[0]["id"] == 42 and not nodes[0]["deleted"]
        assert nodes[0]["metadata"] == {"a": 1}

        engine = Engine(use_device=False)
        fbcompat.import_reference(engine, rdb_path=path)
        col = engine.get_database("old").get_collection("legacy")
        assert col.count() == 1


class TestAdminCLI:
    def test_import_reference_command(self, tmp_path, capsys):
        cmds, vecs = _sample_commands()
        aof_path = str(tmp_path / "appendonly.aof")
        fbcompat.write_aof(cmds, aof_path)
        data_dir = str(tmp_path / "data")
        from scintirete_tpu.cli.admin_main import main

        rc = main([
            "-data-dir", data_dir,
            "import-reference", "--ref-aof", aof_path,
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["imported"]["aof_commands"] == 4
        # the import landed in OUR persistence format: a restartable engine
        from scintirete_tpu.engine import Engine as Eng
        from scintirete_tpu.persistence import PersistenceManager

        engine = Eng(use_device=False)
        pm = PersistenceManager(engine, data_dir)
        pm.recover()
        col = engine.get_database("mydb").get_collection("vecs")
        assert col.count() == 10
        pm.stop()
