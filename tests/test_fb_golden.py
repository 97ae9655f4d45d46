"""Golden byte fixtures for the reference FlatBuffers wire format.

tests/test_fbcompat.py round-trips files through our OWN writer + reader —
a shared encode/decode bug (e.g. a wrong vtable slot number copied into
both) would round-trip cleanly and never be caught. These tests break that
blind spot in both directions with code that shares NOTHING with
persistence/fbcompat.py or the flatbuffers runtime:

- ``Asm`` assembles buffers front-to-back straight from the FlatBuffers
  internals spec (root uoffset; table = soffset32-to-vtable + inline
  fields; vtable = u16 size, u16 table size, u16 per-slot offsets;
  string = u32 len + bytes + NUL; vector = u32 count + payload) with
  field layout hand-derived from /root/reference/schemas/flatbuffers/
  rdb.fbs:20-87 and aof.fbs:37-96. Its outputs are CHECKED IN under
  tests/golden/ and pinned byte-for-byte — fbcompat's readers must decode
  them field-exactly.
- ``R`` is an independent spec-level reader; fbcompat's writers must
  produce buffers it decodes field-exactly (including the reference's
  hard requirement that entrypoint_id parses as a uint64, rdb.go:1080).

One fixture (aof_create_db.bin) is additionally spelled out as a byte
literal with per-field comments, anchoring Asm itself to the spec.
"""

import json
import struct
from pathlib import Path

import numpy as np

from scintirete_tpu.engine import Engine
from scintirete_tpu.engine.database import make_command
from scintirete_tpu.persistence import fbcompat
from scintirete_tpu.types import (
    CollectionConfig,
    DistanceMetric,
    HNSWParams,
)

GOLDEN = Path(__file__).parent / "golden"


# ---------------------------------------------------------------------------
# independent spec-level assembler (write side of the fixtures)


class Asm:
    """Front-to-back FlatBuffers assembly: parents first, children after
    (uoffsets are unsigned and point forward), parent fields patched once
    the child's address is known."""

    def __init__(self):
        self.b = bytearray(8)  # u32 root uoffset (patched) + 4 pad

    def pad(self, align: int, phase: int = 0) -> None:
        while len(self.b) % align != phase:
            self.b += b"\x00"

    def patch(self, pos: int, target: int) -> None:
        struct.pack_into("<I", self.b, pos, target - pos)

    def uoff(self) -> int:
        """Placeholder uoffset; returns the position to patch later."""
        pos = len(self.b)
        self.b += b"\x00\x00\x00\x00"
        return pos

    def table(self, fields):
        """Emit vtable + table. ``fields``: [(slot, kind, value)] with kind
        in i8/u8/bool/i32/i64/uoff (uoff values ignored — placeholders).
        Returns (table_pos, {slot: patch_pos})."""
        sizes = {"i8": 1, "u8": 1, "bool": 1, "i32": 4, "i64": 8, "uoff": 4}
        ordered = sorted(fields, key=lambda f: -sizes[f[1]])
        off, slot_off = 4, {}
        for slot, kind, _ in ordered:
            sz = sizes[kind]
            off = (off + sz - 1) // sz * sz
            slot_off[slot] = off
            off += sz
        tbl_size = (off + 3) // 4 * 4
        n_slots = max(s for s, _, _ in fields) + 1
        self.pad(2)
        vt_pos = len(self.b)
        self.b += struct.pack("<HH", 4 + 2 * n_slots, tbl_size)
        for s in range(n_slots):
            self.b += struct.pack("<H", slot_off.get(s, 0))
        # absolute alignment: an i64 at table+8k must land 8-aligned
        self.pad(8, phase=4 if any(k == "i64" for _, k, _ in fields) else 0)
        self.pad(4)
        t_pos = len(self.b)
        self.b += struct.pack("<i", t_pos - vt_pos)
        patches = {}
        body = bytearray(tbl_size - 4)
        for slot, kind, val in ordered:
            o = slot_off[slot] - 4
            if kind == "uoff":
                patches[slot] = t_pos + 4 + o
            elif kind == "i64":
                struct.pack_into("<q", body, o, val)
            elif kind == "i32":
                struct.pack_into("<i", body, o, val)
            else:
                struct.pack_into("<B", body, o, int(val) & 0xFF)
        self.b += body
        return t_pos, patches

    def string(self, s: str) -> int:
        self.pad(4)
        pos = len(self.b)
        data = s.encode("utf-8")
        self.b += struct.pack("<I", len(data)) + data + b"\x00"
        return pos

    def f32vec(self, vals) -> int:
        self.pad(4)
        pos = len(self.b)
        self.b += struct.pack("<I", len(vals))
        self.b += np.asarray(vals, "<f4").tobytes()
        return pos

    def offvec(self, n: int):
        """Vector of n uoffsets; returns (pos, [patch positions])."""
        self.pad(4)
        pos = len(self.b)
        self.b += struct.pack("<I", n)
        return pos, [self.uoff() for _ in range(n)]

    def finish(self, root_pos: int) -> bytes:
        self.patch(0, root_pos)
        return bytes(self.b)


# ---------------------------------------------------------------------------
# independent spec-level reader (validates fbcompat's WRITERS)


class R:
    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos = buf, pos

    @classmethod
    def root(cls, buf: bytes) -> "R":
        return cls(buf, struct.unpack_from("<I", buf, 0)[0])

    def _field(self, slot: int) -> int:
        vt = self.pos - struct.unpack_from("<i", self.buf, self.pos)[0]
        vt_size = struct.unpack_from("<H", self.buf, vt)[0]
        fo = 4 + 2 * slot
        if fo >= vt_size:
            return 0
        return struct.unpack_from("<H", self.buf, vt + fo)[0]

    def _indirect(self, pos: int) -> int:
        return pos + struct.unpack_from("<I", self.buf, pos)[0]

    def scalar(self, slot: int, fmt: str, default=0):
        o = self._field(slot)
        if not o:
            return default
        return struct.unpack_from(fmt, self.buf, self.pos + o)[0]

    def string(self, slot: int, default: str = "") -> str:
        o = self._field(slot)
        if not o:
            return default
        p = self._indirect(self.pos + o)
        n = struct.unpack_from("<I", self.buf, p)[0]
        return self.buf[p + 4 : p + 4 + n].decode("utf-8")

    def table(self, slot: int):
        o = self._field(slot)
        return R(self.buf, self._indirect(self.pos + o)) if o else None

    def vec_len(self, slot: int) -> int:
        o = self._field(slot)
        if not o:
            return 0
        return struct.unpack_from("<I", self.buf, self._indirect(self.pos + o))[0]

    def _vec_base(self, slot: int) -> int:
        return self._indirect(self.pos + self._field(slot)) + 4

    def vec_table(self, slot: int, j: int) -> "R":
        return R(self.buf, self._indirect(self._vec_base(slot) + 4 * j))

    def vec_string(self, slot: int, j: int) -> str:
        p = self._indirect(self._vec_base(slot) + 4 * j)
        n = struct.unpack_from("<I", self.buf, p)[0]
        return self.buf[p + 4 : p + 4 + n].decode("utf-8")

    def vec_f32(self, slot: int) -> np.ndarray:
        base = self._vec_base(slot)
        n = self.vec_len(slot)
        return np.frombuffer(self.buf, "<f4", count=n, offset=base).copy()


# ---------------------------------------------------------------------------
# fixture builders (layouts hand-derived from the .fbs declaration order)


def _aof_create_db_literal() -> bytes:
    """AOFCommand{timestamp=1700000000, CREATE_DATABASE,
    args=CreateDatabaseArgs{name="golden"}, database="golden"} spelled
    out byte-for-byte (aof.fbs:84-96; union = type slot + value slot)."""
    return (
        struct.pack("<I", 24)  # 0: root uoffset -> table at 24
        + b"\x00" * 4  # 4: pad
        # 8: AOFCommand vtable: 14 bytes, table 24 bytes; slots:
        #    timestamp@8 command_type@16 args_type@17 args@4 database@20
        + struct.pack("<7H", 14, 24, 8, 16, 17, 4, 20)
        + b"\x00" * 2  # 22: pad to the 8-phase the i64 needs
        + struct.pack("<i", 16)  # 24: soffset -> vtable at 8
        + struct.pack("<I", 28)  # 28: args uoffset -> 56
        + struct.pack("<q", 1700000000)  # 32: timestamp
        + bytes([1, 1])  # 40: command_type=CREATE_DATABASE, 41: args_type
        + b"\x00" * 2  # 42: pad
        + struct.pack("<I", 32)  # 44: database uoffset -> 76
        # 48: CreateDatabaseArgs vtable: 6 bytes, table 8; name@4
        + struct.pack("<3H", 6, 8, 4)
        + b"\x00" * 2  # 54: pad
        + struct.pack("<i", 8)  # 56: soffset -> vtable at 48
        + struct.pack("<I", 4)  # 60: name uoffset -> 64
        + struct.pack("<I", 6) + b"golden\x00"  # 64: string "golden"
        + b"\x00"  # 75: pad
        + struct.pack("<I", 6) + b"golden\x00"  # 76: string "golden"
    )


def _aof_insert_fixture() -> bytes:
    """AOFCommand{INSERT_VECTORS, 1 vector} via Asm."""
    a = Asm()
    cmd, p = a.table([
        (0, "i64", 1711111111), (1, "i8", 5), (2, "u8", 5),
        (3, "uoff", None), (4, "uoff", None), (5, "uoff", None),
    ])
    args, pa = a.table([(0, "uoff", None)])  # InsertVectorsArgs.vectors
    a.patch(p[3], args)
    vpos, velems = a.offvec(1)
    a.patch(pa[0], vpos)
    vec, pv = a.table([(0, "uoff", None), (1, "uoff", None), (2, "uoff", None)])
    a.patch(velems[0], vec)
    a.patch(pv[0], a.string("42"))
    a.patch(pv[1], a.f32vec([1.5, -2.25, 0.125]))
    a.patch(pv[2], a.string(json.dumps({"tag": "gold"})))
    a.patch(p[4], a.string("db1"))
    a.patch(p[5], a.string("col1"))
    return a.finish(cmd)


def _rdb_fixture() -> bytes:
    """A full RDBSnapshot tree via Asm (rdb.fbs:20-87)."""
    a = Asm()
    snap, ps = a.table([
        (0, "uoff", None), (1, "i64", 1234567890),
        (2, "uoff", None), (3, "uoff", None),
    ])
    a.patch(ps[0], a.string("1.0"))
    dbs, dvec = a.offvec(1)
    a.patch(ps[2], dbs)
    db, pd = a.table([(0, "uoff", None), (1, "uoff", None), (2, "i64", 100)])
    a.patch(dvec[0], db)
    a.patch(pd[0], a.string("db"))
    cols, cvec = a.offvec(1)
    a.patch(pd[1], cols)
    col, pc = a.table([
        (0, "uoff", None), (1, "uoff", None), (3, "uoff", None),
        (4, "i64", 1), (5, "i64", 1), (6, "i64", 111), (7, "i64", 222),
    ])
    a.patch(cvec[0], col)
    a.patch(pc[0], a.string("c"))
    cfg, pcfg = a.table([(0, "uoff", None), (1, "i8", 1), (2, "uoff", None)])
    a.patch(pc[1], cfg)
    a.patch(pcfg[0], a.string("c"))
    hp, _ = a.table([
        (0, "i32", 8), (1, "i32", 100), (2, "i32", 40),
        (3, "i32", 6), (4, "i64", 42),
    ])
    a.patch(pcfg[2], hp)
    graph, pg = a.table([
        (0, "uoff", None), (1, "uoff", None), (2, "i32", 1), (3, "i32", 2),
    ])
    a.patch(pc[3], graph)
    nodes, nvec = a.offvec(2)
    a.patch(pg[0], nodes)
    a.patch(pg[1], a.string("7"))
    n1, pn1 = a.table([
        (0, "uoff", None), (1, "uoff", None), (2, "uoff", None),
        (3, "bool", 0), (4, "uoff", None), (5, "i32", 1),
    ])
    a.patch(nvec[0], n1)
    a.patch(pn1[0], a.string("7"))
    a.patch(pn1[1], a.f32vec([1.5, -2.0]))
    a.patch(pn1[2], a.string(json.dumps({"k": "v"})))
    lcs1, lvec1 = a.offvec(1)
    a.patch(pn1[4], lcs1)
    lc1, plc1 = a.table([(0, "i32", 0), (1, "uoff", None)])
    a.patch(lvec1[0], lc1)
    ids1, ivec1 = a.offvec(1)
    a.patch(plc1[1], ids1)
    a.patch(ivec1[0], a.string("9"))
    n2, pn2 = a.table([
        (0, "uoff", None), (1, "uoff", None), (3, "bool", 1), (5, "i32", 0),
    ])
    a.patch(nvec[1], n2)
    a.patch(pn2[0], a.string("9"))
    a.patch(pn2[1], a.f32vec([0.25, 4.0]))
    a.patch(ps[3], a.string("{}"))
    return a.finish(snap)


# ---------------------------------------------------------------------------
# reader-side tests: fbcompat must decode the checked-in fixtures exactly


def _pinned(name: str, builder) -> bytes:
    """The committed fixture must equal the in-test assembly (no drift),
    and the tests below decode the COMMITTED bytes."""
    blob = builder()
    disk = (GOLDEN / name).read_bytes()
    assert disk == blob, f"tests/golden/{name} drifted from its spec assembly"
    return disk


def test_golden_aof_create_db_literal():
    buf = _pinned("aof_create_db.bin", _aof_create_db_literal)
    cmd = fbcompat.parse_aof_command(buf)
    assert cmd == {
        "timestamp": 1700000000.0,
        "command_type": "CREATE_DATABASE",
        "database": "golden",
        "collection": "",
        "args": {"name": "golden"},
    }


def test_golden_aof_insert_vectors():
    buf = _pinned("aof_insert.bin", _aof_insert_fixture)
    cmd = fbcompat.parse_aof_command(buf)
    assert cmd["command_type"] == "INSERT_VECTORS"
    assert cmd["timestamp"] == 1711111111.0
    assert cmd["database"] == "db1" and cmd["collection"] == "col1"
    (v,) = cmd["args"]["vectors"]
    assert v["id"] == 42
    np.testing.assert_array_equal(v["elements"],
                                  np.array([1.5, -2.25, 0.125], np.float32))
    assert v["metadata"] == {"tag": "gold"}


def test_golden_rdb_snapshot(tmp_path):
    buf = _pinned("rdb_snapshot.bin", _rdb_fixture)
    path = tmp_path / "golden.rdb"
    path.write_bytes(buf)
    snap = fbcompat.read_rdb(str(path))
    assert snap["version"] == "1.0"
    assert snap["timestamp"] == 1234567890
    col = snap["databases"]["db"]["collections"]["c"]
    assert col["config"]["metric"] == 1  # L2
    assert col["config"]["hnsw"] == {
        "m": 8, "ef_construction": 100, "ef_search": 40,
        "max_layers": 6, "seed": 42,
    }
    assert col["entrypoint_id"] == "7"
    assert col["max_layer"] == 1
    assert col["vector_count"] == 1 and col["deleted_count"] == 1
    by_id = {v["id"]: v for v in col["vectors"]}
    assert not by_id[7]["deleted"] and by_id[9]["deleted"]
    np.testing.assert_array_equal(by_id[7]["elements"],
                                  np.array([1.5, -2.0], np.float32))
    assert by_id[7]["metadata"] == {"k": "v"}


# ---------------------------------------------------------------------------
# writer-side tests: independent reader over fbcompat's output


def test_writer_aof_against_independent_reader():
    cmd = make_command(
        "CREATE_COLLECTION", "mydb", "vecs",
        {
            "name": "vecs",
            "config": {
                "metric": int(DistanceMetric.INNER_PRODUCT),
                "hnsw": {"m": 12, "ef_construction": 77, "ef_search": 33,
                         "max_layers": 9, "seed": 5},
            },
        },
        timestamp=321.0,
    )
    buf = fbcompat.write_aof_command(cmd)
    r = R.root(buf)
    assert r.scalar(0, "<q") == 321  # timestamp
    assert r.scalar(1, "<b") == 3  # CommandType.CREATE_COLLECTION
    assert r.scalar(2, "<B") == 3  # union tag (member 3 of CommandArgs)
    assert r.string(4) == "mydb" and r.string(5) == "vecs"
    args = r.table(3)
    assert args.string(0) == "vecs"
    cfg = args.table(1)
    assert cfg.string(0) == "vecs"
    assert cfg.scalar(1, "<b") == 3  # INNER_PRODUCT
    hp = cfg.table(2)
    assert [hp.scalar(s, "<i") for s in range(4)] == [12, 77, 33, 9]
    assert hp.scalar(4, "<q") == 5


def test_writer_rdb_against_independent_reader(tmp_path):
    engine = Engine(use_device=False)
    db = engine.create_database("d")
    hcol = db.create_collection(CollectionConfig(
        name="h", metric=DistanceMetric.L2,
        hnsw=HNSWParams(m=8, ef_construction=40, ef_search=30, seed=3),
    ))
    hids = hcol.insert([(np.arange(4, dtype=np.float32) + i, {"i": i})
                        for i in range(5)])
    fcol = db.create_collection(CollectionConfig(
        name="f", metric=DistanceMetric.COSINE, index_type="flat",
    ))
    fids = fcol.insert([(np.ones(4, np.float32) * (i + 1), None)
                        for i in range(3)])
    fcol.delete(fids[:1])
    db.create_collection(CollectionConfig(name="e", metric=DistanceMetric.L2))

    path = str(tmp_path / "out.rdb")
    fbcompat.export_rdb(engine, path)
    buf = open(path, "rb").read()
    snap = R.root(buf)
    assert snap.string(0) == "1.0"
    dbt = snap.vec_table(2, 0)
    assert dbt.string(0) == "d"
    cols = {dbt.vec_table(1, j).string(0): dbt.vec_table(1, j)
            for j in range(dbt.vec_len(1))}
    assert set(cols) == {"h", "f", "e"}

    g = cols["h"].table(3)
    # the reference ParseUint's entrypoint_id (rdb.go:1080): must be a
    # parseable uint64 pointing at a real node — for EVERY collection
    assert int(g.string(1)) in set(hids)
    assert g.scalar(3, "<i") == 5
    node0 = g.vec_table(0, 0)
    np.testing.assert_array_equal(node0.vec_f32(1),
                                  np.arange(4, dtype=np.float32))
    assert json.loads(node0.string(2)) == {"i": 0}
    lc0 = node0.vec_table(4, 0)
    assert lc0.scalar(0, "<i") == 0 and lc0.vec_len(1) >= 1
    assert cols["h"].table(1).table(2).scalar(0, "<i") == 8  # hnsw m

    gf = cols["f"].table(3)
    assert int(gf.string(1)) == fids[1]  # first LIVE id (fids[0] deleted)
    assert cols["f"].scalar(4, "<q") == 2 and cols["f"].scalar(5, "<q") == 1
    ge = cols["e"].table(3)
    assert ge.string(1) == "0"  # empty graph: uint64 zero value, parseable
