"""Concurrency: reads and writes racing on one collection (the reference runs
its whole suite under -race; RLock-guarded engine state is our equivalent)."""

import threading

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
