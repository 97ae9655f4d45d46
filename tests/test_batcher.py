"""Dynamic search batcher: coalescing, correctness under concurrency, errors."""

import threading
import time

import numpy as np
import pytest

from scintirete_tpu.server.batcher import SearchBatcher


class TestBatcher:
    def test_coalesces_concurrent_requests(self):
        batch_sizes = []

        def execute(queries):
            batch_sizes.append(len(queries))
            return [float(q[0]) * 2 for q in queries]

        batcher = SearchBatcher(max_batch=64, max_delay_ms=20)
        try:
            results = [None] * 16

            def worker(i):
                q = np.array([float(i)], np.float32)
                results[i] = batcher.submit("k", q, execute)

            threads = [
                threading.Thread(target=worker, args=(i,)) for i in range(16)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert results == [float(i) * 2 for i in range(16)]
            # far fewer dispatches than requests
            assert len(batch_sizes) < 16
            assert sum(batch_sizes) == 16
        finally:
            batcher.stop()

    def test_max_batch_flushes_immediately(self):
        sizes = []

        def execute(queries):
            sizes.append(len(queries))
            return [0.0] * len(queries)

        batcher = SearchBatcher(max_batch=4, max_delay_ms=10_000)
        try:
            threads = [
                threading.Thread(
                    target=lambda: batcher.submit(
                        "k", np.zeros(2, np.float32), execute
                    )
                )
                for _ in range(4)
            ]
            t0 = time.time()
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=5)
            assert time.time() - t0 < 5  # did not wait for the 10s delay
            assert max(sizes) >= 1 and sum(sizes) == 4
        finally:
            batcher.stop()

    def test_distinct_keys_do_not_mix(self):
        def make_execute(tag):
            def execute(queries):
                return [tag] * len(queries)

            return execute

        batcher = SearchBatcher(max_batch=8, max_delay_ms=5)
        try:
            out = {}

            def worker(key):
                out[key] = batcher.submit(
                    key, np.zeros(1, np.float32), make_execute(key)
                )

            threads = [
                threading.Thread(target=worker, args=(k,)) for k in ("a", "b")
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert out == {"a": "a", "b": "b"}
        finally:
            batcher.stop()

    def test_errors_propagate_to_all_waiters(self):
        def execute(queries):
            raise RuntimeError("boom")

        batcher = SearchBatcher(max_batch=2, max_delay_ms=5)
        try:
            errors = []

            def worker():
                try:
                    batcher.submit("k", np.zeros(1, np.float32), execute)
                except RuntimeError as exc:
                    errors.append(str(exc))

            threads = [threading.Thread(target=worker) for _ in range(2)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert errors == ["boom", "boom"]
        finally:
            batcher.stop()

    def test_disabled_mode_direct(self):
        batcher = SearchBatcher(enabled=False)
        out = batcher.submit(
            "k", np.array([3.0], np.float32), lambda q: [float(q[0, 0])]
        )
        assert out == 3.0


class TestDimIsolation:
    def test_wrong_dim_request_fails_alone(self):
        """A wrong-dimension query must not poison other clients' requests
        coalesced under the same key: dimension is part of the group
        identity, so np.stack never mixes dims and only the bad group's
        waiters see its error."""
        def execute(queries):
            if queries.shape[1] != 4:
                raise ValueError("bad dim batch")
            return [1.0] * len(queries)

        batcher = SearchBatcher(max_batch=64, max_delay_ms=20)
        try:
            results = {}
            errors = {}

            def worker(i, dim):
                q = np.zeros(dim, np.float32)
                try:
                    results[i] = batcher.submit("k", q, execute)
                except BaseException as exc:
                    errors[i] = exc

            threads = [
                threading.Thread(target=worker, args=(i, 4 if i != 3 else 7))
                for i in range(8)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert sorted(results) == [0, 1, 2, 4, 5, 6, 7]
            assert all(v == 1.0 for v in results.values())
            assert set(errors) == {3}
        finally:
            batcher.stop()
