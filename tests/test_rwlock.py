"""RWLock semantics: shared readers, exclusive writers, nesting, fairness."""

import threading
import time

from scintirete_tpu.utils.rwlock import RWLock


class TestRWLock:
    def test_readers_share(self):
        lock = RWLock()
        inside = []
        barrier = threading.Barrier(4, timeout=5)

        def reader():
            with lock.read():
                inside.append(1)
                barrier.wait()  # all 4 must be inside simultaneously

        threads = [threading.Thread(target=reader) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=5)
        assert len(inside) == 4

    def test_writer_excludes_readers_and_writers(self):
        lock = RWLock()
        log = []

        def writer(tag):
            with lock.write():
                log.append((tag, "in"))
                time.sleep(0.05)
                log.append((tag, "out"))

        def reader():
            with lock.read():
                log.append(("r", "in"))
                log.append(("r", "out"))

        threads = [
            threading.Thread(target=writer, args=("w1",)),
            threading.Thread(target=writer, args=("w2",)),
            threading.Thread(target=reader),
        ]
        for t in threads:
            t.start()
            time.sleep(0.01)  # deterministic-ish arrival order
        for t in threads:
            t.join(timeout=5)
        # no interleaving inside a writer's critical section
        for tag in ("w1", "w2"):
            i = log.index((tag, "in"))
            assert log[i + 1] == (tag, "out")

    def test_nested_reads_do_not_deadlock(self):
        lock = RWLock()
        done = []

        def nested():
            with lock.read():
                with lock.read():
                    done.append(1)

        t = threading.Thread(target=nested)
        t.start()
        t.join(timeout=5)
        assert done == [1]

    def test_nested_read_while_writer_waits(self):
        """A waiting writer must not deadlock a reader that re-enters the
        read side (readers only block on ACTIVE writers)."""
        lock = RWLock()
        reader_entered = threading.Event()
        release_reader = threading.Event()
        done = []

        def reader():
            with lock.read():
                reader_entered.set()
                release_reader.wait(timeout=5)
                with lock.read():  # nested while the writer queues
                    done.append("nested")

        def writer():
            reader_entered.wait(timeout=5)
            with lock.write():
                done.append("writer")

        rt = threading.Thread(target=reader)
        wt = threading.Thread(target=writer)
        rt.start()
        wt.start()
        reader_entered.wait(timeout=5)
        time.sleep(0.05)  # let the writer queue up
        release_reader.set()
        rt.join(timeout=5)
        wt.join(timeout=5)
        assert done == ["nested", "writer"]

    def test_writer_gets_in_between_reader_bursts(self):
        lock = RWLock()
        got_write = threading.Event()

        def reader_burst():
            for _ in range(50):
                with lock.read():
                    time.sleep(0.001)

        def writer():
            with lock.write():
                got_write.set()

        rt = threading.Thread(target=reader_burst)
        rt.start()
        time.sleep(0.005)
        wt = threading.Thread(target=writer)
        wt.start()
        wt.join(timeout=5)
        assert got_write.is_set()
        rt.join(timeout=5)
