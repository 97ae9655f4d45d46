"""Prewarm manifest pinning: after warm_build(), a real bulk build must
compile NOTHING new — this is what makes a fresh server/bench process run
its first build at steady-state speed over the tunneled TPU. If the
builder grows a new program variant, this test fails and the manifest in
utils/prewarm.py must be extended."""

import logging

import numpy as np
import pytest

from scintirete_tpu.index import knn_build
from scintirete_tpu.index.store import GraphStore
from scintirete_tpu.types import DistanceMetric, HNSWParams
from scintirete_tpu.utils import prewarm


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.messages = []

    def emit(self, record):
        self.messages.append(record.getMessage())


@pytest.mark.parametrize("heuristic", [True, False])
def test_build_compiles_nothing_after_warm(heuristic):
    import jax

    n, dim, m = 4096, 32, 16
    metric = int(DistanceMetric.COSINE)
    prewarm.warm_build(n, dim, metric, m=m, heuristic=heuristic, threads=4)

    cap = _Capture()
    loggers = [
        logging.getLogger("jax._src.interpreters.pxla"),
        logging.getLogger("jax._src.dispatch"),
    ]
    jax.config.update("jax_log_compiles", True)
    for lg in loggers:
        lg.addHandler(cap)
    try:
        store = GraphStore(
            dim,
            HNSWParams(m=m, seed=7, neighbor_heuristic=heuristic),
            DistanceMetric.COSINE,
        )
        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        knn_build.build(store, vecs)
    finally:
        jax.config.update("jax_log_compiles", False)
        for lg in loggers:
            lg.removeHandler(cap)

    compiles = [m_ for m_ in cap.messages if m_.startswith("Compiling ")]
    assert not compiles, compiles

    # the built graph is sane
    assert store.count == n
    deg = (store.neighbors0[:n] >= 0).sum(axis=1)
    assert deg.mean() > 4


def test_append_compiles_nothing_after_warm():
    """Same pinning contract for the batched-append path: after
    warm_append(), append_batch must compile nothing new (first write
    batch to a restored collection otherwise absorbs program loads —
    measured 31-58 vec/s on warmup trials vs ~500 steady at 1M).
    n and the append size are chosen to stay inside one pow-4 capacity
    pad (crossing a pad boundary legitimately recompiles)."""
    import jax

    from scintirete_tpu.index import knn_build

    n, dim, m, nb = 3000, 32, 16, 512
    metric = int(DistanceMetric.COSINE)
    store = GraphStore(
        dim,
        HNSWParams(m=m, seed=7, neighbor_heuristic=True),
        DistanceMetric.COSINE,
    )
    rng = np.random.default_rng(5)
    knn_build.build(store, rng.standard_normal((n, dim)).astype(np.float32))
    prewarm.warm_append(n, dim, metric, m=m, heuristic=True, threads=4,
                        batch=nb)

    cap = _Capture()
    loggers = [
        logging.getLogger("jax._src.interpreters.pxla"),
        logging.getLogger("jax._src.dispatch"),
    ]
    jax.config.update("jax_log_compiles", True)
    for lg in loggers:
        lg.addHandler(cap)
    try:
        knn_build.append_batch(
            store,
            rng.standard_normal((nb, dim)).astype(np.float32),
            scan_cache={},
        )
    finally:
        jax.config.update("jax_log_compiles", False)
        for lg in loggers:
            lg.removeHandler(cap)

    compiles = [m_ for m_ in cap.messages if m_.startswith("Compiling ")]
    assert not compiles, compiles

    assert store.count == n + nb
    deg = (store.neighbors0[n : n + nb] >= 0).sum(axis=1)
    assert deg.mean() > 4
