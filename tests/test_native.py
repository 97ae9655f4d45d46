"""Native (C++) link-application engine: availability, equivalence with the
Python fallback, and structural invariants."""

import numpy as np
import pytest

import scintirete_tpu.native.build as native_build
from scintirete_tpu.index import HNSWIndex
from scintirete_tpu.index.bulk import BOOTSTRAP_SIZE
from scintirete_tpu.ops.distance import distance_np
from scintirete_tpu.types import DistanceMetric, HNSWParams, SearchParams

P = HNSWParams(m=8, ef_construction=60, ef_search=60, seed=5)
N, DIM = BOOTSTRAP_SIZE + 900, 24


@pytest.fixture
def data(rng):
    base = rng.standard_normal((N, DIM)).astype(np.float32)
    queries = rng.standard_normal((16, DIM)).astype(np.float32)
    return base, queries


def build(base, force_python=False):
    old = native_build._FAILED
    native_build._FAILED = force_python
    try:
        idx = HNSWIndex(dim=DIM, params=P, metric=DistanceMetric.L2, use_device=True)
        idx.bulk_insert(list(range(1, N + 1)), base)
    finally:
        native_build._FAILED = old
    return idx


def recall(idx, base, queries, k=10):
    want = distance_np(queries, base, DistanceMetric.L2)
    res = idx.search_batch(queries, SearchParams(top_k=k))
    hits = 0
    for b in range(len(queries)):
        true_ids = {int(i) + 1 for i in np.argsort(want[b], kind="stable")[:k]}
        hits += len(true_ids & {r[0] for r in res[b]})
    return hits / (len(queries) * k)


class TestNative:
    def test_library_compiles_and_loads(self):
        assert native_build.load_native() is not None

    def test_recall_matches_python_fallback(self, data):
        base, queries = data
        r_native = recall(build(base), base, queries)
        r_python = recall(build(base, force_python=True), base, queries)
        assert r_native >= 0.85
        assert abs(r_native - r_python) <= 0.05

    def test_structural_invariants(self, data):
        base, _ = data
        idx = build(base)
        s = idx.store
        assert s.live == N
        nbrs = s.neighbors0[: s.count]
        assert ((nbrs >= 0).sum(axis=1) <= s.m0).all()
        assert nbrs.max() < s.count
        rows = np.arange(s.count)[:, None]
        assert not np.any(nbrs == rows), "self-loop found"
        for lnum, ls in enumerate(s.layers, start=1):
            lt = ls.nbrs[: ls.count]
            assert ((lt >= 0).sum(axis=1) <= s.m).all()
            # layer invariant: neighbors at layer l are members of layer l
            present = lt[lt >= 0]
            assert (ls.row_of[present] >= 0).all(), f"layer {lnum} leak"

    def test_dirty_rows_keep_device_in_sync(self, data):
        from scintirete_tpu.index.device import DeviceIndex

        base, queries = data
        idx = build(base)
        incremental = idx._get_device()
        incremental.sync(idx.store)
        idx.store.invalidate_dirty()
        fresh = DeviceIndex()
        fresh.sync(idx.store)
        a, b = incremental.graph.arrays, fresh.graph.arrays
        np.testing.assert_array_equal(
            np.asarray(a["neighbors0"]), np.asarray(b["neighbors0"])
        )
        np.testing.assert_array_equal(
            np.asarray(a["up_nbrs_cat"]), np.asarray(b["up_nbrs_cat"])
        )
        np.testing.assert_array_equal(
            np.asarray(a["up_rows_flat"]), np.asarray(b["up_rows_flat"])
        )


class TestIncomingCap:
    def test_matches_numpy_capper(self):
        """C++ counting-bucket reverse-edge cap == the numpy packed-key
        argsort implementation (order and values)."""
        from scintirete_tpu.index import knn_build

        rng = np.random.default_rng(7)
        nm, F, max_deg = 500, 12, 8
        fwd_i = rng.integers(-1, nm, (nm, F)).astype(np.int32)
        fwd_d = rng.random((nm, F)).astype(np.float32)
        native = native_build.incoming_cap_native(fwd_i, fwd_d, max_deg)
        if native is None:
            pytest.skip("native library unavailable")
        old = native_build._FAILED
        native_build._FAILED = True  # numpy reference path
        try:
            ref = knn_build._incoming_host(fwd_i, fwd_d, max_deg)
        finally:
            native_build._FAILED = old
        np.testing.assert_array_equal(native[0], ref[0])
        np.testing.assert_allclose(native[1], ref[1])

    def test_empty_and_degenerate(self):
        out = native_build.incoming_cap_native(
            np.full((4, 3), -1, np.int32), np.zeros((4, 3), np.float32), 2
        )
        if out is None:
            pytest.skip("native library unavailable")
        assert (out[0] == -1).all() and np.isinf(out[1]).all()
