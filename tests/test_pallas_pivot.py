"""Pallas pivot-entry scan vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from scintirete_tpu.ops.pallas_pivot import pivot_entry_scan, _TILE
from scintirete_tpu.types import DistanceMetric

L2, COS, IP = (
    int(DistanceMetric.L2),
    int(DistanceMetric.COSINE),
    int(DistanceMetric.INNER_PRODUCT),
)


def xla_reference(q, pv, psq, pdel, metric):
    dots = q @ pv.T
    if metric == IP:
        d = -dots
    elif metric == L2:
        qsq = np.sum(q * q, axis=1, keepdims=True)
        d = qsq + psq[None, :] - 2.0 * dots
    else:
        d = 1.0 - dots  # pre-normalized
    d = np.where(pdel[None, :] > 0.5, np.inf, d)
    return d.min(axis=1), d.argmin(axis=1)


class TestPallasPivotScan:
    @pytest.mark.parametrize("metric", [L2, COS, IP])
    def test_matches_xla(self, rng, metric):
        B, D, R = 8, 32, 2 * _TILE
        q = rng.standard_normal((B, D)).astype(np.float32)
        pv = rng.standard_normal((R, D)).astype(np.float32)
        if metric == COS:
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            pv = pv / np.linalg.norm(pv, axis=1, keepdims=True)
        psq = np.sum(pv * pv, axis=1).astype(np.float32)
        pdel = np.zeros(R, np.float32)
        pdel[::7] = 1.0  # tombstone some pivots

        want_d, want_i = xla_reference(q, pv, psq, pdel, metric)
        got_d, got_i = pivot_entry_scan(
            jnp.asarray(q), jnp.asarray(pv), jnp.asarray(psq),
            jnp.asarray(pdel), metric=metric, interpret=True,
        )
        got_d, got_i = np.asarray(got_d), np.asarray(got_i)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-4)
        # argmin index must agree wherever the minimum is unique
        d_full = xla_reference(q, pv, psq, pdel, metric)
        np.testing.assert_array_equal(got_i, want_i)

    def test_all_deleted(self, rng):
        B, D, R = 4, 16, _TILE
        q = rng.standard_normal((B, D)).astype(np.float32)
        pv = rng.standard_normal((R, D)).astype(np.float32)
        psq = np.sum(pv * pv, axis=1).astype(np.float32)
        got_d, got_i = pivot_entry_scan(
            jnp.asarray(q), jnp.asarray(pv), jnp.asarray(psq),
            jnp.ones(R, jnp.float32), metric=L2, interpret=True,
        )
        assert np.all(np.isinf(np.asarray(got_d)))


class TestPivotKernelIntegration:
    """The search kernel's use_pallas path (interpret mode on CPU) must
    return the same results as the XLA pivot path end-to-end."""

    @pytest.mark.parametrize("metric", [
        DistanceMetric.L2, DistanceMetric.COSINE, DistanceMetric.INNER_PRODUCT,
    ])
    def test_search_kernel_parity(self, rng, metric):
        from scintirete_tpu.index import HNSWIndex
        from scintirete_tpu.index.device import (
            DeviceIndex,
            _search_kernel_pivot,
        )
        from scintirete_tpu.types import HNSWParams

        n, dim = 600, 16
        base = rng.standard_normal((n, dim)).astype(np.float32)
        idx = HNSWIndex(
            dim=dim,
            params=HNSWParams(m=8, ef_construction=40, ef_search=32, seed=2),
            metric=metric,
            use_device=False,
        )
        idx.bulk_insert(list(range(1, n + 1)), base)
        idx.delete(5)
        dev = DeviceIndex()
        dev.sync(idx.store)
        a = dev._arrays
        # pad pivot count to the Pallas tile (the mirror's R can be smaller
        # for tiny stores; production sizes are multiples of 512)
        R = a["pivots"].shape[0]
        reps = -(-_TILE // R) if R < _TILE else 1
        pivots = jnp.tile(a["pivots"], reps)[:_TILE] if reps > 1 else a["pivots"]
        pvecs = (
            jnp.tile(a["pivot_vecs"], (reps, 1))[:_TILE]
            if reps > 1 else a["pivot_vecs"]
        )
        psq = jnp.tile(a["pivot_sq"], reps)[:_TILE] if reps > 1 else a["pivot_sq"]

        queries = rng.standard_normal((8, dim)).astype(np.float32)
        kw = dict(metric=int(metric), ef=32, k=5, max_steps=64)
        d_x, s_x, _ = _search_kernel_pivot(
            jnp.asarray(queries), a["vectors"], a["sq_norms"], a["deleted"],
            a["neighbors0"], pivots, pvecs, psq, use_pallas=False, **kw,
        )
        d_p, s_p, _ = _search_kernel_pivot(
            jnp.asarray(queries), a["vectors"], a["sq_norms"], a["deleted"],
            a["neighbors0"], pivots, pvecs, psq,
            use_pallas=True, interpret=True, **kw,
        )
        np.testing.assert_array_equal(np.asarray(s_x), np.asarray(s_p))
        np.testing.assert_allclose(
            np.asarray(d_x), np.asarray(d_p), rtol=1e-5, atol=1e-6
        )
