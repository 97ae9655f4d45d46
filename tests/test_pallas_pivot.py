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
