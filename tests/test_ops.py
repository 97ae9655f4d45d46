"""Tests for batched distance ops and the exact top-k scan (SURVEY.md §2.1 distance parity)."""

import numpy as np
import pytest
import jax.numpy as jnp

from scintirete_tpu.ops import (
    brute_force_topk,
    distance_np,
    normalize_np,
    pairwise_distance,
    preprocess_norms,
)
from scintirete_tpu.types import DistanceMetric

L2, COS, IP = (
    int(DistanceMetric.L2),
    int(DistanceMetric.COSINE),
    int(DistanceMetric.INNER_PRODUCT),
)


def _ref_l2(q, b):
    return np.sqrt(np.sum((q - b) ** 2))


def _ref_cos(q, b):
    nq, nb = np.linalg.norm(q), np.linalg.norm(b)
    if nq == 0 or nb == 0:
        return 1.0
    return 1.0 - np.clip(np.dot(q, b) / (nq * nb), -1.0, 1.0)


class TestDistanceNp:
    def test_l2_matches_scalar(self, rng):
        q = rng.standard_normal(16).astype(np.float32)
        b = rng.standard_normal((5, 16)).astype(np.float32)
        got = distance_np(q, b, L2)
        want = np.array([_ref_l2(q, row) for row in b])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_cosine_matches_scalar(self, rng):
        q = rng.standard_normal(16).astype(np.float32)
        b = rng.standard_normal((5, 16)).astype(np.float32)
        got = distance_np(q, b, COS)
        want = np.array([_ref_cos(q, row) for row in b])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_cosine_zero_vector_is_one(self, rng):
        # reference: distance.go:53-82 — zero vector => distance 1.0
        q = np.zeros(8, dtype=np.float32)
        b = rng.standard_normal((3, 8)).astype(np.float32)
        np.testing.assert_allclose(distance_np(q, b, COS), np.ones(3))
        b[1] = 0.0
        q2 = rng.standard_normal(8).astype(np.float32)
        assert distance_np(q2, b, COS)[1] == 1.0

    def test_ip_negated(self, rng):
        q = rng.standard_normal(8).astype(np.float32)
        b = rng.standard_normal((3, 8)).astype(np.float32)
        np.testing.assert_allclose(
            distance_np(q, b, IP), -(b @ q), rtol=1e-5, atol=1e-5
        )

    def test_identical_vectors(self):
        q = np.ones(4, dtype=np.float32)
        assert distance_np(q, q[None, :], L2)[0] == 0.0
        assert abs(distance_np(q, q[None, :], COS)[0]) < 1e-6

    def test_normalize(self, rng):
        v = rng.standard_normal((4, 8)).astype(np.float32)
        v[2] = 0.0
        n = normalize_np(v)
        norms = np.linalg.norm(n, axis=-1)
        np.testing.assert_allclose(norms[[0, 1, 3]], 1.0, rtol=1e-5)
        assert norms[2] == 0.0


class TestPairwiseDeviceVsHost:
    @pytest.mark.parametrize("metric", [L2, COS, IP])
    def test_device_matches_numpy(self, rng, metric):
        q = rng.standard_normal((7, 32)).astype(np.float32)
        b = rng.standard_normal((50, 32)).astype(np.float32)
        got = np.asarray(pairwise_distance(jnp.asarray(q), jnp.asarray(b), metric))
        want = distance_np(q, b, metric)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_precomputed_norms_equivalent(self, rng):
        q = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((20, 16)).astype(np.float32))
        norms = preprocess_norms(b)
        np.testing.assert_allclose(
            np.asarray(pairwise_distance(q, b, L2, norms)),
            np.asarray(pairwise_distance(q, b, L2)),
            rtol=1e-6,
        )

    def test_bfloat16_base_close(self, rng):
        q = rng.standard_normal((4, 64)).astype(np.float32)
        b = rng.standard_normal((30, 64)).astype(np.float32)
        got = np.asarray(
            pairwise_distance(
                jnp.asarray(q, dtype=jnp.bfloat16),
                jnp.asarray(b, dtype=jnp.bfloat16),
                COS,
                preprocess_norms(jnp.asarray(b, dtype=jnp.bfloat16)),
            )
        )
        want = distance_np(q, b, COS)
        np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


class TestBruteForceTopK:
    @pytest.mark.parametrize("metric", [L2, COS, IP])
    def test_matches_numpy_argsort(self, rng, metric):
        q = rng.standard_normal((5, 24)).astype(np.float32)
        b = rng.standard_normal((200, 24)).astype(np.float32)
        valid = np.ones(200, dtype=bool)
        d, i = brute_force_topk(
            jnp.asarray(q), jnp.asarray(b), jnp.asarray(valid), metric, 10
        )
        d, i = np.asarray(d), np.asarray(i)
        want_d = distance_np(q, b, metric)
        want_order = np.argsort(want_d, axis=1, kind="stable")[:, :10]
        # distances must match exactly ordered ascending
        np.testing.assert_allclose(
            d, np.take_along_axis(want_d, want_order, axis=1), rtol=1e-4, atol=1e-4
        )
        assert np.all(np.diff(d, axis=1) >= -1e-6)

    def test_masking_excludes_deleted(self, rng):
        q = rng.standard_normal((2, 8)).astype(np.float32)
        b = rng.standard_normal((50, 8)).astype(np.float32)
        valid = np.ones(50, dtype=bool)
        valid[::2] = False  # delete even slots
        d, i = brute_force_topk(
            jnp.asarray(q), jnp.asarray(b), jnp.asarray(valid), L2, 5
        )
        i = np.asarray(i)
        assert np.all(i % 2 == 1)

    def test_tiled_path_matches_untiled(self, rng):
        q = rng.standard_normal((3, 16)).astype(np.float32)
        b = rng.standard_normal((1000, 16)).astype(np.float32)
        valid = jnp.ones(1000, dtype=bool)
        d1, i1 = brute_force_topk(jnp.asarray(q), jnp.asarray(b), valid, L2, 7)
        d2, i2 = brute_force_topk(
            jnp.asarray(q), jnp.asarray(b), valid, L2, 7, tile=128
        )
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_k_exceeds_valid_count(self, rng):
        q = rng.standard_normal((1, 4)).astype(np.float32)
        b = rng.standard_normal((3, 4)).astype(np.float32)
        valid = jnp.ones(3, dtype=bool)
        d, i = brute_force_topk(jnp.asarray(q), jnp.asarray(b), valid, L2, 5)
        d, i = np.asarray(d), np.asarray(i)
        assert np.all(np.isinf(d[:, 3:]))
        assert np.all(i[:, 3:] == -1)

    def test_all_invalid(self, rng):
        q = rng.standard_normal((1, 4)).astype(np.float32)
        b = rng.standard_normal((10, 4)).astype(np.float32)
        valid = jnp.zeros(10, dtype=bool)
        d, i = brute_force_topk(jnp.asarray(q), jnp.asarray(b), valid, COS, 3)
        assert np.all(np.isinf(np.asarray(d)))
        assert np.all(np.asarray(i) == -1)
