"""Fused Pallas lane scan vs numpy/brute-force (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from scintirete_tpu.ops.pallas_scan import LANES, lane_topk_scan
from scintirete_tpu.ops.flat_scan import flat_topk_fused
from scintirete_tpu.types import DistanceMetric

L2, COS, IP = (
    int(DistanceMetric.L2),
    int(DistanceMetric.COSINE),
    int(DistanceMetric.INNER_PRODUCT),
)


def rank_scores(q, base, b_sq, invalid, metric):
    """Numpy mirror of the kernel's ranking-form scores."""
    dots = q.astype(np.float32) @ base.astype(np.float32).T
    if metric == L2:
        s = b_sq[None, :] - 2.0 * dots
    else:
        s = -dots
    return np.where(invalid[None, :] > 0.5, np.inf, s)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestLaneScan:
    @pytest.mark.parametrize("metric", [L2, COS, IP])
    def test_lane_top2_semantics(self, rng, metric):
        B, D, N = 16, 32, 2 * LANES
        q = rng.standard_normal((B, D)).astype(np.float32)
        base = rng.standard_normal((N, D)).astype(np.float32)
        if metric == COS:
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            base = base / np.linalg.norm(base, axis=1, keepdims=True)
        b_sq = np.sum(base * base, axis=1).astype(np.float32)
        invalid = np.zeros(N, np.float32)
        invalid[3] = 1.0  # a deleted row must never surface

        base_b = jnp.asarray(base, jnp.bfloat16)
        d, i = lane_topk_scan(
            jnp.asarray(q), base_b, jnp.asarray(b_sq), jnp.asarray(invalid),
            metric, interpret=True,
        )
        d, i = np.asarray(d), np.asarray(i)
        assert d.shape == (B, 2 * LANES) and i.shape == (B, 2 * LANES)
        assert not np.any(i == 3)

        # per lane: returned pair must be the two best of that lane's rows
        # (bf16 dots -> compare against the bf16-rounded reference)
        ref = rank_scores(
            np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32),
            np.asarray(base_b, np.float32),
            b_sq, invalid, metric,
        )
        for b in range(0, B, 7):
            for lane in range(0, LANES, 101):
                rows = np.arange(lane, N, LANES)
                order = rows[np.argsort(ref[b, rows], kind="stable")]
                got = {i[b, lane], i[b, LANES + lane]}
                assert got == set(order[:2].tolist()), (b, lane)

    def test_invalid_all(self, rng):
        B, D, N = 8, 16, LANES
        q = rng.standard_normal((B, D)).astype(np.float32)
        base = rng.standard_normal((N, D)).astype(np.float32)
        d, i = lane_topk_scan(
            jnp.asarray(q), jnp.asarray(base, jnp.bfloat16),
            jnp.asarray(np.sum(base * base, axis=1)),
            jnp.ones(N, jnp.float32), L2, interpret=True,
        )
        assert np.all(np.isinf(np.asarray(d)))
        assert np.all(np.asarray(i) == -1)


class TestFusedTopK:
    @pytest.mark.parametrize("metric", [L2, COS, IP])
    def test_recall_and_exact_distances(self, rng, metric):
        from scintirete_tpu.ops.distance import distance_np

        B, D, N, k = 16, 24, 2 * LANES, 10
        q = rng.standard_normal((B, D)).astype(np.float32)
        base = rng.standard_normal((N, D)).astype(np.float32)
        invalid = np.zeros(N, np.float32)
        invalid[N - 5 :] = 1.0
        if metric == COS:
            scan = base / np.linalg.norm(base, axis=1, keepdims=True)
            scan_sq = np.ones(N, np.float32)
        else:
            scan = base
            scan_sq = np.sum(base * base, axis=1).astype(np.float32)

        d, s = flat_topk_fused(
            jnp.asarray(q), jnp.asarray(scan, jnp.bfloat16),
            jnp.asarray(base), jnp.asarray(invalid < 0.5), metric, k,
            jnp.asarray(scan_sq), interpret=True,
        )
        d, s = np.asarray(d), np.asarray(s)

        ref = distance_np(q, base, DistanceMetric(metric)).astype(np.float32)
        ref = np.where(invalid[None, :] > 0.5, np.inf, ref)
        true_i = np.argsort(ref, axis=1, kind="stable")[:, :k]
        hits = sum(
            len(set(s[b].tolist()) & set(true_i[b].tolist())) for b in range(B)
        )
        assert hits / (B * k) >= 0.95
        # returned distances are the exact f32 values for the chosen rows
        for b in range(B):
            np.testing.assert_allclose(
                d[b], ref[b, s[b]], rtol=1e-5, atol=1e-6
            )

    @pytest.mark.parametrize("metric", [L2, COS, IP])
    @pytest.mark.parametrize("tps", [2, 4])
    def test_tiles_per_step_matches_single(self, rng, metric, tps):
        """tps>1 folds several base tiles per grid step — selection and
        distances must match the tps=1 program exactly."""
        from scintirete_tpu.ops.distance import distance_np

        B, D, N, k = 16, 24, 4 * LANES, 10
        q = rng.standard_normal((B, D)).astype(np.float32)
        base = rng.standard_normal((N, D)).astype(np.float32)
        valid = np.ones(N, bool)
        valid[N - 3 :] = False
        if metric == COS:
            scan = base / np.linalg.norm(base, axis=1, keepdims=True)
            scan_sq = np.ones(N, np.float32)
        else:
            scan = base
            scan_sq = np.sum(base * base, axis=1).astype(np.float32)
        args = (
            jnp.asarray(q), jnp.asarray(scan, jnp.bfloat16),
            jnp.asarray(base), jnp.asarray(valid), metric, k,
            jnp.asarray(scan_sq),
        )
        d1, s1 = flat_topk_fused(*args, interpret=True)
        dt, st = flat_topk_fused(*args, interpret=True, tps=tps)
        np.testing.assert_array_equal(np.asarray(st), np.asarray(s1))
        np.testing.assert_allclose(np.asarray(dt), np.asarray(d1))
        ref = distance_np(q, base, DistanceMetric(metric)).astype(np.float32)
        ref = np.where(~valid[None, :], np.inf, ref)
        true_i = np.argsort(ref, axis=1, kind="stable")[:, :k]
        hits = sum(
            len(set(np.asarray(st)[b].tolist()) & set(true_i[b].tolist()))
            for b in range(B)
        )
        assert hits / (B * k) >= 0.95

    @pytest.mark.parametrize("metric", [L2, COS, IP])
    @pytest.mark.parametrize("tps", [1, 2])
    def test_int8_recall_and_exact_distances(self, rng, metric, tps):
        from scintirete_tpu.index.flat import _quant8
        from scintirete_tpu.ops.distance import distance_np

        B, D, N, k = 16, 24, 2 * LANES, 10
        q = rng.standard_normal((B, D)).astype(np.float32)
        base = rng.standard_normal((N, D)).astype(np.float32)
        invalid = np.zeros(N, np.float32)
        if metric == COS:
            scan = base / np.linalg.norm(base, axis=1, keepdims=True)
            scan_sq = np.ones(N, np.float32)
        else:
            scan = base
            scan_sq = np.sum(base * base, axis=1).astype(np.float32)
        q8, sc = _quant8(scan)

        d, s = flat_topk_fused(
            jnp.asarray(q), jnp.asarray(q8), jnp.asarray(base),
            jnp.asarray(invalid < 0.5), metric, k, jnp.asarray(scan_sq),
            base_scale=jnp.asarray(sc), interpret=True, tps=tps,
        )
        d, s = np.asarray(d), np.asarray(s)
        ref = distance_np(q, base, DistanceMetric(metric)).astype(np.float32)
        true_i = np.argsort(ref, axis=1, kind="stable")[:, :k]
        hits = sum(
            len(set(s[b].tolist()) & set(true_i[b].tolist())) for b in range(B)
        )
        assert hits / (B * k) >= 0.95
        for b in range(B):
            np.testing.assert_allclose(
                d[b], ref[b, s[b]], rtol=1e-5, atol=1e-6
            )

    @pytest.mark.parametrize("metric", [L2, COS, IP])
    def test_int8_scan_bf16_rerank(self, rng, metric):
        """int8-only HBM mode (FlatIndex device_dtype="bfloat16" at 16M+
        scale): the rerank source is the bf16 corpus copy instead of f32.
        Ranking must hold; returned distances deviate only by bf16 input
        rounding (~0.4% relative)."""
        from scintirete_tpu.index.flat import _quant8
        from scintirete_tpu.ops.distance import distance_np

        B, D, N, k = 16, 24, 2 * LANES, 10
        q = rng.standard_normal((B, D)).astype(np.float32)
        base = rng.standard_normal((N, D)).astype(np.float32)
        if metric == COS:
            scan = base / np.linalg.norm(base, axis=1, keepdims=True)
            scan_sq = np.ones(N, np.float32)
        else:
            scan = base
            scan_sq = np.sum(base * base, axis=1).astype(np.float32)
        q8, sc = _quant8(scan)

        d, s = flat_topk_fused(
            jnp.asarray(q), jnp.asarray(q8),
            jnp.asarray(base, jnp.bfloat16),  # bf16 rerank source
            jnp.ones(N, bool), metric, k, jnp.asarray(scan_sq),
            base_scale=jnp.asarray(sc), interpret=True,
        )
        d, s = np.asarray(d), np.asarray(s)
        assert d.dtype == np.float32
        ref = distance_np(q, base, DistanceMetric(metric)).astype(np.float32)
        true_i = np.argsort(ref, axis=1, kind="stable")[:, :k]
        hits = sum(
            len(set(s[b].tolist()) & set(true_i[b].tolist())) for b in range(B)
        )
        assert hits / (B * k) >= 0.95
        for b in range(B):
            np.testing.assert_allclose(
                d[b], ref[b, s[b]], rtol=2e-2, atol=2e-2
            )

    @pytest.mark.parametrize("metric", [L2, COS, IP])
    def test_int8_query_upload(self, rng, metric):
        """SCNT_QUERY_DTYPE=int8 contract: int8-quantized queries with a
        per-row f32 scale keep recall and land within ~1e-2 relative of
        the exact distances (input rounding only; the kernel dequantizes
        and reranks in f32)."""
        from scintirete_tpu.index.flat import _quant8
        from scintirete_tpu.ops.distance import distance_np

        B, D, N, k = 16, 24, 2 * LANES, 10
        q = rng.standard_normal((B, D)).astype(np.float32)
        base = rng.standard_normal((N, D)).astype(np.float32)
        if metric == COS:
            scan = base / np.linalg.norm(base, axis=1, keepdims=True)
            scan_sq = np.ones(N, np.float32)
        else:
            scan = base
            scan_sq = np.sum(base * base, axis=1).astype(np.float32)
        q8, qsc = _quant8(q)

        d, s = flat_topk_fused(
            jnp.asarray(q8), jnp.asarray(scan, jnp.bfloat16),
            jnp.asarray(base), jnp.ones(N, bool), metric, k,
            jnp.asarray(scan_sq), interpret=True,
            query_scale=jnp.asarray(qsc),
        )
        d, s = np.asarray(d), np.asarray(s)
        ref = distance_np(q, base, DistanceMetric(metric)).astype(np.float32)
        true_i = np.argsort(ref, axis=1, kind="stable")[:, :k]
        hits = sum(
            len(set(s[b].tolist()) & set(true_i[b].tolist())) for b in range(B)
        )
        assert hits / (B * k) >= 0.95
        for b in range(B):
            np.testing.assert_allclose(
                d[b], ref[b, s[b]], rtol=2e-2, atol=2e-2
            )

    @pytest.mark.parametrize("metric", [L2, COS, IP])
    def test_f16_query_upload(self, rng, metric):
        """SCNT_QUERY_F16 contract: f16-uploaded queries keep full recall
        and land within ~1e-3 relative of the exact f32 distances (the
        deviation is query rounding only — the kernel reranks in f32)."""
        from scintirete_tpu.ops.distance import distance_np

        B, D, N, k = 16, 24, 2 * LANES, 10
        q = rng.standard_normal((B, D)).astype(np.float32)
        base = rng.standard_normal((N, D)).astype(np.float32)
        valid = np.ones(N, bool)
        if metric == COS:
            scan = base / np.linalg.norm(base, axis=1, keepdims=True)
            scan_sq = np.ones(N, np.float32)
        else:
            scan = base
            scan_sq = np.sum(base * base, axis=1).astype(np.float32)

        d, s = flat_topk_fused(
            jnp.asarray(q, jnp.float16), jnp.asarray(scan, jnp.bfloat16),
            jnp.asarray(base), jnp.asarray(valid), metric, k,
            jnp.asarray(scan_sq), interpret=True,
        )
        d, s = np.asarray(d), np.asarray(s)
        ref = distance_np(q, base, DistanceMetric(metric)).astype(np.float32)
        true_i = np.argsort(ref, axis=1, kind="stable")[:, :k]
        hits = sum(
            len(set(s[b].tolist()) & set(true_i[b].tolist())) for b in range(B)
        )
        assert hits / (B * k) >= 0.95
        for b in range(B):
            np.testing.assert_allclose(
                d[b], ref[b, s[b]], rtol=2e-3, atol=2e-3
            )

    @pytest.mark.parametrize("metric", [L2, COS, IP])
    def test_knn_lane_topc_vs_numpy(self, rng, metric):
        """Builder kNN scan: prefix masking, self-exclusion, true distances."""
        from scintirete_tpu.ops.distance import distance_np
        from scintirete_tpu.ops.pallas_scan import knn_lane_topc

        B, D, N, c = 16, 24, 2 * LANES, 8
        prefix = LANES + 100  # partial second tile
        base = rng.standard_normal((N, D)).astype(np.float32)
        if metric == COS:
            base = base / np.linalg.norm(base, axis=1, keepdims=True)
        q = base[:B]  # rows ARE prefix members -> self-exclusion matters
        self_idx = np.arange(B, dtype=np.int32)
        b_sq = np.sum(base * base, axis=1).astype(np.float32)

        cd, ci = knn_lane_topc(
            jnp.asarray(q), jnp.asarray(self_idx),
            jnp.asarray(base, jnp.bfloat16), jnp.asarray(b_sq),
            jnp.int32(prefix), metric=metric, c=c,
            grid_tiles=2, interpret=True,
        )
        cd, ci = np.asarray(cd), np.asarray(ci)

        qb = np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32)
        bb = np.asarray(jnp.asarray(base, jnp.bfloat16), np.float32)
        ref = distance_np(qb, bb[:prefix], DistanceMetric(metric)).astype(
            np.float32
        )
        ref[np.arange(B), self_idx] = np.inf
        true_i = np.argsort(ref, axis=1, kind="stable")[:, :c]
        # candidate pools: allow the documented 3-in-a-lane loss (none at
        # this size) but require exact prefix/self discipline
        assert np.all(ci < prefix) and not np.any(ci == self_idx[:, None])
        hits = sum(
            len(set(ci[b].tolist()) & set(true_i[b].tolist())) for b in range(B)
        )
        assert hits / (B * c) >= 0.95
        # distances are the true finalized values for the chosen rows, up
        # to bf16 input rounding (the kernel keeps EXACT f32 norms and only
        # the dots are bf16, so it can differ from this all-bf16 reference
        # by ~2x the bf16 ulp)
        for b in range(B):
            np.testing.assert_allclose(
                cd[b], ref[b, ci[b]], rtol=1e-2, atol=1e-3
            )

    def test_deleted_never_returned(self, rng):
        B, D, N = 8, 16, LANES
        base = rng.standard_normal((N, D)).astype(np.float32)
        q = base[:B] + 0.01 * rng.standard_normal((B, D)).astype(np.float32)
        invalid = np.zeros(N, np.float32)
        invalid[0] = 1.0  # query 0's nearest row is deleted
        d, s = flat_topk_fused(
            jnp.asarray(q), jnp.asarray(base, jnp.bfloat16),
            jnp.asarray(base), jnp.asarray(invalid < 0.5), L2, 5,
            jnp.asarray(np.sum(base * base, axis=1)), interpret=True,
        )
        assert not np.any(np.asarray(s) == 0)

    @pytest.mark.parametrize("metric", [L2, COS, IP])
    def test_knn_lane_topc_masked_vs_numpy(self, rng, metric):
        """Masked-subset scan (append path): arbitrary membership mask,
        self-exclusion, true finalized distances."""
        from scintirete_tpu.ops.distance import distance_np
        from scintirete_tpu.ops.pallas_scan import knn_lane_topc_masked

        B, D, N, c = 16, 24, 2 * LANES, 8
        base = rng.standard_normal((N, D)).astype(np.float32)
        if metric == COS:
            base = base / np.linalg.norm(base, axis=1, keepdims=True)
        # a scattered member subset (every 3rd row) + some holes
        invalid = np.ones(N, np.float32)
        members = np.arange(0, N, 3)
        invalid[members] = 0.0
        invalid[members[5]] = 1.0  # a deleted member
        q = base[members[:B]]  # queries ARE members -> self-exclusion
        self_idx = members[:B].astype(np.int32)
        b_sq = np.sum(base * base, axis=1).astype(np.float32)

        cd, ci = knn_lane_topc_masked(
            jnp.asarray(q), jnp.asarray(self_idx),
            jnp.asarray(base, jnp.bfloat16), jnp.asarray(b_sq),
            jnp.asarray(invalid), metric=metric, c=c,
            grid_tiles=2, interpret=True,
        )
        cd, ci = np.asarray(cd), np.asarray(ci)

        qb = np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32)
        bb = np.asarray(jnp.asarray(base, jnp.bfloat16), np.float32)
        ref = distance_np(qb, bb, DistanceMetric(metric)).astype(np.float32)
        ref[:, invalid > 0.5] = np.inf
        ref[np.arange(B), self_idx] = np.inf
        true_i = np.argsort(ref, axis=1, kind="stable")[:, :c]
        # mask/self discipline is exact
        assert not np.any(invalid[np.maximum(ci, 0)] > 0.5)
        assert not np.any(ci == self_idx[:, None])
        hits = sum(
            len(set(ci[b].tolist()) & set(true_i[b].tolist()))
            for b in range(B)
        )
        assert hits / (B * c) >= 0.95
        for b in range(B):
            np.testing.assert_allclose(
                cd[b], ref[b, ci[b]], rtol=1e-2, atol=1e-3
            )


class TestInfSafety:
    def test_overflowed_norm_does_not_poison_lane(self, rng):
        """A row whose squared L2 norm overflows f32 (finite elements,
        inf norm) must not become a NaN packed key: jnp.minimum(k, NaN)
        would latch NaN for its lane for the rest of the scan, silently
        dropping every row sharing the lane (regression: the pre-packed
        fold was inf-safe)."""
        B, D, N = 8, 16, 2 * LANES
        q = rng.standard_normal((B, D)).astype(np.float32)
        base = rng.standard_normal((N, D)).astype(np.float32)
        base[5] = 2.0e19  # norm^2 ~ 6e39 -> inf in f32
        b_sq = np.sum(base.astype(np.float32) ** 2, axis=1)  # inf at row 5
        assert np.isinf(b_sq[5])
        invalid = np.zeros(N, np.float32)

        d, i = flat_topk_fused(
            jnp.asarray(q), jnp.asarray(base, jnp.bfloat16),
            jnp.asarray(base), jnp.ones(N, bool), L2, 5,
            jnp.asarray(b_sq), width=32, interpret=True,
        )
        d, i = np.asarray(d), np.asarray(i)
        assert np.all(np.isfinite(d))
        assert np.all(i >= 0)
        # the top-5 must match brute force over the sane rows (row 5 and
        # every row sharing its lane must still be rankable)
        sane = rank_scores(q, base, b_sq, invalid, L2)
        want = np.argsort(np.where(np.isfinite(sane), sane, np.inf), axis=1)
        for b in range(B):
            got = set(i[b].tolist())
            # bf16 ranking: allow the exact set to differ only within the
            # rerank width; top-1 must agree
            assert want[b, 0] in got

    def test_int8_overflow_and_nan_scales_do_not_poison(self, rng):
        """int8 kernel invariant (wrapper-enforced): inf squared norms,
        inf/NaN dequant scales, and deleted rows must never produce a NaN
        packed key (jnp.minimum would latch it for the lane) — the kernel
        itself has NO clamp/NaN ops (see _pack_tile_ids), so this pins
        the wrapper's boundary defense."""
        from scintirete_tpu.index.flat import _quant8

        B, D, N = 8, 16, 2 * LANES
        q = rng.standard_normal((B, D)).astype(np.float32)
        base = rng.standard_normal((N, D)).astype(np.float32)
        base[5] = 2.0e19  # norm^2 -> inf in f32
        with np.errstate(over="ignore"):
            b_sq = np.sum(base.astype(np.float32) ** 2, axis=1)
        assert np.isinf(b_sq[5])
        q8, sc = _quant8(np.where(np.isfinite(base), base, 0.0))
        sc = sc.astype(np.float32)
        sc[7] = np.nan   # poisoned scale rows
        sc[9] = np.inf
        invalid = np.zeros(N, np.float32)
        invalid[3] = 1.0  # a deleted row

        d, i = flat_topk_fused(
            jnp.asarray(q), jnp.asarray(q8), jnp.asarray(base),
            jnp.asarray(invalid < 0.5), L2, 5, jnp.asarray(b_sq),
            base_scale=jnp.asarray(sc), width=32, interpret=True, tps=2,
        )
        d, i = np.asarray(d), np.asarray(i)
        assert np.all(np.isfinite(d))
        assert np.all(i >= 0)
        assert not np.any(i == 3)  # deleted row masked via bs=0/bsq=SENT
        # rows sharing a lane with the poisoned ones must still be found
        sane = rank_scores(q, base, b_sq, invalid, L2)
        sane[:, [5, 7, 9]] = np.inf
        want = np.argsort(sane, axis=1)
        for b in range(B):
            assert want[b, 0] in set(i[b].tolist())

    @pytest.mark.parametrize("tps", [4, 8])
    def test_int8_premin_groups_keep_recall(self, rng, tps):
        """tps > _PREMIN folds several pre-min groups per grid step; the
        group pre-min may only lose a candidate when two true top-k share
        a lane AND a group — recall must stay ~exact on a small corpus."""
        from scintirete_tpu.index.flat import _quant8
        from scintirete_tpu.ops.distance import distance_np

        B, D, N, k = 16, 24, 8 * LANES, 10
        q = rng.standard_normal((B, D)).astype(np.float32)
        base = rng.standard_normal((N, D)).astype(np.float32)
        q8, sc = _quant8(base)
        scan_sq = np.sum(base * base, axis=1).astype(np.float32)
        d, s = flat_topk_fused(
            jnp.asarray(q), jnp.asarray(q8), jnp.asarray(base),
            jnp.ones(N, bool), L2, k, jnp.asarray(scan_sq),
            base_scale=jnp.asarray(sc), interpret=True, tps=tps,
        )
        d, s = np.asarray(d), np.asarray(s)
        ref = distance_np(q, base, DistanceMetric(L2)).astype(np.float32)
        true_i = np.argsort(ref, axis=1, kind="stable")[:, :k]
        hits = sum(
            len(set(s[b].tolist()) & set(true_i[b].tolist()))
            for b in range(B)
        )
        assert hits / (B * k) >= 0.95
        for b in range(B):
            np.testing.assert_allclose(
                d[b], ref[b, s[b]], rtol=1e-5, atol=1e-6
            )
