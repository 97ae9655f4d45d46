"""HNSW index tests: reference-style structural behavior (SURVEY.md §4 tier
"Unit — algorithm") plus what the reference lacks: ground-truth recall gates
against brute force, and host-vs-device search parity."""

import numpy as np
import pytest

from scintirete_tpu.errors import ErrorCode, ScintireteError
from scintirete_tpu.index import HNSWIndex
from scintirete_tpu.index.store import GraphStore
from scintirete_tpu.index import host_algo
from scintirete_tpu.ops.distance import distance_np
from scintirete_tpu.types import DistanceMetric, HNSWParams, SearchParams

PARAMS = HNSWParams(m=8, ef_construction=60, ef_search=40, seed=7)


def make_index(metric=DistanceMetric.L2, use_device=False, params=PARAMS, dim=16):
    return HNSWIndex(dim=dim, params=params, metric=metric, use_device=use_device)


def brute_topk(vectors_by_id, q, metric, k):
    ids = np.array(sorted(vectors_by_id))
    mat = np.stack([vectors_by_id[i] for i in ids])
    d = distance_np(q, mat, metric)
    order = np.argsort(d, kind="stable")[:k]
    return list(ids[order]), d[order]


class TestLifecycle:
    def test_empty_index_search(self):
        idx = make_index()
        assert idx.search(np.zeros(16, np.float32), SearchParams(top_k=5)) == []
        assert idx.size() == 0

    def test_single_vector(self, rng):
        idx = make_index()
        v = rng.standard_normal(16).astype(np.float32)
        idx.insert(1, v)
        res = idx.search(v, SearchParams(top_k=3))
        assert len(res) == 1
        assert res[0][0] == 1
        assert res[0][1] < 1e-5

    def test_duplicate_insert_rejected(self, rng):
        idx = make_index()
        v = rng.standard_normal(16).astype(np.float32)
        idx.insert(1, v)
        with pytest.raises(ScintireteError) as exc:
            idx.insert(1, v)
        assert exc.value.code == ErrorCode.INVALID_PARAMETER

    def test_dimension_mismatch(self, rng):
        idx = make_index()
        with pytest.raises(ScintireteError) as exc:
            idx.insert(1, rng.standard_normal(8).astype(np.float32))
        assert exc.value.code == ErrorCode.DIMENSION_MISMATCH

    def test_self_query_returns_self_first(self, rng):
        idx = make_index()
        vecs = rng.standard_normal((50, 16)).astype(np.float32)
        for i, v in enumerate(vecs):
            idx.insert(i + 1, v)
        for i in [0, 10, 49]:
            res = idx.search(vecs[i], SearchParams(top_k=1))
            assert res[0][0] == i + 1

    def test_delete_removes_from_results(self, rng):
        idx = make_index()
        vecs = rng.standard_normal((30, 16)).astype(np.float32)
        for i, v in enumerate(vecs):
            idx.insert(i + 1, v)
        idx.delete(5)
        assert idx.size() == 29
        res = idx.search(vecs[4], SearchParams(top_k=10))
        assert 5 not in [r[0] for r in res]
        # delete nonexistent -> error
        with pytest.raises(ScintireteError) as exc:
            idx.delete(999)
        assert exc.value.code == ErrorCode.VECTOR_NOT_FOUND
        # get on deleted -> not found
        with pytest.raises(ScintireteError):
            idx.get_vector(5)

    def test_delete_entrypoint_promotes_new_one(self, rng):
        idx = make_index()
        vecs = rng.standard_normal((40, 16)).astype(np.float32)
        for i, v in enumerate(vecs):
            idx.insert(i + 1, v)
        # delete the entrypoint repeatedly; search must keep working
        for _ in range(10):
            ep_slot = idx.store.entry_slot
            ep_id = int(idx.slot_to_id[ep_slot])
            idx.delete(ep_id)
            res = idx.search(vecs[0], SearchParams(top_k=3))
            assert len(res) == 3
        assert idx.size() == 30

    def test_delete_all_then_insert(self, rng):
        idx = make_index()
        vecs = rng.standard_normal((10, 16)).astype(np.float32)
        for i, v in enumerate(vecs):
            idx.insert(i + 1, v)
        for i in range(10):
            idx.delete(i + 1)
        assert idx.size() == 0
        assert idx.search(vecs[0], SearchParams(top_k=3)) == []
        idx.insert(100, vecs[0])
        res = idx.search(vecs[0], SearchParams(top_k=1))
        assert res[0][0] == 100

    def test_ef_search_override_and_set(self, rng):
        idx = make_index()
        for i in range(20):
            idx.insert(i + 1, rng.standard_normal(16).astype(np.float32))
        idx.set_ef_search(77)
        assert idx.params.ef_search == 77
        res = idx.search(
            rng.standard_normal(16).astype(np.float32),
            SearchParams(top_k=5, ef_search=10),
        )
        assert len(res) == 5

    def test_stats_and_memory(self, rng):
        idx = make_index()
        for i in range(25):
            idx.insert(i + 1, rng.standard_normal(16).astype(np.float32))
        st = idx.stats()
        assert st.nodes == 25
        assert st.connections > 0
        assert st.memory_bytes > 0
        assert st.max_layer >= 0

    def test_degree_bounds(self, rng):
        # layer-0 degree <= 2M, upper layers <= M (reference: hnsw.go:228-231)
        idx = make_index()
        s = idx.store
        for i in range(200):
            idx.insert(i + 1, rng.standard_normal(16).astype(np.float32))
        assert ((s.neighbors0[: s.count] >= 0).sum(axis=1) <= s.m0).all()
        for ls in s.layers:
            assert ((ls.nbrs[: ls.count] >= 0).sum(axis=1) <= s.m).all()


class TestRecall:
    """Ground-truth recall gates (absent in the reference; required by BASELINE)."""

    @pytest.mark.parametrize(
        "metric",
        [DistanceMetric.L2, DistanceMetric.COSINE, DistanceMetric.INNER_PRODUCT],
    )
    def test_recall_at_10(self, rng, metric):
        n, dim, k = 600, 24, 10
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        idx = HNSWIndex(
            dim=dim,
            params=HNSWParams(m=12, ef_construction=100, ef_search=80, seed=3),
            metric=metric,
            use_device=False,
        )
        by_id = {}
        for i, v in enumerate(vecs):
            idx.insert(i + 1, v)
            by_id[i + 1] = v
        queries = rng.standard_normal((20, dim)).astype(np.float32)
        hits = total = 0
        for q in queries:
            want, _ = brute_topk(by_id, q, metric, k)
            got = [r[0] for r in idx.search(q, SearchParams(top_k=k))]
            hits += len(set(want) & set(got))
            total += k
        recall = hits / total
        assert recall >= 0.9, f"recall@10 too low for {metric}: {recall}"

    def test_recall_with_deletions(self, rng):
        n, dim, k = 400, 16, 10
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        idx = make_index()
        by_id = {}
        for i, v in enumerate(vecs):
            idx.insert(i + 1, v)
            by_id[i + 1] = v
        for i in range(0, n, 3):  # delete a third
            idx.delete(i + 1)
            del by_id[i + 1]
        queries = rng.standard_normal((10, dim)).astype(np.float32)
        hits = total = 0
        for q in queries:
            want, _ = brute_topk(by_id, q, DistanceMetric.L2, k)
            got = [r[0] for r in idx.search(q, SearchParams(top_k=k))]
            assert all(g in by_id for g in got), "returned a deleted id"
            hits += len(set(want) & set(got))
            total += k
        assert hits / total >= 0.85


class TestDeviceParity:
    """Batched device search vs the sequential host oracle."""

    @pytest.mark.parametrize(
        "metric",
        [DistanceMetric.L2, DistanceMetric.COSINE, DistanceMetric.INNER_PRODUCT],
    )
    def test_device_matches_host_recall(self, rng, metric):
        n, dim, k = 500, 16, 10
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        idx = HNSWIndex(
            dim=dim,
            params=HNSWParams(m=8, ef_construction=80, ef_search=60, seed=11),
            metric=metric,
            use_device=True,
        )
        for i, v in enumerate(vecs):
            idx.insert(i + 1, v)
        queries = rng.standard_normal((16, dim)).astype(np.float32)

        dev = idx.search_batch(queries, SearchParams(top_k=k))
        idx.use_device = False
        host = idx.search_batch(queries, SearchParams(top_k=k))

        overlap = total = 0
        for dres, hres in zip(dev, host):
            d_ids = {r[0] for r in dres}
            h_ids = {r[0] for r in hres}
            overlap += len(d_ids & h_ids)
            total += k
            # distances must be exact for shared ids
            d_map = dict(dres)
            for hid, hdist in hres:
                if hid in d_map:
                    assert abs(d_map[hid] - hdist) < 1e-3
        assert overlap / total >= 0.9, f"device/host divergence: {overlap/total}"

    def test_device_excludes_deleted(self, rng):
        n, dim = 200, 16
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        idx = make_index(use_device=True)
        for i, v in enumerate(vecs):
            idx.insert(i + 1, v)
        deleted = set(range(1, n + 1, 4))
        for vid in deleted:
            idx.delete(vid)
        res = idx.search_batch(
            rng.standard_normal((8, dim)).astype(np.float32), SearchParams(top_k=10)
        )
        for rlist in res:
            assert len(rlist) == 10
            assert not ({r[0] for r in rlist} & deleted)

    def test_device_exact_on_self_queries(self, rng):
        n, dim = 300, 16
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        idx = make_index(use_device=True)
        for i, v in enumerate(vecs):
            idx.insert(i + 1, v)
        res = idx.search_batch(vecs[:32], SearchParams(top_k=1))
        ok = sum(1 for i, rlist in enumerate(res) if rlist and rlist[0][0] == i + 1)
        # the graph itself may miss a couple at this ef; device must match host
        idx.use_device = False
        host = idx.search_batch(vecs[:32], SearchParams(top_k=1))
        host_ok = sum(
            1 for i, rlist in enumerate(host) if rlist and rlist[0][0] == i + 1
        )
        assert ok >= host_ok - 1
        assert ok >= 28

    def test_mutation_resyncs_device(self, rng):
        idx = make_index(use_device=True)
        vecs = rng.standard_normal((50, 16)).astype(np.float32)
        for i, v in enumerate(vecs):
            idx.insert(i + 1, v)
        q = vecs[0][None, :]
        assert idx.search_batch(q, SearchParams(top_k=1))[0][0][0] == 1
        idx.delete(1)
        assert idx.search_batch(q, SearchParams(top_k=1))[0][0][0] != 1


class TestGraphState:
    def test_export_import_roundtrip(self, rng):
        idx = make_index()
        vecs = rng.standard_normal((120, 16)).astype(np.float32)
        for i, v in enumerate(vecs):
            idx.insert(i + 1, v)
        idx.delete(7)
        state = idx.export_graph_state()
        idx2 = HNSWIndex.import_graph_state(state, use_device=False)
        assert idx2.size() == idx.size()
        assert idx2.store.max_layer == idx.store.max_layer
        q = rng.standard_normal(16).astype(np.float32)
        r1 = idx.search(q, SearchParams(top_k=10))
        r2 = idx2.search(q, SearchParams(top_k=10))
        assert r1 == r2
        # imported graph stays mutable
        idx2.insert(1000, rng.standard_normal(16).astype(np.float32))
        assert idx2.size() == idx.size() + 1

    def test_export_is_deep_copy(self, rng):
        idx = make_index()
        for i in range(20):
            idx.insert(i + 1, rng.standard_normal(16).astype(np.float32))
        state = idx.export_graph_state()
        state["vectors"][:] = 0.0
        assert not np.allclose(idx.store.vectors[:20], 0.0)

    def test_seed_reproducibility(self, rng):
        vecs = rng.standard_normal((100, 16)).astype(np.float32)
        runs = []
        for _ in range(2):
            idx = HNSWIndex(dim=16, params=HNSWParams(seed=42), use_device=False)
            for i, v in enumerate(vecs):
                idx.insert(i + 1, v)
            runs.append(idx.export_graph_state())
        np.testing.assert_array_equal(runs[0]["levels"], runs[1]["levels"])
        np.testing.assert_array_equal(runs[0]["neighbors0"], runs[1]["neighbors0"])


class TestBulkInsert:
    def test_bulk_matches_recall(self, rng):
        n, dim, k = 500, 16, 10
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        idx = make_index()
        idx.bulk_insert(list(range(1, n + 1)), vecs)
        assert idx.size() == n
        by_id = {i + 1: vecs[i] for i in range(n)}
        hits = total = 0
        for q in rng.standard_normal((10, dim)).astype(np.float32):
            want, _ = brute_topk(by_id, q, DistanceMetric.L2, k)
            got = [r[0] for r in idx.search(q, SearchParams(top_k=k))]
            hits += len(set(want) & set(got))
            total += k
        assert hits / total >= 0.9

    def test_bulk_duplicate_id_rejected(self, rng):
        idx = make_index()
        idx.insert(3, rng.standard_normal(16).astype(np.float32))
        with pytest.raises(ScintireteError):
            idx.bulk_insert([2, 3], rng.standard_normal((2, 16)).astype(np.float32))


class TestBfloat16Storage:
    def test_bf16_collection_recall(self, rng):
        n, dim, k = 400, 32, 10
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        idx = HNSWIndex(
            dim=dim,
            params=HNSWParams(m=8, ef_construction=80, ef_search=60, seed=4),
            metric=DistanceMetric.COSINE,
            device_dtype="bfloat16",
            use_device=True,
        )
        idx.bulk_insert(list(range(1, n + 1)), vecs)
        by_id = {i + 1: vecs[i] for i in range(n)}
        hits = total = 0
        queries = rng.standard_normal((10, dim)).astype(np.float32)
        for q in queries:
            want, _ = brute_topk(by_id, q, DistanceMetric.COSINE, k)
            got = [r[0] for r in idx.search(q, SearchParams(top_k=k))]
            hits += len(set(want) & set(got))
            total += k
        assert hits / total >= 0.85  # small bf16 rounding loss allowed


class TestBeamStepDedup:
    def test_dedup_despite_entry_distance_mismatch(self):
        """Entry distances come from a different program than the beam's
        dist_to (pivot kernel / upper-layer walk) and can disagree by
        ~1e-3. The sort-based dedup must still collapse a re-proposed
        in-list slot — a distance-majority sort let such copies survive
        and crowd the beam (recall 0.9956 -> 0.9866 at 1M, round-5
        regression)."""
        import jax.numpy as jnp

        from scintirete_tpu.index.device import _beam_step

        # true distances: slot0=1.0, slot2=1.0005 (INTERLEAVES between the
        # two slot-0 copies under a distance-majority sort), slot1=2.0
        xs = jnp.asarray(
            [1.0, 2.0, 1.0005, 4.0, 5.0, 6.0, 7.0, 8.0], jnp.float32
        )

        def dist_to(slots):
            return xs[slots]

        deleted = jnp.zeros(8, bool)
        # slot 0 <-> slot 1 mutual neighbors: expanding 1 re-proposes 0
        # (alongside slot 2, whose distance falls between the entry's
        # perturbed slot-0 distance and the re-proposal's true one)
        neighbors0 = jnp.asarray(
            [[1, -1]] + [[0, 2]] + [[-1, -1]] * 6, jnp.int32
        )
        ef = 4
        # entry: slot 0 with a PERTURBED distance (1e-3 relative off)
        cand_s = jnp.asarray([[0, -1, -1, -1]], jnp.int32)
        cand_d = jnp.asarray([[1.001, np.inf, np.inf, np.inf]], jnp.float32)
        expanded = jnp.zeros((1, ef), bool)
        active = jnp.ones(1, bool)
        for _ in range(2):  # step 1: expand 0 -> propose 1; step 2: 1 -> 0,2
            cand_s, cand_d, expanded = _beam_step(
                dist_to, deleted, cand_s, cand_d, expanded,
                rows_of_slots=lambda s: s,
                nbr_lookup=lambda rows: neighbors0[rows],
                active=active, expand=1,
            )
        s = np.asarray(cand_s[0])
        e = np.asarray(expanded[0])
        live = s[s >= 0]
        assert len(set(live.tolist())) == len(live), f"duplicate slots: {s}"
        assert set(live.tolist()) == {0, 1, 2}
        # the surviving slot-0 copy must keep its expanded flag, or the
        # beam would re-expand it forever
        assert all(e[i] for i in range(len(s)) if s[i] in (0, 1)), (s, e)


class TestMidLayerEntry:
    """Hierarchical mid-layer entry (SCNT_DESCENT_MID): descent serving
    enters at the best member of the highest MXU-scannable layer instead
    of walking from the top — routing still uses only graph structure."""

    def _build(self, rng, n=3000, dim=16):
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        idx = HNSWIndex(
            dim=dim,
            params=HNSWParams(m=8, ef_construction=80, ef_search=60, seed=5),
            metric=DistanceMetric.L2,
            use_device=True,
        )
        idx.bulk_insert(list(range(1, n + 1)), vecs)
        return idx, vecs

    def test_mid_matches_pure_descent(self, rng, monkeypatch):
        monkeypatch.setenv("SCNT_DESCENT_MID_CAP", "256")  # force l* >= 2
        monkeypatch.setenv("SCNT_SEARCH_EF_UPPER", "4")
        idx, vecs = self._build(rng)
        from scintirete_tpu.index.device import mid_layer_host

        mid = mid_layer_host(idx.store)
        assert mid and mid["mid_level"] >= 2, "corpus too small for the test"
        queries = rng.standard_normal((32, 16)).astype(np.float32)
        dev = idx._get_device()
        monkeypatch.setenv("SCNT_DESCENT_MID", "0")
        s_ref, _ = dev.search(idx.store, queries, 10, 60,
                              entry_mode="descent")
        monkeypatch.setenv("SCNT_DESCENT_MID", "1")
        s_mid, d_mid = dev.search(idx.store, queries, 10, 60,
                                  entry_mode="descent")
        from scintirete_tpu.ops.distance import distance_np

        want = distance_np(queries, vecs, DistanceMetric.L2)
        true_i = np.argsort(want, axis=1)[:, :10]
        hits_ref = hits_mid = 0
        for b in range(32):
            t = set(true_i[b].tolist())
            hits_ref += len(t & set(s_ref[b][s_ref[b] >= 0].tolist()))
            hits_mid += len(t & set(s_mid[b][s_mid[b] >= 0].tolist()))
            dd = d_mid[b][s_mid[b] >= 0]
            assert np.all(np.diff(dd) >= -1e-6)  # sorted
        # the exact best-of-layer entry can only route as well or better
        # than arriving at that layer from above
        assert hits_mid >= hits_ref - 2, (hits_mid, hits_ref)
        assert hits_mid / 320 >= 0.9

    def test_knn_upper_mode_with_mid_entry(self, rng, monkeypatch):
        """SCNT_UPPER_MODE=knn (round-4 exact-kNN upper layers, ~2x faster
        1M builds) must pair with mid-entry serving and hold recall."""
        monkeypatch.setenv("SCNT_UPPER_MODE", "knn")
        monkeypatch.setenv("SCNT_DESCENT_MID", "1")
        monkeypatch.setenv("SCNT_SEARCH_EF_UPPER", "4")
        monkeypatch.setenv("SCNT_SEARCH_ENTRY", "descent")
        idx, vecs = self._build(rng, n=2000)
        queries = rng.standard_normal((32, 16)).astype(np.float32)
        res = idx.search_batch(queries, SearchParams(top_k=10, ef_search=60))
        from scintirete_tpu.ops.distance import distance_np

        want = distance_np(queries, vecs, DistanceMetric.L2)
        true_ids = np.argsort(want, axis=1)[:, :10] + 1
        hits = sum(
            len(set(true_ids[b].tolist()) & {r[0] for r in res[b]})
            for b in range(32)
        )
        assert hits / 320 >= 0.9

    def test_mid_cap_change_refreshes_table(self, rng, monkeypatch):
        """A/B scripts flip SCNT_DESCENT_MID_CAP between serving modes on
        an already-synced mirror; sync() must re-derive the mid table even
        when store.version is unchanged."""
        monkeypatch.setenv("SCNT_DESCENT_MID_CAP", "64")
        idx, vecs = self._build(rng, n=3000)
        dev = idx._get_device()
        dev.search(idx.store, vecs[:4], 5, 30, entry_mode="descent")
        g = dev.graph if hasattr(dev, "graph") else dev
        lvl_small = g.mid_level
        monkeypatch.setenv("SCNT_DESCENT_MID_CAP", "1024")
        dev.search(idx.store, vecs[:4], 5, 30, entry_mode="descent")
        lvl_big = g.mid_level
        assert lvl_big <= lvl_small
        if lvl_big and lvl_small:
            n_small = idx.store.layers[lvl_small - 1].count
            n_big = idx.store.layers[lvl_big - 1].count
            assert n_big >= n_small  # lower layer => more members

    def test_mid_excludes_deleted(self, rng, monkeypatch):
        monkeypatch.setenv("SCNT_DESCENT_MID_CAP", "256")
        monkeypatch.setenv("SCNT_SEARCH_EF_UPPER", "4")
        monkeypatch.setenv("SCNT_DESCENT_MID", "1")
        idx, vecs = self._build(rng, n=1500)
        dead = {3, 10, 77, 500, 1200}
        for vid in dead:
            idx.delete(vid)
        dev = idx._get_device()
        s, _ = dev.search(idx.store, vecs[:16], 10, 60, entry_mode="descent")
        for b in range(16):
            got = {int(x) + 1 for x in s[b][s[b] >= 0]}  # slots are id-1
            assert not (dead & got)


class TestPivotEntry:
    """MXU pivot entry vs the reference-style hierarchical descent."""

    def test_pivot_matches_descent(self, rng):
        n, dim, k = 500, 16, 10
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        idx = HNSWIndex(
            dim=dim,
            params=HNSWParams(m=8, ef_construction=80, ef_search=60, seed=11),
            metric=DistanceMetric.L2,
            use_device=True,
        )
        idx.bulk_insert(list(range(1, n + 1)), vecs)
        queries = rng.standard_normal((16, dim)).astype(np.float32)
        dev = idx._get_device()
        s_p, d_p = dev.search(idx.store, queries, k, 60, entry_mode="pivot")
        s_d, d_d = dev.search(idx.store, queries, k, 60, entry_mode="descent")
        overlap = sum(
            len(set(s_p[b][s_p[b] >= 0]) & set(s_d[b][s_d[b] >= 0]))
            for b in range(16)
        )
        assert overlap / (16 * k) >= 0.9

    def test_beam_descent_validity_and_no_regression(self, rng, monkeypatch):
        """SCNT_SEARCH_EF_UPPER>1 runs searchLayer(ef_upper) through the
        upper layers instead of the reference's greedy ef=1 walk — the
        scale-recall fix for bulk-built upper layers
        (benchmarks/results_round4.md §3). On any corpus it must produce
        valid results and never fewer ground-truth hits than greedy."""
        n_clusters, per, dim, k = 120, 25, 16, 10
        n = n_clusters * per
        centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 8
        vecs = centers.repeat(per, axis=0) + 0.3 * rng.standard_normal(
            (n, dim)
        ).astype(np.float32)
        idx = HNSWIndex(
            dim=dim,
            params=HNSWParams(m=8, ef_construction=60, ef_search=24, seed=13),
            metric=DistanceMetric.L2,
            use_device=True,
        )
        idx.bulk_insert(list(range(1, n + 1)), vecs)
        nq = 64
        queries = vecs[rng.choice(n, nq, replace=False)] + 0.05 * (
            rng.standard_normal((nq, dim)).astype(np.float32)
        )
        d_exact = distance_np(queries, vecs, DistanceMetric.L2)
        gt = np.argsort(d_exact, axis=1, kind="stable")[:, :k]  # slot order
        dev = idx._get_device()

        def hits(ef_upper):
            monkeypatch.setenv("SCNT_SEARCH_EF_UPPER", str(ef_upper))
            s, d = dev.search(idx.store, queries, k, 24, entry_mode="descent")
            total = 0
            for b in range(nq):
                row = s[b][s[b] >= 0]
                assert len(set(row.tolist())) == len(row)  # no dup slots
                dd = d[b][: len(row)]
                assert (np.diff(dd) >= -1e-6).all()  # sorted
                total += len(set(row) & set(gt[b]))
            return total

        greedy = hits(1)
        beam = hits(8)
        assert beam >= greedy
        assert beam / (nq * k) >= 0.9

    def test_fused_subbatch_matches_chunked(self, rng, monkeypatch):
        """SCNT_FUSE_SUBBATCH scans the pivot kernel over sub-batches in
        ONE program (one dispatch/upload per pass over the tunnel); its
        results must be bit-identical to the per-chunk dispatch path,
        including a non-multiple remainder batch."""
        n, dim, k = 400, 16, 10
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        idx = HNSWIndex(
            dim=dim,
            params=HNSWParams(m=8, ef_construction=80, ef_search=60, seed=5),
            metric=DistanceMetric.COSINE,
            use_device=True,
            search_batch_size=16,
        )
        idx.bulk_insert(list(range(1, n + 1)), vecs)
        queries = rng.standard_normal((41, dim)).astype(np.float32)
        dev = idx._get_device()
        monkeypatch.delenv("SCNT_FUSE_SUBBATCH", raising=False)
        s_c, d_c = dev.search(idx.store, queries, k, 60, entry_mode="pivot")
        monkeypatch.setenv("SCNT_FUSE_SUBBATCH", "1")
        s_f, d_f = dev.search(idx.store, queries, k, 60, entry_mode="pivot")
        np.testing.assert_array_equal(s_f, s_c)
        np.testing.assert_allclose(d_f, d_c, rtol=1e-6, atol=1e-7)

    def test_pivot_excludes_deleted(self, rng):
        n, dim = 300, 16
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        idx = HNSWIndex(
            dim=dim,
            params=HNSWParams(m=8, ef_construction=60, ef_search=40, seed=2),
            metric=DistanceMetric.L2,
            use_device=True,
        )
        idx.bulk_insert(list(range(1, n + 1)), vecs)
        dead = set(range(1, n + 1, 3))
        for vid in dead:
            idx.delete(vid)
        res = idx.search_batch(vecs[:8], SearchParams(top_k=10))
        for rlist in res:
            assert not ({r[0] for r in rlist} & dead)


class TestDevicePivotRefresh:
    def test_incremental_sync_refreshes_pivots_on_growth(self, rng):
        """The entry-pivot sample only covers slots [0, count-at-upload).
        Incremental syncs after >25% growth must resample, or appended
        regions are never reachable as entry points (recall degrades
        progressively until a capacity doubling forces a full upload)."""
        from scintirete_tpu.index.device import DeviceGraph

        store = GraphStore(8, HNSWParams(m=4, ef_construction=20, seed=1),
                           DistanceMetric.L2)
        vecs = rng.standard_normal((64, 8)).astype(np.float32)
        store.reserve(np.zeros(64, np.int64))
        store.alloc_slots(vecs[:40], np.zeros(40, np.int64))
        store.linked_count = store.count  # links applied (simulated)
        g = DeviceGraph()
        g.sync(store)
        assert g._pivot_count == 40
        piv0 = np.asarray(g.arrays["pivots"])
        assert piv0.max() < 40

        # small growth (< threshold): incremental sync keeps the sample
        store.alloc_slots(vecs[40:44], np.zeros(4, np.int64))
        store.linked_count = store.count
        g.sync(store)
        assert g._pivot_count == 40

        # big growth within capacity: same shapes -> incremental path,
        # but the pivot arrays must now cover the appended prefix
        store.alloc_slots(vecs[44:], np.zeros(20, np.int64))
        store.linked_count = store.count
        assert g._signature(store) == g._shape_sig  # truly incremental
        g.sync(store)
        assert g._pivot_count == 64
        piv1 = np.asarray(g.arrays["pivots"])
        assert piv1.max() > piv0.max()

    def test_pivots_exclude_allocated_but_unlinked_slots(self, rng):
        """The chunked bulk build allocates a chunk's slots BEFORE its
        links apply (bulk.py pipelines dispatch ahead of apply, releasing
        the write lock between chunks). A search in that window must not
        enter at an unlinked slot: the beam cannot expand past it (no
        out-edges) and its id is unregistered — observed in the wild as a
        single SearchResult(id=0) during a concurrent build."""
        from scintirete_tpu.index.hnsw import HNSWIndex
        from scintirete_tpu.types import SearchParams

        idx = HNSWIndex(
            dim=16,
            params=HNSWParams(m=8, ef_construction=40, ef_search=30, seed=1),
            metric=DistanceMetric.L2,
            use_device=True,
        )
        base = rng.standard_normal((300, 16)).astype(np.float32)
        for i, v in enumerate(base):
            idx.insert(i + 1, v)

        # simulate the inter-chunk window: a chunk's slots allocated (far
        # from the base cluster, so a leaked pivot would win entry) with
        # links not yet applied and ids not yet registered
        extra = rng.standard_normal((64, 16)).astype(np.float32) + 50.0
        store = idx.store
        levels = np.zeros(64, np.int32)
        store.reserve(levels)
        store.alloc_slots(extra, levels)

        # query sits on an unlinked vector: pre-fix its nearest pivot was
        # the unlinked slot itself -> dead-end entry, one bogus id-0 hit
        res = idx.search(extra[7], SearchParams(top_k=5))
        assert len(res) == 5
        for vid, _dist in res:
            assert 1 <= vid <= 300
