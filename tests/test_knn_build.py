"""Exact-kNN bulk builder tests (index/knn_build.py).

Runs on the CPU mesh. Gates: structural invariants (degree bounds, layer
membership, entrypoint), searchability (device + host oracle recall vs
brute force), and parity of the selection rules with the host oracle.
"""

import numpy as np
import pytest

from scintirete_tpu.index import HNSWIndex, host_algo, knn_build
from scintirete_tpu.index.store import GraphStore
from scintirete_tpu.ops.distance import distance_np
from scintirete_tpu.types import DistanceMetric, HNSWParams, SearchParams


def clustered(rng, n, dim=24, n_clusters=20):
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 2.0
    assign = rng.integers(0, n_clusters, n)
    return (centers[assign] + 0.3 * rng.standard_normal((n, dim))).astype(
        np.float32
    )


def brute_topk(queries, base, metric, k):
    d = distance_np(queries, base, metric)
    return np.argsort(d, axis=1, kind="stable")[:, :k]


@pytest.mark.parametrize("heuristic", [False, True], ids=["simple", "heur"])
@pytest.mark.parametrize(
    "metric",
    [DistanceMetric.L2, DistanceMetric.COSINE, DistanceMetric.INNER_PRODUCT],
)
def test_structure_and_recall(rng, metric, heuristic):
    n = 1500
    base = clustered(rng, n)
    params = HNSWParams(
        m=8, ef_construction=60, ef_search=50, seed=11,
        neighbor_heuristic=heuristic,
    )
    store = GraphStore(dim=base.shape[1], params=params, metric=metric)
    slots = knn_build.build(store, base)
    assert slots == list(range(n))
    assert store.live == n
    assert store.entry_slot >= 0
    assert store.max_layer == int(store.levels[:n].max())

    # degree bounds + layer membership invariant
    assert store.neighbors0.shape[1] == 2 * params.m
    valid0 = store.neighbors0[:n]
    assert (valid0 < n).all()
    for l, ls in enumerate(store.layers, start=1):
        nm = ls.count
        nbrs = ls.nbrs[:nm]
        ok = nbrs >= 0
        members = nbrs[ok]
        # every neighbor at layer l is a member of layer l
        assert (ls.row_of[members] >= 0).all()
        # no self loops
        assert (nbrs != ls.node_slot[:nm, None]).all()
    # layer-0 no self loops
    assert (valid0 != np.arange(n)[:, None]).all()

    # host-oracle search over the built graph must match (or beat) a
    # sequentially-built graph on the same data — the reference's simple
    # selection rule legitimately fragments clustered data, so the gate is
    # parity with the sequential oracle, not an absolute number
    queries = clustered(rng, 64, dim=base.shape[1])
    want = brute_topk(queries, base, metric, 10)

    seq_store = GraphStore(dim=base.shape[1], params=params, metric=metric)
    for v in base:
        host_algo.insert(seq_store, v)

    def recall_of(s):
        hits = 0
        for i, q in enumerate(queries):
            got, _ = host_algo.search(s, q, 10, 60)
            hits += len(set(got.tolist()) & set(want[i].tolist()))
        return hits / (64 * 10)

    knn_recall = recall_of(store)
    seq_recall = recall_of(seq_store)
    assert knn_recall >= seq_recall - 0.03, (
        f"knn-built recall {knn_recall:.3f} < sequential {seq_recall:.3f}"
    )
    if heuristic and metric != DistanceMetric.INNER_PRODUCT:
        # IP "nearest" favors large norms; OOD queries make an absolute gate
        # unprincipled there — the oracle-parity gate above still applies
        assert knn_recall >= 0.85, f"heuristic recall {knn_recall:.3f}"


def test_bulk_insert_uses_knn_builder_and_searches(rng):
    n = max(knn_build.MIN_BUILD_SIZE, 2048)
    base = clustered(rng, n, dim=16)
    idx = HNSWIndex(
        dim=16,
        params=HNSWParams(m=8, ef_construction=60, ef_search=60, seed=7,
                          neighbor_heuristic=True),
        metric=DistanceMetric.COSINE,
        use_device=True,
        search_batch_size=256,
    )
    idx.bulk_insert(list(range(1, n + 1)), base)
    # realistic workload: queries are perturbed base points
    queries = (base[rng.integers(0, n, 128)]
               + 0.1 * rng.standard_normal((128, 16))).astype(np.float32)
    want = brute_topk(queries, base, DistanceMetric.COSINE, 10)
    res = idx.search_batch(queries, SearchParams(top_k=10, ef_search=80))
    hits = 0
    for i in range(128):
        got = {r[0] - 1 for r in res[i]}
        hits += len(got & set(want[i].tolist()))
    recall = hits / (128 * 10)
    assert recall >= 0.92, f"device search recall {recall:.3f}"


def test_incremental_insert_after_knn_build(rng):
    """Online inserts/deletes must compose with a kNN-built graph."""
    n = 2048
    base = clustered(rng, n, dim=16)
    idx = HNSWIndex(
        dim=16,
        params=HNSWParams(m=8, ef_construction=60, ef_search=60, seed=7),
        metric=DistanceMetric.L2,
        use_device=True,
        search_batch_size=256,
    )
    idx.bulk_insert(list(range(1, n + 1)), base)
    # in-distribution online inserts (perturbed base points)
    extra = (base[rng.integers(0, n, 5)]
             + 0.05 * rng.standard_normal((5, 16))).astype(np.float32)
    for i, v in enumerate(extra):
        idx.insert(n + 1 + i, v)
    assert idx.size() == n + 5
    res = idx.search(extra[0], SearchParams(top_k=3))
    assert res[0][0] == n + 1
    assert idx.delete(n + 1) is True
    res = idx.search(extra[0], SearchParams(top_k=3))
    assert n + 1 not in [r[0] for r in res]


def test_knn_build_deterministic(rng):
    base = clustered(rng, 600, dim=12)
    out = []
    for _ in range(2):
        store = GraphStore(
            dim=12,
            params=HNSWParams(m=6, seed=3),
            metric=DistanceMetric.COSINE,
        )
        knn_build.build(store, base)
        out.append(
            (store.neighbors0[:600].copy(), store.levels[:600].copy())
        )
    np.testing.assert_array_equal(out[0][0], out[1][0])
    np.testing.assert_array_equal(out[0][1], out[1][1])


def test_reverse_edges_present(rng):
    """The bidirectional merge must actually add reverse edges: a node that
    nobody selects forward still appears in lists of nodes it selected."""
    base = clustered(rng, 400, dim=8)
    store = GraphStore(
        dim=8, params=HNSWParams(m=4, seed=1), metric=DistanceMetric.L2
    )
    knn_build.build(store, base)
    n = 400
    # count mutual edges: u in adj[v] and v in adj[u]
    mutual = 0
    total = 0
    for u in range(n):
        for v in store.neighbors0[u]:
            if v < 0:
                continue
            total += 1
            if u in store.neighbors0[v]:
                mutual += 1
    assert total > 0
    assert mutual / total > 0.5, "graph should be substantially bidirectional"


def test_bf16_scan_recall(rng, monkeypatch):
    """The TPU build path scans in bf16 (f32 accumulation). Force it on CPU
    and hold the same recall gate — input rounding must not damage the
    candidate sets enough to matter."""
    monkeypatch.setenv("SCNT_BUILD_SCAN_DTYPE", "bfloat16")
    n = max(knn_build.MIN_BUILD_SIZE, 2048)
    base = clustered(rng, n, dim=16)
    idx = HNSWIndex(
        dim=16,
        params=HNSWParams(m=8, ef_construction=60, ef_search=60, seed=7,
                          neighbor_heuristic=True),
        metric=DistanceMetric.COSINE,
        use_device=True,
        search_batch_size=256,
    )
    idx.bulk_insert(list(range(1, n + 1)), base)
    queries = (base[rng.integers(0, n, 128)]
               + 0.1 * rng.standard_normal((128, 16))).astype(np.float32)
    want = brute_topk(queries, base, DistanceMetric.COSINE, 10)
    res = idx.search_batch(queries, SearchParams(top_k=10, ef_search=80))
    hits = 0
    for i in range(128):
        got = {r[0] - 1 for r in res[i]}
        hits += len(got & set(want[i].tolist()))
    recall = hits / (128 * 10)
    assert recall >= 0.92, f"bf16-built graph recall {recall:.3f}"


def test_large_m_exceeds_candidate_pool(rng):
    """m0 = 2M > KNN_CANDIDATES(+sparse): selection returns fewer columns
    than max_deg and the drain must leave the tail -1-filled (regression:
    round-2 packed-fetch conversion broadcast-errored here)."""
    n = 2200
    base = clustered(rng, n)
    idx = HNSWIndex(
        dim=base.shape[1],
        params=HNSWParams(m=64, ef_construction=80, ef_search=50, seed=3),
        metric=DistanceMetric.COSINE,
        use_device=True,
    )
    idx.bulk_insert(list(range(1, n + 1)), base)
    res = idx.search_batch(base[:16], SearchParams(top_k=5))
    hits = sum(1 for i, r in enumerate(res) if any(x[0] == i + 1 for x in r))
    assert hits >= 15


def test_rebuild_append_path(rng, monkeypatch):
    """A large append (>= 4x existing and >= REBUILD_APPEND_MIN) rebuilds
    the union via the kNN constructor (atomic swap); smaller appends keep
    the chunked path."""
    import scintirete_tpu.index.hnsw as hnsw_mod

    monkeypatch.setattr(hnsw_mod, "REBUILD_APPEND_MIN", 2048)
    n1, n2 = 700, 3000
    base = clustered(rng, n1 + n2)
    idx = HNSWIndex(
        dim=base.shape[1],
        params=HNSWParams(m=8, ef_construction=60, ef_search=40, seed=5),
        metric=DistanceMetric.COSINE,
        use_device=True,
    )
    idx.bulk_insert(list(range(1, n1 + 1)), base[:n1])
    idx.bulk_insert(list(range(n1 + 1, n1 + n2 + 1)), base[n1:])
    assert idx.size() == n1 + n2
    # every id resolves to its own vector and is findable
    res = idx.search_batch(
        base[n1 - 8 : n1 + 8], SearchParams(top_k=3)
    )
    hits = sum(
        1 for i, r in enumerate(res) if any(x[0] == n1 - 8 + i + 1 for x in r)
    )
    assert hits >= 15
    np.testing.assert_allclose(idx.get_vector(n1 + 1), base[n1], rtol=1e-6)

    # with a tombstone present the rebuild path is skipped (chunked append)
    idx.delete(1)
    idx.bulk_insert([n1 + n2 + 1], base[:1] * 0.5)
    assert idx.size() == n1 + n2  # -1 tombstone, +1 insert
    assert not idx.contains(1) and idx.contains(n1 + n2 + 1)


@pytest.mark.parametrize("heuristic", [False, True], ids=["simple", "heur"])
@pytest.mark.parametrize(
    "metric",
    [DistanceMetric.L2, DistanceMetric.COSINE, DistanceMetric.INNER_PRODUCT],
)
def test_batched_append(rng, metric, heuristic):
    """Mid-size appends take knn_build.append_batch: recall gates hold for
    old AND new vectors, degree bounds hold, reverse edges exist, and the
    original store is untouched until the swap."""
    import scintirete_tpu.index.knn_build as kb

    n1, n2 = 2500, 2200
    base = clustered(rng, n1 + n2)
    idx = HNSWIndex(
        dim=base.shape[1],
        params=HNSWParams(
            m=8, ef_construction=60, ef_search=50, seed=7,
            neighbor_heuristic=heuristic,
        ),
        metric=metric,
        use_device=True,
    )
    idx.bulk_insert(list(range(1, n1 + 1)), base[:n1])
    old_store = idx.store
    idx.bulk_insert(list(range(n1 + 1, n1 + n2 + 1)), base[n1:])
    assert idx.store is not old_store  # append_batch swapped a clone
    assert old_store.count == n1  # original untouched
    n = n1 + n2
    assert idx.size() == n

    # degree bounds + membership invariants
    store = idx.store
    assert np.all((store.neighbors0[:n] < n) )
    deg0 = (store.neighbors0[:n] >= 0).sum(axis=1)
    assert deg0.max() <= store.m0
    for l, ls in enumerate(store.layers, start=1):
        rows = ls.nbrs[: ls.count]
        assert (rows >= 0).sum(axis=1).max(initial=0) <= store.m
        valid = rows[rows >= 0]
        assert np.all(ls.row_of[valid] >= 0)  # neighbors are layer members

    # appended nodes have incoming edges (bidirectional linking happened)
    incoming = np.isin(store.neighbors0[:n1], np.arange(n1, n)).any()
    assert incoming

    # recall gate over the whole collection (old + new)
    queries = base[::37] + 0.05 * rng.standard_normal(
        (len(base[::37]), base.shape[1])
    ).astype(np.float32)
    true_i = brute_topk(queries, base, metric, 10)
    res = idx.search_batch(queries, SearchParams(top_k=10, ef_search=50))
    hits = 0
    for b in range(len(queries)):
        want = {int(j) + 1 for j in true_i[b]}
        hits += len(want & {r[0] for r in res[b]})
    recall = hits / (len(queries) * 10)
    assert recall >= 0.93, recall


def test_batched_append_scan_cache_interpret(rng, monkeypatch):
    """The fused/masked append path with the device-resident scan cache
    (TPU serving path), exercised on CPU via Pallas interpret mode: the
    second append must HIT the cache (incremental row scatter, no corpus
    re-upload) and recall gates must hold for all generations."""
    monkeypatch.setenv("SCNT_BUILD_SCAN_DTYPE", "bfloat16")
    monkeypatch.setenv("SCNT_APPEND_INTERPRET", "1")

    n1, n2, n3 = 2500, 2200, 2100
    base = clustered(rng, n1 + n2 + n3)
    metric = DistanceMetric.L2
    idx = HNSWIndex(
        dim=base.shape[1],
        params=HNSWParams(
            m=8, ef_construction=60, ef_search=50, seed=7,
            neighbor_heuristic=True,
        ),
        metric=metric,
        use_device=True,
    )
    idx.bulk_insert(list(range(1, n1 + 1)), base[:n1])
    # an UNFUSED build (CPU, SCNT_BUILD_INTERPRET unset) can't seed the
    # cache; the fused build's seeding is covered separately below
    assert idx._append_scan_cache == {}

    idx.bulk_insert(list(range(n1 + 1, n1 + n2 + 1)), base[n1 : n1 + n2])
    cache = idx._append_scan_cache
    assert cache and cache["vec_version"] == idx.store.vec_version
    base_j_first = cache["base_j"]

    idx.bulk_insert(
        list(range(n1 + n2 + 1, n1 + n2 + n3 + 1)), base[n1 + n2 :]
    )
    # second append must have taken the incremental path: same npad, new
    # vec_version, and base_j derived by scatter (no fresh full upload of
    # identical shape is observable, but vec_version continuity is)
    assert cache["vec_version"] == idx.store.vec_version
    assert cache["npad"] == base_j_first.shape[0]

    # the cached base matches the store's scan-form rows exactly
    import numpy as _np

    vecs = idx.store.vectors[: idx.store.count].astype(_np.float32)
    cached = _np.asarray(cache["base_j"], _np.float32)[: idx.store.count]
    _np.testing.assert_allclose(
        cached,
        vecs.astype(cached.dtype),
        rtol=1e-2, atol=1e-2,
    )

    # recall gate over all three generations
    n = n1 + n2 + n3
    assert idx.size() == n
    queries = base[::41] + 0.05 * rng.standard_normal(
        (len(base[::41]), base.shape[1])
    ).astype(np.float32)
    true_i = brute_topk(queries, base, metric, 10)
    res = idx.search_batch(queries, SearchParams(top_k=10, ef_search=50))
    hits = 0
    for b in range(len(queries)):
        want = {int(j) + 1 for j in true_i[b]}
        hits += len(want & {r[0] for r in res[b]})
    recall = hits / (len(queries) * 10)
    assert recall >= 0.93, recall

    # upper-layer structural integrity on the FUSED path (regression: a
    # swapped (ci, cd) unpack wrote float distances into the adjacency as
    # slot ids — every neighbor at layer l must be a member of layer l)
    store = idx.store
    for l, ls in enumerate(store.layers, start=1):
        rows = ls.nbrs[: ls.count]
        assert (rows >= 0).sum(axis=1).max(initial=0) <= store.m
        valid = rows[rows >= 0]
        assert np.all(ls.row_of[valid] >= 0), f"layer {l} non-member nbrs"


def test_fused_build_seeds_append_scan_cache(rng, monkeypatch):
    """A FUSED bulk build seeds the append scan cache device-side (the
    ctx base gathered into slot order): the first append after a build
    must HIT the cache — incremental row scatter, no corpus re-upload —
    and the seeded rows must equal the store's scan-form rows (i.e. the
    order->slot permutation is correct)."""
    monkeypatch.setenv("SCNT_BUILD_SCAN_DTYPE", "bfloat16")
    monkeypatch.setenv("SCNT_BUILD_INTERPRET", "1")
    monkeypatch.setenv("SCNT_APPEND_INTERPRET", "1")

    n1, n2 = 2500, 2100
    base = clustered(rng, n1 + n2)
    idx = HNSWIndex(
        dim=base.shape[1],
        params=HNSWParams(
            m=8, ef_construction=60, ef_search=50, seed=7,
            neighbor_heuristic=True,
        ),
        metric=DistanceMetric.L2,
        use_device=True,
    )
    idx.bulk_insert(list(range(1, n1 + 1)), base[:n1])
    cache = idx._append_scan_cache
    assert cache, "fused build must seed the append scan cache"
    assert cache["lineage"] is idx.store.lineage
    assert cache["vec_version"] == idx.store.vec_version
    cached = np.asarray(cache["base_j"], np.float32)
    np.testing.assert_allclose(
        cached[:n1], base[:n1].astype(cached.dtype), rtol=1e-2, atol=1e-2
    )
    # pad rows must be inert (zero) so masked scans can't surface them
    assert not np.any(cached[n1:])

    # first append must take the scatter (cache-HIT) path
    from scintirete_tpu.index.device import DeviceGraph

    orig = DeviceGraph._scatter_into
    calls = []

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(DeviceGraph, "_scatter_into", counting)
    idx.bulk_insert(list(range(n1 + 1, n1 + n2 + 1)), base[n1:])
    assert calls, "append after a fused build must hit the seeded cache"
    cached = np.asarray(cache["base_j"], np.float32)
    count = idx.store.count
    np.testing.assert_allclose(
        cached[:count],
        idx.store.vectors[:count].astype(cached.dtype),
        rtol=1e-2, atol=1e-2,
    )

    # appended nodes are searchable at quality
    res = idx.search_batch(
        base[n1 : n1 + 128], SearchParams(top_k=10, ef_search=50)
    )
    hits = sum(
        1 for b, row in enumerate(res)
        if any(r[0] == n1 + 1 + b for r in row)
    )
    assert hits >= 124, hits


def test_batched_append_keeps_device_mirror(rng):
    """After a batched append that does NOT grow capacity, the device
    mirror must sync INCREMENTALLY (dirty-preserving clone): only touched
    rows are scattered, no full re-upload (VERDICT r2 item 5 — the full
    upload was ~600 MB at 1M). The FIRST append after a bulk build grows
    cap (build reserves exactly pow2>=n) and legitimately full-uploads —
    a once-per-doubling amortized cost."""
    n1, n2, n3 = 2500, 2200, 2100
    base = clustered(rng, n1 + n2 + n3)
    idx = HNSWIndex(
        dim=base.shape[1],
        params=HNSWParams(m=8, ef_construction=60, ef_search=50, seed=7),
        metric=DistanceMetric.L2,
        use_device=True,
    )
    idx.bulk_insert(list(range(1, n1 + 1)), base[:n1])
    # append 1: grows cap 4096 -> 8192, full upload path (tracking reset)
    idx.bulk_insert(list(range(n1 + 1, n1 + n2 + 1)), base[n1 : n1 + n2])
    idx.search_batch(base[:4], SearchParams(top_k=3, ef_search=50))
    dev = idx._device
    assert dev is not None
    graph = dev.graph if hasattr(dev, "graph") else dev._graph
    full_uploads = []
    orig_full = graph._full_upload
    graph._full_upload = lambda store: (full_uploads.append(1),
                                        orig_full(store))[1]

    # append 2: count 6800 < cap 8192 — must be incremental
    idx.bulk_insert(
        list(range(n1 + n2 + 1, n1 + n2 + n3 + 1)), base[n1 + n2 :]
    )
    assert idx._device is dev  # mirror object survived the publish
    assert idx.store._dirty is not None  # clone carried tracking
    res = idx.search_batch(
        base[n1 + n2 : n1 + n2 + 4], SearchParams(top_k=3, ef_search=50)
    )
    assert not full_uploads  # incremental sync, no full re-upload
    # >25% growth: the incremental sync must have resampled entry pivots
    # to cover the appended region (device.py _incremental)
    assert graph._pivot_count == n1 + n2 + n3
    graph._full_upload = orig_full
    # appended vectors are searchable through the device path
    assert res[0][0][0] == n1 + n2 + 1


def test_refine_layer0_improves_knn_overlap(rng):
    """NN-descent refinement (HNSWParams.refine_rounds) lifts the device
    layer-0 adjacency toward true kNN and preserves the invariants:
    degree bound, no self edges, valid members only."""
    from scintirete_tpu.index import knn_build as kb

    n, dim, m0 = 2048, 32, 16
    centers = rng.standard_normal((40, dim)).astype(np.float32) * 2.0
    a = rng.integers(0, 40, n)
    base = (centers[a] + 0.4 * rng.standard_normal((n, dim))).astype(
        np.float32
    )
    # true kNN@5 (cosine)
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    d = 1.0 - bn @ bn.T
    np.fill_diagonal(d, np.inf)
    true5 = np.argsort(d, axis=1)[:, :5]

    def overlap(adj):
        hits = 0
        for i in range(n):
            hits += len(
                set(adj[i][adj[i] >= 0].tolist()) & set(true5[i].tolist())
            )
        return hits / (n * 5)

    ctx = kb._make_build_ctx(base, 2)  # cosine
    adj = kb._layer_adj(ctx, n, m0, True)
    before = overlap(adj)
    refined = kb._refine_layer0(ctx, adj, n, m0, True, rounds=1)

    assert refined.shape == (n, m0)
    rows = np.arange(n)[:, None]
    assert not np.any(refined == rows)  # no self edges
    assert refined.max() < n and refined.min() >= -1
    after = overlap(refined)
    assert after > before  # strictly better on this clustered workload
    assert after >= 0.97


def test_build_honors_refine_rounds(rng, monkeypatch):
    """HNSWParams.refine_rounds routes the bulk build through the
    refinement pass (observed via the phase hook), and the refined graph
    still searches correctly."""
    from scintirete_tpu.index import knn_build as kb
    from scintirete_tpu.index.hnsw import HNSWIndex

    calls = []
    orig = kb._refine_layer0

    def spy(ctx, adj, nm, max_deg, heuristic, rounds):
        calls.append((nm, max_deg, rounds))
        return orig(ctx, adj, nm, max_deg, heuristic, rounds)

    monkeypatch.setattr(kb, "_refine_layer0", spy)
    n, dim = 2100, 24
    base = rng.standard_normal((n, dim)).astype(np.float32)
    idx = HNSWIndex(
        dim=dim,
        params=HNSWParams(
            m=8, ef_construction=50, seed=7, neighbor_heuristic=True,
            refine_rounds=1,
        ),
        metric=DistanceMetric.L2,
        use_device=True,  # the kNN constructor is the device-build path
    )
    idx.bulk_insert(list(range(1, n + 1)), base)
    assert calls == [(n, 16, 1)]  # layer 0 only, m0 = 2m
    res = idx.search_batch(base[:8], SearchParams(top_k=3, ef_search=40))
    assert all(r[0][0] == i + 1 for i, r in enumerate(res))


def test_resident_flush_matches_host_path(rng):
    """The device-resident reverse-flush (adjacency gathered on device,
    incoming distances recomputed on the MXU) produces the same graph as
    the host-fed chain up to distance-tie reordering: identical forward
    rows, near-identical reverse-repruned rows, same invariants."""
    from scintirete_tpu.index import knn_build as kb
    from scintirete_tpu.index.store import GraphStore

    n1, n2, dim = 2500, 2048, 24
    base = rng.standard_normal((n1 + n2, dim)).astype(np.float32)
    params = HNSWParams(m=8, ef_construction=50, seed=11,
                        neighbor_heuristic=True)

    def run(cache):
        s = GraphStore(dim, params, DistanceMetric.L2)
        kb.build(s, base[:n1], scan_cache=cache)
        kb.append_batch(s, base[n1:], scan_cache=cache)
        return s

    s_host = run(None)  # cache-less: host-fed reprune chain
    s_res = run({})  # cached: resident flush
    assert s_host.count == s_res.count
    a, b = s_host.neighbors0[: s_host.count], s_res.neighbors0[: s_res.count]
    rows = np.arange(s_res.count)[:, None]
    assert not np.any(b == rows)  # no self edges
    assert b.max() < s_res.count
    # identical up to ties: per-row neighbor-set overlap is ~1.0
    inter = sum(
        len(set(a[i][a[i] >= 0]) & set(b[i][b[i] >= 0]))
        / max(1, (a[i] >= 0).sum())
        for i in range(s_host.count)
    ) / s_host.count
    assert inter > 0.995


def test_resident_cache_hits_and_invalidates(rng):
    """Second consecutive append reuses the device-resident adjacency
    (graph_hit); a delete between appends forces a full re-establishment;
    both stay searchable with full self-recall."""
    from scintirete_tpu.index.hnsw import HNSWIndex

    n1, n2, dim = 2500, 2048, 24
    rngv = rng.standard_normal((n1 + 3 * n2, dim)).astype(np.float32)
    idx = HNSWIndex(
        dim=dim,
        params=HNSWParams(m=8, ef_construction=50, seed=5,
                          neighbor_heuristic=True),
        metric=DistanceMetric.L2,
        use_device=True,
    )
    idx.bulk_insert(list(range(1, n1 + 1)), rngv[:n1])
    cache = idx._append_scan_cache
    idx.bulk_insert(
        list(range(n1 + 1, n1 + n2 + 1)), rngv[n1 : n1 + n2]
    )
    assert cache.get("nbrs0_j") is not None
    idx.bulk_insert(
        list(range(n1 + n2 + 1, n1 + 2 * n2 + 1)),
        rngv[n1 + n2 : n1 + 2 * n2],
    )
    assert cache["graph_hit_last"] is True  # consecutive appends hit
    idx.delete(7)  # outside mutation bumps store.version
    start = n1 + 2 * n2
    ids3 = list(range(start + 1, start + n2 + 1))
    idx.bulk_insert(ids3, rngv[start : start + n2])
    assert cache["graph_hit_last"] is False  # invalidated by the delete
    res = idx.search_batch(
        rngv[start : start + 64], SearchParams(top_k=1, ef_search=60)
    )
    ok = sum(1 for i, r in enumerate(res) if r and r[0][0] == ids3[i])
    assert ok >= 62


def test_greedy_descent_routes_clustered(rng, monkeypatch):
    """The sequential-semantics upper hierarchy must carry the REFERENCE's
    routing — greedy ef=1 descent from the entry (hnsw.go:309-311) — on
    clustered data, where round-4's independent per-layer kNN upper graphs
    stranded the walker (VERDICT r4 item 1). Small-N canary for the
    hardware-scale gate (benchmarks/upper_seq_1000000.json). Pinned to
    SCNT_UPPER_MODE=seq + the pure top-down walk (no mid entry): the
    default build is the fast kNN upper, whose routing contract is the
    mid-entry one (TestMidLayerEntry in test_hnsw.py)."""
    from scintirete_tpu.index.device import DeviceIndex

    monkeypatch.setenv("SCNT_UPPER_MODE", "seq")
    monkeypatch.setenv("SCNT_DESCENT_MID", "0")
    data = clustered(rng, 4000, dim=24, n_clusters=40)
    store = GraphStore(
        24,
        HNSWParams(m=8, ef_construction=60, ef_search=40, seed=11),
        DistanceMetric.COSINE,
    )
    knn_build.build(store, data)
    # every upper layer got sequential-semantics adjacency: degree bounds
    # + membership invariants
    for ls in store.layers:
        nbrs = ls.nbrs[: ls.count]
        assert ((nbrs >= 0).sum(axis=1) <= store.m).all()
        live = nbrs[nbrs >= 0]
        assert (ls.row_of[live] >= 0).all(), "edge to a non-member"
    queries = (
        data[rng.integers(0, len(data), 128)]
        + 0.1 * rng.standard_normal((128, 24)).astype(np.float32)
    )
    gt = brute_topk(queries, data, DistanceMetric.COSINE, 10)
    dev = DeviceIndex()
    s, _ = dev.search(store, queries, 10, 40, entry_mode="descent")
    hits = sum(
        len(set(s[i].tolist()) & set(gt[i].tolist())) for i in range(128)
    )
    assert hits / 1280 >= 0.97, f"greedy-descent recall {hits / 1280:.3f}"
