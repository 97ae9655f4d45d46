"""Bulk graph construction from exact k-NN via MXU scans.

The reference (and round-1's chunked builder) constructs HNSW by SEQUENTIAL
insertion: each vector beam-searches the graph built so far and links in
(reference: hnsw.go:190-257). That is a pointer-chase with a serial
dependency — the worst possible shape for a TPU, and the round-1 bottleneck
(~450 vec/s, all in host link application).

This builder inverts the algorithm into dense batched phases per layer:

1. **Doubling-round exact candidates.** Members are (seeded-)shuffled and
   processed in rounds of doubling size; each round's nodes take their
   top-C candidates from an exact MXU scan against the prefix built so far
   (including the round itself). Early nodes therefore see a SPARSE sample
   and form long-range (inter-cluster) edges — the same mechanism that makes
   sequentially-built HNSW routable (a pure exact-kNN graph fragments into
   cluster cliques). Total scan cost ~= (2/3) n^2 multiply-adds, all MXU.
2. **Neighbor selection** — reference semantics, batched over all nodes at
   once: simple nearest-M (hnsw.go:560-583) or the diversity heuristic with
   keep-pruned-fill (host_algo.select_neighbors).
3. **Reverse-edge merge** — bidirectional linking (hnsw.go:224-249): each
   forward edge u->v yields an incoming candidate u for v, capped at the
   nearest max_degree per target (exact: a farther incoming edge could
   never survive the prune), via a sort-by-target segment reduction.
4. **Final prune** — the selection rule applied to (forward u incoming),
   mirroring pruneConnections/heuristic re-selection (hnsw.go:586-614).

Upper layers repeat the phases over the layer's member subset (geometric
series: ~33% extra). Candidates are exact, so recall gates vs the
sequential oracle hold; see tests/test_knn_build.py.
"""

from __future__ import annotations

import functools

import numpy as np

from scintirete_tpu.index.store import GraphStore

# per-node candidate pool from the kNN scan
KNN_CANDIDATES = 64
# below this many vectors a from-scratch build just uses the chunked path
MIN_BUILD_SIZE = 2048
_ROUND0 = 128  # first-round prefix size (sparse enough for long-range edges)
_QBLOCK = 2048  # rows scanned per kNN dispatch
_TILE = 131072  # base columns per scan tile


def _pad_pow2(n: int, minimum: int = 256) -> int:
    n = max(n, minimum)
    return 1 << (n - 1).bit_length()


# ---------------------------------------------------------------------------
# device kernels (built lazily; cached across calls)
# ---------------------------------------------------------------------------


@functools.cache
def _kernels():
    import jax
    import jax.numpy as jnp

    from scintirete_tpu.ops.distance import pairwise_distance

    INF = jnp.float32(jnp.inf)

    @functools.partial(jax.jit, static_argnames=("metric", "c", "tile"))
    def knn_block(
        q_block,  # [Bq, D] rows whose neighbors we want
        self_idx,  # [Bq] i32 member index of each row (self-exclusion)
        base,  # [Np, D] padded member-prefix matrix
        base_sq,  # [Np]
        n_valid,  # scalar i32 true prefix length (>= n_valid is padding)
        metric: int,
        c: int,
        tile: int,
    ):
        """Exact top-c prefix neighbors of each row (self excluded)."""
        Np = base.shape[0]
        num_tiles = max(Np // tile, 1)
        t = Np // num_tiles
        base_t = base.reshape(num_tiles, t, -1)
        norms_t = base_sq.reshape(num_tiles, t)

        def body(carry, xs):
            best_d, best_i = carry
            tile_base, tile_norms, tile_idx = xs
            d = pairwise_distance(q_block, tile_base, metric, tile_norms)
            idx = tile_idx * t + jax.lax.broadcasted_iota(
                jnp.int32, d.shape, 1
            )
            bad = (idx >= n_valid) | (idx == self_idx[:, None])
            d = jnp.where(bad, INF, d)
            td, ti = jax.lax.approx_min_k(d, c)
            ti = jnp.take_along_axis(idx, ti, axis=1)
            all_d = jnp.concatenate([best_d, td], axis=1)
            all_i = jnp.concatenate([best_i, ti], axis=1)
            nd, sel = jax.lax.top_k(-all_d, c)
            return (-nd, jnp.take_along_axis(all_i, sel, axis=1)), None

        B = q_block.shape[0]
        init = (
            jnp.full((B, c), INF, jnp.float32),
            jnp.full((B, c), -1, jnp.int32),
        )
        (bd, bi), _ = jax.lax.scan(
            body,
            init,
            (base_t, norms_t, jnp.arange(num_tiles, dtype=jnp.int32)),
        )
        return bd, jnp.where(jnp.isinf(bd), -1, bi)

    @functools.partial(
        jax.jit, static_argnames=("metric", "max_deg", "heuristic")
    )
    def select_block(
        cand_i,  # [B, C] candidate member indices, sorted by distance asc
        cand_d,  # [B, C] (-1 / inf padded)
        base,  # [Np, D]
        metric: int,
        max_deg: int,
        heuristic: bool,
    ):
        """Per-node neighbor selection (reference semantics, batched).

        simple: nearest max_deg (hnsw.go:560-583).
        heuristic: keep a candidate only if it is closer to the node than to
        every already-kept neighbor; fill remaining slots from the pruned
        set in distance order (host_algo.select_neighbors)."""
        B, C = cand_i.shape
        valid = cand_i >= 0
        if not heuristic:
            sel_i = jnp.where(valid[:, :max_deg], cand_i[:, :max_deg], -1)
            sel_d = jnp.where(valid[:, :max_deg], cand_d[:, :max_deg], INF)
            return sel_i, sel_d

        cvecs = base[jnp.maximum(cand_i, 0)].astype(jnp.float32)  # [B, C, D]
        dots = jnp.einsum(
            "bcd,bed->bce", cvecs, cvecs, preferred_element_type=jnp.float32
        )
        sq = jnp.sum(cvecs * cvecs, axis=2)  # [B, C]
        if metric == 1:  # L2: compare in squared form
            dcc = sq[:, :, None] + sq[:, None, :] - 2.0 * dots
            dq = cand_d * cand_d  # cand_d is sqrt'ed L2
        elif metric == 2:  # cosine
            denom = jnp.sqrt(sq[:, :, None] * sq[:, None, :])
            dcc = 1.0 - jnp.clip(
                jnp.where(denom > 1e-30, dots / jnp.maximum(denom, 1e-30), 0.0),
                -1.0,
                1.0,
            )
            dq = cand_d
        else:  # inner product (negated dot everywhere)
            dcc = -dots
            dq = cand_d

        def body(c, sel):
            dmin = jnp.min(jnp.where(sel, dcc[:, c, :], INF), axis=1)
            n_sel = jnp.sum(sel, axis=1)
            ok = valid[:, c] & (n_sel < max_deg) & (dq[:, c] < dmin)
            return sel.at[:, c].set(ok)

        sel = jax.lax.fori_loop(0, C, body, jnp.zeros((B, C), bool))
        # selected first (distance order), then pruned fill (distance order)
        fill_key = (~sel & valid).astype(jnp.int32) + 2 * (~valid).astype(
            jnp.int32
        )
        order = jnp.argsort(fill_key, axis=1, stable=True)
        out_i = jnp.take_along_axis(cand_i, order, axis=1)[:, :max_deg]
        out_d = jnp.take_along_axis(cand_d, order, axis=1)[:, :max_deg]
        out_key = jnp.take_along_axis(fill_key, order, axis=1)[:, :max_deg]
        out_i = jnp.where(out_key < 2, out_i, -1)
        out_d = jnp.where(out_key < 2, out_d, INF)
        return out_i, out_d

    @functools.partial(jax.jit, static_argnames=("max_deg",))
    def incoming_edges(
        adj,  # [Nm, F] forward-selected neighbor indices (-1 pad)
        adj_d,  # [Nm, F]
        max_deg: int,
    ):
        """Reverse edges capped at the nearest max_deg per target.

        Returns (inc_i [Nm, max_deg], inc_d) — for every forward edge u->v,
        u becomes an incoming candidate of v. Capping incoming at the
        nearest max_deg per target is exact: an incoming edge farther than
        max_deg nearer incoming edges can never survive the final prune."""
        Nm, F = adj.shape
        E = Nm * F
        src = jnp.repeat(
            jnp.arange(Nm, dtype=jnp.int32)[:, None], F, axis=1
        ).reshape(E)
        dst = adj.reshape(E)
        d = adj_d.reshape(E)
        dst_key = jnp.where(dst >= 0, dst, Nm)  # invalid sorts last
        dst_s, d_s, src_s = jax.lax.sort((dst_key, d, src), num_keys=2)
        iota = jnp.arange(E, dtype=jnp.int32)
        new_grp = jnp.concatenate(
            [jnp.ones(1, bool), dst_s[1:] != dst_s[:-1]]
        )
        grp_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(new_grp, iota, 0)
        )
        pos = iota - grp_start
        keep = (pos < max_deg) & (dst_s < Nm)
        row = jnp.where(keep, dst_s, Nm)  # OOB rows dropped by the scatter
        inc_i = jnp.full((Nm, max_deg), -1, jnp.int32)
        inc_d = jnp.full((Nm, max_deg), INF)
        inc_i = inc_i.at[row, pos % max_deg].set(
            jnp.where(keep, src_s, -1), mode="drop"
        )
        inc_d = inc_d.at[row, pos % max_deg].set(
            jnp.where(keep, d_s, INF), mode="drop"
        )
        return inc_i, inc_d

    @jax.jit
    def merge_dedupe(fwd_i, fwd_d, inc_i, inc_d):
        """(forward u incoming) per row: dedupe, sorted by distance asc."""
        all_i = jnp.concatenate([fwd_i, inc_i], axis=1)
        all_d = jnp.concatenate([fwd_d, inc_d], axis=1)
        key_i = jnp.where(all_i >= 0, all_i, jnp.int32(2**30))
        si, sd = jax.lax.sort((key_i, all_d), num_keys=1)
        dup = jnp.concatenate(
            [jnp.zeros((si.shape[0], 1), bool), si[:, 1:] == si[:, :-1]],
            axis=1,
        )
        sd = jnp.where(dup | (si >= 2**30), INF, sd)
        sd, si = jax.lax.sort((sd, si), num_keys=1)
        return jnp.where(jnp.isinf(sd), -1, si), sd

    return {
        "knn_block": knn_block,
        "select_block": select_block,
        "incoming_edges": incoming_edges,
        "merge_dedupe": merge_dedupe,
    }


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------


def _scan_rounds(
    member_vecs: np.ndarray,  # [Nm, D] in SHUFFLED (round) order
    metric: int,
    c: int,
    n_sparse: int = 24,
) -> tuple[np.ndarray, np.ndarray]:
    """Doubling-round exact candidates: row i scans the prefix containing
    its own round. Additionally EVERY row takes its top-n_sparse neighbors
    among the sparse _ROUND0 prefix — long-range candidate material for the
    diversity heuristic (late rows otherwise see only local neighbors; early
    rows get this for free from their small round). Returns
    (cand_i [Nm, c + n_sparse], cand_d), deduplicated, distance-ascending,
    in member order."""
    import jax.numpy as jnp

    K = _kernels()
    nm, dim = member_vecs.shape
    cand_i = np.full((nm, c), -1, np.int32)
    cand_d = np.full((nm, c), np.inf, np.float32)

    start = 0
    prefix = min(_ROUND0, nm)
    while start < nm:
        stop = prefix  # this round covers rows [start, prefix)
        npad = _pad_pow2(prefix)
        base = np.zeros((npad, dim), np.float32)
        base[:prefix] = member_vecs[:prefix]
        base_j = jnp.asarray(base)
        base_sq = jnp.sum(base_j.astype(jnp.float32) ** 2, axis=1)
        tile = min(_TILE, npad)
        cc = min(c, max(prefix - 1, 1))
        in_flight = []
        for qs in range(start, stop, _QBLOCK):
            qe = min(qs + _QBLOCK, stop)
            bq = _pad_pow2(qe - qs, minimum=64)
            qb = np.zeros((bq, dim), np.float32)
            qb[: qe - qs] = member_vecs[qs:qe]
            self_idx = np.full(bq, -1, np.int32)
            self_idx[: qe - qs] = np.arange(qs, qe, dtype=np.int32)
            cd, ci = K["knn_block"](
                jnp.asarray(qb),
                jnp.asarray(self_idx),
                base_j,
                base_sq,
                jnp.int32(prefix),
                metric=metric,
                c=cc,
                tile=tile,
            )
            in_flight.append((qs, qe, ci, cd))
        for qs, qe, ci, cd in in_flight:
            cand_i[qs:qe, :cc] = np.asarray(ci)[: qe - qs]
            cand_d[qs:qe, :cc] = np.asarray(cd)[: qe - qs]
        start = stop
        prefix = min(prefix * 2, nm)

    sparse = min(_ROUND0, nm)
    ns = min(n_sparse, max(sparse - 1, 1))
    if sparse >= nm:  # one round covered everything; nothing to add
        return cand_i, cand_d
    sp_i = np.full((nm, ns), -1, np.int32)
    sp_d = np.full((nm, ns), np.inf, np.float32)
    npad = _pad_pow2(sparse)
    base = np.zeros((npad, dim), np.float32)
    base[:sparse] = member_vecs[:sparse]
    base_j = jnp.asarray(base)
    base_sq = jnp.sum(base_j.astype(jnp.float32) ** 2, axis=1)
    in_flight = []
    for qs in range(0, nm, _QBLOCK):
        qe = min(qs + _QBLOCK, nm)
        bq = _pad_pow2(qe - qs, minimum=64)
        qb = np.zeros((bq, dim), np.float32)
        qb[: qe - qs] = member_vecs[qs:qe]
        self_idx = np.full(bq, -1, np.int32)
        self_idx[: qe - qs] = np.arange(qs, qe, dtype=np.int32)
        cd, ci = K["knn_block"](
            jnp.asarray(qb), jnp.asarray(self_idx), base_j, base_sq,
            jnp.int32(sparse), metric=metric, c=ns, tile=npad,
        )
        in_flight.append((qs, qe, ci, cd))
    for qs, qe, ci, cd in in_flight:
        sp_i[qs:qe] = np.asarray(ci)[: qe - qs]
        sp_d[qs:qe] = np.asarray(cd)[: qe - qs]

    # merge + dedupe (rows with an empty sparse part just keep their list)
    mi, md = K["merge_dedupe"](
        jnp.asarray(cand_i), jnp.asarray(cand_d),
        jnp.asarray(sp_i), jnp.asarray(sp_d),
    )
    return np.asarray(mi), np.asarray(md)


def _build_layer(
    member_vecs: np.ndarray,  # [Nm, D] f32, shuffled (round) order
    metric: int,
    max_deg: int,
    n_candidates: int,
    heuristic: bool,
) -> np.ndarray:
    """Adjacency [Nm, max_deg] in member-index space (-1 padded)."""
    import jax.numpy as jnp

    K = _kernels()
    nm, dim = member_vecs.shape
    c = min(n_candidates, max(nm - 1, 1))
    cand_i, cand_d = _scan_rounds(member_vecs, metric, c)
    c = cand_i.shape[1]  # sparse augmentation may widen the pool

    npad = _pad_pow2(nm)
    base = np.zeros((npad, dim), np.float32)
    base[:nm] = member_vecs
    base_j = jnp.asarray(base)

    # phase 2: forward selection (tiled over rows)
    fwd_i = np.full((nm, max_deg), -1, np.int32)
    fwd_d = np.full((nm, max_deg), np.inf, np.float32)
    in_flight = []
    for qs in range(0, nm, _QBLOCK):
        qe = min(qs + _QBLOCK, nm)
        bq = _pad_pow2(qe - qs, minimum=64)
        ci = np.full((bq, c), -1, np.int32)
        cd = np.full((bq, c), np.inf, np.float32)
        ci[: qe - qs] = cand_i[qs:qe]
        cd[: qe - qs] = cand_d[qs:qe]
        si, sd = K["select_block"](
            jnp.asarray(ci), jnp.asarray(cd), base_j,
            metric=metric, max_deg=max_deg, heuristic=heuristic,
        )
        in_flight.append((qs, qe, si, sd))
    for qs, qe, si, sd in in_flight:
        si_np = np.asarray(si)[: qe - qs]
        sd_np = np.asarray(sd)[: qe - qs]
        w = min(si_np.shape[1], max_deg)
        fwd_i[qs:qe, :w] = si_np[:, :w]
        fwd_d[qs:qe, :w] = sd_np[:, :w]

    # phase 3: reverse edges (one dispatch over the layer)
    inc_i, inc_d = K["incoming_edges"](
        jnp.asarray(fwd_i), jnp.asarray(fwd_d), max_deg=max_deg
    )
    mrg_i, mrg_d = K["merge_dedupe"](
        jnp.asarray(fwd_i), jnp.asarray(fwd_d), inc_i, inc_d
    )
    mrg_i = np.asarray(mrg_i)
    mrg_d = np.asarray(mrg_d)

    # phase 4: final prune with the selection rule over (forward u incoming)
    out = np.full((nm, max_deg), -1, np.int32)
    cm = mrg_i.shape[1]
    in_flight = []
    for qs in range(0, nm, _QBLOCK):
        qe = min(qs + _QBLOCK, nm)
        bq = _pad_pow2(qe - qs, minimum=64)
        ci = np.full((bq, cm), -1, np.int32)
        cd = np.full((bq, cm), np.inf, np.float32)
        ci[: qe - qs] = mrg_i[qs:qe]
        cd[: qe - qs] = mrg_d[qs:qe]
        si, _ = K["select_block"](
            jnp.asarray(ci), jnp.asarray(cd), base_j,
            metric=metric, max_deg=max_deg, heuristic=heuristic,
        )
        in_flight.append((qs, qe, si))
    for qs, qe, si in in_flight:
        si_np = np.asarray(si)[: qe - qs]
        w = min(si_np.shape[1], max_deg)
        out[qs:qe, :w] = si_np[:, :w]
    return out


def build(store: GraphStore, vectors: np.ndarray) -> list[int]:
    """From-scratch bulk build. The store must be empty."""
    assert store.count == 0, "knn_build.build requires an empty store"
    vectors = np.asarray(vectors, np.float32)
    n = len(vectors)
    levels = store.draw_levels(n)
    store.reserve(levels)
    slots = store.alloc_slots(vectors, levels.astype(np.int32))
    metric = int(store.metric)
    heuristic = bool(store.params.neighbor_heuristic)
    shuffle_rng = np.random.default_rng(store.seed ^ 0x5CA1AB1E)

    # layer 0: all nodes, degree 2M
    perm = shuffle_rng.permutation(n)  # round order must not follow data order
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    adj_p = _build_layer(
        vectors[perm], metric, store.m0, KNN_CANDIDATES, heuristic
    )
    # map member-space (shuffled) adjacency back to slot space
    store.neighbors0[:n] = np.where(adj_p[inv] >= 0, perm[np.maximum(adj_p[inv], 0)], -1)

    # upper layers: member subsets, degree M
    max_level = int(levels.max(initial=0))
    for l in range(1, max_level + 1):
        members = np.flatnonzero(levels >= l).astype(np.int64)
        ls = store.layers[l - 1]
        nm = len(members)
        assert np.array_equal(ls.node_slot[:nm], members)
        if nm <= 1:
            ls.nbrs[:nm] = -1
            continue
        mperm = shuffle_rng.permutation(nm)
        minv = np.empty(nm, np.int64)
        minv[mperm] = np.arange(nm)
        # Upper layers are pure ROUTING structures (their edges never appear
        # in results). Diversity selection is always used here: a nearest-M
        # kNN layer fragments into cluster cliques and strands the greedy
        # descent — which would misroute not just searches but every
        # subsequent host-path insert. Layer 0 keeps the configured rule.
        adj_p = _build_layer(
            vectors[members[mperm]], metric, store.m,
            min(KNN_CANDIDATES, 4 * store.m), heuristic=True,
        )
        adj_m = adj_p[minv]  # member-order rows
        mapped = np.where(
            adj_m >= 0, members[mperm[np.maximum(adj_m, 0)]], -1
        )
        ls.nbrs[:nm] = mapped

    store.max_layer = max_level
    store.entry_slot = int(np.argmax(levels)) if n else -1
    store.invalidate_dirty()  # adjacency written in place: full upload next
    store.version += 1
    return [int(s) for s in slots]
