"""Program prewarm: compile/load every device program a workload needs.

Over the tunneled TPU every distinct jit/Pallas variant pays per-process
lowering + executable-load latency (~1-5 s each) even when the persistent
compilation cache already holds the binary. A fresh process's FIRST bulk
build therefore stalls on program loads mid-build — the round-2 driver
bench measured ~6 minutes of exactly this inside its first 100k build
(VERDICT r3 item 1). The shared-base builder cut the variant count ~5x;
`warm_build()` loads the remaining manifest up front and CONCURRENTLY
(loads overlap; measured ~1.8x for 2 threads), so builds run at
steady-state speed from the first call. bench.py warms per scale before
timing; a server can warm at startup for its collections' capacities.

The manifest CHAINS its dummy calls through the same producer ops as the
real build (slice_block -> scan -> merge -> select -> packed fetch): jit
cache keys include argument layout/lineage, so feeding a kernel from
`jnp.zeros` warms a DIFFERENT program than feeding it from the upstream
kernel's output (measured: two extra in-build lane compiles before this
was chained). The pinning test (tests/test_prewarm.py) builds after
warming and asserts the build compiles nothing new, so drift between
manifest and builder shows up in CI.
"""

from __future__ import annotations

import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_runtime_lock = threading.Lock()
_runtime_done = False


def warm_runtime() -> float:
    """Pay the per-process TPU runtime setup once: backend init plus the
    FIRST device->host transfer, which establishes the tunnel's data
    channel (measured 18-77 s on the axon tunnel — by far the largest
    fresh-process cost, and it lands inside whatever operation happens to
    fetch first if not paid here). Idempotent; thread-safe."""
    global _runtime_done
    t0 = time.perf_counter()
    with _runtime_lock:
        if not _runtime_done:
            import jax.numpy as jnp

            np.asarray(jnp.zeros((8,), jnp.int32))
            _runtime_done = True
    return time.perf_counter() - t0


def warm_runtime_async() -> threading.Thread:
    """Kick runtime setup off on a daemon thread (server startup / bench
    entry): init and channel setup happen while the caller loads config,
    generates data, or builds manifests."""
    th = threading.Thread(target=warm_runtime, daemon=True)
    th.start()
    return th


def build_manifest(
    n: int,
    dim: int,
    metric: int,
    m: int = 16,
    heuristic: bool = True,
    refine: bool = False,
) -> list:
    """Zero-arg callables covering every device program of a bulk build at
    this scale (shape/lineage-keyed: values are dummy zeros)."""
    import jax
    import jax.numpy as jnp

    from scintirete_tpu.index import knn_build as kb
    from scintirete_tpu.ops.pallas_scan import LANES, knn_lane_topc

    K = kb._kernels()
    dtype = kb._scan_dtype()
    npad = kb._pad_pow4(n, minimum=max(kb._ROUND0 * 2, 2048))
    interp = kb._interpret_mode()
    fused = (
        (jax.default_backend() == "tpu" or interp)
        and npad % LANES == 0
        and dtype == jnp.bfloat16
    )
    B = kb._QBLOCK
    m0 = 2 * m
    c = kb.KNN_CANDIDATES
    ns = min(24, kb._ROUND0 - 1)

    base = jnp.zeros((npad, dim), dtype)
    base_sq = jnp.zeros((npad,), jnp.float32)
    sp = jnp.zeros((kb._ROUND0 * 2, dim), dtype)
    sp_sq = jnp.zeros((kb._ROUND0 * 2,), jnp.float32)

    def done(x):
        jax.block_until_ready(x)
        return x

    # producer chain shared by every job (the build's tile dataflow)
    qb, qsq, si = done(
        K["slice_block"](base, base_sq, np.int32(0), block=B)
    )
    # hub (long-range) candidate scan
    scd, sci = done(
        K["knn_block"](
            qb, si, sp, sp_sq, jnp.int32(1), metric=metric, c=ns,
            tile=kb._ROUND0 * 2,
        )
    )

    grids = []
    if fused:
        mt = npad // LANES
        grids = sorted({mt, max(mt // 16, 1)})

    def scan(grid=None):
        if grid is None:
            return K["knn_block"](
                qb, si, base, base_sq, jnp.int32(1), metric=metric, c=c,
                tile=min(kb._TILE, npad),
            )
        return knn_lane_topc(
            qb, si, base, base_sq, jnp.int32(1), metric=metric, c=c,
            grid_tiles=grid, interpret=interp, q_sq=qsq,
        )

    def chain(grid, deg, h):
        """One full tile chain: scan -> hub merge -> select -> incoming
        merge -> final select, mirroring _layer_adj."""
        cd, ci = done(scan(grid))
        mi, md = done(K["merge_dedupe"](ci, cd, sci, scd))
        si_, sd_ = done(
            K["select_block"](
                mi, md, base, metric=metric, max_deg=deg, heuristic=h
            )
        )
        ii = jnp.asarray(np.full((B, deg), -1, np.int32))
        dd = jnp.asarray(np.full((B, deg), np.inf, np.float32))
        mi2, md2 = done(K["merge_dedupe"](si_, sd_, ii, dd))
        fi, fd = done(
            K["select_block"](
                mi2, md2, base, metric=metric, max_deg=deg, heuristic=h
            )
        )
        # packed-fetch concats over the fetched widths, all arities
        from scintirete_tpu.index.device import _fetch_packed

        for arity in (4, 16, 64):
            _fetch_packed([fd] * arity, [fi] * arity)

    jobs = []
    # layer-0 rule and upper-layer rule, each through the full chain; the
    # extra grid variants only need the scan program itself
    layer_rules = sorted({(m0, heuristic), (m, True)})
    first = True
    for deg, h in layer_rules:
        g0 = grids[0] if grids else None
        jobs.append(lambda g0=g0, deg=deg, h=h: chain(g0, deg, h))
        if first:
            for g in grids[1:]:
                jobs.append(lambda g=g: done(scan(g)))
            first = False
    # sequential upper-layer constructor programs: the fused
    # insert-descend-select kernel per lc rung, the reverse reprune chain
    # at the upper degree rule, the mirror init/scatter, and the seed
    # scatter buckets (knn_build._build_upper_sequential)
    UB = 8192 if n >= 65536 else B  # knn_build._build_upper_sequential

    def upper_job(lc):
        from scintirete_tpu.index.device import _fetch_packed_idx

        efu = max(int(os.environ.get("SCNT_UPPER_EFC", "64")), 2 * m)
        uqb, _uqsq, usi = done(
            K["slice_block"](base, base_sq, np.int32(0), block=UB)
        )
        ucat = jnp.full((npad, m), -1, jnp.int32)
        lv = jnp.zeros((UB,), jnp.int32)
        offs = jnp.zeros((16,), jnp.int32)
        nms = jnp.zeros((16,), jnp.int32)
        sel_s, ucat = K["upper_insert"](
            uqb, usi, lv, base, base_sq, ucat, offs, nms,
            np.int32(0), np.int32(1), metric=metric, ef_upper=efu, m=m,
            lc=lc, max_steps=(lc + 2) * (efu + 64),
        )
        done(sel_s)
        # _drain_upper packed ids fetches: one concat per (lc, arity)
        for arity in (4, 16, 64):
            _fetch_packed_idx([sel_s] * arity)
        done(ucat)

    for lc in (1, 2, 4, 8, 16):
        jobs.append(lambda lc=lc: upper_job(lc))

    def upper_reprune_job():
        from scintirete_tpu.index.device import (
            DeviceGraph, _fetch_packed_idx,
        )

        blocks = {kb._RPBLOCK}
        if n >= 65536:
            blocks.add(kb._RPBLOCK_UPPER)
        ucat = jnp.full((npad, m), -1, jnp.int32)
        for blk in sorted(blocks):
            t = jnp.asarray(np.full(blk, npad, np.int32))
            inc = jnp.asarray(np.full((blk, 2 * m), -1, np.int32))
            si2, ucat = K["upper_reprune_resident"](
                base, base_sq, ucat, np.int32(0), t, inc,
                metric=metric, m=m,
            )
            done(si2)
            for arity in (4, 16, 64):
                _fetch_packed_idx([si2] * arity)
        # seed-scatter pow2 buckets (S <= 256 rows per layer)
        for k in (64, 128, 256):
            ucat = DeviceGraph._scatter_into(
                ucat, np.arange(k, dtype=np.int32),
                np.full((k, m), -1, np.int32),
            )
        done(ucat)

    jobs.append(upper_reprune_job)

    if refine:
        # one fused program per refinement round's forward tile; its
        # merge/select pieces inline under the chain jit, and the
        # incoming-merge pass reuses the chain()'s programs above
        def refine_job():
            adj_j = jnp.asarray(np.full((npad, m0), -1, np.int32))
            done(
                K["refine_chain"](
                    base, base_sq, adj_j, np.int32(0), metric=metric,
                    max_deg=m0, fanout=kb._REFINE_FANOUT,
                    heuristic=heuristic, cpool=c,
                )
            )

        jobs.append(refine_job)
    return jobs


def append_manifest(
    n: int,
    dim: int,
    metric: int,
    m: int = 16,
    heuristic: bool = True,
    batch: int = 4096,
) -> list:
    """Zero-arg callables covering every device program of a batched
    APPEND onto an n-vector store (knn_build.append_batch): the masked
    candidate scan, forward selection from host-uploaded candidates, and
    the reverse-reprune chain at its fixed _RPBLOCK pad. Without this a
    serving process's FIRST append to a restored collection absorbs
    per-program loads (measured: trials 0-1 of r3_hw_focus.py ran at
    31-58 vec/s vs ~500 steady)."""
    import jax
    import jax.numpy as jnp

    from scintirete_tpu.index import knn_build as kb
    from scintirete_tpu.ops.pallas_scan import LANES, knn_lane_topc_masked

    import os

    K = kb._kernels()
    dtype = kb._scan_dtype()
    npad = kb._pad_pow4(n, minimum=max(kb._ROUND0 * 2, 2048))
    interp = kb._interpret_mode() or (
        os.environ.get("SCNT_APPEND_INTERPRET") == "1"
    )
    fused = (
        (jax.default_backend() == "tpu" or interp)
        and npad % LANES == 0
        and dtype == jnp.bfloat16
    )
    B = kb._QBLOCK
    T = kb._RPBLOCK
    m0 = 2 * m
    c = kb.KNN_CANDIDATES

    base = jnp.zeros((npad, dim), dtype)
    base_sq = jnp.zeros((npad,), jnp.float32)

    # grid_tiles exactly as append_batch derives it from the live count
    max_tiles = npad // LANES
    grid_g = 1
    while grid_g * LANES < n and grid_g < max_tiles:
        grid_g *= 16
    grid_g = min(grid_g, max_tiles)

    def done(x):
        jax.block_until_ready(x)
        return x

    def upload(shape, np_dtype, fill=0, cast=None):
        """Host-buffer upload with the same lineage as append_batch's
        inputs (host-side cast BEFORE the transfer)."""
        a = np.full(shape, fill, np_dtype)
        return jnp.asarray(a.astype(cast) if cast is not None else a)

    from scintirete_tpu.index.device import _fetch_packed

    def scan_job():
        """Candidate scan (layer 0 AND large upper layers share ONE
        masked program), drained through the packed-fetch arities the
        layer-0 2-chunk flight uses."""
        qb = upload((B, dim), np.float32, cast=dtype)
        si = upload((B,), np.int32, -1)
        if fused:
            # masks are computed on device from (levels, deleted) —
            # warm that program with the true lineage
            inval = K["layer_mask"](
                upload((npad,), np.int8),
                upload((npad,), np.bool_, True),
                np.int32(1),
            )
            d_, i_ = done(
                knn_lane_topc_masked(
                    qb, si, base, base_sq, inval, metric=metric, c=c,
                    grid_tiles=grid_g, interpret=interp,
                )
            )
        else:
            d_, i_ = done(
                K["knn_block"](
                    qb, si, base, base_sq, jnp.int32(1), metric=metric,
                    c=c, tile=min(kb._TILE, npad),
                )
            )
        for arity in (4, 16, 64):
            _fetch_packed([d_] * arity, [i_] * arity)

    def select_job(deg, h):
        """Forward selection: append feeds select_block from HOST arrays
        (scan results round-trip through the drain), not from the scan's
        device output — warm that lineage, the caller's (full-range)
        re-slice, and its drain arities."""
        ci = upload((B, c), np.int32, -1)
        cd = upload((B, c), np.float32, np.inf)
        si, sd = K["select_block"](
            ci, cd, base, metric=metric, max_deg=deg, heuristic=h
        )
        si, sd = done((si[:, :deg], sd[:, :deg]))
        for arity in (4, 16, 64):
            _fetch_packed([sd] * arity, [si] * arity)

    def reprune_job(deg, h):
        """The fused one-dispatch reverse-reprune chain at its fixed pad,
        fed with the same upload lineage as reprune_flush."""
        si, sd = done(
            K["reprune_chain"](
                base, base_sq,
                upload((T,), np.int64),
                upload((T, deg), np.int32, -1),
                upload((T, deg), np.int32, -1),
                upload((T, deg), np.float32, np.inf),
                metric=metric, max_deg=deg, heuristic=h,
            )
        )
        for arity in (4, 16, 64):
            _fetch_packed([sd] * arity, [si] * arity)

    def resident_job(h):
        """Layer-0 resident reverse-flush: both incoming-width buckets,
        the idx-only packed fetch, and the writeback/mirror scatters
        (knn_build._flush_resident)."""
        from scintirete_tpu.index.device import (
            _fetch_packed_idx, _pad_pow2, _scatter_rows,
        )

        nbrs = jnp.full((npad, m0), -1, jnp.int32)
        dl = jnp.ones((npad,), jnp.bool_)
        t = upload((T,), np.int32)
        si = sp = None
        for W in sorted({min(kb._W_INC_SMALL, m0), m0}):
            si, sp = K["reprune_resident"](
                base, base_sq, nbrs, dl, t,
                upload((T, W), np.int32, -1),
                metric=metric, max_deg=m0, heuristic=h,
            )
            si, sp = done((si, sp))
        for arity in (4, 16, 64):
            _fetch_packed_idx([sp] * arity)  # the flush fetches pos (int8)
        nbrs = done(_scatter_rows(nbrs, t, si))  # donates its input
        # the new rows' OWN forward adjacency scatters into the resident
        # table at the append-batch pow2 bucket (knn_build.py ~1408, via
        # _scatter_into) — a different program than the _RPBLOCK flush
        nb_pad = _pad_pow2(int(batch))
        done(
            _scatter_rows(
                nbrs,
                upload((nb_pad,), np.int32),
                upload((nb_pad, m0), np.int32, -1),
            )
        )

    # layer-0 rule and upper-layer rule (upper selection always heuristic).
    # The host-fed chain now serves only the upper layers — HNSWIndex
    # always passes a scan cache, so layer 0 goes resident; warming the
    # (m0, h) host chain would be a dead program load
    jobs = [scan_job]
    for deg, h in sorted({(m0, heuristic), (m, True)}):
        jobs.append(lambda deg=deg, h=h: select_job(deg, h))
    jobs.append(lambda: reprune_job(m, True))
    jobs.append(lambda: resident_job(heuristic))
    return jobs


def warm_append(
    n: int,
    dim: int,
    metric: int,
    m: int = 16,
    heuristic: bool = True,
    threads: int = 8,
    batch: int = 4096,
) -> float:
    """Load every batched-append program for an n-vector store up front.
    `batch` = the append batch size the caller will use (its pow2 bucket
    keys one scatter program)."""
    return warm(
        append_manifest(n, dim, metric, m=m, heuristic=heuristic,
                        batch=batch),
        threads=threads,
    )


def warm(jobs: list, threads: int = 8) -> float:
    """Run manifest jobs concurrently; returns elapsed seconds. Runtime
    setup (backend init + d2h channel) is paid first so no job's packed
    fetch absorbs it."""
    t0 = time.perf_counter()
    warm_runtime()
    with ThreadPoolExecutor(threads) as ex:
        for f in [ex.submit(j) for j in jobs]:
            f.result()
    return time.perf_counter() - t0


def warm_build(
    n: int,
    dim: int,
    metric: int,
    m: int = 16,
    heuristic: bool = True,
    threads: int = 8,
    refine: bool = False,
) -> float:
    """Load every bulk-build program for (n, dim, metric, m) up front."""
    return warm(
        build_manifest(n, dim, metric, m=m, heuristic=heuristic,
                       refine=refine),
        threads=threads,
    )
