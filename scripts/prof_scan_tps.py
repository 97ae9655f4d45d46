"""Device-only int8 lane-scan efficiency sweep (VERDICT r3 item 5), v2.

TIMING METHOD — the tunnel lies to block_until_ready. v1 of this script
timed `jax.block_until_ready(kernel(...))` loops and printed 0.0 ms
"passes" (143M QPS, 9754% of int8 peak): under the axon tunnel,
block_until_ready returns once the remote execution is *enqueued*, not
complete, so that pattern measures dispatch, not compute. The only wall
the tunnel cannot fake is a VALUE fetch. So each measurement here runs
the kernel M times inside ONE jitted while-loop with a forced data
dependence between iterations (q_{i+1} = q + 1e-30 * f(out_i) — not
foldable, numerically invisible on unit-norm queries), returns a scalar,
and the harness fetches it. Per-pass time = (t(M2) - t(M1)) / (M2 - M1):
the dispatch + fetch + tunnel-RT costs appear in both terms and cancel.

Usage: python scripts/prof_scan_tps.py [n] [reps]
       python scripts/prof_scan_tps.py --cpu    # tiny interpret-mode sanity
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

CPU_SANITY = "--cpu" in sys.argv
if CPU_SANITY:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scintirete_tpu.ops.flat_scan import flat_topk_fused  # noqa: E402
from scintirete_tpu.ops.pallas_scan import (  # noqa: E402
    lane_topk_scan_packed_int8,
    quantize_rows,
)
from scintirete_tpu.types import DistanceMetric  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
if CPU_SANITY:
    N = min(N, 8 * 1024)
DIM, K = 128, 10
METRIC = int(DistanceMetric.COSINE)
INTERPRET = CPU_SANITY
# chain lengths: short leg amortizes nothing, long leg adds exactly
# (M2 - M1) extra passes between the same dispatch+fetch bookends
M1, M2 = 4, 8 if CPU_SANITY else 68

print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(42)
base = rng.standard_normal((N, DIM)).astype(np.float32)
bn = base / np.linalg.norm(base, axis=1, keepdims=True)
b32 = jnp.asarray(bn)  # f32 rerank source, as FlatIndex holds it
scan8, scale8 = quantize_rows(b32)
sqn = jnp.ones((N,), jnp.float32)
invalid = jnp.zeros((N,), jnp.float32)
valid = jnp.ones((N,), bool)
jax.block_until_ready((b32, scan8, scale8))


@functools.partial(jax.jit, static_argnames=("tps",))
def chain_kernel(q, m, tps):
    def body(i, carry):
        acc, qq = carry
        keys, _ = lane_topk_scan_packed_int8(
            qq, scan8, scale8, sqn, invalid, METRIC,
            interpret=INTERPRET, tps=tps,
        )
        s = jnp.min(keys)  # finite by wrapper construction
        return acc + s, qq + 1e-30 * s

    acc, _ = jax.lax.fori_loop(0, m, body, (jnp.float32(0.0), q))
    return acc


@functools.partial(jax.jit, static_argnames=("tps",))
def chain_fused(q, m, tps):
    def body(i, carry):
        acc, qq = carry
        d, _ = flat_topk_fused(
            qq, scan8, b32, valid, METRIC, K, sqn,
            width=max(4 * K, 64), base_scale=scale8,
            interpret=INTERPRET, tps=tps,
        )
        s = jnp.sum(d[:, 0])
        return acc + s, qq + 1e-30 * s

    acc, _ = jax.lax.fori_loop(0, m, body, (jnp.float32(0.0), q))
    return acc


def fetch_time(fn, q, m):
    t0 = time.time()
    v = float(fn(q, jnp.int32(m)))  # value fetch = the honest wall
    assert np.isfinite(v)
    return time.time() - t0


def timed(fn, label, q, B):
    fetch_time(fn, q, M1)  # compile both loop bodies / warm caches
    t1s, t2s = [], []
    for _ in range(REPS):
        t1s.append(fetch_time(fn, q, M1))
        t2s.append(fetch_time(fn, q, M2))
    per = (min(t2s) - min(t1s)) / (M2 - M1)
    if per <= 0:  # tunnel-RT noise swamped the diff; report raw long leg
        per = min(t2s) / M2
        tag = " (noise-floored: long-leg/M)"
    else:
        tag = ""
    tops = B / per * N * DIM * 2 / 1e12
    print(
        f"{label}: {per * 1e3:.2f} ms/pass -> {B / per:.0f} QPS "
        f"({tops:.1f} TOPS, {100 * tops / 394:.1f}% int8 peak){tag} "
        f"[legs {min(t1s):.2f}s/{min(t2s):.2f}s]",
        flush=True,
    )
    return per


for B in ((128,) if CPU_SANITY else (4096,)):
    q = rng.standard_normal((B, DIM)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    qj = jax.device_put(jnp.asarray(qn))
    jax.block_until_ready(qj)
    print(f"--- B={B} n={N} chain M1={M1} M2={M2} ---", flush=True)
    for tps in (4, 8, 16):
        if N % (1024 * tps):
            continue
        timed(
            functools.partial(chain_kernel, tps=tps),
            f"kernel tps={tps}", qj, B,
        )
    for tps in (4, 8, 16):
        if N % (1024 * tps):
            continue
        timed(
            functools.partial(chain_fused, tps=tps),
            f"fused+epilogue tps={tps}", qj, B,
        )
