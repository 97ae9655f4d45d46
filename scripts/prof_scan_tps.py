"""Device-only int8 lane-scan efficiency sweep (VERDICT r3 item 5).

The fused scan runs ~45 TOPS device-only at 1M (~11% of the v5e's ~394
int8 peak). Decomposition (pallas_scan.py header): ~60% of a grid step is
fixed overhead + the VPU fold, so fewer/fatter steps should win. Sweeps
tps (base tiles folded per grid step) x B, timing the KERNEL only and the
kernel+epilogue (flat_topk_fused), all with device-resident inputs.

Usage: python scripts/prof_scan_tps.py [n] [passes]
"""

from __future__ import annotations

import sys
import time

import numpy as np

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
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 5
DIM, K = 128, 10
METRIC = int(DistanceMetric.COSINE)

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


def timed(fn, label, B):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(PASSES):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    best = min(ts)
    tops = B / best * N * DIM * 2 / 1e12
    print(
        f"{label}: best {best * 1e3:.1f}ms -> {B / best:.0f} QPS "
        f"({tops:.1f} TOPS, {100 * tops / 394:.1f}% int8 peak)",
        flush=True,
    )
    return best


for B in (4096, 16384):
    q = rng.standard_normal((B, DIM)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    qj = jax.device_put(jnp.asarray(qn))
    jax.block_until_ready(qj)
    print(f"--- B={B} n={N} ---", flush=True)
    for tps in (4, 8, 16):
        if N % (1024 * tps):
            continue
        timed(
            lambda tps=tps: lane_topk_scan_packed_int8(
                qj, scan8, scale8, sqn, invalid, METRIC, tps=tps
            ),
            f"kernel tps={tps}",
            B,
        )
    for tps in (4, 8):
        timed(
            lambda tps=tps: flat_topk_fused(
                qj, scan8, b32, valid, METRIC, K, sqn,
                width=max(4 * K, 64), base_scale=scale8, tps=tps,
            ),
            f"fused+epilogue tps={tps}",
            B,
        )
