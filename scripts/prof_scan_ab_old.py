"""A/B the PRE-optimization int8 packed lane scan (a pinned copy of the
kernel as of a given git rev) against the current one, both under the
chained-fetch harness (see prof_scan_tps.py header for why
block_until_ready timings are fake over the tunnel).

Usage:
  git show <rev>:scintirete_tpu/ops/pallas_scan.py > /tmp/old_pallas_scan.py
  python scripts/prof_scan_ab_old.py [n]
"""

from __future__ import annotations

import functools
import importlib.util
import sys
import time

import numpy as np

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scintirete_tpu.ops.pallas_scan import (  # noqa: E402
    lane_topk_scan_packed_int8 as new_kernel,
    quantize_rows,
)
from scintirete_tpu.types import DistanceMetric  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "old_pallas_scan", "/tmp/old_pallas_scan.py"
)
old_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old_mod)
old_kernel = old_mod.lane_topk_scan_packed_int8

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
DIM, B = 128, 4096
METRIC = int(DistanceMetric.COSINE)
M1, M2 = 4, 68

print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(42)
base = rng.standard_normal((N, DIM)).astype(np.float32)
bn = base / np.linalg.norm(base, axis=1, keepdims=True)
b32 = jnp.asarray(bn)
scan8, scale8 = quantize_rows(b32)
sqn = jnp.ones((N,), jnp.float32)
invalid = jnp.zeros((N,), jnp.float32)
q = rng.standard_normal((B, DIM)).astype(np.float32)
qj = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
jax.block_until_ready((b32, scan8, scale8, qj))


def make_chain(kfn, tps):
    @jax.jit
    def chain(q, m):
        def body(i, carry):
            acc, qq = carry
            keys, _ = kfn(
                qq, scan8, scale8, sqn, invalid, METRIC, tps=tps
            )
            s = jnp.min(keys)
            return acc + s, qq + 1e-30 * s

        acc, _ = jax.lax.fori_loop(0, m, body, (jnp.float32(0.0), q))
        return acc

    return chain


def timed(label, chain):
    float(chain(qj, jnp.int32(M1)))  # compile/warm
    t1s, t2s = [], []
    for _ in range(3):
        t0 = time.time()
        float(chain(qj, jnp.int32(M1)))
        t1s.append(time.time() - t0)
        t0 = time.time()
        float(chain(qj, jnp.int32(M2)))
        t2s.append(time.time() - t0)
    per = (min(t2s) - min(t1s)) / (M2 - M1)
    tops = B / per * N * DIM * 2 / 1e12
    print(
        f"{label}: {per * 1e3:.2f} ms/pass ({tops:.1f} TOPS, "
        f"{100 * tops / 394:.1f}% int8 peak)",
        flush=True,
    )


for tps in (4, 8):
    timed(f"OLD kernel tps={tps}", make_chain(old_kernel, tps))
for tps in (4, 8, 16):
    timed(f"NEW kernel tps={tps}", make_chain(new_kernel, tps))
