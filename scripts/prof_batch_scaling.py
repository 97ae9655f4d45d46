"""Serving-batch scaling law for the fused int8 lane scan at 1M.

Mimics FlatIndex._device_search exactly (host _quant8, jnp.asarray
uploads, flat_topk_fused, _fetch_packed) at B in {2048, 4096, 8192,
16384}. Only fetch-terminated timings are real on axon
(block_until_ready does not block on this platform).
"""

import time

import numpy as np

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scintirete_tpu.index.device import _fetch_packed  # noqa: E402
from scintirete_tpu.index.flat import _quant8  # noqa: E402
from scintirete_tpu.ops.flat_scan import flat_topk_fused  # noqa: E402
from scintirete_tpu.types import DistanceMetric  # noqa: E402

N, DIM, K = 1_048_576, 128, 10
print(f"device: {jax.devices()}", flush=True)

rng = np.random.default_rng(42)
base = rng.standard_normal((N, DIM)).astype(np.float32)
base /= np.linalg.norm(base, axis=1, keepdims=True)
q8_h, sc_h = _quant8(base)
sq_h = np.sum(base * base, axis=1).astype(np.float32)
print("host data ready", flush=True)

t0 = time.time()
base_f = jnp.asarray(base)
q8 = jnp.asarray(q8_h)
sc = jnp.asarray(sc_h)
sq = jnp.asarray(sq_h)
valid = jnp.ones(N, bool)
print(f"uploads dispatched {time.time() - t0:.1f}s", flush=True)

metric = int(DistanceMetric.COSINE)
for B in (2048, 4096, 8192, 16384):
    qs_host = rng.standard_normal((B, DIM)).astype(np.float32)
    for trial in range(5):
        t0 = time.time()
        qd = jnp.asarray(qs_host)
        t_up = time.time()
        d, s = flat_topk_fused(
            qd, q8, base_f, valid, metric, K, sq,
            width=max(4 * K, 64), base_scale=sc,
        )
        t_disp = time.time()
        dh, sh = _fetch_packed([d], [s])
        t_done = time.time()
        print(
            f"B={B} trial{trial}: up {t_up - t0:.3f}s disp "
            f"{t_disp - t_up:.3f}s fetch {t_done - t_disp:.3f}s "
            f"total {t_done - t0:.3f}s -> {B / (t_done - t0):.0f} QPS",
            flush=True,
        )
