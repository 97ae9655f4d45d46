"""Measure the axon-tunnel cost floor for the flat-scan serving path.

Breaks one 4096-query x 1M search pass into its components:
  (a) host->device upload of the query batch (2 MB)
  (b) kernel dispatch + execution (block_until_ready, results stay on device)
  (c) device->host fetch of the packed [B, 2k] result (328 KB)
  (d) full end-to-end FlatIndex.search_batch
If (a)+(c) alone exceed 4096/60000 s = 68 ms, 60k QPS at 1M is
tunnel-irreducible on this hardware and we document the profile instead
(VERDICT r2 item 3 'done' criterion).
"""

import time

import numpy as np

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scintirete_tpu.index.flat import FlatIndex  # noqa: E402
from scintirete_tpu.types import DistanceMetric, SearchParams  # noqa: E402

N, DIM, K, NQ = 1_000_000, 128, 10, 4096
dev = jax.devices()[0]
print(f"device: {dev}", flush=True)

rng = np.random.default_rng(42)
base = rng.standard_normal((N, DIM)).astype(np.float32)
queries = rng.standard_normal((NQ, DIM)).astype(np.float32)

idx = FlatIndex(dim=DIM, metric=DistanceMetric.COSINE, use_device=True)
idx.bulk_insert(list(range(1, N + 1)), base)
params = SearchParams(top_k=K)
idx.search_batch(queries, params)  # compile + sync mirror

# (a) upload 2MB
for trial in range(3):
    t0 = time.time()
    qd = jax.device_put(queries, dev)
    qd.block_until_ready()
    print(f"(a) upload 2MB: {time.time() - t0 * 1:.4f}s", flush=True)

# raw dispatch+execute: call the fused kernel directly with a resident
# query buffer, keep outputs on device
from scintirete_tpu.ops.flat_scan import flat_topk_fused  # noqa: E402

a = idx._dev
qd = jax.device_put(queries, dev)
qd.block_until_ready()


def run_kernel():
    d, s = flat_topk_fused(
        qd,
        a["scan"],
        a["vectors"],
        a["valid"],
        int(DistanceMetric.COSINE),
        K,
        a.get("scan_sq", a["sq_norms"]),
        width=max(4 * K, 64),
        base_scale=a.get("scan_scale"),
    )
    return d, s


d, s = run_kernel()
jax.block_until_ready((d, s))
for trial in range(5):
    t0 = time.time()
    d, s = run_kernel()
    jax.block_until_ready((d, s))
    print(f"(b) dispatch+execute (resident q): {time.time() - t0:.4f}s", flush=True)

# (c) fetch packed result
from scintirete_tpu.index.device import _fetch_packed  # noqa: E402

for trial in range(3):
    t0 = time.time()
    dh, sh = _fetch_packed([d], [s])
    print(f"(c) packed fetch: {time.time() - t0:.4f}s", flush=True)

# (d) end-to-end
for trial in range(5):
    t0 = time.time()
    idx.search_batch(queries, params)
    dt = time.time() - t0
    print(f"(d) end-to-end search_batch: {dt:.4f}s = {NQ / dt:.0f} QPS", flush=True)

# (e) same but with host->device upload included in the timed region
for trial in range(3):
    t0 = time.time()
    qd2 = jax.device_put(queries, dev)
    d2, s2 = flat_topk_fused(
        qd2,
        a["scan"],
        a["vectors"],
        a["valid"],
        int(DistanceMetric.COSINE),
        K,
        a.get("scan_sq", a["sq_norms"]),
        width=max(4 * K, 64),
        base_scale=a.get("scan_scale"),
    )
    dh, sh = _fetch_packed([d2], [s2])
    dt = time.time() - t0
    print(f"(e) upload+kernel+fetch: {dt:.4f}s = {NQ / dt:.0f} QPS", flush=True)

# (f) marginal kernel cost: dispatch 4 back-to-back, block once
for trial in range(3):
    t0 = time.time()
    outs = [run_kernel() for _ in range(4)]
    jax.block_until_ready(outs)
    print(f"(f) 4x dispatch+execute: {time.time() - t0:.4f}s", flush=True)

# (g) upload scaling: 4MB and 0.5MB and bf16 2MB->1MB
big = np.concatenate([queries, queries])
small = queries[:1024]
qbf = queries.astype(jnp.bfloat16)
for name, arr in (("4MB f32", big), ("0.5MB f32", small), ("1MB bf16(4096q)", qbf)):
    for trial in range(3):
        t0 = time.time()
        x = jax.device_put(arr, dev); x.block_until_ready()
        print(f"(g) upload {name}: {time.time() - t0:.4f}s", flush=True)
