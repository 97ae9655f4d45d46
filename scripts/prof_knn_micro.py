"""Microbenchmark knn_block on the real TPU: isolate the scan_rounds cost."""

from __future__ import annotations

import sys
import time

import numpy as np

from scintirete_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scintirete_tpu.index.knn_build import _kernels, _QBLOCK


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    K = _kernels()
    rng = np.random.default_rng(0)
    dim = 128
    npad = 131072
    base = rng.standard_normal((npad, dim)).astype(np.float32)
    base_j = jnp.asarray(base)
    base_sq = jnp.sum(base_j * base_j, axis=1)
    qb = jnp.asarray(rng.standard_normal((_QBLOCK, dim)).astype(np.float32))
    self_idx = jnp.asarray(np.arange(_QBLOCK, dtype=np.int32))

    for c in (64, 24):
        for nv in (npad, 131072 // 2, 128):
            # warm/compile
            d, i = K["knn_block"](qb, self_idx, base_j, base_sq,
                                  jnp.int32(nv), metric=2, c=c, tile=npad)
            jax.block_until_ready((d, i))
            t0 = time.time()
            outs = []
            for _ in range(20):
                d, i = K["knn_block"](qb, self_idx, base_j, base_sq,
                                      jnp.int32(nv), metric=2, c=c, tile=npad)
                outs.append(d)
            jax.block_until_ready(outs)
            dt = (time.time() - t0) / 20
            log(f"c={c} n_valid={nv}: {dt*1000:.1f} ms/block "
                f"({_QBLOCK*npad*dim*2/dt/1e12:.1f} TFLOP/s)")

    # host->device query transfer cost (per block)
    qb_np = rng.standard_normal((_QBLOCK, dim)).astype(np.float32)
    t0 = time.time()
    for _ in range(20):
        jax.block_until_ready(jnp.asarray(qb_np))
    log(f"query upload: {(time.time()-t0)/20*1000:.1f} ms/block")

    # materialization (device->host) cost of one result pair
    d, i = K["knn_block"](qb, self_idx, base_j, base_sq,
                          jnp.int32(npad), metric=2, c=64, tile=npad)
    jax.block_until_ready((d, i))
    t0 = time.time()
    for _ in range(20):
        np.asarray(d), np.asarray(i)
    log(f"result fetch: {(time.time()-t0)/20*1000:.1f} ms/pair")


if __name__ == "__main__":
    main()
