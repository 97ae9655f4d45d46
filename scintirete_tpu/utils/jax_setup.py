"""JAX runtime setup helpers.

The search kernels compile once per (capacity, batch, ef) shape class; on the
TPU tunnel a cold compile costs tens of seconds. The persistent compilation
cache makes that a one-time cost across processes (server restarts, bench
runs) — the TPU analogue of the reference shipping a prebuilt binary.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/scintirete_tpu/xla")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    path = cache_dir or os.environ.get(
        "SCINTIRETE_XLA_CACHE_DIR", _DEFAULT_CACHE_DIR
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
