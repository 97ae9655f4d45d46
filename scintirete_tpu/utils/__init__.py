"""Shared utilities."""

from scintirete_tpu.utils.jax_setup import enable_compilation_cache  # noqa: F401
