"""Native (C++) runtime components, loaded via ctypes with Python fallbacks."""

from scintirete_tpu.native.build import load_native  # noqa: F401
