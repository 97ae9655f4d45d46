"""HNSW index on flat arrays: host store + batched device search kernels."""

from scintirete_tpu.index.hnsw import HNSWIndex  # noqa: F401
from scintirete_tpu.index.store import GraphStore  # noqa: F401
