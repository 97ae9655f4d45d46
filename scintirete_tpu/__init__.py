"""Scintirete-TPU: a TPU-native vector search engine.

A brand-new JAX/XLA/Pallas implementation of the capability surface of the Go
reference Scintirete (an in-memory HNSW vector database): multi-database /
multi-collection management, L2 / cosine / inner-product metrics, batched
insert/delete/search with server-generated IDs and JSON metadata, AOF + RDB
durability, gRPC + HTTP/JSON APIs with password auth, OpenAI-compatible text
embedding, Prometheus metrics, audit logs, and an interactive CLI.

Where the reference chases pointers one query at a time under a mutex
(reference: internal/core/algorithm/hnsw.go), this engine stores vectors and
fixed-degree neighbor tables as flat HBM-resident device arrays and runs
greedy descent + ef-beam search as batched, masked kernels.
"""

__version__ = "0.1.0"

from scintirete_tpu.types import (  # noqa: F401
    DistanceMetric,
    HNSWParams,
    SearchParams,
    CollectionConfig,
    CollectionInfo,
    Vector,
)
from scintirete_tpu.errors import ScintireteError, ErrorCode  # noqa: F401
