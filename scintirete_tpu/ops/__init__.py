"""Device compute ops: batched distances, exact top-k scan, HNSW search kernels."""

from scintirete_tpu.ops.distance import (  # noqa: F401
    pairwise_distance,
    distance_np,
    normalize_np,
    preprocess_norms,
)
from scintirete_tpu.ops.topk import brute_force_topk  # noqa: F401
