"""Bulk index construction.

Strategy (SURVEY.md §7 "hard parts"): HNSW insertion is inherently
sequential, so the bulk path inserts in chunks — within a chunk every new
vector descends against the *frozen* pre-chunk graph (batched on device once
the graph is synced), then link updates are applied host-side in chunk order,
including links between chunk members. For small graphs, plain sequential
host insertion is used (it is also the semantics oracle).
"""

from __future__ import annotations

import numpy as np

from scintirete_tpu.index import host_algo
from scintirete_tpu.index.store import GraphStore


def bulk_insert(store: GraphStore, vectors: np.ndarray) -> list[int]:
    """Insert a batch of vectors; returns their slots in order.

    Currently sequential host insertion; the device-assisted chunked builder
    replaces the inner loop (same link-application code) — see build plan.
    """
    levels = store.draw_levels(len(vectors))
    return [
        host_algo.insert(store, v, int(level)) for v, level in zip(vectors, levels)
    ]
