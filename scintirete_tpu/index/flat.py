"""FlatIndex: exact top-k search over a single device-resident matrix.

The TPU-native answer to "why does a vector DB need a graph index at all?":
the reference adopted HNSW because a CPU scan at 1M vectors costs ~100 ms per
query (reference: docs/en/2_system-requirements.md sizing, ~71% of search CPU
in scalar distance loops). One TPU chip's MXU scores a 1k-query batch against
1M x 128 vectors in ~35 ms total — exact search at >25k QPS, recall 1.0 —
so up to HBM scale the *flat* index dominates HNSW on every axis that isn't
single-query latency: build is O(append), delete is a mask write, snapshots
are a plain matrix dump, and recall is exact.

Capability parity: implements the same surface as `HNSWIndex`
(reference: internal/core/interfaces.go:87-111 VectorIndex) so collections
can select `index_type = "flat"`. SearchParams.ef_search is accepted and
ignored (no beam). Selection uses the hardware approx-top-k
(ops/flat_scan.py); distances are reference-exact.

Mutation model mirrors HNSWIndex: host arrays are the source of truth;
the device mirror re-syncs lazily (full upload on capacity growth, dirty-row
scatter otherwise).
"""

from __future__ import annotations

import dataclasses
import os
import threading
from typing import Any, Optional, Sequence

import numpy as np

from scintirete_tpu.errors import (
    ErrorCode,
    ScintireteError,
    dimension_mismatch,
)
from scintirete_tpu.types import DistanceMetric, HNSWParams, SearchParams
from scintirete_tpu.utils.rwlock import RWLock

_MIN_CAP = 256
# capacity at/above which the fused Pallas lane scan (and its int8 first
# pass) beats the XLA two-pass bf16 scan on TPU (measured crossover between
# 100k and 1M on one v5e; re-measured below 128k after the packed-key
# kernel rework — SCNT_FUSED_MIN_CAP overrides for profiling)
_FUSED_MIN_CAP = int(os.environ.get("SCNT_FUSED_MIN_CAP", 1 << 18))
# widest single fused dispatch: the packed int8 kernel's resident
# [SUB, LANES] f32 output pair exceeds the 16 MB scoped-VMEM budget when
# the compiler double-buffers it for wider batches (measured: B=8192
# compiles fail; B=4096 is the widest proven shape). Wider search_batch
# calls loop fixed 4096-query dispatches and still fetch ONE packed
# result — dispatches queue back-to-back on device, so the per-call wall
# stays one upload + one fetch RT; bounding the shape set also keeps the
# per-process program-load count flat (tunnel rule, docs/architecture.md).
_FUSED_MAX_B = 4096
def _query_f16() -> bool:
    """Upload queries as f16 instead of f32: halves the host->device
    bytes — the dominant serving cost over a tunneled TPU (~160 ms of a
    ~310 ms pass at B=16k x 128-d) — at the price of ~1e-3-relative
    rounding on returned distances (the on-device rerank casts back to
    f32, so rank order is still decided at f32-dot precision of the
    ROUNDED query). Opt-in (read per call, so serving processes can
    flip it): exact reference-value distances stay the default."""
    return os.environ.get("SCNT_QUERY_F16", "0") == "1"


def _query_upload_mode() -> str:
    """Query upload dtype for the fused path: "f32" (default,
    reference-exact distances), "f16" (half the bytes, ~1e-3 relative),
    or "int8" (per-row symmetric quantization + f32 scale: 132 B/query at
    D=128 — a further ~2x upload cut over f16 at ~4e-3 relative input
    rounding; recall must be gated by the caller, as bench.py does).
    SCNT_QUERY_DTYPE wins; SCNT_QUERY_F16=1 is the round-3 compat
    spelling."""
    mode = os.environ.get("SCNT_QUERY_DTYPE", "").lower()
    if mode in ("f32", "f16", "int8"):
        return mode
    return "f16" if _query_f16() else "f32"


def _sanitize_tps(
    tps: int, cap: int, dim: int = 128, elt_bytes: int = 2
) -> int:
    """Clamp a requested scan-tiles-per-step to a power of two that (a)
    divides cap/LANES (capacity is pow2 >= 2^18 in the fused regime) and
    (b) keeps the double-buffered per-step base block (2 x tps*LANES rows
    x dim x elt_bytes) within ~5 MB of VMEM next to the ~8 MB of packed
    outputs. A stray odd/oversized env value must degrade, not trip the
    kernel's divisibility assert or a Mosaic VMEM OOM. int8 scans
    (elt_bytes=1) admit tps=16 at dim=128; bf16 keeps the measured round-3
    budget and tops out at 8."""
    from scintirete_tpu.ops.pallas_scan import LANES

    if elt_bytes <= 1:
        ceiling = 16
        vmem_cap = max(1, (5 << 20) // (2 * LANES * max(dim, 1)))
    else:
        ceiling = 8
        vmem_cap = max(1, (4 << 20) // (LANES * max(dim, 1) * elt_bytes))
    tps = min(max(1, tps), ceiling, vmem_cap)
    tps = 1 << (tps.bit_length() - 1)
    while tps > 1 and cap % (tps * LANES) != 0:
        tps >>= 1
    return tps


_DEVICE_SLICE_CACHE: dict[int, Any] = {}


def _device_slice(arr, start, width: int):
    """Slice `width` rows starting at traced `start` out of a
    device-resident batch — the chunked fused path's way of feeding
    fixed-width kernel dispatches from ONE whole-batch upload (per-chunk
    host->device transfers each pay tunnel round-trip + per-transfer
    protocol overhead; a dynamic_slice is a ~free device-side op). One
    jitted program per width (start is a traced scalar, so chunk offsets
    don't mint variants)."""
    import jax

    fn = _DEVICE_SLICE_CACHE.get(width)
    if fn is None:
        def _slice(a, s):
            return jax.lax.dynamic_slice_in_dim(a, s, width, axis=0)

        fn = _DEVICE_SLICE_CACHE[width] = jax.jit(_slice)
    return fn(arr, start)


def _quant8(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8 quantization (host mirror of
    ops.pallas_scan.quantize_rows)."""
    amax = np.max(np.abs(v), axis=1, keepdims=True)
    scale = amax / 127.0
    q = np.where(scale > 0.0, np.round(v / np.maximum(scale, 1e-30)), 0.0)
    return (
        np.clip(q, -127, 127).astype(np.int8),
        scale[:, 0].astype(np.float32),
    )


def _grow_to(arr: np.ndarray, cap: int, fill) -> np.ndarray:
    # np.zeros is calloc-backed (~free); np.full memsets explicitly, which
    # costs seconds per GB on this host — avoid it for zero fills
    shape = (cap,) + arr.shape[1:]
    if fill == 0 or fill is False:
        new = np.zeros(shape, dtype=arr.dtype)
    else:
        new = np.full(shape, fill, dtype=arr.dtype)
    new[: arr.shape[0]] = arr
    return new


@dataclasses.dataclass
class FlatStats:
    nodes: int
    connections: int
    avg_degree: float
    max_layer: int
    memory_bytes: int


class FlatIndex:
    """Thread-safe exact index keyed by uint64 vector IDs."""

    RECALL_TARGET = 0.95  # approx_min_k selection recall (distances exact)

    def __init__(
        self,
        dim: int,
        params: HNSWParams | None = None,  # accepted for config parity
        metric: DistanceMetric = DistanceMetric.COSINE,
        device_dtype: str = "float32",
        use_device: bool = True,
        search_batch_size: int = 1024,
        fast_scan: bool = True,
        # first-pass copy dtype: int8 default (measured 1M/128-d cosine on
        # one v5e: 36.8k QPS vs bf16's 28.6k, recall 1.0000 for both — the
        # exact f32 rerank absorbs the quantization); "bfloat16" available
        # for corpora where per-row int8 ranking proves too coarse
        scan_dtype: str = "int8",
        **_: Any,
    ):
        self.dim = dim
        self.params = params or HNSWParams()
        self.metric = DistanceMetric(metric)
        self.device_dtype = device_dtype
        self.use_device = use_device
        self.search_batch_size = search_batch_size
        # bf16/int8 first pass + f32 rerank (see _sync)
        self.fast_scan = fast_scan
        self.scan_dtype = scan_dtype

        self.cap = _MIN_CAP
        self.count = 0  # slots handed out (includes tombstones)
        self.live = 0
        self.vectors = np.zeros((self.cap, dim), np.float32)
        self.deleted = np.zeros(self.cap, np.bool_)
        self.id_to_slot: dict[int, int] = {}
        self.slot_to_id = np.zeros(self.cap, np.uint64)

        # readers share (reference: hnsw.go:292 RLock — FlatIndex is the
        # index that wins benchmarks, so its readers must overlap too);
        # writers serialize on _write_mu and take the write side only for
        # the host-array mutation
        self._rw = RWLock()
        self._write_mu = threading.Lock()
        self._sync_mu = threading.Lock()  # device-mirror sync (read path)
        # device mirror state
        self._dev: dict[str, Any] = {}
        self._dev_cap = -1
        self._dirty: set[int] | None = set()
        self._version = 0
        self._dev_version = -1

    # ----- properties -----

    def size(self) -> int:
        with self._rw.read():
            return self.live

    def memory_bytes(self) -> int:
        with self._rw.read():
            return (
                self.vectors.nbytes
                + self.deleted.nbytes
                + self.slot_to_id.nbytes
                + 8 * len(self.id_to_slot)
            )

    def set_ef_search(self, ef: int) -> None:  # interface parity; no beam
        with self._write_mu, self._rw.write():
            self.params = dataclasses.replace(self.params, ef_search=ef)

    def stats(self) -> FlatStats:
        with self._rw.read():
            return FlatStats(
                nodes=self.live,
                connections=0,
                avg_degree=0.0,
                max_layer=0,
                memory_bytes=self.memory_bytes(),
            )

    # ----- mutation -----

    def _reserve(self, n: int) -> None:
        target = self.cap
        while target < self.count + n:
            target *= 2
        if target != self.cap:
            self.cap = target
            self.vectors = _grow_to(self.vectors, target, 0.0)
            self.deleted = _grow_to(self.deleted, target, False)
            self.slot_to_id = _grow_to(self.slot_to_id, target, 0)
            self._dirty = None  # shapes changed; full upload next sync

    def insert(self, vector_id: int, elements: Sequence[float]) -> None:
        self.bulk_insert([vector_id], np.asarray(elements, np.float32)[None, :])

    def bulk_insert(self, ids: Sequence[int], vectors: np.ndarray) -> None:
        with self._write_mu, self._rw.write():
            seen: set[int] = set()
            for vid in ids:
                v = int(vid)
                # also reject repeats WITHIN the batch (two slots under one
                # id: duplicate results + an undeletable phantom slot)
                if v in self.id_to_slot or v in seen:
                    raise ScintireteError(
                        ErrorCode.INVALID_PARAMETER,
                        f"vector with ID {vid} already exists",
                    )
                seen.add(v)
            vectors = np.asarray(vectors, np.float32)
            if vectors.ndim != 2 or vectors.shape[1] != self.dim:
                raise dimension_mismatch(self.dim, int(vectors.shape[-1]))
            n = len(vectors)
            self._reserve(n)
            slots = np.arange(self.count, self.count + n)
            self.vectors[slots] = vectors
            for vid, slot in zip(ids, slots):
                self.id_to_slot[int(vid)] = int(slot)
                self.slot_to_id[slot] = vid
            self.count += n
            self.live += n
            if self._dirty is not None:
                self._dirty.update(slots.tolist())
            self._version += 1

    def delete(self, vector_id: int) -> bool:
        with self._write_mu, self._rw.write():
            slot = self.id_to_slot.get(vector_id)
            if slot is None:
                raise ScintireteError(
                    ErrorCode.VECTOR_NOT_FOUND, f"vector not found: {vector_id}"
                )
            if self.deleted[slot]:
                return False
            self.deleted[slot] = True
            self.live -= 1
            if self._dirty is not None:
                self._dirty.add(int(slot))
            self._version += 1
            return True

    def contains(self, vector_id: int) -> bool:
        with self._rw.read():
            slot = self.id_to_slot.get(vector_id)
            return slot is not None and not self.deleted[slot]

    def has_id(self, vector_id: int) -> bool:
        with self._rw.read():
            return vector_id in self.id_to_slot

    def get_vector(self, vector_id: int) -> np.ndarray:
        with self._rw.read():
            slot = self.id_to_slot.get(vector_id)
            if slot is None or self.deleted[slot]:
                raise ScintireteError(
                    ErrorCode.VECTOR_NOT_FOUND, f"vector not found: {vector_id}"
                )
            return self.vectors[slot].copy()

    # ----- search -----

    def search(
        self, query: Sequence[float], params: SearchParams
    ) -> list[tuple[int, float]]:
        return self.search_batch(
            np.asarray(query, np.float32)[None, :], params
        )[0]

    def search_batch(
        self, queries: np.ndarray, params: SearchParams
    ) -> list[list[tuple[int, float]]]:
        queries = np.asarray(queries, np.float32)
        if queries.ndim != 2 or queries.shape[1] != self.dim:
            raise dimension_mismatch(self.dim, int(queries.shape[-1]))
        with self._rw.read():
            if self.live == 0:
                return [[] for _ in range(queries.shape[0])]
            k = min(params.top_k, self.live)
            if self.use_device:
                slots_b, dists_b = self._device_search(queries, k)
            else:
                slots_b, dists_b = self._host_search(queries, k)
            return self._assemble(slots_b, dists_b)

    def _assemble(self, slots_b, dists_b):
        from scintirete_tpu.index.results import assemble_results

        return assemble_results(self.slot_to_id, slots_b, dists_b)

    def search_batch_arrays(
        self, queries: np.ndarray, params: SearchParams
    ) -> tuple[np.ndarray, np.ndarray]:
        """Packed-array search for the BatchSearch RPC: (ids u64 [B,k],
        dists f32 [B,k]); id 0 / +inf mark missing hits. Skips the per-hit
        tuple assembly — the response-shaping wall at B>=1024."""
        from scintirete_tpu.index.results import assemble_arrays

        queries = np.asarray(queries, np.float32)
        if queries.ndim != 2 or queries.shape[1] != self.dim:
            raise dimension_mismatch(self.dim, int(queries.shape[-1]))
        with self._rw.read():
            if self.live == 0:
                b = queries.shape[0]
                return (np.zeros((b, 0), np.uint64),
                        np.zeros((b, 0), np.float32))
            k = min(params.top_k, self.live)
            if self.use_device:
                slots_b, dists_b = self._device_search(queries, k)
            else:
                slots_b, dists_b = self._host_search(queries, k)
            return assemble_arrays(self.slot_to_id, slots_b, dists_b)

    # ----- pipelined serving -----
    #
    # The serving pass over a tunneled TPU is TRANSFER-bound: at 1M x
    # B=4096 the device scan is ~16 ms but query upload + result fetch
    # are ~100 ms of tunnel time (scripts/prof_tunnel_floor.py). A server
    # under load has independent batches in flight, so the upload+kernel
    # of batch i+1 can proceed while batch i's results stream back —
    # submit/collect splits the pass at exactly that boundary.

    def search_submit(self, queries: np.ndarray, params: SearchParams):
        """Dispatch a search (upload + kernel) WITHOUT fetching results.

        Returns an opaque pending handle for search_collect. Device
        arrays snapshot the corpus at submit time; slots are stable
        (deletes are soft), so collect-after-mutation stays consistent.
        """
        queries = np.asarray(queries, np.float32)
        if queries.ndim != 2 or queries.shape[1] != self.dim:
            raise dimension_mismatch(self.dim, int(queries.shape[-1]))
        with self._rw.read():
            if self.live == 0 or not self.use_device:
                # degenerate/host paths run eagerly; collect just returns
                return ("done", self.search_batch(queries, params))
            k = min(params.top_k, self.live)
            return ("dev", self._device_submit(queries, k))

    def search_collect(self, pending) -> list[list[tuple[int, float]]]:
        """Fetch + assemble the results of a search_submit handle."""
        kind, payload = pending
        if kind == "done":
            return payload
        with self._rw.read():
            slots_b, dists_b = self._device_collect(payload)
            return self._assemble(slots_b, dists_b)

    def search_batch_pipelined(
        self, batches, params: SearchParams, depth: int = 2
    ) -> list[list[list[tuple[int, float]]]]:
        """Search several query batches with up to `depth` in flight:
        steady-state throughput is max(upload, kernel, fetch) per batch
        instead of their sum."""
        from collections import deque

        out = []
        pending: deque = deque()
        for q in batches:
            pending.append(self.search_submit(q, params))
            if len(pending) >= depth:
                out.append(self.search_collect(pending.popleft()))
        while pending:
            out.append(self.search_collect(pending.popleft()))
        return out

    def search_collect_arrays(self, pending) -> tuple[np.ndarray, np.ndarray]:
        """Packed-array collect for a search_submit handle: (ids u64 [B,k],
        dists f32 [B,k]); id 0 / +inf mark missing hits. Skips the per-hit
        tuple assembly (~430 ms of one-core host wall at B=64k x k=10 —
        the response-shaping wall the BatchSearch RPC already avoids via
        search_batch_arrays)."""
        from scintirete_tpu.index.results import assemble_arrays

        kind, payload = pending
        if kind == "done":
            b = len(payload)
            k = max((len(r) for r in payload), default=0)
            ids = np.zeros((b, k), np.uint64)
            dists = np.full((b, k), np.inf, np.float32)
            for i, row in enumerate(payload):
                for j, (vid, d) in enumerate(row):
                    ids[i, j] = vid
                    dists[i, j] = d
            return ids, dists
        with self._rw.read():
            slots_b, dists_b = self._device_collect(payload)
            return assemble_arrays(self.slot_to_id, slots_b, dists_b)

    def search_batch_pipelined_arrays(
        self, batches, params: SearchParams, depth: int = 2
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Pipelined serving with packed-array results (no per-hit Python
        objects): the high-throughput serving shape — per batch, (ids u64
        [B,k], dists f32 [B,k])."""
        from collections import deque

        out = []
        pending: deque = deque()
        for q in batches:
            pending.append(self.search_submit(q, params))
            if len(pending) >= depth:
                out.append(self.search_collect_arrays(pending.popleft()))
        while pending:
            out.append(self.search_collect_arrays(pending.popleft()))
        return out

    def _host_search(self, queries, k):
        from scintirete_tpu.ops.distance import distance_np

        d = distance_np(queries, self.vectors[: self.count], self.metric)
        d = np.where(self.deleted[: self.count][None, :], np.inf, d)
        idx = np.argsort(d, axis=1, kind="stable")[:, :k]
        dd = np.take_along_axis(d, idx, axis=1)
        return np.where(np.isinf(dd), -1, idx).astype(np.int64), dd.astype(
            np.float32
        )

    def _sync(self) -> None:
        import jax.numpy as jnp

        from scintirete_tpu.index.device import DeviceGraph

        dtype = jnp.bfloat16 if self.device_dtype == "bfloat16" else jnp.float32
        import jax

        cosine = self.metric == DistanceMetric.COSINE
        # int8 only where the fused kernel will consume it (large corpora
        # on TPU); below the crossover the XLA two-pass bf16 scan is
        # faster, and it cannot rank from an int8 copy
        use_int8 = (
            self.scan_dtype == "int8"
            and self.cap >= _FUSED_MIN_CAP
            and jax.default_backend() == "tpu"
        )
        # fast-scan mode: keep a narrow copy for the full-corpus first pass
        # and rerank candidates against the "exact" matrix — scan-dtype MXU
        # rate with f32-computed returned distances. f32 collections pair
        # it with a bf16/int8 scan copy; bf16 collections (the int8-only
        # HBM mode for 16M+ corpora — rerank reads the bf16 rows, cast to
        # f32 per gathered candidate block) only need the extra copy in the
        # int8 fused regime — below it they already scan at the fast rate.
        two_pass = self.fast_scan and (
            dtype == jnp.float32 or (dtype == jnp.bfloat16 and use_int8)
        )

        def scan_form(v: np.ndarray) -> np.ndarray:
            # the fused lane scan ranks cosine by -dot over pre-normalized
            # rows (zero rows stay zero -> dot 0, consistent with the
            # reference's zero-vector cosine distance of 1.0)
            if not cosine:
                return v
            n = np.linalg.norm(v, axis=1, keepdims=True)
            return np.where(n > 1e-30, v / np.maximum(n, 1e-30), 0.0)

        dirty = self._dirty
        self._dirty = set()
        try:
            self._sync_apply(dirty, dtype, two_pass, use_int8, cosine,
                             scan_form)
        except BaseException:
            # dirty rows were consumed but not applied (transient device
            # error mid-scatter) — force a full upload on the next sync
            self._dirty = None
            raise
        self._dev_version = self._version

    def _sync_apply(self, dirty, dtype, two_pass, use_int8, cosine,
                    scan_form):
        import jax.numpy as jnp

        from scintirete_tpu.index.device import DeviceGraph

        if self._dev_cap != self.cap or dirty is None or not self._dev:
            vecs = self.vectors
            valid = ~self.deleted & (np.arange(self.cap) < self.count)
            self._dev = {
                "vectors": jnp.asarray(vecs, dtype),
                "sq_norms": jnp.asarray(
                    np.sum(vecs.astype(np.float32) ** 2, axis=1), jnp.float32
                ),
                "valid": jnp.asarray(valid),
            }
            if two_pass:
                sf = scan_form(vecs)
                if use_int8:
                    q8, sc = _quant8(sf)
                    self._dev["scan"] = jnp.asarray(q8)
                    self._dev["scan_scale"] = jnp.asarray(sc)
                else:
                    self._dev["scan"] = jnp.asarray(sf, jnp.bfloat16)
                if cosine:
                    # norms of the SCAN-form copy (1/0 for cosine); the
                    # scan first pass must rank with these, not the raw
                    # norms (other metrics reuse sq_norms at lookup)
                    self._dev["scan_sq"] = jnp.asarray(
                        np.sum(sf.astype(np.float32) ** 2, axis=1),
                        jnp.float32,
                    )
            self._dev_cap = self.cap
        elif dirty:
            rows = np.fromiter(dirty, np.int32, len(dirty))
            self._dev["vectors"] = DeviceGraph._scatter_into(
                self._dev["vectors"], rows, self.vectors[rows]
            )
            if two_pass and "scan" in self._dev:
                sf = scan_form(self.vectors[rows])
                if self._dev["scan"].dtype == jnp.int8:
                    q8, sc = _quant8(sf)
                    self._dev["scan"] = DeviceGraph._scatter_into(
                        self._dev["scan"], rows, q8
                    )
                    self._dev["scan_scale"] = DeviceGraph._scatter_into(
                        self._dev["scan_scale"], rows, sc
                    )
                else:
                    self._dev["scan"] = DeviceGraph._scatter_into(
                        self._dev["scan"], rows, sf
                    )
                if cosine:
                    self._dev["scan_sq"] = DeviceGraph._scatter_into(
                        self._dev["scan_sq"],
                        rows,
                        np.sum(sf.astype(np.float32) ** 2, axis=1),
                    )
            norms = np.sum(self.vectors[rows].astype(np.float32) ** 2, axis=1)
            self._dev["sq_norms"] = DeviceGraph._scatter_into(
                self._dev["sq_norms"], rows, norms
            )
            ok = ~self.deleted[rows] & (rows < self.count)
            self._dev["valid"] = DeviceGraph._scatter_into(
                self._dev["valid"], rows, ok
            )

    def _device_search(self, queries, k):
        return self._device_collect(self._device_submit(queries, k))

    def _device_submit(self, queries, k):
        import jax
        import jax.numpy as jnp

        from scintirete_tpu.ops.flat_scan import (
            flat_topk,
            flat_topk_fused,
            flat_topk_rerank,
        )
        from scintirete_tpu.ops.pallas_scan import LANES

        # readers overlap now: the lazy mirror sync mutates _dev/_dirty on
        # the READ path, so the first reader after a mutation does the sync
        # under _sync_mu while the rest re-check and proceed
        if self._dev_version != self._version:
            with self._sync_mu:
                if self._dev_version != self._version:
                    self._sync()
        a = self._dev
        B = queries.shape[0]
        in_flight = []
        step = self.search_batch_size
        # fused Pallas lane scan: score matrix stays in VMEM (needs Mosaic,
        # a LANES-aligned capacity, and >= 1 sublane of queries)
        use_fused = (
            "scan" in a
            and jax.default_backend() == "tpu"
            and self.cap % LANES == 0
            and self.cap >= _FUSED_MIN_CAP
            # the lane scan yields at most 2*LANES candidates and loses
            # ~C(k,3)/LANES^2 of a large top-k to 3-in-a-lane collisions;
            # big-k requests take the exact XLA scan instead
            and k <= 128
        )
        if use_fused:
            # one 2D-grid dispatch covers up to _FUSED_MAX_B pow2 queries
            # (no Python sub-batch loop below that width — the round-2
            # path's per-call dispatch overhead over the tunnel was the
            # dominant cost, ~3% MFU); wider batches upload the WHOLE
            # batch in one transfer, slice fixed-width chunks ON DEVICE
            # (dynamic_slice — no per-chunk host->device RT), and loop
            # fixed-width dispatches that queue back-to-back on device,
            # still producing ONE packed fetch
            mode = _query_upload_mode()
            # scan tiles folded per grid step: fewer/fatter steps cut the
            # per-step fixed overhead (~half the kernel wall at tps=1)
            tps = _sanitize_tps(
                int(os.environ.get("SCNT_SCAN_TPS", "1")), self.cap,
                self.dim,
                elt_bytes=1 if a["scan"].dtype == jnp.int8 else 2,
            )
            if B > _FUSED_MAX_B:
                width = _FUSED_MAX_B
                padded_B = -(-B // width) * width
            else:
                width = padded_B = max(1 << (B - 1).bit_length(), 8)
            full = queries
            if padded_B > B:
                full = np.concatenate(
                    [queries, np.zeros((padded_B - B, self.dim), np.float32)]
                )
            if mode == "int8":
                q8, qsc = _quant8(full)
                q_up = jnp.asarray(q8)
                q_scale_up = jnp.asarray(qsc)
            else:
                up_dtype = jnp.float16 if mode == "f16" else jnp.float32
                q_up = jnp.asarray(full, up_dtype)
                q_scale_up = None
            for start in range(0, padded_B, width):
                if padded_B > width:
                    qc = _device_slice(q_up, np.int32(start), width)
                    qs = (
                        _device_slice(q_scale_up, np.int32(start), width)
                        if q_scale_up is not None
                        else None
                    )
                else:
                    qc, qs = q_up, q_scale_up
                d, s = flat_topk_fused(
                    qc,
                    a["scan"],
                    a["vectors"],
                    a["valid"],
                    int(self.metric),
                    k,
                    a.get("scan_sq", a["sq_norms"]),
                    width=max(4 * k, 64),
                    base_scale=a.get("scan_scale"),
                    tps=tps,
                    query_scale=qs,
                )
                n_here = min(B - start, width)
                if n_here > 0:
                    in_flight.append((start, n_here, d, s))
            return self._pack_payload(B, k, in_flight)
        # an int8 scan copy is only usable by the fused kernel; elsewhere
        # fall back to the plain f32 scan
        scan8 = "scan" in a and a["scan"].dtype == jnp.int8
        for start in range(0, B, step):
            chunk = queries[start : start + step]
            n = chunk.shape[0]
            padded = max(1 << (n - 1).bit_length(), 8)
            if padded > n:
                chunk = np.concatenate(
                    [chunk, np.zeros((padded - n, self.dim), np.float32)]
                )
            if "scan" in a and not scan8:
                # f16 upload contract as the fused path: the kernel casts
                # queries to f32 on device, only upload rounding deviates
                d, s = flat_topk_rerank(
                    jnp.asarray(
                        chunk, jnp.float16 if _query_f16() else jnp.float32
                    ),
                    a["scan"],
                    a["vectors"],
                    a["valid"],
                    int(self.metric),
                    k,
                    a.get("scan_sq", a["sq_norms"]),
                    width=max(4 * k, 32),
                    recall_target=0.99,
                )
            else:
                d, s = flat_topk(
                    jnp.asarray(chunk, jnp.float32),
                    a["vectors"],
                    a["valid"],
                    int(self.metric),
                    k,
                    a["sq_norms"],
                    recall_target=self.RECALL_TARGET,
                )
            in_flight.append((start, n, d, s))
        return self._pack_payload(B, k, in_flight)

    @staticmethod
    def _pack_payload(B, k, in_flight):
        from scintirete_tpu.index.device import _pack_deferred

        # pack at SUBMIT time: the concat program lands in the device queue
        # right behind the scan kernels, so a depth-2 pipelined collect is
        # a pure device->host transfer (packing at collect time would queue
        # it behind the NEXT pass's kernel)
        packed = _pack_deferred(
            [d for _, _, d, _ in in_flight], [s for _, _, _, s in in_flight]
        )
        metas = [(start, n, d.shape[0]) for start, n, d, _ in in_flight]
        return (B, k, metas, packed)

    def _device_collect(self, payload):
        from scintirete_tpu.index.device import _unpack_host

        B, k, metas, packed = payload
        out_slots = np.empty((B, k), np.int64)
        out_dists = np.empty((B, k), np.float32)
        # ONE device->host fetch for the whole batch: per-sub-batch fetches
        # each pay a full transfer round trip (~20 ms over a tunneled TPU)
        d_host, s_host = _unpack_host(packed)
        row = 0
        for start, n, rows in metas:
            out_dists[start : start + n] = d_host[row : row + n]
            out_slots[start : start + n] = s_host[row : row + n]
            row += rows
        return out_slots, out_dists

    # ----- state export/import (RDB restore without rebuild) -----

    def export_graph_state(self) -> dict[str, Any]:
        with self._rw.read():
            n = self.count
            return {
                "kind": "flat",
                "dim": self.dim,
                "metric": int(self.metric),
                "params": dataclasses.asdict(self.params),
                "count": n,
                "live": self.live,
                "vectors": self.vectors[:n].copy(),
                "deleted": self.deleted[:n].copy(),
                "slot_to_id": self.slot_to_id[:n].copy(),
            }

    @classmethod
    def import_graph_state(
        cls,
        state: dict[str, Any],
        device_dtype: str = "float32",
        use_device: bool = True,
        **kw: Any,
    ) -> "FlatIndex":
        idx = cls(
            dim=int(state["dim"]),
            params=HNSWParams(**state["params"]),
            metric=DistanceMetric(state["metric"]),
            device_dtype=device_dtype,
            use_device=use_device,
            **kw,
        )
        n = int(state["count"])
        idx._reserve(n)
        idx.count = n
        idx.live = int(state["live"])
        idx.vectors[:n] = state["vectors"]
        idx.deleted[:n] = state["deleted"]
        slot_to_id = np.asarray(state["slot_to_id"], np.uint64)
        idx.slot_to_id[:n] = slot_to_id
        for slot in range(n):
            idx.id_to_slot[int(slot_to_id[slot])] = slot
        idx._dirty = None
        idx._version += 1
        return idx
