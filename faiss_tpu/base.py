"""Index base class — the TPU-native analogue of faiss/Index.h:95-430.

Design (SURVEY.md §7): indexes are thin Python objects holding immutable
device arrays (codes, ids, centroids) plus small config. All compute happens
in jitted functional kernels at module level; the OO layer only does shape
validation, host<->device staging, query batching and dtype conversion —
the role class_wrappers.py plays in the reference Python API.

Semantics preserved from the reference:
  - ids are int64 at the API boundary; "no result" is id -1 with
    distance +inf (min metrics) / -inf (max metrics).
  - METRIC_L2 returns *squared* L2.
  - ``add`` assigns sequential ids ntotal..ntotal+n-1 unless the index
    supports add_with_ids.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# Query-batch bucketing: queries are processed in padded power-of-two
# batches so jit caches stay small (analogue of GpuIndex paging,
# gpu/GpuIndex.cu:373, but for compile-cache control rather than PCIe).
MIN_QUERY_BUCKET = 128
MAX_QUERY_BATCH = 8192


# ---------------------------------------------------------------------------
# shared H2D staging for add pipelines. Uploading the vector batch once and
# letting every consumer (coarse assignment, residual encode, refine storage)
# reuse the device copy is the TPU analogue of the reference GPU backend's
# paged add with pinned double buffering (gpu/GpuIndex.cu:554) — over the
# tunnel one 512 MB upload costs ~11 s, so duplicates dominate add().
# ---------------------------------------------------------------------------

_stage_cache = {}


def _stage_key(x: np.ndarray):
    return (x.ctypes.data, x.shape, str(x.dtype))


def staged_device(x):
    """Device copy of ``x`` if one is staged (else None)."""
    if not isinstance(x, np.ndarray):
        return None
    return _stage_cache.get(_stage_key(x))


class device_staging:
    """Context manager: stage ``x`` on device for the duration of an add
    flow; nested uses reuse the same copy, the outermost one releases it.

    ``dtype`` compresses the upload (e.g. np.float16 halves the tunnel
    bytes — the GpuIndexFlatConfig.useFloat16 analogue); consumers upcast
    on device."""

    def __init__(self, x, dtype=None):
        self.x = x
        self.dtype = dtype

    def __enter__(self):
        import jax.numpy as jnp

        key = _stage_key(self.x)
        dev = _stage_cache.get(key)
        self._owner = dev is None
        if dev is None:
            h = self.x if self.dtype is None else self.x.astype(self.dtype)
            dev = _stage_cache[key] = jnp.asarray(h)
        return dev

    def __exit__(self, *exc):
        if self._owner:
            _stage_cache.pop(_stage_key(self.x), None)
        return False


# Max bytes of one add page's f32 working set. Bulk adds are paged so the
# device-side encode chain (staged copy + residuals + codes) stays bounded
# regardless of how many vectors the caller hands to add() — the reference
# GPU backend pages adds the same way (gpu/GpuIndex.cu:474 kAddPageSize).
ADD_PAGE_BYTES = 512 << 20


def add_page_rows(d: int) -> int:
    """Rows per add page so one page's f32 copy is <= ADD_PAGE_BYTES."""
    return max(1 << 10, ADD_PAGE_BYTES // (4 * max(int(d), 1)))


def query_buckets(nq: int, max_batch: int = MAX_QUERY_BATCH):
    """Split nq into (start, padded_len, real_len) power-of-two buckets."""
    out = []
    start = 0
    while start < nq:
        remaining = nq - start
        real = min(remaining, max_batch)
        padded = MIN_QUERY_BUCKET
        while padded < real:
            padded *= 2
        out.append((start, padded, real))
        start += real
    return out


class SearchParameters:
    """Per-call search options (reference: faiss/Index.h:88)."""

    def __init__(self, sel=None):
        self.sel = sel  # IDSelector


class Index:
    """Abstract index over float32 vectors (reference: faiss/Index.h:101)."""

    def __init__(self, d: int, metric_type, metric_arg: float = 0.0):
        from .metric import MetricType

        self.d = int(d)
        self.metric_type = MetricType(metric_type)
        self.metric_arg = float(metric_arg)
        self.ntotal = 0
        self.is_trained = True
        self.verbose = False

    # -- training / population ------------------------------------------
    def train(self, x) -> None:  # noqa: D401
        """Train on representative vectors; default no-op (Index.h:148)."""
        del x
        self.is_trained = True

    def add(self, x) -> None:
        raise NotImplementedError

    def add_with_ids(self, x, ids) -> None:
        raise NotImplementedError(
            f"{type(self).__name__} does not support add_with_ids; "
            "wrap with IndexIDMap"
        )

    # -- queries ----------------------------------------------------------
    def search(
        self, x, k: int, *, params: Optional[SearchParameters] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError

    def assign(self, x, k: int = 1) -> np.ndarray:
        _, ids = self.search(x, k)
        return ids

    def search_submit(self, x, k: int, *, params=None):
        """Enqueue a search without blocking on its results; pair with
        :meth:`search_collect`. A serving loop that submits batch i+1
        before collecting batch i overlaps the device link's readback,
        upload, and compute across batches (steady-state throughput
        approaches max(wire, compute) instead of their sum). Indexes with
        a fused device path override this; the base implementation is an
        eager fallback with identical results."""
        return ("eager", self.search(x, k, params=params))

    def search_collect(self, handle):
        """Block on and return (D, I) for a :meth:`search_submit` handle."""
        tag, st = handle
        if tag == "eager":
            return st
        return self._sbbr_collect(st)

    def range_search(self, x, radius: float, *, params=None):
        """Two-pass static-shape range search; see impl in subclasses."""
        raise NotImplementedError

    # -- reconstruction ---------------------------------------------------
    def reconstruct(self, key: int) -> np.ndarray:
        return self.reconstruct_n(key, 1)[0]

    def reconstruct_n(self, n0: int, ni: int) -> np.ndarray:
        raise NotImplementedError

    def reconstruct_batch(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        out = np.empty((len(keys), self.d), dtype=np.float32)
        for i, key in enumerate(keys):
            out[i] = self.reconstruct(int(key))
        return out

    # -- mutation ---------------------------------------------------------
    def reset(self) -> None:
        raise NotImplementedError

    def remove_ids(self, sel) -> int:
        raise NotImplementedError(
            f"{type(self).__name__} does not support remove_ids"
        )

    def merge_from(self, other: "Index", add_id: int = 0) -> None:
        raise NotImplementedError

    # -- standalone codec (Index.h:380-430) --------------------------------
    def sa_code_size(self) -> int:
        raise NotImplementedError

    def sa_encode(self, x) -> np.ndarray:
        raise NotImplementedError

    def sa_decode(self, codes) -> np.ndarray:
        raise NotImplementedError

    # -- helpers ------------------------------------------------------------
    def _check_input(self, x) -> np.ndarray:
        x = np.ascontiguousarray(x, dtype=np.float32)
        if x.ndim == 1:
            if x.size % self.d != 0:
                raise ValueError(f"vector size {x.size} not multiple of d={self.d}")
            x = x.reshape(-1, self.d)
        if x.ndim != 2 or x.shape[1] != self.d:
            raise ValueError(f"expected [n, {self.d}] array, got {x.shape}")
        return x

    def _check_trained(self):
        if not self.is_trained:
            raise RuntimeError(
                f"{type(self).__name__} is not trained; call train() first"
            )

    def __repr__(self):
        return (
            f"{type(self).__name__}(d={self.d}, ntotal={self.ntotal}, "
            f"metric={self.metric_type.name})"
        )


class IDSelector:
    """Subset-of-ids predicate (reference: faiss/impl/IDSelector.h).

    TPU-native form: renders to a boolean keep-mask over candidate id arrays
    (static shapes), rather than a virtual is_member() callback.
    """

    def mask_for_ids(self, ids: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def is_member(self, i: int) -> bool:
        return bool(self.mask_for_ids(np.array([i], dtype=np.int64))[0])


class IDSelectorRange(IDSelector):
    """Keep ids in [imin, imax) (IDSelector.h:23)."""

    def __init__(self, imin: int, imax: int):
        self.imin, self.imax = int(imin), int(imax)

    def mask_for_ids(self, ids):
        return (ids >= self.imin) & (ids < self.imax)


class IDSelectorArray(IDSelector):
    """Keep an explicit id list (IDSelector.h:45)."""

    def __init__(self, ids):
        self.ids = np.unique(np.asarray(ids, dtype=np.int64))

    def mask_for_ids(self, ids):
        if len(self.ids) == 0:
            return np.zeros(np.shape(ids), bool)
        pos = np.searchsorted(self.ids, ids)
        pos = np.clip(pos, 0, len(self.ids) - 1)
        return self.ids[pos] == ids


class IDSelectorBatch(IDSelectorArray):
    """Hash-set selector (IDSelector.h:60) — same mask semantics here."""


class IDSelectorBitmap(IDSelector):
    """Bitmap over [0, n) (IDSelector.h:88)."""

    def __init__(self, bitmap: np.ndarray):
        self.bitmap = np.asarray(bitmap, dtype=np.uint8)

    def mask_for_ids(self, ids):
        byte = self.bitmap[np.clip(ids >> 3, 0, len(self.bitmap) - 1)]
        ok = (byte >> (ids & 7).astype(np.uint8)) & 1
        in_range = (ids >= 0) & ((ids >> 3) < len(self.bitmap))
        return (ok == 1) & in_range


class IDSelectorNot(IDSelector):
    def __init__(self, sel: IDSelector):
        self.sel = sel

    def mask_for_ids(self, ids):
        return ~self.sel.mask_for_ids(ids)


class IDSelectorAnd(IDSelector):
    def __init__(self, lhs: IDSelector, rhs: IDSelector):
        self.lhs, self.rhs = lhs, rhs

    def mask_for_ids(self, ids):
        return self.lhs.mask_for_ids(ids) & self.rhs.mask_for_ids(ids)


class IDSelectorOr(IDSelector):
    def __init__(self, lhs: IDSelector, rhs: IDSelector):
        self.lhs, self.rhs = lhs, rhs

    def mask_for_ids(self, ids):
        return self.lhs.mask_for_ids(ids) | self.rhs.mask_for_ids(ids)


class IDSelectorXOr(IDSelector):
    def __init__(self, lhs: IDSelector, rhs: IDSelector):
        self.lhs, self.rhs = lhs, rhs

    def mask_for_ids(self, ids):
        return self.lhs.mask_for_ids(ids) ^ self.rhs.mask_for_ids(ids)


class IDSelectorAll(IDSelector):
    def mask_for_ids(self, ids):
        return np.ones(ids.shape, dtype=bool)


class RangeSearchResult:
    """CSR-style range search result (reference: impl/AuxIndexStructures.h:35).

    lims has nq+1 entries; result j of query i is labels[lims[i]:lims[i+1]].
    """

    def __init__(self, lims: np.ndarray, distances: np.ndarray, labels: np.ndarray):
        self.lims = lims
        self.distances = distances
        self.labels = labels

    @property
    def nq(self):
        return len(self.lims) - 1
