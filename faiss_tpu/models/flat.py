"""Exact brute-force indexes — the analogue of faiss/IndexFlat.{h,cpp}.

IndexFlat stores raw float32 vectors and answers exact k-NN by fused
chunked-GEMM + k-select on the MXU (ops/distances.knn), replacing the
reference's BLAS-tiled scan + heap ResultHandlers (IndexFlat.cpp:40-60).
IndexFlatL2 caches database norms like the reference's cached sync_l2norms
(IndexFlat.h:98).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..base import Index, RangeSearchResult, SearchParameters, query_buckets
from ..metric import MetricType, is_similarity_metric
from ..ops import distances as dops


class IndexFlat(Index):
    """Exact exhaustive index (reference: faiss/IndexFlat.h:23)."""

    # db sizes below this use the plain XLA path (padding overhead dominates)
    PALLAS_MIN_NB = 16384

    def __init__(self, d: int, metric=MetricType.L2, metric_arg: float = 0.0):
        super().__init__(d, metric, metric_arg)
        self._pending = []  # host-side staged adds
        self._xb = None  # consolidated device array [ntotal, d]
        self._norms = None  # cached device L2 norms
        self._xbT = None  # transposed padded device copy for the fused kernel
        # device storage dtype: np.float16 halves HBM + upload time at
        # ~2^-11 rounding (GpuIndexFlatConfig.useFloat16, gpu/GpuIndexFlat.h)
        self.storage_dtype = np.float32

    # -- population -------------------------------------------------------
    def add(self, x) -> None:
        from ..base import staged_device

        x = self._check_input(x)
        if len(x) == 0:
            return
        dev = staged_device(x)
        if dev is not None and not self._pending:
            # an add flow already uploaded this batch — append the device
            # copy directly instead of re-uploading at consolidation
            import jax.numpy as jnp

            dev = dev.astype(jnp.dtype(self.storage_dtype))
            self._xb = (
                dev if self._xb is None else jnp.concatenate([self._xb, dev])
            )
            self._norms = None
            self._xbT = None
            self.ntotal += len(x)
            return
        self._pending.append(x)
        self.ntotal += len(x)

    def reset(self) -> None:
        self._pending = []
        self._xb = None
        self._norms = None
        self._xbT = None
        self.ntotal = 0

    def merge_from(self, other: "IndexFlat", add_id: int = 0) -> None:
        del add_id  # flat ids are sequential
        if other.d != self.d or other.metric_type != self.metric_type:
            raise ValueError("incompatible indexes for merge")
        if other.ntotal:
            self.add(other.vectors())
        other.reset()

    def remove_ids(self, sel) -> int:
        xb = self.vectors()
        ids = np.arange(self.ntotal, dtype=np.int64)
        keep = ~sel.mask_for_ids(ids)
        nremoved = int((~keep).sum())
        self.reset()
        if keep.any():
            self.add(xb[keep])
        return nremoved

    # -- device staging -----------------------------------------------------
    def _consolidate(self):
        if self._pending:
            parts = []
            if self._xb is not None:
                parts.append(np.asarray(self._xb))
            parts.extend(self._pending)
            host = np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            self._xb = jnp.asarray(host.astype(self.storage_dtype, copy=False))
            self._pending = []
            self._norms = None
            self._xbT = None
        if self._xb is not None and self._norms is None and (
            self.metric_type == MetricType.L2
        ):
            self._norms = dops.l2_norms(self._xb.astype(jnp.float32))
        return self._xb

    def vectors(self) -> np.ndarray:
        """All stored vectors as numpy [ntotal, d]."""
        xb = self._consolidate()
        if xb is None:
            return np.empty((0, self.d), dtype=np.float32)
        return np.asarray(xb, dtype=np.float32)

    # -- queries ------------------------------------------------------------
    def search(
        self, x, k: int, *, params: Optional[SearchParameters] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        x = self._check_input(x)
        if k < 1:
            raise ValueError("k must be >= 1")
        nq = len(x)
        largest = is_similarity_metric(self.metric_type)
        D = np.full((nq, k), -np.inf if largest else np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        xb = self._consolidate()
        if xb is None or nq == 0:
            return D, I

        y_mask = None
        if params is not None and params.sel is not None:
            mask_host = params.sel.mask_for_ids(
                np.arange(self.ntotal, dtype=np.int64)
            )
            y_mask = jnp.asarray(mask_host)

        if y_mask is None and self._use_fused_kernel(k):
            return self._search_fused(x, k, D, I)

        for start, padded, real in query_buckets(nq):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            d, i = dops.knn(
                jnp.asarray(xq),
                xb.astype(jnp.float32),
                k,
                metric=self.metric_type,
                metric_arg=self.metric_arg,
                y_norms=self._norms,
                y_mask=y_mask,
            )
            D[start : start + real] = np.asarray(d)[:real]
            I[start : start + real] = np.asarray(i)[:real]
        return D, I

    def range_search(
        self, x, radius: float, *, params: Optional[SearchParameters] = None
    ) -> RangeSearchResult:
        """Exact range search (reference: IndexFlat range_search).

        Chunked distance tiles; thresholding and CSR assembly happen on host
        (the variable-size output cannot live under jit — the reference's
        RangeSearchPartialResult buffering, AuxIndexStructures.h:66).
        """
        x = self._check_input(x)
        xb = self._consolidate()
        nq = len(x)
        largest = is_similarity_metric(self.metric_type)
        lims = np.zeros(nq + 1, dtype=np.uint64)
        if xb is None or nq == 0:
            return RangeSearchResult(
                lims, np.empty(0, np.float32), np.empty(0, np.int64)
            )
        sel_mask = None
        if params is not None and params.sel is not None:
            sel_mask = params.sel.mask_for_ids(np.arange(self.ntotal, np.int64))

        all_d, all_i = [[] for _ in range(nq)], [[] for _ in range(nq)]
        chunk = 1 << 16
        for c0 in range(0, self.ntotal, chunk):
            c1 = min(c0 + chunk, self.ntotal)
            Dt = np.asarray(
                dops.pairwise_distances(
                    jnp.asarray(x), xb[c0:c1], self.metric_type, self.metric_arg
                )
            )
            hit = Dt > radius if largest else Dt < radius
            if sel_mask is not None:
                hit &= sel_mask[None, c0:c1]
            qi, ci = np.nonzero(hit)
            for q, c, dv in zip(qi, ci + c0, Dt[qi, ci]):
                all_d[q].append(dv)
                all_i[q].append(c)
        counts = np.array([len(v) for v in all_i], dtype=np.uint64)
        lims[1:] = np.cumsum(counts)
        distances = np.concatenate([np.asarray(v, np.float32) for v in all_d]) if lims[-1] else np.empty(0, np.float32)
        labels = np.concatenate([np.asarray(v, np.int64) for v in all_i]) if lims[-1] else np.empty(0, np.int64)
        return RangeSearchResult(lims, distances, labels)

    # -- reconstruction -------------------------------------------------------
    def reconstruct_n(self, n0: int, ni: int) -> np.ndarray:
        if n0 < 0 or n0 + ni > self.ntotal:
            raise IndexError("reconstruct range out of bounds")
        return self.vectors()[n0 : n0 + ni].copy()

    def reconstruct_batch(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        return self.vectors()[keys].copy()

    # -- flat codec: codes are raw float bytes (IndexFlatCodes.h) -------------
    def sa_code_size(self) -> int:
        return self.d * 4

    def sa_encode(self, x) -> np.ndarray:
        return self._check_input(x).view(np.uint8).reshape(len(x), -1).copy()

    def sa_decode(self, codes) -> np.ndarray:
        codes = np.ascontiguousarray(codes, dtype=np.uint8)
        return codes.view(np.float32).reshape(len(codes), self.d).copy()


    # ---- fused Pallas path (TPU WarpSelect analogue) -----------------------
    def _use_fused_kernel(self, k: int) -> bool:
        import jax

        return (
            jax.default_backend() not in ("cpu",)
            and k <= 2048  # BlockSelect range: chained 128-lane rank buffers
            and self.metric_type in (MetricType.L2, MetricType.INNER_PRODUCT)
            and self.ntotal >= self.PALLAS_MIN_NB
            and self.d <= 2048
        )

    def _xbT_dev(self):
        from ..ops import pallas_knn as pk

        if self._xbT is None:
            xb = self._consolidate()
            nbp = -(-self.ntotal // 1024) * 1024
            host = np.zeros((self.d, nbp), np.float32)
            host[:, : self.ntotal] = np.asarray(xb).T
            self._xbT = jnp.asarray(host)
        return self._xbT

    def _search_fused(self, x, k, D, I):
        """Fused GEMM+select kernel with exactness repair for lossy rows
        (ops/pallas_knn.py)."""
        from ..ops import pallas_knn as pk

        nq = len(x)
        metric_l2 = self.metric_type == MetricType.L2
        xbT = self._xbT_dev()
        k_lanes = max(128, -(-k // 128) * 128)
        for start, padded, real in query_buckets(nq):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            qt = min(padded, 512)
            v, i, ev = pk.knn_fused_pallas(
                jnp.asarray(xq),
                xbT,
                self.ntotal,
                metric_l2=metric_l2,
                qt=qt,
                k_lanes=k_lanes,
            )
            # reduce/slice ON DEVICE: the tunnel moves ~45 MB/s, so the
            # full [nq, k_lanes] v/i/ev transfer would dominate the search
            kk = min(k, k_lanes)
            if metric_l2:
                lossy_dev = jnp.min(ev, -1) < v[:, kk - 1]
            else:
                lossy_dev = jnp.max(ev, -1) > v[:, kk - 1]
            v_dev, i_dev = v[:, :kk], i[:, :kk]
            v = np.array(v_dev[:real])  # writable: lossy rows repaired below
            i = np.array(i_dev[:real])
            lossy = np.asarray(lossy_dev)[:real]
            if lossy.any():
                # exact repair through the XLA path for the affected rows
                rows = np.nonzero(lossy)[0]
                xq_fix = np.ascontiguousarray(x[start + rows])
                d_fix, i_fix = dops.knn(
                    jnp.asarray(xq_fix),
                    self._consolidate(),
                    k,
                    metric=self.metric_type,
                    y_norms=self._norms,
                )
                v[rows, :k] = np.asarray(d_fix)
                i[rows, :k] = np.asarray(i_fix)
            D[start : start + real] = v[:, :k]
            I[start : start + real] = i[:, :k]
        return D, I


class IndexFlatL2(IndexFlat):
    """reference: faiss/IndexFlat.h:85."""

    def __init__(self, d: int):
        super().__init__(d, MetricType.L2)


class IndexFlatIP(IndexFlat):
    """reference: faiss/IndexFlat.h:79."""

    def __init__(self, d: int):
        super().__init__(d, MetricType.INNER_PRODUCT)


class IndexFlat1D(IndexFlat):
    """1-D exact search via sorted values (reference: IndexFlat.h:201).

    On TPU the generic GEMM path already handles d=1; this subclass keeps the
    API (update_permutation) and uses a host-side sorted array for the
    single-vector fast path.
    """

    def __init__(self, continuous_update: bool = True):
        super().__init__(1, MetricType.L2)
        self.continuous_update = continuous_update
        self.perm = np.empty(0, dtype=np.int64)

    def add(self, x):
        super().add(x)
        if self.continuous_update:
            self.update_permutation()

    def update_permutation(self):
        vals = self.vectors()[:, 0]
        self.perm = np.argsort(vals, kind="stable").astype(np.int64)
