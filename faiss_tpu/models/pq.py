"""IndexPQ — flat product-quantizer index (reference: faiss/IndexPQ.{h,cpp}).

Stores unpacked PQ codes [ntotal, M] host-side, scores queries by fused ADC
table lookup + k-select on device (ops/pq_ops.pq_adc_knn). The FastScan
variant (IndexPQFastScan, reference faiss/IndexPQFastScan.h) is the same
kernel with nbits=4 — on TPU the "SIMD register LUT" trick is the one-hot
MXU contraction, so no separate packed layout is needed; the class exists
for API/factory parity and defaults search to bf16 one-hot GEMM.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..base import Index, SearchParameters, query_buckets
from ..codecs.pq import ProductQuantizer
from ..metric import MetricType, is_similarity_metric
from ..ops import pq_ops


class IndexPQ(Index):
    """reference: faiss/IndexPQ.h:24."""

    # search_type values (IndexPQ.h:56)
    ST_PQ = 0
    ST_SDC = 1
    ST_polysemous = 2

    def __init__(self, d: int, M: int, nbits: int = 8, metric=MetricType.L2):
        super().__init__(d, metric)
        self.pq = ProductQuantizer(d, M, nbits)
        self.is_trained = False
        self.do_polysemous_training = False
        self.polysemous_training = None  # PolysemousTraining instance
        self.polysemous_ht = 0  # Hamming threshold (0 = M*nbits/2 default)
        self.search_type = self.ST_PQ
        self._codes_host: Optional[np.ndarray] = None  # [n, M] unpacked
        self._dev_codes = None
        self._sdc = None  # cached symmetric table [M, ksub, ksub]

    def train(self, x) -> None:
        x = self._check_input(x)
        self.pq.verbose = self.verbose
        self.pq.train(x)
        if self.do_polysemous_training:
            from ..codecs.polysemous import PolysemousTraining

            pt = self.polysemous_training or PolysemousTraining()
            pt.optimize_pq_for_hamming(self.pq)
        self.is_trained = True
        self._sdc = None

    def add(self, x) -> None:
        x = self._check_input(x)
        self._check_trained()
        codes = self.pq.compute_codes_int(x)
        if self._codes_host is None:
            self._codes_host = codes
        else:
            self._codes_host = np.concatenate([self._codes_host, codes])
        self.ntotal += len(x)
        self._dev_codes = None

    def reset(self) -> None:
        self._codes_host = None
        self._dev_codes = None
        self.ntotal = 0

    def _codes_dev(self):
        if self._dev_codes is None:
            self._dev_codes = jnp.asarray(self._codes_host.astype(np.int32))
        return self._dev_codes

    def search(
        self, x, k: int, *, params: Optional[SearchParameters] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        x = self._check_input(x)
        self._check_trained()
        nq = len(x)
        largest = is_similarity_metric(self.metric_type)
        D = np.full((nq, k), -np.inf if largest else np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        if self.ntotal == 0 or nq == 0:
            return D, I
        sel_mask = None
        if params is not None and params.sel is not None:
            sel_mask = params.sel.mask_for_ids(np.arange(self.ntotal, dtype=np.int64))
        codes = self._codes_dev()
        dev_cb = self.pq._dev()
        for start, padded, real in query_buckets(nq):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            if self.search_type == self.ST_SDC:
                # symmetric distance: encode the query, row-gather the SDC
                # table -> per-query LUTs, then the SAME fused ADC scan
                # (reference: IndexPQ.h:78 ST_SDC, pq_knn_search_sdc)
                if self.metric_type != MetricType.L2:
                    raise ValueError("SDC search is defined for L2")
                if self._sdc is None:
                    self._sdc = self.pq.compute_sdc_table()
                qcodes = self.pq.compute_codes_int(xq).astype(np.int64)
                m_idx = np.arange(self.pq.M)[None, :]
                luts = jnp.asarray(self._sdc[m_idx, qcodes])  # [nq, M, ksub]
            elif self.metric_type == MetricType.L2:
                luts = pq_ops.pq_distance_tables(jnp.asarray(xq), dev_cb)
            else:
                luts = pq_ops.pq_ip_tables(jnp.asarray(xq), dev_cb)
            if self.search_type == self.ST_polysemous:
                ht = self.polysemous_ht or (self.pq.M * self.pq.nbits // 2)
                qcodes = self.pq.compute_codes_int(xq).astype(np.int32)
                d, i = pq_ops.pq_polysemous_knn(
                    luts, jnp.asarray(qcodes), codes, k, ht
                )
            else:
                d, i = pq_ops.pq_adc_knn(luts, codes, k, largest=largest)
            d, i = np.asarray(d)[:real], np.asarray(i)[:real].astype(np.int64)
            if sel_mask is not None:
                ok = (i >= 0) & sel_mask[np.maximum(i, 0)]
                # re-rank after masking: keep order, push masked to the end
                fill = -np.inf if largest else np.inf
                d = np.where(ok, d, fill)
                i = np.where(ok, i, -1)
                order = np.argsort(-d if largest else d, axis=1, kind="stable")
                d = np.take_along_axis(d, order, axis=1)
                i = np.take_along_axis(i, order, axis=1)
            D[start : start + real] = d
            I[start : start + real] = i
        return D, I

    def range_search(self, x, radius: float, *, params=None):
        """ADC range search (reference: IndexPQ range_search) — decode-based
        thresholding with host CSR assembly."""
        from ..base import RangeSearchResult

        x = self._check_input(x)
        nq = len(x)
        largest = is_similarity_metric(self.metric_type)
        lims = np.zeros(nq + 1, np.uint64)
        if self.ntotal == 0:
            return RangeSearchResult(
                lims, np.empty(0, np.float32), np.empty(0, np.int64)
            )
        recon = self.pq.decode_int(self._codes_host)
        all_d, all_i = [], []
        for q in range(nq):
            if largest:
                d = recon @ x[q]
                hit = d > radius
            else:
                d = ((recon - x[q][None]) ** 2).sum(1)
                hit = d < radius
            idx = np.nonzero(hit)[0]
            all_d.append(d[idx].astype(np.float32))
            all_i.append(idx.astype(np.int64))
            lims[q + 1] = lims[q] + len(idx)
        return RangeSearchResult(
            lims,
            np.concatenate(all_d) if nq else np.empty(0, np.float32),
            np.concatenate(all_i) if nq else np.empty(0, np.int64),
        )

    # -- reconstruction / codec ----------------------------------------------
    def reconstruct_n(self, n0: int, ni: int) -> np.ndarray:
        return self.pq.decode_int(self._codes_host[n0 : n0 + ni])

    def sa_code_size(self) -> int:
        return self.pq.code_size

    def sa_encode(self, x) -> np.ndarray:
        return self.pq.compute_codes(self._check_input(x))

    def sa_decode(self, codes) -> np.ndarray:
        return self.pq.decode(codes)

    def merge_from(self, other: "IndexPQ", add_id: int = 0) -> None:
        del add_id
        if other.ntotal:
            self._codes_host = (
                other._codes_host.copy()
                if self._codes_host is None
                else np.concatenate([self._codes_host, other._codes_host])
            )
            self.ntotal += other.ntotal
            self._dev_codes = None
        other.reset()


class IndexPQFastScan(IndexPQ):
    """4-bit PQ with MXU one-hot LUT scoring
    (reference: faiss/IndexPQFastScan.h:26; bbs accepted for parity)."""

    def __init__(self, d: int, M: int, nbits: int = 4, metric=MetricType.L2, bbs: int = 32):
        if nbits != 4:
            raise ValueError("FastScan requires nbits=4")
        super().__init__(d, M, nbits, metric)
        self.bbs = bbs
