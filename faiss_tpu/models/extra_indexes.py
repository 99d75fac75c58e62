"""Smaller index variants: Index2Layer, IndexIVFFlatDedup,
IndexRowwiseMinMax — reference: faiss/Index2Layer.{h,cpp},
faiss/IndexIVFFlat.h (Dedup), faiss/IndexRowwiseMinMax.{h,cpp}.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..base import Index
from ..codecs.pq import ProductQuantizer
from ..metric import MetricType
from .flat import IndexFlat
from .ivf import IndexIVF, IndexIVFFlat


class Index2Layer(Index):
    """IVF-structured codes stored flat (reference: Index2Layer.h:22).

    Stores (coarse id, PQ code of residual) per vector without inverted
    lists — the format used to bootstrap HNSW-on-codes. Search decodes and
    brute-forces on the decoded vectors.
    """

    def __init__(self, quantizer, nlist: int, M: int, nbits: int = 8,
                 metric=MetricType.L2):
        d = quantizer.d
        super().__init__(d, metric)
        self.q1_quantizer = quantizer
        self.nlist = int(nlist)
        self.pq = ProductQuantizer(d, M, nbits)
        self.is_trained = False
        self._listnos: Optional[np.ndarray] = None
        self._codes: Optional[np.ndarray] = None
        self.code_size = self.pq.code_size + 4  # coarse id stored as int32

    def train(self, x) -> None:
        x = self._check_input(x)
        if self.q1_quantizer.ntotal != self.nlist:
            from .imi import MultiIndexQuantizer

            if isinstance(self.q1_quantizer, MultiIndexQuantizer):
                # IMI coarse quantizer trains itself (the reference sets
                # quantizer_trains_alone=1 for the 2x..+PQ factory form)
                self.q1_quantizer.train(x)
            else:
                from ..clustering import Clustering

                clus = Clustering(self.d, self.nlist)
                clus.train(x)
                self.q1_quantizer.reset()
                self.q1_quantizer.add(clus.centroids)
        _, assign = self.q1_quantizer.search(x, 1)
        res = x - self.q1_quantizer.vectors()[assign.ravel()]
        self.pq.train(res)
        self.is_trained = True

    def add(self, x) -> None:
        x = self._check_input(x)
        _, assign = self.q1_quantizer.search(x, 1)
        assign = assign.ravel().astype(np.int32)
        res = x - self.q1_quantizer.vectors()[assign]
        codes = self.pq.compute_codes_int(res)
        self._listnos = (
            assign if self._listnos is None
            else np.concatenate([self._listnos, assign])
        )
        self._codes = (
            codes if self._codes is None else np.concatenate([self._codes, codes])
        )
        self.ntotal += len(x)

    def reconstruct_n(self, n0: int, ni: int) -> np.ndarray:
        recon = self.pq.decode_int(self._codes[n0 : n0 + ni])
        return recon + self.q1_quantizer.vectors()[self._listnos[n0 : n0 + ni]]

    def search(self, x, k: int, *, params=None):
        # decode-and-scan (the reference mainly uses this class as HNSW
        # storage; exact scan over reconstructions keeps semantics)
        flat = IndexFlat(self.d, self.metric_type)
        flat.add(self.reconstruct_n(0, self.ntotal))
        return flat.search(x, k, params=params)

    def reset(self) -> None:
        self._listnos = None
        self._codes = None
        self.ntotal = 0

    def _truncate(self, n: int) -> None:
        """Drop rows n.. (interrupt rollback for graph wrappers that must
        add storage before building graph nodes)."""
        if n <= 0:
            self.reset()
            return
        self._listnos = self._listnos[:n]
        self._codes = self._codes[:n]
        self.ntotal = n


class IndexIVFFlatDedup(IndexIVFFlat):
    """IVFFlat that deduplicates identical vectors
    (reference: IndexIVFFlat.h:69 IndexIVFFlatDedup).

    Duplicate vectors are stored once; their extra ids live in
    ``instances`` (a host map). Search returns the representative id;
    reconstruct/remove understand all ids.
    """

    def __init__(self, quantizer, d, nlist, metric=MetricType.L2):
        super().__init__(quantizer, d, nlist, metric)
        self.instances = {}  # representative id -> list of duplicate ids

    def add_with_ids(self, x, ids) -> None:
        x = self._check_input(x)
        if ids is None:
            ids = np.arange(self.ntotal, self.ntotal + len(x), dtype=np.int64)
        ids = np.asarray(ids, np.int64)
        # hash stored vectors for dedup
        existing = {}
        if self.ntotal:
            for slot in range(self.ntotal):
                existing[self._codes_host[slot].tobytes()] = int(
                    self._ids_host[slot]
                )
        keep_rows, keep_ids = [], []
        for i, row in enumerate(x):
            key = row.astype(np.float32).tobytes()
            if key in existing:
                rep = existing[key]
                self.instances.setdefault(rep, []).append(int(ids[i]))
            else:
                existing[key] = int(ids[i])
                keep_rows.append(i)
                keep_ids.append(ids[i])
        if keep_rows:
            super().add_with_ids(x[keep_rows], np.asarray(keep_ids, np.int64))

    def remove_ids(self, sel) -> int:
        removed = 0
        for rep in list(self.instances):
            dups = self.instances[rep]
            keep = [i for i in dups if not sel.is_member(i)]
            removed += len(dups) - len(keep)
            if keep:
                self.instances[rep] = keep
            else:
                del self.instances[rep]
        return removed + super().remove_ids(sel)


class IndexRowwiseMinMax(Index):
    """Per-row min/max normalization wrapper codec
    (reference: IndexRowwiseMinMax.h:33; fp32 scale/bias variant).

    sa codes prepend (scale, bias) to the sub-index code; add/search
    normalize rows to [0, 1] before delegating.
    """

    def __init__(self, index: Index):
        super().__init__(index.d, index.metric_type)
        self.index = index
        self.is_trained = index.is_trained
        self._scale_bias = []

    def train(self, x) -> None:
        x = self._check_input(x)
        self.index.train(self._normalize(x)[0])
        self.is_trained = True

    def _normalize(self, x):
        lo = x.min(axis=1, keepdims=True)
        hi = x.max(axis=1, keepdims=True)
        scale = np.maximum(hi - lo, 1e-20)
        return ((x - lo) / scale).astype(np.float32), scale.ravel(), lo.ravel()

    def add(self, x) -> None:
        x = self._check_input(x)
        xn, scale, bias = self._normalize(x)
        self.index.add(xn)
        self._scale_bias.extend(zip(scale, bias))
        self.ntotal = self.index.ntotal

    def search(self, x, k: int, *, params=None):
        # the reference wrapper is a PURE storage codec and refuses to
        # search (IndexRowwiseMinMax.cpp:362: "search not implemented for
        # this type of index") — per-row normalization is not invertible on
        # the query side, so any ranking it produced would be misleading
        raise NotImplementedError(
            "search not implemented for IndexRowwiseMinMax (codec-only "
            "wrapper, like the reference); use sa_encode/sa_decode"
        )

    def reconstruct(self, key: int) -> np.ndarray:
        scale, bias = self._scale_bias[key]
        return self.index.reconstruct(key) * scale + bias

    def sa_code_size(self) -> int:
        return self.index.sa_code_size() + 8

    def sa_encode(self, x) -> np.ndarray:
        x = self._check_input(x)
        xn, scale, bias = self._normalize(x)
        sub = self.index.sa_encode(xn)
        head = np.stack([scale, bias], 1).astype(np.float32).view(np.uint8)
        return np.concatenate([head, sub], axis=1)

    def sa_decode(self, codes) -> np.ndarray:
        codes = np.ascontiguousarray(codes, np.uint8)
        head = codes[:, :8].copy().view(np.float32)
        sub = self.index.sa_decode(codes[:, 8:])
        return sub * head[:, 0:1] + head[:, 1:2]

    def reset(self) -> None:
        self.index.reset()
        self._scale_bias = []
        self.ntotal = 0


class IndexRowwiseMinMaxFP16(IndexRowwiseMinMax):
    """fp16 scale/bias variant (IndexRowwiseMinMax.h:21)."""

    def sa_code_size(self) -> int:
        return self.index.sa_code_size() + 4

    def sa_encode(self, x) -> np.ndarray:
        x = self._check_input(x)
        xn, scale, bias = self._normalize(x)
        sub = self.index.sa_encode(xn)
        head = np.stack([scale, bias], 1).astype(np.float16).view(np.uint8)
        return np.concatenate([head, sub], axis=1)

    def sa_decode(self, codes) -> np.ndarray:
        codes = np.ascontiguousarray(codes, np.uint8)
        head = codes[:, :4].copy().view(np.float16).astype(np.float32)
        sub = self.index.sa_decode(codes[:, 4:])
        return sub * head[:, 0:1] + head[:, 1:2]


class IndexIVFIndependentQuantizer(Index):
    """IVF whose coarse quantizer sees UN-transformed vectors while the
    codes are computed on transformed ones
    (reference: IndexIVFIndependentQuantizer.h:24)."""

    def __init__(self, quantizer: Index, index_ivf: IndexIVF, vt=None):
        super().__init__(quantizer.d, index_ivf.metric_type)
        self.quantizer = quantizer
        self.index_ivf = index_ivf
        self.vt = vt
        self.is_trained = False

    def train(self, x) -> None:
        x = self._check_input(x)
        if not self.quantizer.is_trained or self.quantizer.ntotal == 0:
            from ..clustering import Clustering

            clus = Clustering(self.d, self.index_ivf.nlist)
            clus.train(x)
            self.quantizer.reset()
            self.quantizer.add(clus.centroids)
        xt = self.vt.apply(x) if self.vt is not None else x
        if self.vt is not None and not self.vt.is_trained:
            self.vt.train(x)
            xt = self.vt.apply(x)
        _, assign = self.quantizer.search(x, 1)
        self.index_ivf.quantizer.reset()
        # coarse centroids live in untransformed space; the IVF's own
        # quantizer holds transformed centroids for residual encoding
        cent = self.quantizer.vectors()
        self.index_ivf.quantizer.add(
            self.vt.apply(cent) if self.vt is not None else cent
        )
        self.index_ivf.train_encoder(xt, assign.ravel())
        self.index_ivf.is_trained = True
        self.is_trained = True

    def add(self, x) -> None:
        x = self._check_input(x)
        _, assign = self.quantizer.search(x, 1)
        xt = self.vt.apply(x) if self.vt is not None else x
        self.index_ivf.add_core(xt, None, assign.ravel())
        self.ntotal = self.index_ivf.ntotal

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        nprobe = self.index_ivf.nprobe
        cd, probes = self.quantizer.search(x, nprobe)
        xt = self.vt.apply(x) if self.vt is not None else x
        return self.index_ivf.search_preassigned(xt, k, probes, cd, params=params)

    def reset(self) -> None:
        self.index_ivf.reset()
        self.ntotal = 0


class IndexIVFSpectralHash(IndexIVF):
    """IVF of binarized spectral-hash codes
    (reference: IndexIVFSpectralHash.{h,cpp}).

    Residuals pass through a global linear transform (random rotation by
    default, like threshold mode Thresh_global), are thresholded into nbit
    binary codes, and lists are scanned by Hamming distance.
    """

    def __init__(self, quantizer, d, nlist, nbit: int, period: float = 1.0):
        from ..metric import MetricType

        super().__init__(quantizer, d, nlist, MetricType.L2)
        self.nbit = int(nbit)
        self.period = period
        self.threshold_type = 0  # Thresh_global
        from ..transforms import RandomRotationMatrix

        self.vt = RandomRotationMatrix(d, nbit)
        self.vt.init()
        self.trained_thresholds = np.zeros(nbit, np.float32)
        self.code_size = (nbit + 7) // 8

    def train_encoder(self, x, assign) -> None:
        res = x - self.quantizer.vectors()[assign]
        proj = self.vt.apply(res)
        self.trained_thresholds = np.median(proj, axis=0).astype(np.float32)

    def encode_vectors(self, x, listnos) -> np.ndarray:
        res = x - self.quantizer.vectors()[listnos]
        proj = self.vt.apply(res)
        bits = proj > self.trained_thresholds
        return np.packbits(bits, axis=1, bitorder="little")

    def decode_vectors(self, codes, listnos):
        raise NotImplementedError("spectral hash codes are not invertible")

    def reconstruct(self, key):
        raise NotImplementedError("spectral hash codes are not invertible")

    def search(self, x, k: int, *, params=None):
        """Hamming scan of probed lists (host popcount; lists are short)."""
        x = self._check_input(x)
        nprobe = self.nprobe
        if params is not None and getattr(params, "nprobe", 0):
            nprobe = params.nprobe
        nprobe = min(max(1, nprobe), self.nlist)
        _, probes = self.quantizer.search(x, nprobe)
        nq = len(x)
        D = np.full((nq, k), np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        if self.ntotal == 0:
            return D, I
        centroids = self.quantizer.vectors()
        bbits = np.unpackbits(self._codes_host, axis=1, bitorder="little")[
            :, : self.nbit
        ]
        for q in range(nq):
            cand = np.nonzero(np.isin(self._listnos_host, probes[q]))[0]
            if len(cand) == 0:
                continue
            # per-probe query code against each candidate's own list centroid
            res = x[q][None] - centroids[self._listnos_host[cand]]
            proj = self.vt.apply(res)
            qbits = proj > self.trained_thresholds
            d = (qbits != bbits[cand]).sum(1).astype(np.float32)
            order = np.argsort(d, kind="stable")[:k]
            D[q, : len(order)] = d[order]
            I[q, : len(order)] = self._ids_host[cand[order]]
        return D, I
