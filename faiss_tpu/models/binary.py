"""Binary indexes — analogue of faiss/IndexBinary*.{h,cpp}.

IndexBinary: d is in BITS, codes are uint8[d/8], distances are int32 hamming
(IndexBinary.h:29). The hierarchy mirrors the float one: Flat (brute force on
the VPU popcount kernel), IVF (coarse quantization by hamming-to-centroid),
FromFloat (wrap a float index), HashMap variants (host-side buckets).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..base import Index
from ..metric import MetricType
from ..ops import hamming as hops


class IndexBinary:
    """Base binary index (reference: IndexBinary.h:29)."""

    def __init__(self, d: int):
        if d % 8:
            raise ValueError("binary dimension must be a multiple of 8")
        self.d = int(d)
        self.code_size = d // 8
        self.ntotal = 0
        self.is_trained = True
        self.verbose = False
        self.metric_type = MetricType.L2  # hamming, kept for API parity

    def _check(self, x) -> np.ndarray:
        x = np.ascontiguousarray(x, np.uint8)
        if x.ndim != 2 or x.shape[1] != self.code_size:
            raise ValueError(f"expected [n, {self.code_size}] uint8 codes")
        return x

    def train(self, x) -> None:
        del x

    def add(self, x) -> None:
        raise NotImplementedError

    def search(self, x, k):
        raise NotImplementedError

    def reset(self) -> None:
        raise NotImplementedError

    def reconstruct(self, key: int) -> np.ndarray:
        raise NotImplementedError


class IndexBinaryFlat(IndexBinary):
    """Exhaustive hamming search (reference: IndexBinaryFlat.h:22)."""

    def __init__(self, d: int):
        super().__init__(d)
        self.xb = np.empty((0, self.code_size), np.uint8)

    def add(self, x) -> None:
        self.xb = np.concatenate([self.xb, self._check(x)])
        self.ntotal = len(self.xb)

    def search(self, x, k: int):
        x = self._check(x)
        if self.ntotal == 0:
            return (
                np.full((len(x), k), 2**31 - 1, np.int32),
                np.full((len(x), k), -1, np.int64),
            )
        return hops.hamming_knn_host(x, self.xb, k)

    def range_search(self, x, radius: int):
        from ..base import RangeSearchResult

        x = self._check(x)
        D, I = [], []
        lims = np.zeros(len(x) + 1, np.uint64)
        qw = np.unpackbits(x, axis=1, bitorder="little")
        bw = np.unpackbits(self.xb, axis=1, bitorder="little")
        for q in range(len(x)):
            d = (qw[q][None] != bw).sum(1)
            hit = np.nonzero(d < radius)[0]
            D.append(d[hit].astype(np.int32))
            I.append(hit.astype(np.int64))
            lims[q + 1] = lims[q] + len(hit)
        return RangeSearchResult(
            lims,
            np.concatenate(D) if len(x) else np.empty(0, np.int32),
            np.concatenate(I) if len(x) else np.empty(0, np.int64),
        )

    def reconstruct(self, key: int) -> np.ndarray:
        return self.xb[key].copy()

    def reset(self) -> None:
        self.xb = np.empty((0, self.code_size), np.uint8)
        self.ntotal = 0


class IndexBinaryFlat1Bit(IndexBinaryFlat):
    pass


class IndexBinaryIVF(IndexBinary):
    """IVF over binary codes (reference: IndexBinaryIVF.h:33).

    Coarse quantizer is an IndexBinaryFlat over centroid codes; training
    k-means runs in float space then binarizes centroids (like the reference
    python train path).
    """

    def __init__(self, quantizer: Optional[IndexBinaryFlat], d: int, nlist: int):
        super().__init__(d)
        self.nlist = int(nlist)
        self.quantizer = quantizer or IndexBinaryFlat(d)
        self.nprobe = 1
        self.is_trained = self.quantizer.ntotal == self.nlist
        self._codes = np.empty((0, self.code_size), np.uint8)
        self._listnos = np.empty(0, np.int32)
        self._ids = np.empty(0, np.int64)

    def train(self, x) -> None:
        from ..clustering import Clustering, ClusteringParameters

        x = self._check(x)
        xf = np.unpackbits(x, axis=1, bitorder="little").astype(np.float32)
        clus = Clustering(self.d, self.nlist, ClusteringParameters(niter=10))
        clus.train(xf)
        centroids = hops.pack_bits(clus.centroids - 0.5)
        self.quantizer.reset()
        self.quantizer.add(centroids)
        self.is_trained = True

    def add(self, x) -> None:
        self.add_with_ids(x, None)

    def add_with_ids(self, x, ids) -> None:
        x = self._check(x)
        _, assign = self.quantizer.search(x, 1)
        if ids is None:
            ids = np.arange(self.ntotal, self.ntotal + len(x), dtype=np.int64)
        self._codes = np.concatenate([self._codes, x])
        self._listnos = np.concatenate(
            [self._listnos, assign.ravel().astype(np.int32)]
        )
        self._ids = np.concatenate([self._ids, np.asarray(ids, np.int64)])
        self.ntotal += len(x)

    def search(self, x, k: int):
        x = self._check(x)
        nq = len(x)
        nprobe = min(self.nprobe, self.nlist)
        _, probes = self.quantizer.search(x, nprobe)
        D = np.full((nq, k), 2**31 - 1, np.int32)
        I = np.full((nq, k), -1, np.int64)
        qbits = np.unpackbits(x, axis=1, bitorder="little")
        bbits = np.unpackbits(self._codes, axis=1, bitorder="little")
        for q in range(nq):
            mask = np.isin(self._listnos, probes[q][probes[q] >= 0])
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            d = (qbits[q][None] != bbits[cand]).sum(1)
            order = np.argsort(d, kind="stable")[:k]
            D[q, : len(order)] = d[order]
            I[q, : len(order)] = self._ids[cand[order]]
        return D, I

    def reconstruct(self, key: int) -> np.ndarray:
        pos = np.nonzero(self._ids == key)[0]
        if len(pos) == 0:
            raise KeyError(key)
        return self._codes[pos[0]].copy()

    def reset(self) -> None:
        self._codes = np.empty((0, self.code_size), np.uint8)
        self._listnos = np.empty(0, np.int32)
        self._ids = np.empty(0, np.int64)
        self.ntotal = 0


class IndexBinaryFromFloat(IndexBinary):
    """Wrap a float index to take binary codes (IndexBinaryFromFloat.h)."""

    def __init__(self, index: Index):
        super().__init__(index.d)
        self.index = index
        self.is_trained = index.is_trained

    def _to_float(self, x):
        return np.unpackbits(self._check(x), axis=1, bitorder="little").astype(
            np.float32
        )

    def train(self, x) -> None:
        self.index.train(self._to_float(x))
        self.is_trained = True

    def add(self, x) -> None:
        self.index.add(self._to_float(x))
        self.ntotal = self.index.ntotal

    def search(self, x, k: int):
        D, I = self.index.search(self._to_float(x), k)
        # float L2 on 0/1 vectors == hamming
        return np.round(D).astype(np.int32), I

    def reset(self) -> None:
        self.index.reset()
        self.ntotal = 0


class IndexBinaryHash(IndexBinary):
    """Prefix-bucket hash index (reference: IndexBinaryHash.h:26)."""

    def __init__(self, d: int, b: int):
        super().__init__(d)
        self.b = int(b)  # bits used as hash key
        self.nflip = 0  # hamming radius of probed buckets at search
        self._buckets = {}
        self._codes = np.empty((0, self.code_size), np.uint8)
        self._ids = np.empty(0, np.int64)

    def _key(self, code: np.ndarray) -> int:
        bits = np.unpackbits(code, bitorder="little")[: self.b]
        return int(bits @ (1 << np.arange(self.b, dtype=np.int64)))

    def add(self, x) -> None:
        x = self._check(x)
        base = self.ntotal
        for i, code in enumerate(x):
            self._buckets.setdefault(self._key(code), []).append(base + i)
        self._codes = np.concatenate([self._codes, x])
        self._ids = np.concatenate(
            [self._ids, np.arange(base, base + len(x), dtype=np.int64)]
        )
        self.ntotal += len(x)

    def _probe_keys(self, key: int):
        keys = [key]
        if self.nflip >= 1:
            keys += [key ^ (1 << i) for i in range(self.b)]
        if self.nflip >= 2:
            keys += [
                key ^ (1 << i) ^ (1 << j)
                for i in range(self.b)
                for j in range(i + 1, self.b)
            ]
        return keys

    def search(self, x, k: int):
        x = self._check(x)
        nq = len(x)
        D = np.full((nq, k), 2**31 - 1, np.int32)
        I = np.full((nq, k), -1, np.int64)
        qbits = np.unpackbits(x, axis=1, bitorder="little")
        bbits = np.unpackbits(self._codes, axis=1, bitorder="little")
        for q in range(nq):
            cand = []
            for key in self._probe_keys(self._key(x[q])):
                cand.extend(self._buckets.get(key, []))
            if not cand:
                continue
            cand = np.asarray(cand)
            d = (qbits[q][None] != bbits[cand]).sum(1)
            order = np.argsort(d, kind="stable")[:k]
            D[q, : len(order)] = d[order]
            I[q, : len(order)] = self._ids[cand[order]]
        return D, I

    def reset(self) -> None:
        self._buckets = {}
        self._codes = np.empty((0, self.code_size), np.uint8)
        self._ids = np.empty(0, np.int64)
        self.ntotal = 0


class IndexBinaryMultiHash(IndexBinaryHash):
    """Multiple hash tables on disjoint bit ranges (IndexBinaryHash.h:77)."""

    def __init__(self, d: int, nhash: int, b: int):
        super().__init__(d, b)
        self.nhash = int(nhash)
        self._tables = [{} for _ in range(nhash)]

    def _key_h(self, code: np.ndarray, h: int) -> int:
        bits = np.unpackbits(code, bitorder="little")
        sel = bits[h * self.b : (h + 1) * self.b]
        return int(sel @ (1 << np.arange(len(sel), dtype=np.int64)))

    def add(self, x) -> None:
        x = self._check(x)
        base = self.ntotal
        for i, code in enumerate(x):
            for h in range(self.nhash):
                self._tables[h].setdefault(self._key_h(code, h), []).append(
                    base + i
                )
        self._codes = np.concatenate([self._codes, x])
        self._ids = np.concatenate(
            [self._ids, np.arange(base, base + len(x), dtype=np.int64)]
        )
        self.ntotal += len(x)

    def search(self, x, k: int):
        x = self._check(x)
        nq = len(x)
        D = np.full((nq, k), 2**31 - 1, np.int32)
        I = np.full((nq, k), -1, np.int64)
        qbits = np.unpackbits(x, axis=1, bitorder="little")
        bbits = np.unpackbits(self._codes, axis=1, bitorder="little")
        for q in range(nq):
            cand = set()
            for h in range(self.nhash):
                cand.update(self._tables[h].get(self._key_h(x[q], h), []))
            if not cand:
                continue
            cand = np.asarray(sorted(cand))
            d = (qbits[q][None] != bbits[cand]).sum(1)
            order = np.argsort(d, kind="stable")[:k]
            D[q, : len(order)] = d[order]
            I[q, : len(order)] = self._ids[cand[order]]
        return D, I


class IndexBinaryHNSW(IndexBinary):
    """HNSW graph over binary codes (reference: IndexBinaryHNSW.h:21).

    The native HNSW graph operates on float vectors; binary codes embed as
    0/1 floats where squared L2 == Hamming distance, so graph semantics
    match the reference exactly (distances returned as int32 Hamming).
    """

    def __init__(self, d: int, M: int = 16):
        super().__init__(d)
        from .hnsw import IndexHNSWFlat

        self._impl = IndexHNSWFlat(d, M)
        self.hnsw = self._impl.hnsw
        self._codes = np.empty((0, self.code_size), np.uint8)

    def _to_float(self, x):
        return np.unpackbits(self._check(x), axis=1, bitorder="little").astype(
            np.float32
        )

    def add(self, x) -> None:
        x = self._check(x)
        self._impl.add(self._to_float(x))
        self._codes = np.concatenate([self._codes, x])
        self.ntotal = self._impl.ntotal

    def search(self, x, k: int):
        D, I = self._impl.search(self._to_float(x), k)
        return np.round(D).astype(np.int32), I

    def reconstruct(self, key: int) -> np.ndarray:
        return self._codes[key].copy()

    def reset(self) -> None:
        self._impl.reset()
        self._codes = self._codes[:0]
        self.ntotal = 0
