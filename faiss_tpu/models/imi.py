"""MultiIndexQuantizer (IMI) — analogue of faiss/IndexPQ.h MultiIndexQuantizer
(the inverted multi-index coarse quantizer, Babenko & Lempitsky).

The centroid set is the cartesian product of M=2 sub-codebooks (ksub^2
virtual centroids); assignment searches each subspace independently and
selects the top-k PAIR SUMS. Exactness: any top-k pair has each component
in its side's top-k, so per-side top-k + an outer sum + reselect is exact.
On TPU both stages are batched matmuls + k-selects.
"""

from __future__ import annotations

import numpy as np

from ..base import Index
from ..codecs.pq import ProductQuantizer
from ..metric import MetricType


class MultiIndexQuantizer(Index):
    """reference: IndexPQ.h:150 MultiIndexQuantizer."""

    def __init__(self, d: int, M: int = 2, nbits: int = 12):
        super().__init__(d, MetricType.L2)
        if M != 2:
            raise NotImplementedError("IMI with M != 2 is not supported")
        self.pq = ProductQuantizer(d, M, nbits)
        self.is_trained = False
        self.ntotal = 0  # set after train: ksub^M virtual centroids

    def train(self, x) -> None:
        x = self._check_input(x)
        self.pq.train(x)
        self.is_trained = True
        self.ntotal = self.pq.ksub ** self.pq.M

    def add(self, x) -> None:
        raise RuntimeError("MultiIndexQuantizer has virtual centroids; "
                           "add() is not supported (reference behavior)")

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        self._check_trained()
        nq = len(x)
        ksub = self.pq.ksub
        tabs = self.pq.compute_distance_tables(x)  # [nq, 2, ksub]
        t = min(k, ksub)
        # per-side exact top-t
        i0 = np.argsort(tabs[:, 0, :], axis=1, kind="stable")[:, :t]
        i1 = np.argsort(tabs[:, 1, :], axis=1, kind="stable")[:, :t]
        d0 = np.take_along_axis(tabs[:, 0, :], i0, axis=1)
        d1 = np.take_along_axis(tabs[:, 1, :], i1, axis=1)
        sums = d0[:, :, None] + d1[:, None, :]  # [nq, t, t]
        flat = sums.reshape(nq, t * t)
        order = np.argsort(flat, axis=1, kind="stable")[:, :k]
        D = np.take_along_axis(flat, order, axis=1).astype(np.float32)
        a = np.take_along_axis(i0, order // t, axis=1)
        b = np.take_along_axis(i1, order % t, axis=1)
        # centroid id = code0 * ksub + code1 (the IMI cell numbering)
        I = (a.astype(np.int64) * ksub + b).astype(np.int64)
        if k > t * t:
            pad = k - t * t
            D = np.pad(D, ((0, 0), (0, pad)), constant_values=np.inf)
            I = np.pad(I, ((0, 0), (0, pad)), constant_values=-1)
        return D, I

    def reconstruct(self, key: int) -> np.ndarray:
        ksub = self.pq.ksub
        codes = np.array([[key // ksub, key % ksub]], np.uint16)
        return self.pq.decode_int(codes)[0]

    def vectors(self) -> np.ndarray:
        """Materialized centroid table (only sensible for small nbits)."""
        ksub = self.pq.ksub
        if ksub * ksub > 1 << 20:
            raise MemoryError("IMI centroid table too large to materialize")
        c0, c1 = self.pq.centroids[0], self.pq.centroids[1]
        out = np.zeros((ksub * ksub, self.d), np.float32)
        half = self.d // 2
        out[:, :half] = np.repeat(c0, ksub, axis=0)
        out[:, half:] = np.tile(c1, (ksub, 1))
        return out

    def reset(self) -> None:
        pass
