"""MultiIndexQuantizer (IMI) — analogue of faiss/IndexPQ.h MultiIndexQuantizer
(the inverted multi-index coarse quantizer, Babenko & Lempitsky).

The centroid set is the cartesian product of M sub-codebooks (ksub^M
virtual centroids); assignment searches each subspace independently and
selects the top-k TUPLE SUMS. Exactness of the generic-M merge: if a
tuple is in the global top-k, every prefix of it is in the top-k of
prefix sums (otherwise >=k prefix tuples beat that prefix, and extending
each with this tuple's own suffix yields >=k better full tuples) — so an
iterated candidates x next-side merge that keeps top-k per step is exact.
On TPU both stages are batched matmuls + k-selects; the reference instead
walks a per-query heap over the product lattice (IndexPQ.cpp
MinSumK) — sequential and host-bound, the opposite of what the MXU wants.
"""

from __future__ import annotations

import numpy as np

from ..base import Index
from ..codecs.pq import ProductQuantizer
from ..metric import MetricType


def _merge_topk_sums(cd, ci, d_next, i_next, k, mult):
    """Exact top-k over sums of candidate partials and one more side.

    cd/ci: [nq, c] partial sums + composite ids; d_next/i_next: [nq, t]
    next side's top-t; returns ([nq, k'], ids) with composite id
    ci * mult + i_next (k' = min(k, c*t)).
    """
    nq, c = cd.shape
    t = d_next.shape[1]
    sums = (cd[:, :, None] + d_next[:, None, :]).reshape(nq, c * t)
    kk = min(k, c * t)
    order = np.argsort(sums, axis=1, kind="stable")[:, :kk]
    D = np.take_along_axis(sums, order, axis=1)
    a = np.take_along_axis(ci, order // t, axis=1)
    b = np.take_along_axis(i_next, order % t, axis=1)
    return D, a * mult + b.astype(np.int64)


class MultiIndexQuantizer(Index):
    """reference: IndexPQ.h:150 MultiIndexQuantizer (generic M)."""

    def __init__(self, d: int, M: int = 2, nbits: int = 12):
        super().__init__(d, MetricType.L2)
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

    def _side_topk(self, x, t):
        """Per-subspace top-t (distances, ids): exhaustive table scan."""
        tabs = self.pq.compute_distance_tables(x)  # [nq, M, ksub]
        ds, is_ = [], []
        for m in range(self.pq.M):
            o = np.argsort(tabs[:, m, :], axis=1, kind="stable")[:, :t]
            ds.append(np.take_along_axis(tabs[:, m, :], o, axis=1))
            is_.append(o)
        return ds, is_

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        self._check_trained()
        ksub, M = self.pq.ksub, self.pq.M
        t = min(k, ksub)
        ds, is_ = self._side_topk(x, t)
        # reference cell numbering: sub 0 is the LEAST significant digit
        # (IndexPQ.cpp:872 reconstruct unpacks key low-bits-first), so merge
        # sides high-to-low
        cd, ci = ds[M - 1], is_[M - 1].astype(np.int64)
        for m in range(M - 2, -1, -1):
            cd, ci = _merge_topk_sums(cd, ci, ds[m], is_[m], k, ksub)
        D, I = cd.astype(np.float32), ci
        if k > I.shape[1]:  # k exceeds ksub^M reachable tuples
            pad = k - I.shape[1]
            D = np.pad(D, ((0, 0), (0, pad)), constant_values=np.inf)
            I = np.pad(I, ((0, 0), (0, pad)), constant_values=-1)
        return D, I

    def reconstruct(self, key: int) -> np.ndarray:
        ksub, M = self.pq.ksub, self.pq.M
        code = []
        for _ in range(M):  # sub 0 = least significant digit (reference order)
            code.append(key % ksub)
            key //= ksub
        codes = np.array([code], np.uint16)
        return self.pq.decode_int(codes)[0]

    def vectors(self) -> np.ndarray:
        """Materialized centroid table (only sensible for small nbits)."""
        ksub, M = self.pq.ksub, self.pq.M
        n = ksub ** M
        if n > 1 << 20:
            raise MemoryError("IMI centroid table too large to materialize")
        out = np.zeros((n, self.d), np.float32)
        dsub = self.d // M
        for m in range(M):
            reps = ksub ** m  # digit m has weight ksub^m (sub 0 fastest)
            tiles = ksub ** (M - 1 - m)
            block = np.tile(np.repeat(self.pq.centroids[m], reps, axis=0),
                            (tiles, 1))
            out[:, m * dsub:(m + 1) * dsub] = block
        return out

    def reset(self) -> None:
        pass


class MultiIndexQuantizer2(MultiIndexQuantizer):
    """reference: IndexPQ.h:170 MultiIndexQuantizer2.

    Same virtual-centroid product lattice, but the per-subspace top-t
    assignment is delegated to user-provided sub-indexes (typically
    approximate, e.g. HNSW over each sub-codebook) instead of the
    exhaustive table scan — the merge stage is unchanged. Exactness then
    holds relative to what the sub-indexes return.
    """

    def __init__(self, d: int, nbits: int, *assign_indexes):
        M = len(assign_indexes)
        if M < 2:
            raise ValueError("MultiIndexQuantizer2 needs >=2 assign indexes")
        super().__init__(d, M, nbits)
        dsub = d // M
        for sub in assign_indexes:
            if sub.d != dsub:
                raise ValueError(f"assign index d={sub.d} != dsub={dsub}")
        self.assign_indexes = list(assign_indexes)
        self.own_fields = True

    def train(self, x) -> None:
        super().train(x)
        dsub = self.d // self.pq.M
        for m, sub in enumerate(self.assign_indexes):
            sub.reset()
            if not sub.is_trained:
                sub.train(self.pq.centroids[m].reshape(-1, dsub))
            sub.add(self.pq.centroids[m].reshape(-1, dsub))

    def _side_topk(self, x, t):
        dsub = self.d // self.pq.M
        ds, is_ = [], []
        for m, sub in enumerate(self.assign_indexes):
            dm, im = sub.search(
                np.ascontiguousarray(x[:, m * dsub:(m + 1) * dsub]), t)
            # missing entries (-1) must never win the merge
            dm = np.where(im < 0, np.inf, dm.astype(np.float64))
            ds.append(dm)
            is_.append(np.maximum(im, 0).astype(np.int64))
        return ds, is_
