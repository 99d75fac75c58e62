"""Standalone numpy-facing ops — analogue of faiss/python/extra_wrappers.py.

knn / knn_hamming / pairwise_distances / kmin / kmax / bucket_sort /
merge_knn_results / ResultHeap / pack_bitstrings — the utility surface the
reference exposes without an Index object.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .metric import MetricType, is_similarity_metric
from .ops import distances as dops
from .ops import hamming as hops
from .ops.topk import merge_topk_many, topk


def knn(
    xq, xb, k: int, metric=MetricType.L2, metric_arg: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Brute-force k-NN (reference: extra_wrappers.py:363 knn)."""
    xq = np.ascontiguousarray(xq, np.float32)
    xb = np.ascontiguousarray(xb, np.float32)
    D, I = dops.knn(
        jnp.asarray(xq), jnp.asarray(xb), k, metric=MetricType(metric),
        metric_arg=metric_arg,
    )
    return np.asarray(D), np.asarray(I).astype(np.int64)


def knn_hamming(xq, xb, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """reference: extra_wrappers.py:422."""
    return hops.hamming_knn_host(
        np.ascontiguousarray(xq, np.uint8), np.ascontiguousarray(xb, np.uint8), k
    )


def pairwise_distances(
    xq, xb, metric=MetricType.L2, metric_arg: float = 0.0
) -> np.ndarray:
    """reference: extra_wrappers.py:61 pairwise_distances."""
    return np.asarray(
        dops.pairwise_distances(
            jnp.asarray(np.ascontiguousarray(xq, np.float32)),
            jnp.asarray(np.ascontiguousarray(xb, np.float32)),
            MetricType(metric),
            metric_arg,
        )
    )


def pairwise_distance_gpu(*a, **kw):  # API parity with gpu_wrappers
    return pairwise_distances(*a, **kw)


knn_gpu = knn  # API parity: everything runs on the accelerator here


def kmin(D, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Row-wise k smallest (reference: extra_wrappers.py:25)."""
    v, i = topk(jnp.asarray(np.ascontiguousarray(D, np.float32)), k, largest=False)
    return np.asarray(v), np.asarray(i).astype(np.int64)


def kmax(D, k: int) -> Tuple[np.ndarray, np.ndarray]:
    v, i = topk(jnp.asarray(np.ascontiguousarray(D, np.float32)), k, largest=True)
    return np.asarray(v), np.asarray(i).astype(np.int64)


def merge_knn_results(Dall, Iall, keep_max: bool = False):
    """Merge [nshard, nq, k] result tables (extra_wrappers.py:294)."""
    Dall = np.ascontiguousarray(Dall, np.float32)
    Iall = np.ascontiguousarray(Iall, np.int64)
    nshard, nq, k = Dall.shape
    # merge via k-select on int32 positions, then map back to original int64
    # ids (ids may exceed int32 range)
    flatD = np.moveaxis(Dall, 0, 1).reshape(nq, nshard * k)
    pos = jnp.asarray(
        np.broadcast_to(np.arange(nshard * k, dtype=np.int32), (nq, nshard * k))
    )
    v, p = topk(jnp.asarray(flatD), k, largest=keep_max)
    p = np.asarray(p)
    flatI = np.moveaxis(Iall, 0, 1).reshape(nq, nshard * k)
    return np.asarray(v), np.take_along_axis(flatI, p.astype(np.int64), axis=1)


def diversity_select(D, I, id_to_group, k: int, max_per_group: int):
    """Group-capped top-k from sorted candidate lists — the batched
    TPU-native analogue of the reference diversity result handler
    (demos/diversity_filter/diversity_result_handler.h:21): keep the best
    ``k`` results per query with at most ``max_per_group`` from any group.

    ``D``/``I`` are distance-sorted candidate tables [nq, kc] (kc >= k);
    ``id_to_group`` maps database ids to int group labels. Where the
    reference filters during the scan (a stateful O(k) bubble handler per
    result), here the scan stays a dense fused kernel and the cap is a
    vectorized post-pass over its top-kc — same output whenever every
    query has k group-capped results within its kc candidates (see
    ``diversity_search`` for the adaptive-kc exact wrapper).

    Returns (D_out [nq, k], I_out [nq, k], n_valid [nq]); unfilled slots
    hold inf/-1.
    """
    D = np.ascontiguousarray(D, np.float32)
    I = np.ascontiguousarray(I, np.int64)
    nq, kc = I.shape
    id_to_group = np.asarray(id_to_group)
    g = np.where(I >= 0, id_to_group[np.maximum(I, 0)], -1).astype(np.int64)
    # per-row running count of each group along the sorted order:
    # stable-sort columns by group, cumcount within runs, scatter back
    ordg = np.argsort(g, axis=1, kind="stable")
    gs = np.take_along_axis(g, ordg, axis=1)
    pos = np.broadcast_to(np.arange(kc), (nq, kc))
    run_start = np.where(
        np.concatenate(
            [np.ones((nq, 1), bool), gs[:, 1:] != gs[:, :-1]], axis=1
        ),
        pos, 0,
    )
    run_start = np.maximum.accumulate(run_start, axis=1)
    cumcount = np.empty((nq, kc), np.int64)
    np.put_along_axis(cumcount, ordg, pos - run_start, axis=1)
    keep = (cumcount < max_per_group) & (I >= 0)
    rank = np.cumsum(keep, axis=1) - 1
    take = keep & (rank < k)
    D_out = np.full((nq, k), np.inf, np.float32)
    I_out = np.full((nq, k), -1, np.int64)
    r, c = np.nonzero(take)
    D_out[r, rank[r, c]] = D[r, c]
    I_out[r, rank[r, c]] = I[r, c]
    return D_out, I_out, np.minimum(np.sum(keep, axis=1), k)


def diversity_search(index, xq, k: int, id_to_group, max_per_group: int,
                     fetch_factor: int = 4):
    """Exact group-capped search: over-fetch ``fetch_factor * k``
    candidates from ``index`` and apply :func:`diversity_select`, doubling
    the over-fetch for any query that could not fill k slots until it can
    or the whole database has been ranked. On an exact base index this
    returns exactly what the reference's scan-time diversity handler
    returns (demos/diversity_filter/demo_diversity_result_handler.cpp)."""
    xq = np.ascontiguousarray(xq, np.float32)
    kc = min(max(k, fetch_factor * k), max(index.ntotal, 1))
    D, I = index.search(xq, kc)
    D_out, I_out, n_valid = diversity_select(D, I, id_to_group, k, max_per_group)
    while kc < index.ntotal:
        short = np.nonzero(n_valid < k)[0]
        if len(short) == 0:
            break
        kc = min(kc * 2, index.ntotal)
        Ds, Is = index.search(xq[short], kc)
        Do, Io, nv = diversity_select(Ds, Is, id_to_group, k, max_per_group)
        D_out[short], I_out[short], n_valid[short] = Do, Io, nv
    return D_out, I_out


def bucket_sort(tab, nbucket: Optional[int] = None, nt: int = 0):
    """Counting sort: returns (lims, perm) (extra_wrappers.py:154)."""
    tab = np.asarray(tab).ravel()
    if nbucket is None:
        nbucket = int(tab.max()) + 1 if len(tab) else 0
    lims = np.zeros(nbucket + 1, np.int64)
    np.add.at(lims[1:], tab, 1)
    np.cumsum(lims, out=lims)
    perm = np.argsort(tab, kind="stable").astype(np.int64)
    return lims, perm


def matrix_bucket_sort_inplace(tab, nbucket: Optional[int] = None, nt: int = 0):
    """Row-id bucket sort (extra_wrappers.py matrix_bucket_sort_inplace):
    returns lims; tab is overwritten with row indices grouped by value."""
    tab = np.asarray(tab)
    nrow, ncol = tab.shape
    vals = tab.ravel()
    if nbucket is None:
        nbucket = int(vals.max()) + 1
    order = np.argsort(vals, kind="stable")
    rows = (order // ncol).astype(tab.dtype)
    lims = np.zeros(nbucket + 1, np.int64)
    np.add.at(lims[1:], vals, 1)
    np.cumsum(lims, out=lims)
    tab.ravel()[:] = rows
    return lims


class ResultHeap:
    """Accumulate knn results over database chunks
    (reference: extra_wrappers.py:231)."""

    def __init__(self, nq: int, k: int, keep_max: bool = False):
        self.nq, self.k, self.keep_max = nq, k, keep_max
        fill = -np.inf if keep_max else np.inf
        self.D = np.full((nq, k), fill, np.float32)
        self.I = np.full((nq, k), -1, np.int64)

    def add_result(self, D, I) -> None:
        Dc = np.concatenate([self.D, D.astype(np.float32)], axis=1)
        Ic = np.concatenate([self.I, I.astype(np.int64)], axis=1)
        order = np.argsort(-Dc if self.keep_max else Dc, axis=1, kind="stable")
        order = order[:, : self.k]
        self.D = np.take_along_axis(Dc, order, axis=1)
        self.I = np.take_along_axis(Ic, order, axis=1)

    def finalize(self) -> None:
        pass  # results kept sorted incrementally


def pack_bitstrings(a, nbit: int) -> np.ndarray:
    """[n, M] ints -> packed bitstrings (extra_wrappers.py:715)."""
    a = np.ascontiguousarray(a, np.uint64)
    n, M = a.shape
    code_size = (M * nbit + 7) // 8
    out = np.zeros((n, code_size), np.uint8)
    bit = 0
    for m in range(M):
        for b in range(nbit):
            byte, off = divmod(bit, 8)
            out[:, byte] |= (((a[:, m] >> b) & 1) << off).astype(np.uint8)
            bit += 1
    return out


def unpack_bitstrings(codes, M: int, nbit: int) -> np.ndarray:
    codes = np.ascontiguousarray(codes, np.uint8)
    n = len(codes)
    out = np.zeros((n, M), np.uint64)
    bit = 0
    for m in range(M):
        for b in range(nbit):
            byte, off = divmod(bit, 8)
            out[:, m] |= ((codes[:, byte] >> off) & 1).astype(np.uint64) << b
            bit += 1
    return out


def rand(n, seed: int = 12345) -> np.ndarray:
    return np.random.RandomState(seed).rand(n).astype(np.float32)


def randn(n, seed: int = 12345) -> np.ndarray:
    return np.random.RandomState(seed).randn(n).astype(np.float32)


def randint(n, seed: int = 12345, vmax: int = 2**31 - 1) -> np.ndarray:
    return np.random.RandomState(seed).randint(vmax, size=n).astype(np.int64)
