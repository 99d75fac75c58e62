"""NSG indexes — analogue of faiss/IndexNSG.{h,cpp} + impl/NSG.{h,cpp} +
impl/NNDescent.{h,cpp}.

Graph construction (NN-descent kNN bootstrap + MRNG pruning + spanning
connectivity) and beam search live in native C++ (native/nsg.cpp), the same
host-side placement the reference uses — graph walks don't belong on a TPU.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from ..base import Index
from ..metric import MetricType

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    nd = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "native"))
    so = os.path.join(nd, "libnsg.so")
    src = os.path.join(nd, "nsg.cpp")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
             os.path.join(nd, "nsg.cpp"), "-o", so],
            check=True,
        )
    lib = ctypes.CDLL(so)
    c = ctypes
    lib.nsg_new.restype = c.c_void_p
    lib.nsg_new.argtypes = [c.c_int, c.c_int]
    lib.nsg_free.argtypes = [c.c_void_p]
    lib.nsg_ntotal.restype = c.c_int64
    lib.nsg_ntotal.argtypes = [c.c_void_p]
    lib.nsg_enterpoint.restype = c.c_int64
    lib.nsg_enterpoint.argtypes = [c.c_void_p]
    lib.nsg_build.restype = c.c_int
    lib.nsg_stats_get.argtypes = [c.POINTER(c.c_longlong)]
    lib.nsg_stats_reset.argtypes = []
    lib.nsg_set_interrupt.argtypes = [c.c_int]
    lib.nsg_build.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.c_int64, c.c_int, c.c_int, c.c_int,
    ]
    lib.nsg_search.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.c_int64, c.c_int64, c.c_int,
        c.POINTER(c.c_float), c.POINTER(c.c_int64),
    ]
    lib.nsg_get_graph.argtypes = [c.c_void_p, c.POINTER(c.c_int64)]
    lib.nsg_get_vecs.argtypes = [c.c_void_p, c.POINTER(c.c_float)]
    lib.nsg_import.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.c_int64, c.POINTER(c.c_int64),
        c.c_int64,
    ]
    _LIB = lib
    return lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class NSGStats:
    """Build/search distance-eval counter (hnsw_stats analogue for the
    native NSG component)."""

    def __init__(self):
        self.ndis = 0

    def sync(self) -> "NSGStats":
        if _LIB is not None:
            buf = (ctypes.c_longlong * 1)()
            _LIB.nsg_stats_get(buf)
            self.ndis = int(buf[0])
        return self

    def reset(self) -> None:
        if _LIB is not None:
            _LIB.nsg_stats_reset()
        self.ndis = 0


nsg_stats = NSGStats()


class IndexNSGFlat(Index):
    """NSG over raw vectors (reference: IndexNSG.h:23, IndexNSGFlat).

    The reference builds NSG in one shot from the full database (add must
    receive all vectors at once, IndexNSG.cpp) — same constraint here.
    """

    def __init__(self, d: int, R: int = 32, metric=MetricType.L2):
        if metric != MetricType.L2:
            raise ValueError("NSG supports L2 (like the reference default)")
        super().__init__(d, metric)
        self.R = int(R)
        self.GK = 64  # knn-graph degree for NN-descent (IndexNSG.h GK)
        self.nndescent_iter = 8
        self.build_L = 64
        self.search_L = 16  # reference: nsg.search_L
        self._g = None
        self._lib = None

    def _ensure(self):
        if self._g is None:
            self._lib = _load_lib()
            self._g = self._lib.nsg_new(self.d, self.R)
        return self._g

    def add(self, x) -> None:
        x = self._check_input(x)
        if self.ntotal:
            raise RuntimeError(
                "IndexNSG must be built in one add() call (reference "
                "IndexNSG.cpp has the same constraint)"
            )
        g = self._ensure()
        from .hnsw import _watch_interrupt

        rc = _watch_interrupt(
            self._lib.nsg_set_interrupt,
            lambda: self._lib.nsg_build(
                g, _fp(x), len(x), self.GK, self.nndescent_iter,
                self.build_L,
            ),
        )
        nsg_stats.sync()
        if rc != 0:
            from ..callbacks import InterruptedException

            self.reset()
            raise InterruptedException("NSG build interrupted")
        self._xb = x.copy()
        self.ntotal = len(x)

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        L = self.search_L
        if params is not None and getattr(params, "search_L", 0):
            L = params.search_L
        nq = len(x)
        D = np.full((nq, k), np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        if self.ntotal == 0:
            return D, I
        self._lib.nsg_search(self._g, _fp(x), nq, k, max(L, k), _fp(D), _ip64(I))
        return D, I

    def reconstruct(self, key: int) -> np.ndarray:
        return self._xb[key].copy()

    def reconstruct_n(self, n0, ni):
        return self._xb[n0 : n0 + ni].copy()

    def reset(self) -> None:
        if self._g is not None:
            self._lib.nsg_free(self._g)
            self._g = None
        self.ntotal = 0

    # serialization hooks
    def graph_state(self):
        if self._g is None:
            return None
        graph = np.empty(self.ntotal * self.R, np.int64)
        self._lib.nsg_get_graph(self._g, _ip64(graph))
        return {
            "graph": graph,
            "enterpoint": int(self._lib.nsg_enterpoint(self._g)),
            "R": self.R,
            "search_L": self.search_L,
        }

    def restore_graph(self, state, xb) -> None:
        self.R = int(state["R"])
        self.search_L = int(state["search_L"])
        g = self._ensure()
        xb = np.ascontiguousarray(xb, np.float32)
        graph = np.ascontiguousarray(state["graph"], np.int64)
        self._lib.nsg_import(g, _fp(xb), len(xb), _ip64(graph), state["enterpoint"])
        self._xb = xb
        self.ntotal = len(xb)


class IndexNNDescentFlat(IndexNSGFlat):
    """Raw NN-descent kNN-graph index (reference: IndexNNDescent.h).

    Uses the same native machinery with pruning disabled-ish: R = GK and the
    NSG prune keeps closest candidates, which reduces to the kNN graph when
    the MRNG rule rarely rejects — adequate parity for the search API.
    """

    def __init__(self, d: int, K: int = 32, metric=MetricType.L2):
        super().__init__(d, K, metric)
        self.GK = max(K, 32)


class IndexNSGPQ(IndexNSGFlat):
    """NSG graph over PQ-coded storage (reference: IndexNSG.h:89).

    Graph construction AND search run on the DECODED reconstructions, so
    reported distances are the asymmetric ADC distances
    ||q - decode(code)||^2 — the same distances the reference's storage
    DistanceComputer produces; only codes + graph need persisting."""

    def __init__(self, d: int, pq_m: int, R: int = 32, pq_nbits: int = 8):
        from .pq import IndexPQ

        super().__init__(d, R)
        self.storage = IndexPQ(d, pq_m, pq_nbits)
        self.is_trained = False

    def train(self, x) -> None:
        x = self._check_input(x)
        self.storage.train(x)
        self.is_trained = True

    def add(self, x) -> None:
        x = self._check_input(x)
        self._check_trained()
        if self.ntotal:
            raise RuntimeError("IndexNSG must be built in one add() call")
        self.storage.add(x)
        xr = self.storage.reconstruct_n(0, self.storage.ntotal)
        g = self._ensure()
        from .hnsw import _watch_interrupt

        xr = np.ascontiguousarray(xr, np.float32)
        rc = _watch_interrupt(
            self._lib.nsg_set_interrupt,
            lambda: self._lib.nsg_build(
                g, _fp(xr), len(xr), self.GK, self.nndescent_iter,
                self.build_L,
            ),
        )
        nsg_stats.sync()
        if rc != 0:
            from ..callbacks import InterruptedException

            self.reset()
            # also drop the encoded batch: the ntotal==0 guard would let a
            # retry re-encode it on top, duplicating every vector
            self.storage.reset()
            raise InterruptedException("NSG build interrupted")
        self._xb = xr
        self.ntotal = len(xr)

    def reconstruct(self, key: int) -> np.ndarray:
        return self.storage.reconstruct(key)


class IndexNSGSQ(IndexNSGPQ):
    """NSG graph over SQ-coded storage (reference: IndexNSG.h:98)."""

    def __init__(self, d: int, qtype, R: int = 32, metric=MetricType.L2):
        from .sq import IndexScalarQuantizer

        IndexNSGFlat.__init__(self, d, R, metric)
        self.storage = IndexScalarQuantizer(d, qtype, metric)
        self.is_trained = self.storage.is_trained
