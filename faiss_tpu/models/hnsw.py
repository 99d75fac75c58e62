"""HNSW indexes — analogue of faiss/IndexHNSW.{h,cpp} + impl/HNSW.{h,cpp}.

Graph construction and traversal are sequential pointer-chasing — the one
workload that belongs on the host, so (like the reference) the graph lives
in native C++ (native/hnsw.cpp, built to libhnsw.so and bound via ctypes).
The storage codec (Flat/PQ/SQ) follows the reference's IndexHNSW design:
the graph ranks by exact float distance on raw vectors fed at add time;
reconstruction goes through the storage index.

efConstruction/efSearch semantics follow impl/HNSW.h:139-142.
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


def _native_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.abspath(os.path.join(_native_dir(), "libhnsw.so"))
    src = os.path.abspath(os.path.join(_native_dir(), "hnsw.cpp"))
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
             src, "-o", so],
            check=True,
        )
    lib = ctypes.CDLL(so)
    lib.hnsw_new.restype = ctypes.c_void_p
    lib.hnsw_new.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
    ]
    lib.hnsw_free.argtypes = [ctypes.c_void_p]
    lib.hnsw_ntotal.restype = ctypes.c_int64
    lib.hnsw_ntotal.argtypes = [ctypes.c_void_p]
    lib.hnsw_add.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.hnsw_add.restype = ctypes.c_int64
    lib.hnsw_stats_get.argtypes = [ctypes.POINTER(ctypes.c_longlong)]
    lib.hnsw_stats_reset.argtypes = []
    lib.hnsw_set_interrupt.argtypes = [ctypes.c_int]
    lib.hnsw_search.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.hnsw_max_level.restype = ctypes.c_int
    lib.hnsw_max_level.argtypes = [ctypes.c_void_p]
    lib.hnsw_entry_point.restype = ctypes.c_int64
    lib.hnsw_entry_point.argtypes = [ctypes.c_void_p]
    lib.hnsw_get_levels.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
    lib.hnsw_neighbor_bytes.restype = ctypes.c_int64
    lib.hnsw_neighbor_bytes.argtypes = [ctypes.c_void_p]
    lib.hnsw_get_neighbors.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.hnsw_get_vecs.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.hnsw_import.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int,
    ]
    lib.hnsw_set_pano.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _LIB = lib
    return lib


def _fp(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class HNSW:
    """Parameter bag mirroring impl/HNSW.h knobs."""

    def __init__(self, M: int = 32):
        self.M = M
        self.efConstruction = 40
        self.efSearch = 16
        self.max_level = -1
        self.entry_point = -1


class HNSWStats:
    """Search counters (reference: impl/HNSW.h:260 HNSWStats; the global
    ``hnsw_stats`` singleton mirrors faiss.cvar.hnsw_stats). Counters live
    in the native library; ``sync()`` snapshots them into the fields."""

    def __init__(self):
        self.n1 = 0  # searches run
        self.ndis = 0  # distance evaluations (level-0 beam visits)
        self.nhops = 0  # beam-search expansions

    def sync(self) -> "HNSWStats":
        if _LIB is not None:
            buf = (ctypes.c_longlong * 3)()
            _LIB.hnsw_stats_get(buf)
            self.n1, self.ndis, self.nhops = (
                int(buf[0]), int(buf[1]), int(buf[2])
            )
        return self

    def reset(self) -> None:
        if _LIB is not None:
            _LIB.hnsw_stats_reset()
        self.n1 = self.ndis = self.nhops = 0


hnsw_stats = HNSWStats()


def _watch_interrupt(set_fn, call):
    """Run ``call()`` (a GIL-releasing ctypes call) while a watchdog
    thread polls InterruptCallback and forwards interruption into the
    native loop — the ctypes equivalent of the reference's per-loop
    InterruptCallback::check() polling (AuxIndexStructures.h:138)."""
    import threading

    from ..callbacks import InterruptCallback

    stop = threading.Event()

    def watch():
        while not stop.wait(0.05):
            if InterruptCallback.is_interrupted():
                set_fn(1)
                return

    t = threading.Thread(target=watch, daemon=True)
    t.start()
    try:
        return call()
    finally:
        stop.set()
        t.join(timeout=0.5)
        set_fn(0)


class IndexHNSW(Index):
    """HNSW over a storage index (reference: IndexHNSW.h:24)."""

    def __init__(self, storage: Index, M: int = 32):
        super().__init__(storage.d, storage.metric_type)
        self.storage = storage
        self.hnsw = HNSW(M)
        self.own_fields = False
        self.is_trained = storage.is_trained
        self._graph = None
        self._xb_host = []  # raw vectors retained for graph distances

    def _ensure_graph(self):
        if self._graph is None:
            lib = _load_lib()
            metric = 1 if self.metric_type == MetricType.L2 else 0
            self._graph = lib.hnsw_new(
                self.d, self.hnsw.M, self.hnsw.efConstruction, metric, 1234
            )
            self._lib = lib
        return self._graph

    def train(self, x) -> None:
        self.storage.train(x)
        self.is_trained = True

    def add(self, x) -> None:
        x = self._check_input(x)
        self._check_trained()
        g = self._ensure_graph()
        # efConstruction may have been changed after init; re-create not
        # needed — the native side reads it at hnsw_new; reference allows
        # changing it between adds, we approximate by rebuilding if empty.
        added = _watch_interrupt(
            self._lib.hnsw_set_interrupt,
            lambda: self._lib.hnsw_add(g, _fp(x), len(x)),
        )
        if added < len(x):
            from ..callbacks import InterruptedException

            self.storage.add(x[:added])
            self.ntotal = self.storage.ntotal
            raise InterruptedException(
                f"HNSW add interrupted after {added}/{len(x)} nodes"
            )
        self.storage.add(x)
        self.ntotal = self.storage.ntotal

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        ef = self.hnsw.efSearch
        if params is not None and getattr(params, "efSearch", 0):
            ef = params.efSearch
        nq = len(x)
        D = np.empty((nq, k), np.float32)
        I = np.empty((nq, k), np.int64)
        if self.ntotal == 0:
            D.fill(np.inf if self.metric_type == MetricType.L2 else -np.inf)
            I.fill(-1)
            return D, I
        self._lib.hnsw_search(
            self._graph,
            _fp(x),
            nq,
            k,
            max(ef, k),
            _fp(D),
            I.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        hnsw_stats.sync()
        return D, I

    def reconstruct(self, key: int) -> np.ndarray:
        return self.storage.reconstruct(key)

    def reconstruct_n(self, n0, ni):
        return self.storage.reconstruct_n(n0, ni)

    def vectors(self) -> np.ndarray:
        """Stored vectors (decoded). Lets an IndexHNSW serve as an IVF
        coarse quantizer (reference factory `IVFx_HNSWy` grammar,
        index_factory.cpp parse_coarse_quantizer)."""
        return np.ascontiguousarray(
            self.reconstruct_n(0, self.ntotal), np.float32
        )

    def reset(self) -> None:
        if self._graph is not None:
            self._lib.hnsw_free(self._graph)
            self._graph = None
        self.storage.reset()
        self.ntotal = 0

    # -- graph (de)serialization hooks used by io.py --------------------------
    def graph_state(self):
        if self._graph is None or self.ntotal == 0:
            return None
        lib = self._lib
        levels = np.empty(self.ntotal, np.int32)
        lib.hnsw_get_levels(
            self._graph, levels.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
        )
        nbytes = lib.hnsw_neighbor_bytes(self._graph)
        neigh = np.empty(nbytes // 8, np.int64)
        lib.hnsw_get_neighbors(
            self._graph, neigh.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        )
        vecs = np.empty((self.ntotal, self.d), np.float32)
        lib.hnsw_get_vecs(self._graph, _fp(vecs))
        return {
            "vecs": vecs,
            "levels": levels,
            "neighbors": neigh,
            "entry_point": int(lib.hnsw_entry_point(self._graph)),
            "max_level": int(lib.hnsw_max_level(self._graph)),
            "M": self.hnsw.M,
            "efConstruction": self.hnsw.efConstruction,
            "efSearch": self.hnsw.efSearch,
        }

    def restore_graph(self, state, xb: np.ndarray) -> None:
        self.hnsw.M = int(state["M"])
        self.hnsw.efConstruction = int(state["efConstruction"])
        self.hnsw.efSearch = int(state["efSearch"])
        g = self._ensure_graph()
        xb = np.ascontiguousarray(xb, np.float32)
        levels = np.ascontiguousarray(state["levels"], np.int32)
        neigh = np.ascontiguousarray(state["neighbors"], np.int64)
        self._lib.hnsw_import(
            g,
            _fp(xb),
            len(xb),
            levels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            neigh.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            state["entry_point"],
            state["max_level"],
        )
        self.ntotal = len(xb)


class IndexHNSWFlat(IndexHNSW):
    """reference: IndexHNSW.h IndexHNSWFlat."""

    def __init__(self, d: int, M: int = 32, metric=MetricType.L2):
        from .flat import IndexFlat

        super().__init__(IndexFlat(d, metric), M)


class IndexHNSWFlatPanorama(IndexHNSWFlat):
    """HNSW with Panorama progressive distance refinement
    (reference: IndexHNSW.h:171 IndexHNSWFlatPanorama).

    Level-0 beam distances evaluate dimension blocks progressively and
    prune a candidate as soon as the Cauchy-Schwarz lower bound on its
    remaining dimensions exceeds the beam threshold — effective when the
    data concentrates energy in early dimensions (post-PCA, high d). As
    the reference documents, recall is not guaranteed identical to vanilla
    HNSW (pruned candidates also leave the traversal beam)."""

    def __init__(self, d: int, M: int = 32, num_panorama_levels: int = 8,
                 metric=MetricType.L2):
        super().__init__(d, M, metric)
        self.num_panorama_levels = int(num_panorama_levels)

    def _ensure_graph(self):
        fresh = self._graph is None
        g = super()._ensure_graph()
        if fresh:
            self._lib.hnsw_set_pano(g, self.num_panorama_levels)
        return g

    def graph_state(self):
        state = super().graph_state()
        if state is not None:
            state["pano_levels"] = self.num_panorama_levels
        return state

    def restore_graph(self, state, xb) -> None:
        self.num_panorama_levels = int(state.get("pano_levels", 8))
        super().restore_graph(state, xb)


class IndexHNSWPQ(IndexHNSW):
    """HNSW graph + PQ storage (reference: IndexHNSW.h IndexHNSWPQ)."""

    def __init__(self, d: int, M: int = 32, pq_m: int = 8, pq_nbits: int = 8):
        from .pq import IndexPQ

        super().__init__(IndexPQ(d, pq_m, pq_nbits), M)
        self.is_trained = False


class IndexHNSWSQ(IndexHNSW):
    """HNSW graph + SQ storage (reference: IndexHNSW.h IndexHNSWSQ)."""

    def __init__(self, d: int, qtype, M: int = 32, metric=MetricType.L2):
        from .sq import IndexScalarQuantizer

        super().__init__(IndexScalarQuantizer(d, qtype, metric), M)
        self.is_trained = self.storage.is_trained


class SearchParametersHNSW:
    """reference: IndexHNSW.h SearchParametersHNSW."""

    def __init__(self, efSearch: int = 16, sel=None):
        self.efSearch = efSearch
        self.sel = sel


class IndexHNSW2Level(IndexHNSW):
    """HNSW graph over 2-level (coarse id + PQ residual) codes
    (reference: IndexHNSW.h:221 IndexHNSW2Level).

    The graph is built and searched over the DECODED reconstructions
    (centroid + PQ residual decode) so distances equal the reference
    storage DistanceComputer's; the Index2Layer storage keeps the compact
    codes for persistence and reconstruction."""

    def __init__(self, quantizer, nlist: int, m_pq: int, M: int = 32):
        from .extra_indexes import Index2Layer

        super().__init__(Index2Layer(quantizer, nlist, m_pq), M)
        self.is_trained = self.storage.is_trained

    def add(self, x) -> None:
        x = self._check_input(x)
        self._check_trained()
        n0 = self.storage.ntotal
        self.storage.add(x)
        xr = self.storage.reconstruct_n(n0, self.storage.ntotal - n0)
        g = self._ensure_graph()
        xr = np.ascontiguousarray(xr, np.float32)
        added = _watch_interrupt(
            self._lib.hnsw_set_interrupt,
            lambda: self._lib.hnsw_add(g, _fp(xr), len(xr)),
        )
        self.ntotal = n0 + added
        if added < len(xr):
            from ..callbacks import InterruptedException

            # roll storage back to the graph's prefix: graph node ids ARE
            # storage row numbers, so leaving the full batch in storage
            # would desynchronize every later add
            self.storage._truncate(n0 + added)
            raise InterruptedException(
                f"HNSW2Level add interrupted after {added}/{len(xr)} nodes"
                " (storage rolled back to the graph prefix)"
            )

    def flip_to_ivf(self):
        """Return an IndexIVFPQ over the SAME trained parameters and codes
        (reference: IndexHNSW2Level::flip_to_ivf — converts the flat
        2-level storage into inverted lists for IVF-style search)."""
        from .ivf_pq import IndexIVFPQ

        st = self.storage
        ivf = IndexIVFPQ(
            st.q1_quantizer, st.d, st.nlist, st.pq.M, st.pq.nbits,
            st.metric_type,
        )
        ivf.pq.centroids = st.pq.centroids
        ivf.is_trained = True
        if st.ntotal:
            ivf._codes_host = st._codes.copy()
            ivf._listnos_host = st._listnos.astype(np.int32).copy()
            ivf._ids_host = np.arange(st.ntotal, dtype=np.int64)
            ivf.ntotal = st.ntotal
        return ivf
