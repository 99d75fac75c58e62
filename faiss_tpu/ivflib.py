"""IVF surgery utilities — analogue of faiss/IVFlib.{h,cpp} and
contrib/ivf_tools.py.
"""

from __future__ import annotations

import numpy as np

from .models.ivf import IndexIVF
from .models.meta import IndexIDMap, IndexPreTransform


def extract_index_ivf(index) -> IndexIVF:
    """Unwrap PreTransform/IDMap down to the IndexIVF (IVFlib.h:31)."""
    while True:
        if isinstance(index, (IndexPreTransform, IndexIDMap)):
            index = index.index
        elif isinstance(index, IndexIVF):
            return index
        else:
            raise TypeError(f"no IndexIVF inside {type(index).__name__}")


def try_extract_index_ivf(index):
    try:
        return extract_index_ivf(index)
    except TypeError:
        return None


def merge_into(index0, index1, shift_ids: bool = False) -> None:
    """Merge index1's entries into index0 (IVFlib.h merge_into)."""
    ivf0 = extract_index_ivf(index0)
    ivf1 = extract_index_ivf(index1)
    ivf0.merge_from(ivf1, add_id=ivf0.ntotal if shift_ids else 0)
    if hasattr(index0, "ntotal"):
        index0.ntotal = ivf0.ntotal


def add_preassigned(index_ivf: IndexIVF, x, a, ids=None) -> None:
    """Add with precomputed assignment (contrib/ivf_tools.py:15)."""
    index_ivf.add_core(np.ascontiguousarray(x, np.float32), ids, a)


def search_preassigned(index_ivf: IndexIVF, xq, k, list_nos, coarse_dis=None):
    """contrib/ivf_tools.py:26."""
    if coarse_dis is None:
        coarse_dis = np.zeros(np.asarray(list_nos).shape, np.float32)
    return index_ivf.search_preassigned(xq, k, list_nos, coarse_dis)


def replace_ivf_quantizer(index_ivf: IndexIVF, new_quantizer) -> object:
    """Swap the coarse quantizer (contrib/ivf_tools.py:53). The new
    quantizer is trained on the old centroids if untrained."""
    old = index_ivf.quantizer
    if new_quantizer.ntotal == 0:
        centroids = old.vectors() if hasattr(old, "vectors") else old.reconstruct_n(
            0, old.ntotal
        )
        if not new_quantizer.is_trained:
            new_quantizer.train(centroids)
        new_quantizer.add(centroids)
    if new_quantizer.ntotal != index_ivf.nlist:
        raise ValueError("quantizer size != nlist")
    index_ivf.quantizer = new_quantizer
    index_ivf._device = None
    return old


def get_invlist_range(index_ivf: IndexIVF, l0: int, l1: int):
    """Extract entries of lists [l0, l1) (IVFlib.h get_invlist_range)."""
    mask = (index_ivf._listnos_host >= l0) & (index_ivf._listnos_host < l1)
    return (
        index_ivf._codes_host[mask],
        index_ivf._listnos_host[mask],
        index_ivf._ids_host[mask],
    )


def shard_ivf_index_centroids(index_ivf: IndexIVF, n_shards: int):
    """Split an IVF index into n_shards by centroid ranges
    (IVFlib.h:171 shard_ivf_index_centroids)."""
    import copy

    shards = []
    per = -(-index_ivf.nlist // n_shards)
    for s in range(n_shards):
        l0, l1 = s * per, min((s + 1) * per, index_ivf.nlist)
        shard = copy.copy(index_ivf)
        codes, listnos, ids = get_invlist_range(index_ivf, l0, l1)
        shard._codes_host = codes.copy()
        shard._listnos_host = listnos.copy()
        shard._ids_host = ids.copy()
        shard.ntotal = len(ids)
        shard._device = None
        shards.append(shard)
    return shards


def clone_index(index):
    """Deep copy via serialization round-trip (reference: clone_index.h)."""
    from .io import deserialize_index, serialize_index

    return deserialize_index(serialize_index(index))


class SlidingIndexWindow:
    """Sliding window over an IVF index: at each ``step`` the oldest slice
    of entries is dropped and a new sub-index's entries are appended
    (reference: IVFlib.h:86 SlidingIndexWindow).

    The window owns the target index's flat entry store; slices are kept as
    (ids, listnos, codes) blocks and re-concatenated on step — the padded
    device layout rebuilds lazily on next search.
    """

    def __init__(self, index):
        self.index = index
        self.ivf = extract_index_ivf(index)
        self.nlist = self.ivf.nlist
        self.n_slice = 0
        self._slices = []
        if self.ivf.ntotal:
            self._slices.append(
                (
                    self.ivf._ids_host.copy(),
                    self.ivf._listnos_host.copy(),
                    None
                    if self.ivf._codes_host is None
                    else self.ivf._codes_host.copy(),
                )
            )
            self.n_slice = 1

    def step(self, sub_index, remove_oldest: bool) -> None:
        """Append ``sub_index``'s entries (may be None) and/or drop the
        oldest slice (IVFlib.cpp SlidingIndexWindow::step semantics)."""
        if remove_oldest and self._slices:
            self._slices.pop(0)
        if sub_index is not None:
            ivf = extract_index_ivf(sub_index)
            if ivf.nlist != self.nlist:
                raise ValueError("sub-index nlist mismatch")
            if ivf.ntotal:
                self._slices.append(
                    (
                        ivf._ids_host.copy(),
                        ivf._listnos_host.copy(),
                        None
                        if ivf._codes_host is None
                        else ivf._codes_host.copy(),
                    )
                )
        self.n_slice = len(self._slices)
        import numpy as np

        if self._slices:
            self.ivf._ids_host = np.concatenate(
                [s[0] for s in self._slices]
            )
            self.ivf._listnos_host = np.concatenate(
                [s[1] for s in self._slices]
            )
            if self._slices[0][2] is not None:
                self.ivf._codes_host = np.concatenate(
                    [s[2] for s in self._slices]
                )
        else:
            self.ivf._ids_host = np.empty(0, np.int64)
            self.ivf._listnos_host = np.empty(0, np.int32)
            if self.ivf._codes_host is not None:
                self.ivf._codes_host = self.ivf._codes_host[:0]
        self.ivf.ntotal = len(self.ivf._ids_host)
        self.ivf._device = None
        if hasattr(self.ivf, "_brute"):
            self.ivf._brute = None
        self.index.ntotal = self.ivf.ntotal
