"""InvertedLists abstraction + combinator views — analogue of
faiss/invlists/InvertedLists.{h,cpp} and InvertedListsIOHook.h.

The engine's native storage is the flat entry store on IndexIVF
(codes/listnos/ids arrays — ArrayInvertedLists + DirectMap in one), staged
into padded device arrays at scan time. This module provides the
composition layer on top:

  - ``InvertedLists``: per-list read API (list_size/get_codes/get_ids).
  - ``ArrayInvertedLists``: in-RAM lists; also wraps an IndexIVF's store.
  - ``SliceInvertedLists``  (InvertedLists.h:399): list-range view.
  - ``HStackInvertedLists`` (InvertedLists.h:375): per-list concatenation
    of several sources (the merge view).
  - ``VStackInvertedLists`` (InvertedLists.h:420): list-wise stacking.
  - ``InvertedListsIOHook``: registry for (de)serializing custom invlist
    classes through write_index/read_index (InvertedListsIOHook.h).

Views are read-only (ReadOnlyInvertedLists semantics); attaching any
InvertedLists to an IndexIVF via ``replace_invlists`` materializes the
entries into the flat store (the padded device layout is rebuilt lazily).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


class InvertedLists:
    """Abstract per-list storage (reference: InvertedLists.h:58)."""

    def __init__(self, nlist: int, code_size: int):
        self.nlist = int(nlist)
        self.code_size = int(code_size)

    def list_size(self, list_no: int) -> int:
        raise NotImplementedError

    def get_codes(self, list_no: int) -> np.ndarray:
        raise NotImplementedError

    def get_ids(self, list_no: int) -> np.ndarray:
        raise NotImplementedError

    def add_entries(self, list_no, ids, codes) -> int:
        raise RuntimeError("read-only InvertedLists")

    @property
    def compute_ntotal(self) -> int:
        return sum(self.list_size(i) for i in range(self.nlist))

    def print_stats(self) -> str:
        sizes = [self.list_size(i) for i in range(self.nlist)]
        return (
            f"InvertedLists: nlist={self.nlist} ntotal={sum(sizes)} "
            f"max={max(sizes) if sizes else 0}"
        )


class ArrayInvertedLists(InvertedLists):
    """In-RAM lists (reference: InvertedLists.h:264)."""

    def __init__(self, nlist: int, code_size: int):
        super().__init__(nlist, code_size)
        self._ids: List[np.ndarray] = [
            np.empty(0, np.int64) for _ in range(nlist)
        ]
        self._codes: List[np.ndarray] = [
            np.empty((0, code_size), np.uint8) for _ in range(nlist)
        ]

    @classmethod
    def from_index(cls, index) -> "ArrayInvertedLists":
        """Snapshot an IndexIVF's flat entry store into per-list arrays."""
        codes = index._codes_host
        if codes is None:
            codes = np.empty((index.ntotal, 0), np.uint8)
        code_size = (
            codes.shape[1] * codes.dtype.itemsize if codes.ndim == 2 else 0
        )
        il = cls(index.nlist, code_size)
        order = np.argsort(index._listnos_host, kind="stable")
        ln = index._listnos_host[order]
        bounds = np.searchsorted(ln, np.arange(index.nlist + 1))
        for l in range(index.nlist):
            sl = order[bounds[l] : bounds[l + 1]]
            il._ids[l] = index._ids_host[sl].copy()
            il._codes[l] = (
                codes[sl].view(np.uint8).reshape(len(sl), -1).copy()
            )
        return il

    def list_size(self, list_no):
        return len(self._ids[list_no])

    def get_codes(self, list_no):
        return self._codes[list_no]

    def get_ids(self, list_no):
        return self._ids[list_no]

    def add_entries(self, list_no, ids, codes) -> int:
        ids = np.asarray(ids, np.int64).ravel()
        codes = np.asarray(codes, np.uint8).reshape(len(ids), -1)
        self._ids[list_no] = np.concatenate([self._ids[list_no], ids])
        self._codes[list_no] = np.concatenate([self._codes[list_no], codes])
        return len(self._ids[list_no])

    def resize(self, list_no: int, new_size: int) -> None:
        self._ids[list_no] = self._ids[list_no][:new_size]
        self._codes[list_no] = self._codes[list_no][:new_size]


class SliceInvertedLists(InvertedLists):
    """View of lists [i0, i1) (reference: InvertedLists.h:399)."""

    def __init__(self, il: InvertedLists, i0: int, i1: int):
        super().__init__(i1 - i0, il.code_size)
        self.il = il
        self.i0, self.i1 = int(i0), int(i1)

    def list_size(self, list_no):
        return self.il.list_size(self.i0 + list_no)

    def get_codes(self, list_no):
        return self.il.get_codes(self.i0 + list_no)

    def get_ids(self, list_no):
        return self.il.get_ids(self.i0 + list_no)


class HStackInvertedLists(InvertedLists):
    """Per-list concatenation of several sources (InvertedLists.h:375)."""

    def __init__(self, ils: Sequence[InvertedLists]):
        if not ils:
            raise ValueError("need at least one source")
        super().__init__(ils[0].nlist, ils[0].code_size)
        for il in ils:
            if il.nlist != self.nlist or il.code_size != self.code_size:
                raise ValueError("incompatible InvertedLists for hstack")
        self.ils = list(ils)

    def list_size(self, list_no):
        return sum(il.list_size(list_no) for il in self.ils)

    def get_codes(self, list_no):
        return np.concatenate([il.get_codes(list_no) for il in self.ils])

    def get_ids(self, list_no):
        return np.concatenate([il.get_ids(list_no) for il in self.ils])


class VStackInvertedLists(InvertedLists):
    """List-wise stacking: output list l belongs to the source whose list
    range contains it (reference: InvertedLists.h:420)."""

    def __init__(self, ils: Sequence[InvertedLists]):
        if not ils:
            raise ValueError("need at least one source")
        super().__init__(sum(il.nlist for il in ils), ils[0].code_size)
        self.ils = list(ils)
        self.cumsz = np.cumsum([0] + [il.nlist for il in ils])

    def _locate(self, list_no):
        s = int(np.searchsorted(self.cumsz, list_no, side="right") - 1)
        return self.ils[s], list_no - int(self.cumsz[s])

    def list_size(self, list_no):
        il, l = self._locate(list_no)
        return il.list_size(l)

    def get_codes(self, list_no):
        il, l = self._locate(list_no)
        return il.get_codes(l)

    def get_ids(self, list_no):
        il, l = self._locate(list_no)
        return il.get_ids(l)


def replace_invlists(index, il: InvertedLists) -> None:
    """Materialize an InvertedLists into an IndexIVF's flat entry store
    (the reference swaps the pointer; the TPU layout is rebuilt lazily)."""
    if il.nlist != index.nlist:
        raise ValueError("nlist mismatch")
    ids, listnos, codes = [], [], []
    for l in range(il.nlist):
        n = il.list_size(l)
        if n == 0:
            continue
        ids.append(il.get_ids(l))
        listnos.append(np.full(n, l, np.int32))
        codes.append(il.get_codes(l))
    index._ids_host = (
        np.concatenate(ids) if ids else np.empty(0, np.int64)
    )
    index._listnos_host = (
        np.concatenate(listnos) if listnos else np.empty(0, np.int32)
    )
    raw = (
        np.concatenate(codes)
        if codes
        else np.empty((0, il.code_size), np.uint8)
    )
    if index._codes_host is not None and index._codes_host.dtype != np.uint8:
        # flat store keeps codec-native dtype (e.g. f32 rows for IVFFlat)
        raw = raw.view(index._codes_host.dtype).reshape(len(raw), -1)
    index._codes_host = raw
    index.ntotal = len(index._ids_host)
    index._device = None
    if hasattr(index, "_brute"):
        index._brute = None


# ---------------------------------------------------------------------------
# custom invlists IO registry (InvertedListsIOHook.h)
# ---------------------------------------------------------------------------

_io_hooks: Dict[str, "InvertedListsIOHook"] = {}


class InvertedListsIOHook:
    """Serialization hook for custom InvertedLists classes.

    Subclass, set ``classname``, implement write/read, then
    ``InvertedListsIOHook.add_callback(hook)`` — write_index/read_index
    route invlists whose class matches (reference: InvertedListsIOHook.h).
    """

    classname: str = ""

    def write(self, il, arrays: dict, path: str) -> dict:
        raise NotImplementedError

    def read(self, meta: dict, arrays: dict, path: str):
        raise NotImplementedError

    @staticmethod
    def add_callback(hook: "InvertedListsIOHook") -> None:
        _io_hooks[hook.classname] = hook

    @staticmethod
    def lookup(classname: str) -> "InvertedListsIOHook":
        if classname not in _io_hooks:
            raise KeyError(f"no InvertedListsIOHook for {classname}")
        return _io_hooks[classname]

    @staticmethod
    def lookup_or_none(classname: str):
        return _io_hooks.get(classname)
