"""Zn-lattice sphere codec — analogue of faiss/impl/lattice_Zn.{h,cpp}.

Quantizes a direction to the nearest point of the integer lattice Z^d on the
sphere of squared radius r2, and enumerates those points with consecutive
ids. All sphere points are sign/permutation images of a small set of "atoms"
(non-increasing non-negative integer vectors with sum of squares r2), so:

  - nearest-point search is one GEMM: sort |x| descending, dot against the
    atom matrix, pick the best atom, undo the permutation and signs
    (ZnSphereSearch::search, lattice_Zn.cpp) — fully batched on the MXU.
  - the id of a point is (atom base offset) + (multiset-permutation rank) *
    2^signbits + sign bits — a combinatorial numbering like the reference's
    CodeSegment scheme (lattice_Zn.h:115). The byte layout is this
    implementation's own (no cross-library file compatibility is claimed).

IndexLattice (faiss/IndexLattice.h) stores per-subvector: a scalar-quantized
norm (scale_nbit bits) + the lattice id of the normalized direction.
"""

from __future__ import annotations

import functools
from math import comb
from typing import List, Tuple

import numpy as np


@functools.lru_cache(maxsize=None)
def zn_sphere_atoms(dim: int, r2: int) -> np.ndarray:
    """All non-increasing non-negative integer vectors of length ``dim``
    with sum of squares == r2, as a [natom, dim] f32 matrix."""
    out: List[List[int]] = []

    def rec(prefix, remaining, max_val, slots):
        if remaining == 0:
            out.append(prefix + [0] * slots)
            return
        if slots == 0:
            return
        v = min(max_val, int(np.sqrt(remaining)))
        while v >= 1:
            if v * v <= remaining:
                rec(prefix + [v], remaining - v * v, v, slots - 1)
            v -= 1

    rec([], r2, int(np.sqrt(r2)), dim)
    if not out:
        raise ValueError(f"no Z^{dim} points with squared norm {r2}")
    return np.asarray(out, np.float32)


class ZnSphereSearch:
    """Nearest sphere vertex (reference: lattice_Zn.h:25)."""

    def __init__(self, dim: int, r2: int):
        self.dim, self.r2 = int(dim), int(r2)
        self.voc = zn_sphere_atoms(dim, r2)  # [natom, dim]
        self.natom = len(self.voc)

    def search_multi(self, x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """[n, dim] -> (nearest vertices [n, dim] f32, dot products [n])."""
        x = np.ascontiguousarray(x, np.float32)
        xabs = np.abs(x)
        order = np.argsort(-xabs, axis=1, kind="stable")
        xs = np.take_along_axis(xabs, order, axis=1)
        dots = xs @ self.voc.T  # [n, natom]
        best = np.argmax(dots, axis=1)
        c_sorted = self.voc[best]  # atom values in sorted-position space
        c = np.zeros_like(x)
        np.put_along_axis(c, order, c_sorted, axis=1)
        c = np.where(x < 0, -c, c)
        return c, dots[np.arange(len(x)), best]

    def search(self, x: np.ndarray) -> Tuple[np.ndarray, float]:
        c, dp = self.search_multi(x[None])
        return c[0], float(dp[0])


class ZnSphereCodec(ZnSphereSearch):
    """Sphere vertices with consecutive ids (reference: lattice_Zn.h:115)."""

    def __init__(self, dim: int, r2: int):
        super().__init__(dim, r2)
        self._perm_count = np.zeros(self.natom, np.uint64)
        self._signbits = np.zeros(self.natom, np.int64)
        self._c0 = np.zeros(self.natom + 1, np.uint64)
        for a, atom in enumerate(np.asarray(self.voc, np.int64)):
            self._perm_count[a] = self._multiset_perms(atom)
            self._signbits[a] = int((atom != 0).sum())
            self._c0[a + 1] = self._c0[a] + self._perm_count[a] * (
                1 << self._signbits[a]
            )
        self.nv = int(self._c0[-1])
        self.code_size = max(1, (int(self.nv - 1).bit_length() + 7) // 8)

    @staticmethod
    def _multiset_perms(atom) -> int:
        n = len(atom)
        total = 1
        rem = n
        vals, counts = np.unique(atom, return_counts=True)
        for c in counts:
            total *= comb(rem, int(c))
            rem -= int(c)
        return total

    def _atom_of(self, c_abs_sorted) -> int:
        m = np.all(self.voc == c_abs_sorted[None], axis=1)
        idx = np.nonzero(m)[0]
        if len(idx) == 0:
            raise ValueError("vector is not a sphere vertex")
        return int(idx[0])

    @staticmethod
    def _rank_multiset_perm(seq: np.ndarray) -> int:
        """Rank of ``seq`` among the lexicographic multiset permutations."""
        seq = list(int(v) for v in seq)
        from collections import Counter

        counts = Counter(seq)
        n = len(seq)

        def perms(counts, n):
            total = 1
            rem = n
            for c in counts.values():
                total *= comb(rem, c)
                rem -= c
            return total

        rank = 0
        for i, v in enumerate(seq):
            for smaller in sorted(c for c in counts if c > v):
                # values sort DESCENDING lexicographically (larger first)
                counts[smaller] -= 1
                if counts[smaller] == 0:
                    del counts[smaller]
                rank += perms(counts, n - i - 1)
                counts[smaller] = counts.get(smaller, 0) + 1
            counts[v] -= 1
            if counts[v] == 0:
                del counts[v]
        return rank

    @staticmethod
    def _unrank_multiset_perm(rank: int, counts_in, n: int) -> List[int]:
        from collections import Counter

        counts = Counter(counts_in)

        def perms(counts, n):
            total = 1
            rem = n
            for c in counts.values():
                total *= comb(rem, c)
                rem -= c
            return total

        out = []
        for i in range(n):
            for v in sorted(counts, reverse=True):  # descending lexicographic
                counts[v] -= 1
                if counts[v] == 0:
                    del counts[v]
                p = perms(counts, n - i - 1)
                if rank < p:
                    out.append(v)
                    break
                rank -= p
                counts[v] = counts.get(v, 0) + 1
            else:
                raise ValueError("rank out of range")
        return out

    def encode(self, x: np.ndarray) -> int:
        """Nearest-vertex id of (possibly unnormalized) x."""
        c, _ = self.search(np.ascontiguousarray(x, np.float32))
        return self.encode_vertex(c)

    def encode_vertex(self, c: np.ndarray) -> int:
        ci = np.asarray(np.rint(c), np.int64)
        ca = np.abs(ci)
        a = self._atom_of(-np.sort(-ca).astype(np.float32))
        perm_rank = self._rank_multiset_perm(ca)
        signs = 0
        bit = 0
        for v in ci:
            if v != 0:
                if v < 0:
                    signs |= 1 << bit
                bit += 1
        return int(
            self._c0[a]
            + np.uint64(perm_rank) * np.uint64(1 << self._signbits[a])
            + np.uint64(signs)
        )

    def decode(self, code: int) -> np.ndarray:
        a = int(np.searchsorted(self._c0, code, side="right") - 1)
        off = int(code) - int(self._c0[a])
        sb = int(self._signbits[a])
        signs = off & ((1 << sb) - 1)
        perm_rank = off >> sb
        atom = np.asarray(self.voc[a], np.int64)
        from collections import Counter

        seq = self._unrank_multiset_perm(
            perm_rank, Counter(int(v) for v in atom), self.dim
        )
        out = np.zeros(self.dim, np.float32)
        bit = 0
        for i, v in enumerate(seq):
            if v != 0:
                out[i] = -v if (signs >> bit) & 1 else v
                bit += 1
        return out


class ZnSphereCodecAlt(ZnSphereCodec):
    """API parity with the reference's power-of-two recursive variant
    (lattice_Zn.h:175); the combinatorial codec covers all dims here."""
