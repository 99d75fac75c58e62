"""IndexLattice — Zn-lattice codec index (reference: faiss/IndexLattice.{h,cpp}).

Each d/nsq-dim subvector is stored as (scale_nbit-bit quantized norm,
lattice id of the normalized direction on the Zn sphere of radius^2 r2).
Search is codec-faithful: candidates are decoded and scanned with the flat
GEMM kernels (the reference searches through IndexFlatCodes distance
computers on decoded values).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..base import Index, SearchParameters
from ..codecs.lattice import ZnSphereCodecAlt
from ..metric import MetricType
from .flat import IndexFlat


class IndexLattice(Index):
    """reference: IndexLattice.h:19."""

    def __init__(self, d: int, nsq: int, scale_nbit: int, r2: int,
                 metric=MetricType.L2):
        super().__init__(d, metric)
        if d % nsq:
            raise ValueError("d must be a multiple of nsq")
        self.nsq = int(nsq)
        self.dsq = d // nsq
        self.scale_nbit = int(scale_nbit)
        self.zn_sphere_codec = ZnSphereCodecAlt(self.dsq, r2)
        # bits per subvector id (IndexLattice.cpp constructor)
        self.lattice_nbit = 0
        while (1 << self.lattice_nbit) < self.zn_sphere_codec.nv:
            self.lattice_nbit += 1
        self.trained: Optional[np.ndarray] = None  # [2, nsq] min/max norms
        self.is_trained = False
        self._codes: Optional[np.ndarray] = None  # [n, nsq, 2] int64
        self._flat = IndexFlat(d, metric)  # decoded reconstructions

    @property
    def code_size(self) -> int:
        return (self.nsq * (self.scale_nbit + self.lattice_nbit) + 7) // 8

    def sa_code_size(self) -> int:
        return self.code_size

    def train(self, x) -> None:
        x = self._check_input(x)
        sub = x.reshape(len(x), self.nsq, self.dsq)
        norms = np.linalg.norm(sub, axis=2)
        self.trained = np.stack([norms.min(0), norms.max(0)])
        self.is_trained = True

    # -- codec -------------------------------------------------------------
    def _encode_fields(self, x) -> np.ndarray:
        """-> [n, nsq, 2] int64: (norm code, lattice id) per subvector."""
        n = len(x)
        sub = x.reshape(n, self.nsq, self.dsq)
        mins, maxs = self.trained
        sc = 1 << self.scale_nbit
        norms = np.linalg.norm(sub, axis=2)
        nj = (norms - mins) * sc / np.maximum(maxs - mins, 1e-20)
        nj = np.clip(nj, 0, sc - 1).astype(np.int64)
        # nearest sphere vertices for all subvectors in one batched search
        flat_sub = sub.reshape(n * self.nsq, self.dsq)
        verts, _ = self.zn_sphere_codec.search_multi(flat_sub)
        ids = np.array(
            [self.zn_sphere_codec.encode_vertex(v) for v in verts], np.int64
        ).reshape(n, self.nsq)
        return np.stack([nj, ids], axis=2)

    def _decode_fields(self, fields) -> np.ndarray:
        n = len(fields)
        mins, maxs = self.trained
        sc = 1 << self.scale_nbit
        r = np.sqrt(self.zn_sphere_codec.r2)
        out = np.zeros((n, self.nsq, self.dsq), np.float32)
        for i in range(n):
            for j in range(self.nsq):
                norm = (fields[i, j, 0] + 0.5) * (maxs[j] - mins[j]) / sc + mins[j]
                out[i, j] = self.zn_sphere_codec.decode(
                    int(fields[i, j, 1])
                ) * (norm / r)
        return out.reshape(n, self.d)

    def sa_encode(self, x) -> np.ndarray:
        """Packed bitstring codes (IndexLattice.cpp:80 layout: per subvector
        scale_nbit norm bits then lattice_nbit id bits, little-endian)."""
        fields = self._encode_fields(self._check_input(x))
        n = len(fields)
        total_bits = self.nsq * (self.scale_nbit + self.lattice_nbit)
        bits = np.zeros((n, total_bits), np.uint8)
        pos = 0
        for j in range(self.nsq):
            for b in range(self.scale_nbit):
                bits[:, pos] = (fields[:, j, 0] >> b) & 1
                pos += 1
            for b in range(self.lattice_nbit):
                bits[:, pos] = (fields[:, j, 1] >> b) & 1
                pos += 1
        return np.packbits(bits, axis=1, bitorder="little")[
            :, : self.code_size
        ]

    def sa_decode(self, codes) -> np.ndarray:
        codes = np.ascontiguousarray(codes, np.uint8)
        n = len(codes)
        total_bits = self.nsq * (self.scale_nbit + self.lattice_nbit)
        bits = np.unpackbits(codes, axis=1, bitorder="little")[:, :total_bits]
        fields = np.zeros((n, self.nsq, 2), np.int64)
        pos = 0
        for j in range(self.nsq):
            for b in range(self.scale_nbit):
                fields[:, j, 0] |= bits[:, pos].astype(np.int64) << b
                pos += 1
            for b in range(self.lattice_nbit):
                fields[:, j, 1] |= bits[:, pos].astype(np.int64) << b
                pos += 1
        return self._decode_fields(fields)

    # -- population / search -------------------------------------------------
    def add(self, x) -> None:
        x = self._check_input(x)
        self._check_trained()
        fields = self._encode_fields(x)
        self._codes = (
            fields
            if self._codes is None
            else np.concatenate([self._codes, fields])
        )
        self._flat.add(self._decode_fields(fields))
        self.ntotal += len(x)

    def reset(self) -> None:
        self._codes = None
        self._flat.reset()
        self.ntotal = 0

    def search(self, x, k: int, *, params: Optional[SearchParameters] = None):
        return self._flat.search(self._check_input(x), k, params=params)

    def reconstruct_n(self, n0: int, ni: int) -> np.ndarray:
        return self._decode_fields(self._codes[n0 : n0 + ni])
