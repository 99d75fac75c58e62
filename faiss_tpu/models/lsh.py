"""IndexLSH — binary hashing via (rotated) projections
(reference: faiss/IndexLSH.{h,cpp}).

Vectors are projected by an optional random rotation, optionally shifted by
trained per-bit thresholds, sign-binarized, and searched by hamming distance
on the popcount kernel.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..base import Index
from ..metric import MetricType
from ..ops import hamming as hops
from ..transforms import RandomRotationMatrix


class IndexLSH(Index):
    """reference: IndexLSH.h:21."""

    def __init__(
        self,
        d: int,
        nbits: int,
        rotate_data: bool = True,
        train_thresholds: bool = False,
    ):
        super().__init__(d, MetricType.L2)
        self.nbits = int(nbits)
        self.rotate_data = rotate_data
        self.train_thresholds = train_thresholds
        self.thresholds: Optional[np.ndarray] = None
        if rotate_data or nbits != d:
            self.rrot = RandomRotationMatrix(d, nbits)
            self.rrot.init()
        else:
            self.rrot = None
        self.is_trained = not train_thresholds
        nbytes = (nbits + 7) // 8
        self._codes = np.empty((0, nbytes), np.uint8)

    def apply_preprocess(self, x) -> np.ndarray:
        x = self._check_input(x)
        if self.rrot is not None:
            x = self.rrot.apply(x)
        if self.train_thresholds and self.thresholds is not None:
            x = x - self.thresholds
        return x

    def train(self, x) -> None:
        if self.train_thresholds:
            xt = self._check_input(x)
            if self.rrot is not None:
                xt = self.rrot.apply(xt)
            self.thresholds = np.median(xt, axis=0).astype(np.float32)
        self.is_trained = True

    def sa_encode(self, x) -> np.ndarray:
        return np.packbits(
            self.apply_preprocess(x) > 0, axis=1, bitorder="little"
        )

    def sa_code_size(self) -> int:
        return (self.nbits + 7) // 8

    def add(self, x) -> None:
        self._check_trained()
        self._codes = np.concatenate([self._codes, self.sa_encode(x)])
        self.ntotal = len(self._codes)

    def search(self, x, k: int, *, params=None):
        self._check_trained()
        q = self.sa_encode(x)
        if self.ntotal == 0:
            return (
                np.full((len(q), k), np.inf, np.float32),
                np.full((len(q), k), -1, np.int64),
            )
        D, I = hops.hamming_knn_host(q, self._codes, k)
        return D.astype(np.float32), I

    def reset(self) -> None:
        self._codes = self._codes[:0]
        self.ntotal = 0
