"""IndexEDEN / IndexIVFEDEN — EDEN-coded indexes.

Reference: faiss/IndexEDEN.{h,cpp}, faiss/IndexIVFEDEN.{h,cpp}.

TPU formulation: the EDEN L2 estimator

    D(x, i) = ||x - c||^2 + l2_i - 2 * scale_i * <x - c, q_i>

is a plain L2 GEMM scan against the scaled codes y_i = scale_i * q_i with the
per-code norm term OVERRIDDEN by l2_i (unbiased EDEN stores the true residual
norm there, so D is an unbiased distance estimate, NOT the distance to the
reconstruction — EDENQuantizer.cpp distance_from_code_dot). The flat index
reuses ops.distances.knn with a custom y_norms; the IVF index folds the list
centroid in (z_i = c_l + y_i, t_i = ||c_l||^2 + 2<c_l, y_i> + l2_i) and
reuses the standard IVF-flat scan kernel with code_norms = t_i.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..base import Index, SearchParameters
from ..codecs.eden import EDENQuantizer, EDENScaleType
from ..metric import MetricType
from ..ops import distances as dops
from .ivf import IndexIVF


class IndexEDEN(Index):
    """Flat EDEN index (reference: IndexEDEN.h:15)."""

    def __init__(
        self,
        d: int,
        metric=MetricType.L2,
        nb_bits: int = 1,
        scale_type: EDENScaleType = EDENScaleType.UNBIASED,
    ):
        if metric not in (MetricType.L2, MetricType.INNER_PRODUCT):
            raise ValueError("EDEN supports only L2 and inner product")
        super().__init__(d, metric)
        self.eden = EDENQuantizer(d, nb_bits, scale_type)
        self.center = np.zeros(d, np.float32)
        self.code_size = self.eden.code_size
        self.is_trained = False
        self._codes: Optional[np.ndarray] = None  # [n, d] uint8
        self._factors: Optional[np.ndarray] = None  # [n, 2] f32
        self._dev = None

    def train(self, x) -> None:
        x = self._check_input(x)
        self.center = (
            x.mean(0).astype(np.float32) if len(x) else self.center
        )
        self.is_trained = True

    def add(self, x) -> None:
        x = self._check_input(x)
        self._check_trained()
        codes, factors = self.eden.encode(x, self.center)
        self._codes = (
            codes if self._codes is None else np.concatenate([self._codes, codes])
        )
        self._factors = (
            factors
            if self._factors is None
            else np.concatenate([self._factors, factors])
        )
        self.ntotal += len(x)
        self._dev = None

    def reset(self) -> None:
        self._codes = None
        self._factors = None
        self.ntotal = 0
        self._dev = None

    def _device(self):
        import jax.numpy as jnp

        if self._dev is None:
            y = (
                self.eden.centroids[self._codes.astype(np.int64)]
                * self._factors[:, 1:2]
            ).astype(np.float32)
            if self.metric_type == MetricType.L2:
                self._dev = (jnp.asarray(y), jnp.asarray(self._factors[:, 0]))
            else:
                self._dev = (jnp.asarray(y + self.center), None)
        return self._dev

    def search(self, x, k: int, *, params: Optional[SearchParameters] = None):
        import jax.numpy as jnp

        x = self._check_input(x)
        nq = len(x)
        largest = self.metric_type == MetricType.INNER_PRODUCT
        if self.ntotal == 0:
            return (
                np.full((nq, k), -np.inf if largest else np.inf, np.float32),
                np.full((nq, k), -1, np.int64),
            )
        y, l2 = self._device()
        sel_ids = None
        if params is not None and params.sel is not None:
            sel_ids = params.sel.mask_for_ids(
                np.arange(self.ntotal, dtype=np.int64)
            )
        if self.metric_type == MetricType.L2:
            D, I = dops.knn(
                jnp.asarray(x - self.center), y, k,
                metric=MetricType.L2, y_norms=l2,
                y_mask=None if sel_ids is None else jnp.asarray(sel_ids),
            )
        else:
            D, I = dops.knn(
                jnp.asarray(x), y, k,
                metric=MetricType.INNER_PRODUCT,
                y_mask=None if sel_ids is None else jnp.asarray(sel_ids),
            )
        return np.asarray(D), np.asarray(I).astype(np.int64)

    def reconstruct(self, key: int) -> np.ndarray:
        return self.eden.decode(
            self._codes[key : key + 1], self._factors[key : key + 1],
            self.center,
        )[0]

    def reconstruct_n(self, n0: int, ni: int) -> np.ndarray:
        return self.eden.decode(
            self._codes[n0 : n0 + ni], self._factors[n0 : n0 + ni],
            self.center,
        )

    def sa_code_size(self) -> int:
        return self.eden.code_size

    def sa_encode(self, x) -> np.ndarray:
        codes, factors = self.eden.encode(self._check_input(x), self.center)
        return self.eden.pack(codes, factors)

    def sa_decode(self, data) -> np.ndarray:
        codes, factors = self.eden.unpack(np.asarray(data, np.uint8))
        return self.eden.decode(codes, factors, self.center)


class IndexIVFEDEN(IndexIVF):
    """IVF + EDEN residual codes (reference: IndexIVFEDEN.h:18)."""

    def __init__(
        self,
        quantizer,
        d: int,
        nlist: int,
        metric=MetricType.L2,
        nb_bits: int = 1,
        scale_type: EDENScaleType = EDENScaleType.UNBIASED,
    ):
        if metric not in (MetricType.L2, MetricType.INNER_PRODUCT):
            raise ValueError("EDEN supports only L2 and inner product")
        super().__init__(quantizer, d, nlist, metric)
        self.eden = EDENQuantizer(d, nb_bits, scale_type)
        self.by_residual = True
        self.code_size = self.eden.code_size

    def train_encoder(self, x, assign) -> None:
        del x, assign  # Lloyd-Max codebook is data-independent

    def encode_vectors(self, x, listnos) -> np.ndarray:
        cents = self.quantizer.vectors()[listnos]
        codes, factors = self.eden.encode(x, cents)
        return self.eden.pack(codes, factors)

    def decode_vectors(self, codes, listnos) -> np.ndarray:
        c, f = self.eden.unpack(np.ascontiguousarray(codes, np.uint8))
        return self.eden.decode(c, f, self.quantizer.vectors()[listnos])

    def _stage_codes(self, slot_ids, lengths, max_len, sorted_ln, ranks, order):
        import jax.numpy as jnp

        d = self.d
        pad_codes = np.zeros((self.nlist, max_len, d), np.float32)
        pad_norms = np.full((self.nlist, max_len), np.inf, np.float32)
        if self.ntotal:
            c, f = self.eden.unpack(self._codes_host[order])
            cents = self.quantizer.vectors()[self._listnos_host[order]]
            y = self.eden.centroids[c.astype(np.int64)] * f[:, 1:2]
            z = (cents + y).astype(np.float32)  # reconstruction
            pad_codes[sorted_ln, ranks] = z
            if self.metric_type == MetricType.L2:
                # t = ||c_l||^2 + 2<c_l, y> + l2  (EDEN estimator norm term)
                t = (
                    (cents * cents).sum(1)
                    + 2.0 * (cents * y).sum(1)
                    + f[:, 0]
                ).astype(np.float32)
                pad_norms[sorted_ln, ranks] = t
        dev = {
            "codes": jnp.asarray(pad_codes),
            "slot_ids": jnp.asarray(slot_ids),
            "lengths": jnp.asarray(lengths),
        }
        dev["code_norms"] = (
            jnp.asarray(pad_norms)
            if self.metric_type == MetricType.L2
            else None
        )
        return dev

    def sa_code_size(self) -> int:
        return self.eden.code_size
