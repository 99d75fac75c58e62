"""EDEN quantizer — per-vector-scaled Lloyd-Max scalar codes.

Reference: faiss/impl/EDENQuantizer.{h,cpp} (EDEN, ICML 2022,
proceedings.mlr.press/v162/vargaftik22a) + the biased DRIVE scale
(NeurIPS 2021). Semantics (EDENQuantizer.cpp eden_utils::compute_codes):

  r          = x - centroid
  normalized = r * sqrt(d) / ||r||
  code[j]    = LloydMax_assign(normalized[j])       (unit-Gaussian codebook)
  q          = LloydMax_centroids[code]             (decoded unit code)
  UNBIASED:  scale = ||r||^2 / <q, r>,  l2_norm_term = ||r||^2
  BIASED:    scale = <q, r> / ||q||^2,  l2_norm_term = scale^2 ||q||^2
  decode     = centroid + scale * q
  L2 dist    = ||query - centroid||^2 + l2_norm_term
               - 2 scale <query - centroid, q>
  IP  dist   = <query, centroid> + scale <query, q>

The reference embeds hard-coded Lloyd-Max tables for the standard normal
(ScalarQuantizer.cpp kLloydMaxCentroids*); here they are computed at first
use by the classic Lloyd-Max fixed point for N(0,1) — same mathematical
object, independently derived.

TPU formulation: scoring decodes unit codes by table gather and contracts
them against (query - centroid) on the MXU in chunks — a scalar-code GEMM
scan like the SQ index, plus the per-vector scale/l2 terms.
"""

from __future__ import annotations

import functools
import math
from enum import IntEnum
from typing import Optional, Tuple

import numpy as np


class EDENScaleType(IntEnum):
    """reference: impl/EDENQuantizer.h:21."""

    UNBIASED = 1
    BIASED = 2


@functools.lru_cache(maxsize=None)
def lloyd_max_gaussian(bits: int) -> Tuple[np.ndarray, np.ndarray]:
    """Optimal (MSE) scalar quantizer of N(0,1): (centroids [2^bits],
    boundaries [2^bits - 1]). Lloyd-Max fixed point: boundaries are
    midpoints, centroids are conditional means of the Gaussian cell
    (closed form via pdf/cdf)."""
    if not 1 <= bits <= 8:
        raise ValueError("EDEN supports 1..8 bits")
    k = 1 << bits
    # initialize with Gaussian quantiles
    from math import erf, sqrt

    def cdf(t):
        return 0.5 * (1.0 + erf(t / sqrt(2.0)))

    def pdf(t):
        return math.exp(-0.5 * t * t) / sqrt(2.0 * math.pi)

    # quantile init by bisection
    c = np.array(
        [_gaussian_quantile((i + 0.5) / k) for i in range(k)], np.float64
    )
    for _ in range(200):
        b = 0.5 * (c[:-1] + c[1:])
        edges = np.concatenate([[-np.inf], b, [np.inf]])
        new_c = np.empty_like(c)
        for i in range(k):
            lo, hi = edges[i], edges[i + 1]
            plo = 0.0 if lo == -np.inf else pdf(lo)
            phi = 0.0 if hi == np.inf else pdf(hi)
            clo = 0.0 if lo == -np.inf else cdf(lo)
            chi = 1.0 if hi == np.inf else cdf(hi)
            new_c[i] = (plo - phi) / max(chi - clo, 1e-300)
        if np.max(np.abs(new_c - c)) < 1e-12:
            c = new_c
            break
        c = new_c
    b = 0.5 * (c[:-1] + c[1:])
    return c.astype(np.float32), b.astype(np.float32)


def _gaussian_quantile(p: float) -> float:
    lo, hi = -10.0, 10.0
    from math import erf, sqrt

    for _ in range(80):
        mid = 0.5 * (lo + hi)
        if 0.5 * (1.0 + erf(mid / sqrt(2.0))) < p:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


class EDENQuantizer:
    """Vectorized EDEN codec. Codes are stored unpacked ([n, d] uint8) plus
    per-vector factors [n, 2] = (l2_norm_term, scale) — the device-friendly
    layout; ``pack``/``unpack`` provide the reference's packed-bitstring
    byte format for sa_encode parity (impl/EDENQuantizer.h code layout:
    packed scalar code then EDENCodeFactors)."""

    def __init__(
        self,
        d: int,
        nb_bits: int = 1,
        scale_type: EDENScaleType = EDENScaleType.UNBIASED,
    ):
        self.d = int(d)
        self.nb_bits = int(nb_bits)
        self.scale_type = EDENScaleType(scale_type)
        self.centroids, self.boundaries = lloyd_max_gaussian(self.nb_bits)
        self.packed_size = (self.d * self.nb_bits + 7) // 8
        self.code_size = self.packed_size + 8  # + 2 f32 factors

    # -- core codec (unpacked) ------------------------------------------------
    def encode(
        self, x: np.ndarray, centroid: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """x [n, d] (+ optional centroid [d] or [n, d]) ->
        (codes [n, d] uint8, factors [n, 2] f32)."""
        x = np.ascontiguousarray(x, np.float32)
        r = x if centroid is None else x - centroid
        norm2 = np.sum(r.astype(np.float64) ** 2, axis=1)
        ok = norm2 > np.finfo(np.float32).eps
        inv = np.where(ok, 1.0 / np.sqrt(np.maximum(norm2, 1e-300)), 0.0)
        normalized = r * (math.sqrt(self.d) * inv)[:, None]
        codes = np.searchsorted(self.boundaries, normalized).astype(np.uint8)
        q = self.centroids[codes].astype(np.float64)
        cip = np.sum(q * r, axis=1)
        cn2 = np.sum(q * q, axis=1)
        if self.scale_type == EDENScaleType.BIASED:
            with np.errstate(divide="ignore", invalid="ignore"):
                scale = cip / cn2
            l2 = scale * scale * cn2
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                scale = norm2 / cip
            l2 = norm2
        bad = ~(np.isfinite(scale) & ok)
        scale = np.where(bad, 0.0, scale)
        l2 = np.where(bad, 0.0, l2)
        factors = np.stack([l2, scale], axis=1).astype(np.float32)
        return codes, factors

    def decode(
        self,
        codes: np.ndarray,
        factors: np.ndarray,
        centroid: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        out = self.centroids[codes.astype(np.int64)] * factors[:, 1:2]
        if centroid is not None:
            out = out + centroid
        return out.astype(np.float32)

    # -- packed byte format (sa_encode parity) --------------------------------
    def pack(self, codes: np.ndarray, factors: np.ndarray) -> np.ndarray:
        n = len(codes)
        bits = np.unpackbits(
            codes[:, :, None], axis=2, count=8, bitorder="big"
        )[:, :, 8 - self.nb_bits :]
        packed = np.packbits(
            bits.reshape(n, -1), axis=1, bitorder="big"
        )[:, : self.packed_size]
        out = np.zeros((n, self.code_size), np.uint8)
        out[:, : self.packed_size] = packed
        out[:, self.packed_size :] = factors.astype(np.float32).view(np.uint8)
        return out

    def unpack(self, data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        n = len(data)
        bits = np.unpackbits(
            data[:, : self.packed_size], axis=1, bitorder="big"
        )[:, : self.d * self.nb_bits].reshape(n, self.d, self.nb_bits)
        weights = (1 << np.arange(self.nb_bits - 1, -1, -1)).astype(np.int64)
        codes = (bits.astype(np.int64) * weights).sum(-1).astype(np.uint8)
        factors = (
            np.ascontiguousarray(data[:, self.packed_size :])
            .view(np.float32)
            .reshape(n, 2)
        )
        return codes, factors
