"""RaBitQ — randomized 1-bit quantization with an unbiased distance
estimator (reference: faiss/impl/RaBitQuantizer.{h,cpp}; Gao & Long,
"RaBitQ: Quantizing High-Dimensional Vectors with a Theoretical Error
Bound", SIGMOD'24).

Encoding of a (residual) vector x_r = x - c:
  - rotate by a shared random orthogonal P (the randomized part),
  - keep sign bits  b = (P x_r > 0),  o_bar = (2b - 1)/sqrt(d),
  - store two fp32 factors: ||x_r|| and f = <x_hat, o_bar> where
    x_hat = P x_r / ||x_r||.

Estimator at query time (q_r = P(q - c)):
  <q_r, x_r> ~= ||x_r|| * <q_r, o_bar> / f
  ||q - x||^2 ~= ||q_r||^2 + ||x_r||^2 - 2 * est

<q_r, o_bar> is exact and computed for ALL candidates as one GEMM against
the unpacked sign matrix — the TPU replacement for the reference's SIMD
popcount kernels (utils/rabitq_simd.h): with f32/bf16 queries the +-1
contraction IS a matmul, so it lands on the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..transforms import _random_orthogonal


class RaBitQuantizer:
    """reference: impl/RaBitQuantizer.h:21 (single-bit variant)."""

    def __init__(self, d: int, seed: int = 1234):
        self.d = int(d)
        # bits packed little-endian + 2 fp32 factors (norm, f)
        self.code_size = (d + 7) // 8 + 8
        self.P = _random_orthogonal(d, d, seed)  # shared rotation
        self.center: Optional[np.ndarray] = None  # [d] global center (flat)

    def train(self, x) -> None:
        x = np.ascontiguousarray(x, np.float32)
        self.center = x.mean(0)

    @property
    def is_trained(self) -> bool:
        return self.center is not None

    # -- encode -----------------------------------------------------------
    def encode_parts(self, x, centers=None) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (packed bits [n, d/8], factors [n, 2] = (||x_r||, f))."""
        x = np.ascontiguousarray(x, np.float32)
        c = self.center if centers is None else centers
        xr = (x - c) @ self.P.T
        norms = np.linalg.norm(xr, axis=1)
        safe = np.maximum(norms, 1e-20)
        signs = np.where(xr > 0, 1.0, -1.0).astype(np.float32)
        o_bar = signs / np.sqrt(self.d)
        f = (xr / safe[:, None] * o_bar).sum(1).astype(np.float32)
        f = np.where(np.abs(f) < 1e-6, 1e-6, f)
        bits = np.packbits(xr > 0, axis=1, bitorder="little")
        factors = np.stack([norms.astype(np.float32), f], axis=1)
        return bits, factors

    def compute_codes(self, x) -> np.ndarray:
        bits, factors = self.encode_parts(x)
        return np.concatenate([bits, factors.view(np.uint8)], axis=1)

    def decode(self, codes) -> np.ndarray:
        """Approximate reconstruction: ||x_r|| * f * o_bar rotated back."""
        codes = np.ascontiguousarray(codes, np.uint8)
        nbytes = (self.d + 7) // 8
        bits = np.unpackbits(codes[:, :nbytes], axis=1, bitorder="little")[
            :, : self.d
        ]
        factors = codes[:, nbytes:].copy().view(np.float32)
        o_bar = (2.0 * bits - 1.0) / np.sqrt(self.d)
        xr = o_bar * (factors[:, 0] * factors[:, 1])[:, None]
        return (xr @ self.P + self.center).astype(np.float32)

    # -- query-side -------------------------------------------------------
    def rotate_queries(self, xq, centers=None) -> Tuple[np.ndarray, np.ndarray]:
        """(q_r rotated [nq, d], ||q_r||^2 [nq])."""
        c = self.center if centers is None else centers
        qr = (np.ascontiguousarray(xq, np.float32) - c) @ self.P.T
        return qr.astype(np.float32), (qr**2).sum(1).astype(np.float32)
