"""ProductQuantizer — analogue of faiss/impl/ProductQuantizer.{h,cpp}.

d dims split into M subspaces of dsub dims; each subspace gets a k-means
codebook of ksub = 2^nbits codewords (ProductQuantizer.h:76-135). Training
runs per-subspace Lloyd iterations on TPU (shared jit across subspaces since
shapes match); encode/decode/ADC tables are batched device kernels
(ops/pq_ops.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..clustering import Clustering, ClusteringParameters
from ..metric import MetricType
from ..ops import pq_ops


class Quantizer:
    """Codec base (reference: impl/Quantizer.h)."""

    def __init__(self, d: int, code_size: int):
        self.d = int(d)
        self.code_size = int(code_size)

    def train(self, x):
        raise NotImplementedError

    def compute_codes(self, x) -> np.ndarray:
        raise NotImplementedError

    def decode(self, codes) -> np.ndarray:
        raise NotImplementedError


class ProductQuantizer(Quantizer):
    """reference: impl/ProductQuantizer.h:24."""

    # train_type values (ProductQuantizer.h:150)
    Train_default = 0
    Train_hot_start = 1
    Train_shared = 2
    Train_hypercube = 3
    Train_hypercube_pca = 4

    def __init__(self, d: int, M: int, nbits: int = 8):
        if d % M != 0:
            raise ValueError(f"d={d} not a multiple of M={M}")
        self.M = int(M)
        self.nbits = int(nbits)
        self.ksub = 1 << self.nbits
        self.dsub = d // M
        # packed code size in bytes (PQEncoder semantics, h:195)
        super().__init__(d, (M * nbits + 7) // 8)
        self.cp = ClusteringParameters(niter=25)
        self.train_type = self.Train_default
        self.verbose = False
        # centroids [M, ksub, dsub]
        self.centroids: Optional[np.ndarray] = None
        self._dev_centroids = None

    # -- training (ProductQuantizer::train, cpp) ------------------------------
    def train(self, x) -> None:
        from ..ops.kmeans_ops import batched_kmeans

        x = np.ascontiguousarray(x, np.float32)
        n = len(x)
        # subsample like Clustering (max_points_per_centroid, Clustering.h:46)
        max_n = self.ksub * self.cp.max_points_per_centroid
        if n > max_n:
            rs = np.random.RandomState(self.cp.seed)
            x = x[rs.permutation(n)[:max_n]]
            n = max_n
        xs = x.reshape(n, self.M, self.dsub)
        centroids = np.empty((self.M, self.ksub, self.dsub), np.float32)
        if self.train_type == self.Train_shared:
            # one codebook shared across subspaces (h:155)
            clus = Clustering(self.dsub, self.ksub, self.cp)
            clus.train(xs.transpose(1, 0, 2).reshape(-1, self.dsub))
            centroids[:] = clus.centroids[None]
        elif n < self.ksub:
            raise ValueError(
                f"not enough training points ({n}) for ksub={self.ksub}"
            )
        else:
            # all M subspace k-means runs in ONE device program
            xms = np.ascontiguousarray(xs.transpose(1, 0, 2))  # [M, n, dsub]
            rs = np.random.RandomState(self.cp.seed)
            init = xms[:, rs.permutation(n)[: self.ksub], :]
            out = batched_kmeans(
                jnp.asarray(xms), jnp.asarray(init), self.ksub, self.cp.niter
            )
            centroids[:] = np.asarray(out)
        self.centroids = centroids
        self._dev_centroids = None

    def _dev(self):
        if self._dev_centroids is None:
            if self.centroids is None:
                raise RuntimeError("ProductQuantizer is not trained")
            self._dev_centroids = jnp.asarray(self.centroids)
        return self._dev_centroids

    @property
    def is_trained(self) -> bool:
        return self.centroids is not None

    # -- codec ------------------------------------------------------------------
    def compute_codes_int(self, x) -> np.ndarray:
        """Unpacked codes [n, M] (uint8 for nbits<=8, uint16 above)."""
        x = np.ascontiguousarray(x, np.float32)
        codes = np.asarray(pq_ops.pq_encode(jnp.asarray(x), self._dev()))
        dtype = np.uint8 if self.nbits <= 8 else np.uint16
        return codes.astype(dtype)

    def compute_codes(self, x) -> np.ndarray:
        """Packed byte codes [n, code_size] (PQEncoder8/16/Generic)."""
        return self.pack_codes(self.compute_codes_int(x))

    def decode_int(self, codes_int) -> np.ndarray:
        g = pq_ops.pq_decode(jnp.asarray(codes_int.astype(np.int32)), self._dev())
        return np.asarray(g)

    def decode(self, codes) -> np.ndarray:
        return self.decode_int(self.unpack_codes(codes))

    # -- bit packing (reference: impl/ProductQuantizer.h:195-238 encoders) -------
    def pack_codes(self, codes_int: np.ndarray) -> np.ndarray:
        n = len(codes_int)
        if self.nbits == 8:
            return codes_int.astype(np.uint8)
        if self.nbits == 16:
            return (
                codes_int.astype("<u2").view(np.uint8).reshape(n, self.code_size)
            )
        if self.nbits == 4:
            c = codes_int.astype(np.uint8)
            if self.M % 2:
                c = np.concatenate([c, np.zeros((n, 1), np.uint8)], axis=1)
            lo = c[:, 0::2]
            hi = c[:, 1::2]
            return (lo | (hi << 4))[:, : self.code_size]
        # generic bitstring packing (PQEncoderGeneric)
        out = np.zeros((n, self.code_size), np.uint8)
        bit = 0
        for m in range(self.M):
            vals = codes_int[:, m].astype(np.uint64)
            for b in range(self.nbits):
                byte, off = divmod(bit, 8)
                out[:, byte] |= (((vals >> b) & 1) << off).astype(np.uint8)
                bit += 1
        return out

    def unpack_codes(self, codes: np.ndarray) -> np.ndarray:
        codes = np.ascontiguousarray(codes, np.uint8)
        n = len(codes)
        if self.nbits == 8:
            return codes
        if self.nbits == 16:
            return codes.view("<u2").reshape(n, self.M)
        if self.nbits == 4:
            out = np.empty((n, self.M), np.uint8)
            out[:, 0::2] = codes[:, : (self.M + 1) // 2] & 0xF
            out[:, 1::2] = codes[:, : self.M // 2] >> 4
            return out
        out = np.zeros((n, self.M), np.uint16)
        bit = 0
        for m in range(self.M):
            for b in range(self.nbits):
                byte, off = divmod(bit, 8)
                out[:, m] |= ((codes[:, byte] >> off) & 1).astype(np.uint16) << b
                bit += 1
        return out

    # -- distance tables -----------------------------------------------------------
    def compute_distance_tables(self, xq) -> np.ndarray:
        """[nq, M, ksub] squared-L2 ADC tables (ProductQuantizer.h:126)."""
        return np.asarray(
            pq_ops.pq_distance_tables(
                jnp.asarray(np.ascontiguousarray(xq, np.float32)), self._dev()
            )
        )

    def compute_inner_prod_tables(self, xq) -> np.ndarray:
        return np.asarray(
            pq_ops.pq_ip_tables(
                jnp.asarray(np.ascontiguousarray(xq, np.float32)), self._dev()
            )
        )

    def compute_sdc_table(self) -> np.ndarray:
        """Symmetric table [M, ksub, ksub] (ProductQuantizer::compute_sdc_table)."""
        c = self.centroids
        d2 = (
            np.sum(c**2, -1)[:, :, None]
            + np.sum(c**2, -1)[:, None, :]
            - 2 * np.einsum("mkd,mjd->mkj", c, c)
        )
        return np.maximum(d2, 0).astype(np.float32)

    # -- search over raw codes (ProductQuantizer::search) ----------------------------
    def search(self, xq, codes_int, k: int, metric=MetricType.L2):
        xq = np.ascontiguousarray(xq, np.float32)
        if metric == MetricType.L2:
            luts = pq_ops.pq_distance_tables(jnp.asarray(xq), self._dev())
            largest = False
        else:
            luts = pq_ops.pq_ip_tables(jnp.asarray(xq), self._dev())
            largest = True
        D, I = pq_ops.pq_adc_knn(
            luts, jnp.asarray(codes_int.astype(np.int32)), k, largest=largest
        )
        return np.asarray(D), np.asarray(I).astype(np.int64)
