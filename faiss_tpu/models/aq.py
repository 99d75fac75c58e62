"""Additive-quantizer indexes — analogue of faiss/IndexAdditiveQuantizer.{h,cpp}
and IndexIVFAdditiveQuantizer.{h,cpp}.

Search uses the ST_norm_float decomposition: for L2,
d(q, y) = ||q||^2 - 2 <q, y> + ||y||^2, with <q, y> = sum_m LUT[m, code_m]
(one gather per level) and ||y||^2 stored per code — so the scan is the same
gather+select machinery as PQ with one extra additive term.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Index, query_buckets
from ..codecs.aq import (
    AdditiveQuantizer,
    LocalSearchQuantizer,
    ProductAdditiveQuantizer,
    ProductLocalSearchQuantizer,
    ProductResidualQuantizer,
    ResidualQuantizer,
)
from ..metric import MetricType, is_similarity_metric
from ..ops.topk import merge_topk
from .ivf import IndexIVF


@functools.partial(jax.jit, static_argnames=("k", "largest", "db_chunk"))
def _aq_knn(luts, codes, norms, k, largest=False, db_chunk=1 << 16):
    """Fused AQ scoring + k-select: score = bias - 2*sum_m LUT[m, code_m]
    (+ norm term for L2)."""
    nq, M, K = luts.shape
    nb = codes.shape[0]
    sentinel = -jnp.inf if largest else jnp.inf
    nchunks = max(1, -(-nb // db_chunk))
    pad = nchunks * db_chunk - nb
    cp = jnp.pad(codes, ((0, pad), (0, 0))) if pad else codes
    cp = cp.reshape(nchunks, db_chunk, M)
    npad = jnp.pad(norms, (0, pad)) if pad else norms
    npad = npad.reshape(nchunks, db_chunk)
    flat = luts.reshape(nq, M * K)
    offs = jnp.arange(M, dtype=jnp.int32) * K

    def body(carry, inputs):
        vals, ids = carry
        ci, cc, nn = inputs
        idx = cc.astype(jnp.int32) + offs  # [chunk, M]

        def madd(acc, m):
            return acc + flat[:, idx[:, m]], None

        ipsum, _ = jax.lax.scan(
            madd, jnp.zeros((nq, db_chunk), jnp.float32), jnp.arange(M)
        )
        if largest:
            scores = ipsum  # inner product
        else:
            scores = nn[None, :] - 2.0 * ipsum  # + ||q||^2 added by caller
        col = jnp.arange(db_chunk, dtype=jnp.int32) + ci * db_chunk
        valid = col < nb
        scores = jnp.where(valid[None, :], scores, sentinel)
        kk = min(k, db_chunk)
        if largest:
            cv, cpos = jax.lax.approx_max_k(scores, kk)
        else:
            cv, cpos = jax.lax.approx_min_k(scores, kk)
        cids = jnp.where(valid[cpos], col[cpos], -1)
        vals, ids = merge_topk(vals, ids, cv, cids, min(k, nb), largest=largest)
        return (vals, ids), None

    kk = min(k, nb)
    init = (
        jnp.full((nq, kk), sentinel, jnp.float32),
        jnp.full((nq, kk), -1, jnp.int32),
    )
    (vals, ids), _ = jax.lax.scan(
        body, init, (jnp.arange(nchunks), cp, npad)
    )
    return vals, ids


class IndexAdditiveQuantizer(Index):
    """Flat AQ index (reference: IndexAdditiveQuantizer.h:27)."""

    def __init__(self, d: int, aq: AdditiveQuantizer, metric=MetricType.L2):
        super().__init__(d, metric)
        self.aq = aq
        self.is_trained = aq.is_trained
        self._codes_int: Optional[np.ndarray] = None
        self._norms: Optional[np.ndarray] = None

    def train(self, x) -> None:
        self.aq.train(self._check_input(x))
        self.is_trained = True

    def add(self, x) -> None:
        x = self._check_input(x)
        self._check_trained()
        codes = self.aq.compute_codes_int(x)
        recon = self.aq.decode_int(codes)
        norms = (recon**2).sum(1).astype(np.float32)
        if self.aq._NORM_BYTES.get(self.aq.search_type, 0) == 1:
            # quantized norm storage (ST_norm_qint8/…): search must rank
            # with the SAME norm the code stores (AdditiveQuantizer.h:78)
            norms = self.aq.decode_norms(
                self.aq.encode_norms(norms)
            ).astype(np.float32)
        self._codes_int = (
            codes if self._codes_int is None
            else np.concatenate([self._codes_int, codes])
        )
        self._norms = (
            norms if self._norms is None else np.concatenate([self._norms, norms])
        )
        self.ntotal += len(x)

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        nq = len(x)
        largest = is_similarity_metric(self.metric_type)
        D = np.full((nq, k), -np.inf if largest else np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        if self.ntotal == 0:
            return D, I
        codes = jnp.asarray(self._codes_int.astype(np.int32))
        norms = jnp.asarray(self._norms)
        cb = jnp.asarray(self.aq.codebooks)
        for start, padded, real in query_buckets(nq):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            luts = jnp.einsum("qd,mkd->qmk", jnp.asarray(xq), cb)
            d, i = _aq_knn(luts, codes, norms, k, largest=largest)
            d = np.asarray(d)[:real]
            if not largest:
                d = d + (xq[:real] ** 2).sum(1)[:, None]
                d = np.maximum(d, 0)
            D[start : start + real] = d
            I[start : start + real] = np.asarray(i)[:real]
        return D, I

    def reconstruct_n(self, n0: int, ni: int) -> np.ndarray:
        return self.aq.decode_int(self._codes_int[n0 : n0 + ni])

    def sa_code_size(self) -> int:
        return self.aq.code_size

    def sa_encode(self, x) -> np.ndarray:
        return self.aq.compute_codes(self._check_input(x))

    def sa_decode(self, codes) -> np.ndarray:
        return self.aq.decode(codes)

    def reset(self) -> None:
        self._codes_int = None
        self._norms = None
        self.ntotal = 0


class IndexResidualQuantizer(IndexAdditiveQuantizer):
    """reference: IndexAdditiveQuantizer.h IndexResidualQuantizer."""

    def __init__(self, d: int, M: int, nbits: int = 8, metric=MetricType.L2):
        super().__init__(d, ResidualQuantizer(d, M, nbits), metric)
        self.rq = self.aq


class IndexLocalSearchQuantizer(IndexAdditiveQuantizer):
    def __init__(self, d: int, M: int, nbits: int = 8, metric=MetricType.L2):
        super().__init__(d, LocalSearchQuantizer(d, M, nbits), metric)
        self.lsq = self.aq


class IndexProductResidualQuantizer(IndexAdditiveQuantizer):
    def __init__(self, d, nsplits, Msub, nbits=8, metric=MetricType.L2):
        super().__init__(d, ProductResidualQuantizer(d, nsplits, Msub, nbits), metric)


class IndexProductLocalSearchQuantizer(IndexAdditiveQuantizer):
    def __init__(self, d, nsplits, Msub, nbits=8, metric=MetricType.L2):
        super().__init__(
            d, ProductLocalSearchQuantizer(d, nsplits, Msub, nbits), metric
        )


class IndexIVFAdditiveQuantizer(IndexIVF):
    """IVF + AQ residual codes (reference: IndexIVFAdditiveQuantizer.h).

    Codes stored as int codes + fp32 reconstruction norms; the scan decodes
    through the LUT trick (same as flat AQ) with the coarse term folded in
    by residual encoding: codes encode (x - centroid).
    """

    def __init__(self, quantizer, d, nlist, aq: AdditiveQuantizer,
                 metric=MetricType.L2):
        super().__init__(quantizer, d, nlist, metric)
        self.aq = aq
        self.by_residual = True
        self.code_size = aq.code_size

    def train_encoder(self, x, assign) -> None:
        if self.by_residual:
            x = x - self.quantizer.vectors()[assign]
        self.aq.train(x)

    def encode_vectors(self, x, listnos) -> np.ndarray:
        if self.by_residual:
            x = x - self.quantizer.vectors()[listnos]
        return self.aq.compute_codes_int(x)

    def decode_vectors(self, codes, listnos) -> np.ndarray:
        out = self.aq.decode_int(codes)
        if self.by_residual:
            out = out + self.quantizer.vectors()[listnos]
        return out

    def _stage_codes(self, slot_ids, lengths, max_len, sorted_ln, ranks, order):
        # decode-to-float staging (exact distances, like IVF-SQ); a fused
        # LUT scan kernel is a planned optimization
        d = self.d
        pad_codes = np.zeros((self.nlist, max_len, d), np.float32)
        if self.ntotal:
            pad_codes[sorted_ln, ranks] = self.decode_vectors(
                self._codes_host[order], self._listnos_host[order]
            )
        dev = {
            "codes": jnp.asarray(pad_codes),
            "slot_ids": jnp.asarray(slot_ids),
            "lengths": jnp.asarray(lengths),
        }
        if self.metric_type == MetricType.L2:
            dev["code_norms"] = jnp.sum(jnp.square(dev["codes"]), axis=-1)
        else:
            dev["code_norms"] = None
        return dev

    def sa_code_size(self) -> int:
        return self.aq.code_size


class IndexIVFResidualQuantizer(IndexIVFAdditiveQuantizer):
    def __init__(self, quantizer, d, nlist, M, nbits=8, metric=MetricType.L2):
        super().__init__(quantizer, d, nlist, ResidualQuantizer(d, M, nbits), metric)


class IndexIVFLocalSearchQuantizer(IndexIVFAdditiveQuantizer):
    def __init__(self, quantizer, d, nlist, M, nbits=8, metric=MetricType.L2):
        super().__init__(
            quantizer, d, nlist, LocalSearchQuantizer(d, M, nbits), metric
        )


class IndexAdditiveQuantizerFastScan(IndexAdditiveQuantizer):
    """4-bit AQ with block-batched LUT scan (reference:
    IndexAdditiveQuantizerFastScan.h:29). On TPU the 4-bit configuration
    runs the same MXU LUT-sum scan as the base class — small-ksub tables
    are what make the one-hot contraction cheap — so this class is the
    nbits=4 constraint + the bbs knob, not a separate layout."""

    def __init__(self, d, aq, metric=MetricType.L2, bbs: int = 32):
        if aq.nbits != 4:
            raise ValueError("FastScan requires nbits=4")
        super().__init__(d, aq, metric)
        self.bbs = bbs


class IndexResidualQuantizerFastScan(IndexAdditiveQuantizerFastScan):
    """reference: IndexAdditiveQuantizerFastScan.h:98."""

    def __init__(self, d, M, nbits=4, metric=MetricType.L2, bbs=32):
        super().__init__(d, ResidualQuantizer(d, M, nbits), metric, bbs)


class IndexLocalSearchQuantizerFastScan(IndexAdditiveQuantizerFastScan):
    """reference: IndexAdditiveQuantizerFastScan.h:121."""

    def __init__(self, d, M, nbits=4, metric=MetricType.L2, bbs=32):
        super().__init__(d, LocalSearchQuantizer(d, M, nbits), metric, bbs)


class IndexProductResidualQuantizerFastScan(IndexAdditiveQuantizerFastScan):
    """reference: IndexAdditiveQuantizerFastScan.h:143."""

    def __init__(self, d, nsplits, Msub, nbits=4, metric=MetricType.L2, bbs=32):
        super().__init__(
            d,
            ProductAdditiveQuantizer(d, nsplits, Msub, nbits,
                                     sub_cls=ResidualQuantizer),
            metric,
            bbs,
        )


class IndexProductLocalSearchQuantizerFastScan(IndexAdditiveQuantizerFastScan):
    """reference: IndexAdditiveQuantizerFastScan.h:166."""

    def __init__(self, d, nsplits, Msub, nbits=4, metric=MetricType.L2, bbs=32):
        super().__init__(
            d,
            ProductAdditiveQuantizer(d, nsplits, Msub, nbits,
                                     sub_cls=LocalSearchQuantizer),
            metric,
            bbs,
        )


class IndexIVFAdditiveQuantizerFastScan(IndexIVFAdditiveQuantizer):
    """4-bit IVF AQ (reference: IndexIVFAdditiveQuantizerFastScan.h:33):
    the nbits=4 configuration of the IVF AQ scan + the bbs knob."""

    def __init__(self, quantizer, d, nlist, aq, metric=MetricType.L2, bbs=32):
        if aq.nbits != 4:
            raise ValueError("FastScan requires nbits=4")
        super().__init__(quantizer, d, nlist, aq, metric)
        self.bbs = bbs


class IndexIVFResidualQuantizerFastScan(IndexIVFAdditiveQuantizerFastScan):
    """reference: IndexIVFAdditiveQuantizerFastScan.h:130."""

    def __init__(self, quantizer, d, nlist, M, nbits=4,
                 metric=MetricType.L2, bbs=32):
        super().__init__(
            quantizer, d, nlist, ResidualQuantizer(d, M, nbits), metric, bbs
        )


class IndexIVFLocalSearchQuantizerFastScan(IndexIVFAdditiveQuantizerFastScan):
    """reference: IndexIVFAdditiveQuantizerFastScan.h:145."""

    def __init__(self, quantizer, d, nlist, M, nbits=4,
                 metric=MetricType.L2, bbs=32):
        super().__init__(
            quantizer, d, nlist, LocalSearchQuantizer(d, M, nbits), metric,
            bbs,
        )

class IndexIVFProductResidualQuantizer(IndexIVFAdditiveQuantizer):
    """reference: IndexIVFAdditiveQuantizer.h:141."""

    def __init__(self, quantizer, d, nlist, nsplits, Msub, nbits=8,
                 metric=MetricType.L2):
        super().__init__(
            quantizer, d, nlist,
            ProductAdditiveQuantizer(d, nsplits, Msub, nbits,
                                     sub_cls=ResidualQuantizer),
            metric,
        )


class IndexIVFProductLocalSearchQuantizer(IndexIVFAdditiveQuantizer):
    """reference: IndexIVFAdditiveQuantizer.h:171."""

    def __init__(self, quantizer, d, nlist, nsplits, Msub, nbits=8,
                 metric=MetricType.L2):
        super().__init__(
            quantizer, d, nlist,
            ProductAdditiveQuantizer(d, nsplits, Msub, nbits,
                                     sub_cls=LocalSearchQuantizer),
            metric,
        )


class IndexIVFProductResidualQuantizerFastScan(
    IndexIVFAdditiveQuantizerFastScan
):
    """reference: IndexIVFAdditiveQuantizerFastScan.h:166."""

    def __init__(self, quantizer, d, nlist, nsplits, Msub, nbits=4,
                 metric=MetricType.L2, bbs=32):
        super().__init__(
            quantizer, d, nlist,
            ProductAdditiveQuantizer(d, nsplits, Msub, nbits,
                                     sub_cls=ResidualQuantizer),
            metric, bbs,
        )


class IndexIVFProductLocalSearchQuantizerFastScan(
    IndexIVFAdditiveQuantizerFastScan
):
    """reference: IndexIVFAdditiveQuantizerFastScan.h:147."""

    def __init__(self, quantizer, d, nlist, nsplits, Msub, nbits=4,
                 metric=MetricType.L2, bbs=32):
        super().__init__(
            quantizer, d, nlist,
            ProductAdditiveQuantizer(d, nsplits, Msub, nbits,
                                     sub_cls=LocalSearchQuantizer),
            metric, bbs,
        )
