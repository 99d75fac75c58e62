"""RaBitQ indexes — analogue of faiss/IndexRaBitQ.{h,cpp} and
faiss/IndexIVFRaBitQ.{h,cpp}.

Storage is 1 bit/dim + small fp32 factors. The scan unpacks bits on the fly
(VPU shifts) and computes all <q_rot, sign> terms as one MXU contraction —
see codecs/rabitq.py for the estimator. The IVF variant uses the identity
<P(q-c), o> = <Pq, o> - <Pc, o> with <Pc, o> stored per code, so the
query-side GEMM is probe-independent.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Index, query_buckets
from ..codecs.rabitq import RaBitQuantizer
from ..metric import MetricType
from ..ops.topk import merge_topk
from .ivf import IndexIVF


def _unpack_signs(packed, d):
    """uint8 [.., nbytes] -> sign matrix [.., d] in f32 (+-1)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., :, None] >> shifts) & 1  # [.., nbytes, 8]
    bits = bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)[..., :d]
    return 2.0 * bits.astype(jnp.float32) - 1.0


@functools.partial(jax.jit, static_argnames=("k", "d", "db_chunk"))
def _rabitq_knn(qr, qn2, packed, factors, k, d, db_chunk=1 << 15):
    """Flat RaBitQ scan: estimator distances + fused k-select."""
    nq = qr.shape[0]
    nb = packed.shape[0]
    sqrt_d = jnp.sqrt(jnp.float32(d))
    nchunks = max(1, -(-nb // db_chunk))
    pad = nchunks * db_chunk - nb
    pp = jnp.pad(packed, ((0, pad), (0, 0))) if pad else packed
    pp = pp.reshape(nchunks, db_chunk, -1)
    ff = jnp.pad(factors, ((0, pad), (0, 0))) if pad else factors
    ff = ff.reshape(nchunks, db_chunk, 2)

    def body(carry, inputs):
        vals, ids = carry
        ci, pc, fc = inputs
        signs = _unpack_signs(pc, d)  # [chunk, d]
        ip_ob = (
            jax.lax.dot_general(
                qr, signs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            / sqrt_d
        )  # [nq, chunk]
        nr = fc[:, 0][None, :]
        f = fc[:, 1][None, :]
        est = nr * ip_ob / f
        dist = qn2[:, None] + nr * nr - 2.0 * est
        col = jnp.arange(db_chunk, dtype=jnp.int32) + ci * db_chunk
        dist = jnp.where(col[None, :] < nb, dist, jnp.inf)
        kk = min(k, db_chunk)
        cv, cp = jax.lax.approx_min_k(dist, kk)
        cids = jnp.where(col[cp] < nb, col[cp], -1)
        vals, ids = merge_topk(vals, ids, cv, cids, min(k, nb), largest=False)
        return (vals, ids), None

    kk = min(k, nb)
    init = (
        jnp.full((nq, kk), jnp.inf, jnp.float32),
        jnp.full((nq, kk), -1, jnp.int32),
    )
    (vals, ids), _ = jax.lax.scan(body, init, (jnp.arange(nchunks), pp, ff))
    return vals, ids


class IndexRaBitQ(Index):
    """Flat RaBitQ index (reference: IndexRaBitQ.h:20). ``nb_bits > 1``
    selects the multi-bit variant (IndexRaBitQ.h:40, RaBitQuantizerMultiBit):
    scoring becomes a GEMM against the implied scaled code vectors with the
    per-code norm term overridden by f_add — same scan shape, more bits."""

    def __init__(self, d: int, metric=MetricType.L2, nb_bits: int = 1):
        if metric != MetricType.L2:
            raise ValueError("RaBitQ supports L2 only (like the reference)")
        super().__init__(d, metric)
        self.nb_bits = int(nb_bits)
        if self.nb_bits > 1:
            from ..codecs.rabitq import MultiBitRaBitQ

            self.rabitq = MultiBitRaBitQ(d, self.nb_bits)
        else:
            self.rabitq = RaBitQuantizer(d)
        self.is_trained = False
        self.qb = 0  # query quantization bits; 0 = exact fp query (default)
        self.centered = False  # zero-symmetric query SQ range (reference flag)
        self._bits: Optional[np.ndarray] = None
        self._factors: Optional[np.ndarray] = None
        self._ydev = None

    def train(self, x) -> None:
        self.rabitq.train(self._check_input(x))
        self.is_trained = True

    def add(self, x) -> None:
        x = self._check_input(x)
        self._check_trained()
        bits, factors = self.rabitq.encode_parts(x)
        self._bits = bits if self._bits is None else np.concatenate([self._bits, bits])
        self._factors = (
            factors if self._factors is None
            else np.concatenate([self._factors, factors])
        )
        self.ntotal += len(x)
        self._ydev = None

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        nq = len(x)
        D = np.full((nq, k), np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        if self.ntotal == 0:
            return D, I
        if self.nb_bits > 1:
            return self._search_multibit(x, k)
        bits_d = jnp.asarray(self._bits)
        fac_d = jnp.asarray(self._factors)
        for start, padded, real in query_buckets(nq):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            qr, qn2 = self.rabitq.rotate_queries(xq)
            if self.qb:
                from ..codecs.rabitq import quantize_query_sq

                # qn2 stays exact (query_fac.qr_to_c_L2sqr is computed from
                # the unquantized query in the reference too)
                qr = quantize_query_sq(qr, self.qb, self.centered)
            dv, iv = _rabitq_knn(
                jnp.asarray(qr), jnp.asarray(qn2), bits_d, fac_d, k, self.d
            )
            D[start : start + real] = np.asarray(dv)[:real, :k]
            I[start : start + real] = np.asarray(iv)[:real, :k]
        return D, I

    def _search_multibit(self, x, k):
        from ..ops import distances as dops

        if self._ydev is None:
            y = self.rabitq.implied_vectors(self._bits, self._factors)
            self._ydev = (
                jnp.asarray(y),
                jnp.asarray(self._factors[:, 0]),  # f_add = ||r||^2
            )
        y, f_add = self._ydev
        D, I = dops.knn(
            jnp.asarray(x - self.rabitq.center), y, k,
            metric=MetricType.L2, y_norms=f_add,
        )
        return np.asarray(D), np.asarray(I).astype(np.int64)

    def reconstruct_n(self, n0: int, ni: int) -> np.ndarray:
        if self.nb_bits > 1:
            return self.rabitq.decode(
                self._bits[n0 : n0 + ni], self._factors[n0 : n0 + ni],
                self.rabitq.center,
            )
        codes = np.concatenate(
            [self._bits[n0 : n0 + ni],
             self._factors[n0 : n0 + ni].view(np.uint8)], axis=1
        )
        return self.rabitq.decode(codes)

    def sa_code_size(self) -> int:
        return self.rabitq.code_size

    def sa_encode(self, x) -> np.ndarray:
        x = self._check_input(x)
        if self.nb_bits > 1:
            return self.rabitq.pack(*self.rabitq.encode_parts(x))
        return self.rabitq.compute_codes(x)

    def sa_decode(self, codes) -> np.ndarray:
        if self.nb_bits > 1:
            c, f = self.rabitq.unpack(np.asarray(codes, np.uint8))
            return self.rabitq.decode(c, f, self.rabitq.center)
        return self.rabitq.decode(codes)

    def reset(self) -> None:
        self._bits = None
        self._factors = None
        self.ntotal = 0
        self._ydev = None


@functools.partial(jax.jit, static_argnames=("k", "d"))
def _ivf_rabitq_scan(qPo_all, qn2_bias, probes, packed, factors, slot_ids,
                     lengths, k, d):
    """IVF RaBitQ scan. qPo_all [nq, ?]: NOT used — see local computation.

    packed: [nlist, max_len, nbytes]; factors: [nlist, max_len, 3] =
    (nr, f, g=<Pc,o_bar>); qn2_bias = coarse_dis [nq, nprobe] (=||q-c||^2).
    qPo_all: [nq, d] rotated queries Pq (probe-independent).
    """
    nq = qPo_all.shape[0]
    nprobe = probes.shape[1]
    max_len = packed.shape[1]
    sqrt_d = jnp.sqrt(jnp.float32(d))
    col = jnp.arange(max_len, dtype=jnp.int32)

    def body(carry, p):
        vals, ids = carry
        ln = probes[:, p]
        safe = jnp.maximum(ln, 0)
        pc = packed[safe]  # [nq, max_len, nbytes]
        fc = factors[safe]  # [nq, max_len, 3]
        sl = slot_ids[safe]
        signs = _unpack_signs(pc, d)  # [nq, max_len, d]
        ipq = (
            jax.lax.dot_general(
                qPo_all[:, None, :], signs, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, 0, :]
            / sqrt_d
        )  # [nq, max_len] = <Pq, o_bar>
        nr, f, g = fc[..., 0], fc[..., 1], fc[..., 2]
        est = nr * (ipq - g) / f
        dist = qn2_bias[:, p][:, None] + nr * nr - 2.0 * est
        valid = jnp.logical_and(col[None, :] < lengths[safe][:, None],
                                ln[:, None] >= 0)
        dist = jnp.where(valid, dist, jnp.inf)
        sl = jnp.where(valid, sl, -1)
        vals, ids = merge_topk(vals, ids, dist, sl, k, largest=False)
        return (vals, ids), None

    init = (
        jnp.full((nq, k), jnp.inf, jnp.float32),
        jnp.full((nq, k), -1, jnp.int32),
    )
    (vals, ids), _ = jax.lax.scan(body, init, jnp.arange(nprobe))
    return vals, ids


class IndexRaBitQFastScan(IndexRaBitQ):
    """FastScan configuration of IndexRaBitQ (reference:
    IndexRaBitQFastScan.h:39). The reference repacks codes into 32-vector
    SIMD blocks and accumulates the 1-bit dot product in a qb-bit integer
    domain; on TPU the scan is already one device-wide GEMM, so the class
    reduces to the quantized-query operating point: queries are SQ-quantized
    to ``qb`` bits (default 8, like the reference) before the MXU scan.
    ``bbs`` is kept for API parity (block size has no TPU meaning)."""

    def __init__(self, d: int, metric=MetricType.L2, bbs: int = 32,
                 nb_bits: int = 1):
        super().__init__(d, metric, nb_bits)
        self.bbs = int(bbs)
        self.qb = 8
        self.centered = False

    @classmethod
    def from_rabitq(cls, orig: "IndexRaBitQ", bbs: int = 32):
        """Build from an existing IndexRaBitQ (reference constructor
        IndexRaBitQFastScan.cpp: IndexRaBitQFastScan(const IndexRaBitQ&))."""
        out = cls(orig.d, orig.metric_type, bbs, orig.nb_bits)
        out.rabitq = orig.rabitq
        out.is_trained = orig.is_trained
        out._bits = None if orig._bits is None else orig._bits.copy()
        out._factors = None if orig._factors is None else orig._factors.copy()
        out.ntotal = orig.ntotal
        return out


class IndexIVFRaBitQ(IndexIVF):
    """IVF + RaBitQ residual codes (reference: IndexIVFRaBitQ.h:19)."""

    def __init__(self, quantizer, d, nlist, metric=MetricType.L2,
                 nb_bits: int = 1):
        if metric != MetricType.L2:
            raise ValueError("RaBitQ supports L2 only")
        super().__init__(quantizer, d, nlist, metric)
        self.nb_bits = int(nb_bits)
        if self.nb_bits > 1:
            from ..codecs.rabitq import MultiBitRaBitQ

            self.rabitq = MultiBitRaBitQ(d, self.nb_bits)
            self.code_size = self.rabitq.code_size
        else:
            self.rabitq = RaBitQuantizer(d)
            self.code_size = self.rabitq.code_size + 4  # + <Pc, o_bar>
        self.by_residual = True
        self.qb = 0
        self.centered = False

    def train_encoder(self, x, assign) -> None:
        self.rabitq.center = np.zeros(self.d, np.float32)  # residual mode

    def encode_vectors(self, x, listnos):
        centers = self.quantizer.vectors()[listnos]
        if self.nb_bits > 1:
            codes, factors = self.rabitq.encode_parts(x, centers=centers)
            return self.rabitq.pack(codes, factors)
        bits, factors = self.rabitq.encode_parts(x, centers=centers)
        # g = <P c, o_bar>
        nbytes = (self.d + 7) // 8
        ubits = np.unpackbits(bits, axis=1, bitorder="little")[:, : self.d]
        o_bar = (2.0 * ubits - 1.0) / np.sqrt(self.d)
        pc = centers @ self.rabitq.P.T
        g = (pc * o_bar).sum(1).astype(np.float32)
        return np.concatenate(
            [bits, factors.view(np.uint8), g[:, None].view(np.uint8)], axis=1
        )

    def decode_vectors(self, codes, listnos):
        codes = np.ascontiguousarray(codes, np.uint8)
        if self.nb_bits > 1:
            c, f = self.rabitq.unpack(codes)
            return self.rabitq.decode(
                c, f, self.quantizer.vectors()[listnos]
            )
        nbytes = (self.d + 7) // 8
        base = self.rabitq.decode(codes[:, : nbytes + 8])  # center=0 residual
        return base + self.quantizer.vectors()[listnos]

    def _stage_codes(self, slot_ids, lengths, max_len, sorted_ln, ranks, order):
        if self.nb_bits > 1:
            # multi-bit: implied vectors + overridden norm term reuse the
            # standard IVF-flat scan (z = c_l + y, t = ||c_l||^2 + 2<c_l,y>
            # + f_add) — see MultiBitRaBitQ docstring
            pad_codes = np.zeros((self.nlist, max_len, self.d), np.float32)
            pad_norms = np.full((self.nlist, max_len), np.inf, np.float32)
            if self.ntotal:
                c, f = self.rabitq.unpack(self._codes_host[order])
                cents = self.quantizer.vectors()[self._listnos_host[order]]
                y = self.rabitq.implied_vectors(c, f)
                z = (cents + y).astype(np.float32)
                t = (
                    (cents * cents).sum(1)
                    + 2.0 * (cents * y).sum(1)
                    + f[:, 0]
                ).astype(np.float32)
                pad_codes[sorted_ln, ranks] = z
                pad_norms[sorted_ln, ranks] = t
            return {
                "codes": jnp.asarray(pad_codes),
                "slot_ids": jnp.asarray(slot_ids),
                "lengths": jnp.asarray(lengths),
                "code_norms": jnp.asarray(pad_norms),
            }
        nbytes = (self.d + 7) // 8
        pad_bits = np.zeros((self.nlist, max_len, nbytes), np.uint8)
        pad_fac = np.zeros((self.nlist, max_len, 3), np.float32)
        pad_fac[..., 1] = 1.0  # avoid div by zero on padding
        if self.ntotal:
            codes = self._codes_host[order]
            pad_bits[sorted_ln, ranks] = codes[:, :nbytes]
            fac = codes[:, nbytes : nbytes + 8].copy().view(np.float32)
            g = codes[:, nbytes + 8 :].copy().view(np.float32)
            pad_fac[sorted_ln, ranks, 0] = fac[:, 0]
            pad_fac[sorted_ln, ranks, 1] = fac[:, 1]
            pad_fac[sorted_ln, ranks, 2] = g[:, 0]
        return {
            "codes": jnp.asarray(pad_bits),
            "factors": jnp.asarray(pad_fac),
            "slot_ids": jnp.asarray(slot_ids),
            "lengths": jnp.asarray(lengths),
            "code_norms": None,
        }

    def _scan(self, xq_dev, probes, coarse_dis, k, dev, sel_mask):
        if self.nb_bits > 1:
            return IndexIVF._scan(
                self, xq_dev, probes, coarse_dis, k, dev, sel_mask
            )
        del sel_mask  # selector support via post-filter planned
        qP = xq_dev @ jnp.asarray(self.rabitq.P.T)
        if self.qb:
            # device-side qb-bit SQ of the rotated query (codecs.rabitq.
            # quantize_query_sq math). Divergence from the reference
            # (documented): quantization is applied once to P q rather than
            # per-probe to P (q - c_l) — the per-probe shift is carried
            # exactly through the g factor, so only the SQ grid differs.
            levels = float((1 << int(self.qb)) - 1)
            if self.centered:
                amax = jnp.maximum(
                    jnp.max(jnp.abs(qP), 1, keepdims=True), 1e-20
                )
                u = jnp.round((qP + amax) / (2.0 * amax) * levels)
                qP = u * (2.0 * amax / levels) - amax
            else:
                lo = jnp.min(qP, 1, keepdims=True)
                step = (
                    jnp.maximum(jnp.max(qP, 1, keepdims=True) - lo, 1e-20)
                    / levels
                )
                qP = jnp.round((qP - lo) / step) * step + lo
        return _ivf_rabitq_scan(
            qP,
            coarse_dis,
            probes,
            dev["codes"],
            dev["factors"],
            dev["slot_ids"],
            dev["lengths"],
            k,
            self.d,
        )


class IndexIVFRaBitQFastScan(IndexIVFRaBitQ):
    """FastScan configuration of IndexIVFRaBitQ (reference:
    IndexIVFRaBitQFastScan.h:49). Like IndexRaBitQFastScan: the 32-vector
    SIMD block layout has no TPU meaning (the list scan is a batched GEMM),
    so this is the qb-quantized-query operating point with ``bbs`` kept for
    API parity. qb defaults to 8 as in the reference."""

    def __init__(self, quantizer, d, nlist, metric=MetricType.L2,
                 bbs: int = 32, nb_bits: int = 1):
        super().__init__(quantizer, d, nlist, metric, nb_bits)
        self.bbs = int(bbs)
        self.qb = 8

    @classmethod
    def from_ivf_rabitq(cls, orig: "IndexIVFRaBitQ", bbs: int = 32):
        """Build from an existing IndexIVFRaBitQ (reference constructor
        IndexIVFRaBitQFastScan(const IndexIVFRaBitQ&, int bbs))."""
        out = cls(
            orig.quantizer, orig.d, orig.nlist, orig.metric_type, bbs,
            orig.nb_bits,
        )
        out.rabitq = orig.rabitq
        out.is_trained = orig.is_trained
        out.nprobe = orig.nprobe
        for f in ("_codes_host", "_listnos_host", "_ids_host"):
            v = getattr(orig, f)
            setattr(out, f, None if v is None else v.copy())
        out.ntotal = orig.ntotal
        return out
