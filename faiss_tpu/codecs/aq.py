"""Additive quantizers — analogue of faiss/impl/AdditiveQuantizer.{h,cpp},
ResidualQuantizer.{h,cpp}, LocalSearchQuantizer.{h,cpp}.

A vector is approximated by a SUM of M codewords, one from each of M
codebooks of size K (AdditiveQuantizer.h:26). TPU-native formulation:

  - ResidualQuantizer training: greedy level-by-level k-means on residuals
    (the reference trains with beam search, residual_quantizer_encode_steps;
    greedy = beam 1); encoding uses batched BEAM SEARCH where each level is
    one MXU matmul over all (candidate, codeword) pairs plus a top-B select.
  - LocalSearchQuantizer: RQ init + ICM sweeps (the reference uses simulated
    annealing + ICM, LocalSearchQuantizer.cpp); each ICM sweep re-picks one
    level's code with the others fixed — a batched matmul + argmin.
  - Search uses the reference's ST_norm_float decomposition: LUT inner
    products plus a stored per-code float norm (AdditiveQuantizer.h:57).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..callbacks import InterruptCallback

from .pq import Quantizer


@functools.partial(jax.jit, static_argnames=("beam",))
def _beam_search_encode(x, codebooks, beam: int):
    """Batched beam-search encoding.

    x [n, d]; codebooks [M, K, d]. Returns codes [n, M] int32 (best beam).
    State: residuals of the `beam` best prefixes; each level scores all
    beam*K continuations with one batched GEMM and reselects the top beam.
    """
    n, d = x.shape
    M, K, _ = codebooks.shape

    # level 0
    c0 = codebooks[0]
    d2 = (
        jnp.sum(x * x, -1)[:, None]
        + jnp.sum(c0 * c0, -1)[None, :]
        - 2.0 * x @ c0.T
    )  # [n, K]
    b = min(beam, K)
    errs, idx = jax.lax.top_k(-d2, b)  # [n, b]
    errs = -errs
    codes = idx[:, :, None]  # [n, b, 1]
    res = x[:, None, :] - c0[idx]  # [n, b, d]

    for m in range(1, M):
        InterruptCallback.check()
        cm = codebooks[m]  # [K, d]
        # errors of all (beam, K) continuations
        ip = jnp.einsum("nbd,kd->nbk", res, cm, preferred_element_type=jnp.float32)
        e = (
            jnp.sum(res * res, -1)[:, :, None]
            + jnp.sum(cm * cm, -1)[None, None, :]
            - 2.0 * ip
        )  # [n, b, K]
        flat = e.reshape(n, -1)
        errs, sel = jax.lax.top_k(-flat, b)
        errs = -errs
        bsel = sel // K  # which beam entry
        ksel = sel % K  # which codeword
        codes = jnp.concatenate(
            [
                jnp.take_along_axis(codes, bsel[:, :, None], axis=1),
                ksel[:, :, None],
            ],
            axis=2,
        )
        res = (
            jnp.take_along_axis(res, bsel[:, :, None], axis=1) - cm[ksel]
        )
    return codes[:, 0, :].astype(jnp.int32)  # best beam


@functools.partial(jax.jit, static_argnames=())
def _icm_sweep(x, codebooks, codes):
    """One ICM sweep: re-pick each level's code with others fixed
    (LocalSearchQuantizer::icm_encode semantics)."""
    n, d = x.shape
    M, K, _ = codebooks.shape

    def level_update(m, codes):
        recon = _decode_dev(codes, codebooks)
        cm = codebooks[m]
        cur = cm[codes[:, m]]
        target = x - (recon - cur)  # residual excluding level m
        d2 = (
            jnp.sum(target * target, -1)[:, None]
            + jnp.sum(cm * cm, -1)[None, :]
            - 2.0 * target @ cm.T
        )
        new = jnp.argmin(d2, -1).astype(codes.dtype)
        return codes.at[:, m].set(new)

    return jax.lax.fori_loop(0, M, level_update, codes)


def _decode_dev(codes, codebooks):
    M = codebooks.shape[0]
    out = codebooks[0][codes[:, 0]]
    for m in range(1, M):
        out = out + codebooks[m][codes[:, m]]
    return out


class AdditiveQuantizer(Quantizer):
    """Base sum-of-codebooks codec (reference: AdditiveQuantizer.h:26)."""

    # search_type values (AdditiveQuantizer.h:57 Search_type_t; numeric
    # values diverge from the reference enum — ST_norm_float predates the
    # rest here and is pinned by serialized indexes)
    ST_decompress = 0
    ST_LUT_nonorm = 1
    ST_norm_from_LUT = 2
    ST_norm_float = 4
    ST_norm_qint8 = 5
    ST_norm_qint4 = 6
    ST_norm_cqint8 = 7
    ST_norm_cqint4 = 8
    ST_norm_lsq2x4 = 9
    ST_norm_rq2x4 = 10

    # bytes appended to the packed code for the stored norm (the reference
    # bit-packs 4-bit norms into the code bitstream; here norm storage is
    # byte-aligned for array-sliceable decode)
    _NORM_BYTES = {0: 0, 1: 0, 2: 0, 4: 4, 5: 1, 6: 1, 7: 1, 8: 1, 9: 1, 10: 1}

    def __init__(self, d: int, M: int, nbits: int = 8):
        self.M = int(M)
        self.nbits = int(nbits)
        self.K = 1 << self.nbits
        super().__init__(d, (M * nbits + 7) // 8 + 4)  # + float32 norm
        self.codebooks: Optional[np.ndarray] = None  # [M, K, d]
        self.search_type = self.ST_norm_float
        self.norm_min = self.norm_max = float("nan")
        self.qnorm: Optional[np.ndarray] = None  # cqint / lsq2x4 / rq2x4
        self.norm_tabs: Optional[np.ndarray] = None  # [2,16] fastscan tables
        self.verbose = False

    @property
    def is_trained(self) -> bool:
        return self.codebooks is not None

    def set_search_type(self, st: int) -> None:
        """Select the norm storage mode (AdditiveQuantizer.h:72); resizes
        code_size accordingly. Call before train()."""
        if st not in self._NORM_BYTES:
            raise ValueError(f"unknown search_type {st}")
        self.search_type = st
        self.code_size = (self.M * self.nbits + 7) // 8 + self._NORM_BYTES[st]

    # -- norm storage (AdditiveQuantizer.cpp train_norm/encode_norm) -------
    def train_norm(self, norms: np.ndarray) -> None:
        norms = np.ascontiguousarray(norms, np.float32).ravel()
        self.norm_min = float(norms.min())
        self.norm_max = float(norms.max())
        st = self.search_type
        if st in (self.ST_norm_cqint8, self.ST_norm_cqint4):
            k = 256 if st == self.ST_norm_cqint8 else 16
            # the reference trains the norm codebook with an exact 1-D DP
            # (Clustering1D::train_exact); quantile-initialized 1-D Lloyd
            # converges to the same codebook here at O(n log k)/iter —
            # clustering.kmeans1d remains the exact-DP utility
            sub = np.sort(norms[: 1 << 16])
            uniq = np.unique(sub)
            if len(uniq) <= k:
                self.qnorm = np.resize(uniq, k).astype(np.float32)
                return
            cents = np.quantile(sub, (np.arange(k) + 0.5) / k)
            for _ in range(25):
                bounds = (cents[1:] + cents[:-1]) / 2
                a = np.searchsorted(bounds, sub)
                sums = np.bincount(a, weights=sub, minlength=k)
                cnts = np.bincount(a, minlength=k)
                nz = cnts > 0
                cents[nz] = sums[nz] / cnts[nz]
            self.qnorm = cents.astype(np.float32)
        elif st in (self.ST_norm_lsq2x4, self.ST_norm_rq2x4):
            sub_cls = (
                LocalSearchQuantizer
                if st == self.ST_norm_lsq2x4
                else ResidualQuantizer
            )
            sub = sub_cls(1, 2, 4)
            sub.train(norms[: 1 << 16, None])
            c = sub.codebooks[:, :, 0]  # [2, 16]
            self.norm_tabs = c.astype(np.float32)
            # flat 256-entry table: entry i*16+j reconstructs c0[j] + c1[i]
            self.qnorm = (c[1][:, None] + c[0][None, :]).ravel().astype(
                np.float32
            )

    def encode_norms(self, norms: np.ndarray) -> np.ndarray:
        """uint8 [n, norm_bytes] norm payload for the packed codes."""
        norms = np.ascontiguousarray(norms, np.float32).ravel()
        st = self.search_type
        if st == self.ST_norm_float:
            return norms[:, None].view(np.uint8)
        if st in (self.ST_norm_qint8, self.ST_norm_qint4):
            scale = 256 if st == self.ST_norm_qint8 else 16
            span = max(self.norm_max - self.norm_min, 1e-20)
            i = np.floor((norms - self.norm_min) / span * scale)
            return np.clip(i, 0, scale - 1).astype(np.uint8)[:, None]
        if self.qnorm is not None:  # cqint / lsq2x4 / rq2x4: nearest entry
            i = np.abs(norms[:, None] - self.qnorm[None, :]).argmin(1)
            return i.astype(np.uint8)[:, None]
        return np.zeros((len(norms), 0), np.uint8)

    def decode_norms(self, codes: np.ndarray) -> Optional[np.ndarray]:
        """Stored reconstruction norms from packed codes (f32 [n])."""
        st = self.search_type
        nb = self._NORM_BYTES[st]
        if nb == 0:
            return None
        tail = np.ascontiguousarray(codes[:, codes.shape[1] - nb :])
        if st == self.ST_norm_float:
            return tail.view(np.float32).ravel()
        i = tail[:, 0].astype(np.float32)
        if st in (self.ST_norm_qint8, self.ST_norm_qint4):
            scale = 256 if st == self.ST_norm_qint8 else 16
            return (i + 0.5) / scale * (self.norm_max - self.norm_min) + (
                self.norm_min
            )
        return self.qnorm[tail[:, 0]]

    def _dev(self):
        return jnp.asarray(self.codebooks)

    def compute_codes_int(self, x) -> np.ndarray:
        raise NotImplementedError

    def compute_codes(self, x) -> np.ndarray:
        """Packed codes + trailing stored norm (format per search_type)."""
        codes_int = self.compute_codes_int(x)
        from .pq import ProductQuantizer

        helper = ProductQuantizer.__new__(ProductQuantizer)
        helper.M, helper.nbits, helper.code_size = (
            self.M,
            self.nbits,
            (self.M * self.nbits + 7) // 8,
        )
        packed = ProductQuantizer.pack_codes(helper, codes_int)
        if self._NORM_BYTES[self.search_type] == 0:
            return packed
        recon = self.decode_int(codes_int)
        norms = (recon**2).sum(1).astype(np.float32)
        return np.concatenate([packed, self.encode_norms(norms)], axis=1)

    def unpack_codes(self, codes) -> np.ndarray:
        from .pq import ProductQuantizer

        helper = ProductQuantizer.__new__(ProductQuantizer)
        helper.M, helper.nbits, helper.code_size = (
            self.M,
            self.nbits,
            (self.M * self.nbits + 7) // 8,
        )
        return ProductQuantizer.unpack_codes(
            helper, codes[:, : helper.code_size]
        )

    def decode_int(self, codes_int) -> np.ndarray:
        return np.asarray(
            _decode_dev(jnp.asarray(codes_int.astype(np.int32)), self._dev())
        )

    def decode(self, codes) -> np.ndarray:
        return self.decode_int(self.unpack_codes(np.ascontiguousarray(codes, np.uint8)))

    def _maybe_train_norm(self, x) -> None:
        """After codebook training: fit the norm quantizer on the
        reconstruction norms of a training subsample
        (AdditiveQuantizer.cpp train_norm callers)."""
        if self.search_type in (
            self.ST_norm_qint8, self.ST_norm_qint4, self.ST_norm_cqint8,
            self.ST_norm_cqint4, self.ST_norm_lsq2x4, self.ST_norm_rq2x4,
        ):
            sub = np.ascontiguousarray(x[:8192], np.float32)
            recon = self.decode_int(self.compute_codes_int(sub))
            self.train_norm((recon**2).sum(1))

    def compute_LUT(self, xq) -> np.ndarray:
        """Per-query IP tables [nq, M, K] (AdditiveQuantizer::compute_LUT)."""
        cb = self.codebooks
        return np.einsum("qd,mkd->qmk", np.ascontiguousarray(xq, np.float32), cb)


class ResidualQuantizer(AdditiveQuantizer):
    """reference: impl/ResidualQuantizer.h:22."""

    def __init__(self, d: int, M: int, nbits: int = 8):
        super().__init__(d, M, nbits)
        self.max_beam_size = 5
        self.train_iters = 15  # k-means iters per level

    def train(self, x) -> None:
        from ..ops.kmeans_ops import batched_kmeans

        x = np.ascontiguousarray(x, np.float32)
        n = len(x)
        max_n = self.K * 256
        if n > max_n:
            x = x[np.random.RandomState(123).permutation(n)[:max_n]]
            n = max_n
        res = x.copy()
        codebooks = np.zeros((self.M, self.K, self.d), np.float32)
        rs = np.random.RandomState(123)
        for m in range(self.M):
            init = res[rs.permutation(n)[: self.K]]
            cb = np.asarray(
                batched_kmeans(
                    jnp.asarray(res[None]),
                    jnp.asarray(init[None]),
                    self.K,
                    self.train_iters,
                )
            )[0]
            codebooks[m] = cb
            d2 = (
                (res**2).sum(1)[:, None]
                + (cb**2).sum(1)[None, :]
                - 2 * res @ cb.T
            )
            assign = d2.argmin(1)
            res = res - cb[assign]
        self.codebooks = codebooks
        self._maybe_train_norm(x)

    def compute_codes_int(self, x) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float32)
        codes = _beam_search_encode(
            jnp.asarray(x), self._dev(), self.max_beam_size
        )
        return np.asarray(codes).astype(
            np.uint8 if self.nbits <= 8 else np.uint16
        )


class LocalSearchQuantizer(AdditiveQuantizer):
    """reference: impl/LocalSearchQuantizer.h:24 — RQ init + iterated
    local search: each ILS iteration PERTURBS ``nperts`` random levels of
    the best codes, re-optimizes with ICM sweeps, and keeps the candidate
    rows whose reconstruction improved (the reference's perturbation/
    accept loop, LocalSearchQuantizer.cpp icm_encode; batched per-row on
    device instead of per-vector)."""

    def __init__(self, d: int, M: int, nbits: int = 8):
        super().__init__(d, M, nbits)
        self.encode_ils_iters = 4  # perturb+ICM rounds at encode time
        self.icm_iters = 2  # ICM sweeps per ILS round
        self.nperts = min(4, M)  # levels perturbed per round (LSQ.h:42)
        self.train_ils_iters = 2
        self._rq = ResidualQuantizer(d, M, nbits)

    def train(self, x) -> None:
        self._rq.train(x)
        self.codebooks = self._rq.codebooks
        # refine codebooks: alternate (ICM encode, least-squares update)
        x = np.ascontiguousarray(x, np.float32)[: self.K * 64]
        for _ in range(self.train_ils_iters):
            codes = self.compute_codes_int(x)
            # least-squares codebook update: solve for all codewords jointly
            # via normal equations on the one-hot design matrix
            onehot = np.zeros((len(x), self.M * self.K), np.float32)
            for m in range(self.M):
                onehot[np.arange(len(x)), m * self.K + codes[:, m]] = 1
            gram = onehot.T @ onehot + 1e-3 * np.eye(self.M * self.K, dtype=np.float32)
            rhs = onehot.T @ x
            sol = np.linalg.solve(gram, rhs)
            self.codebooks = sol.reshape(self.M, self.K, self.d).astype(np.float32)
        self._maybe_train_norm(x)

    def compute_codes_int(self, x) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float32)
        self._rq.codebooks = self.codebooks
        codes = jnp.asarray(
            self._rq.compute_codes_int(x).astype(np.int32)
        )
        xd = jnp.asarray(x)
        cb = self._dev()

        def row_err(c):
            r = _decode_dev(c, cb) - xd
            return jnp.sum(r * r, axis=1)

        from ..callbacks import InterruptCallback

        for _ in range(self.icm_iters):
            InterruptCallback.check()
            codes = _icm_sweep(xd, cb, codes)
        best, best_err = codes, row_err(codes)
        rng = np.random.RandomState(0x15C)
        n = len(x)
        for _ in range(max(0, self.encode_ils_iters - 1)):
            InterruptCallback.check()
            # perturb nperts random levels per row, re-optimize, keep wins
            levels = rng.randint(self.M, size=(n, self.nperts))
            vals = rng.randint(self.K, size=(n, self.nperts))
            cand = best.at[
                jnp.arange(n, dtype=jnp.int32)[:, None],
                jnp.asarray(levels, jnp.int32),
            ].set(jnp.asarray(vals, best.dtype))
            for _ in range(self.icm_iters):
                cand = _icm_sweep(xd, cb, cand)
            err = row_err(cand)
            win = err < best_err
            best = jnp.where(win[:, None], cand, best)
            best_err = jnp.minimum(err, best_err)
        return np.asarray(best).astype(
            np.uint8 if self.nbits <= 8 else np.uint16
        )


class ProductAdditiveQuantizer(AdditiveQuantizer):
    """Independent AQs over dimension splits
    (reference: impl/ProductAdditiveQuantizer.h)."""

    def __init__(self, d: int, nsplits: int, Msub: int, nbits: int = 8,
                 sub_cls=ResidualQuantizer):
        if d % nsplits:
            raise ValueError("d must be divisible by nsplits")
        super().__init__(d, nsplits * Msub, nbits)
        self.nsplits = nsplits
        self.dsub = d // nsplits
        self.subs = [sub_cls(self.dsub, Msub, nbits) for _ in range(nsplits)]

    def train(self, x) -> None:
        x = np.ascontiguousarray(x, np.float32)
        Msub = self.M // self.nsplits
        codebooks = np.zeros((self.M, self.K, self.d), np.float32)
        for s, sub in enumerate(self.subs):
            xs = x[:, s * self.dsub : (s + 1) * self.dsub]
            sub.train(xs)
            # embed sub-codebooks into the full-d codebook (zero elsewhere)
            codebooks[
                s * Msub : (s + 1) * Msub,
                :,
                s * self.dsub : (s + 1) * self.dsub,
            ] = sub.codebooks
        self.codebooks = codebooks
        self._maybe_train_norm(x)

    def compute_codes_int(self, x) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float32)
        outs = []
        for s, sub in enumerate(self.subs):
            outs.append(
                sub.compute_codes_int(x[:, s * self.dsub : (s + 1) * self.dsub])
            )
        return np.concatenate(outs, axis=1)


class ProductResidualQuantizer(ProductAdditiveQuantizer):
    def __init__(self, d, nsplits, Msub, nbits=8):
        super().__init__(d, nsplits, Msub, nbits, ResidualQuantizer)


class ProductLocalSearchQuantizer(ProductAdditiveQuantizer):
    def __init__(self, d, nsplits, Msub, nbits=8):
        super().__init__(d, nsplits, Msub, nbits, LocalSearchQuantizer)
