"""Exact brute-force indexes — the analogue of faiss/IndexFlat.{h,cpp}.

IndexFlat stores raw float32 vectors and answers exact k-NN by fused
chunked-GEMM + k-select on the MXU (ops/distances.knn), replacing the
reference's BLAS-tiled scan + heap ResultHandlers (IndexFlat.cpp:40-60).
IndexFlatL2 caches database norms like the reference's cached sync_l2norms
(IndexFlat.h:98).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Index, RangeSearchResult, SearchParameters, query_buckets
from ..metric import MetricType, is_similarity_metric
from ..ops import distances as dops


@functools.partial(jax.jit, static_argnames=("d_pad", "nbp", "metric_l2"))
def _stage_flat_screen(xb, d_pad, nbp, metric_l2):
    """Screen store for the recon-kernel flat path: the vectors as TWO
    stacked transposed bf16 planes (hi parts then lo residuals — together
    f32-faithful to ~2^-17, which is what lets the exactness certificate
    pass: a single bf16 plane's worst-case bound swamps real top-k gaps),
    plus per-row screen keys (exact ||y||^2 for L2, 0 for IP; +inf on
    pads) and the max row norm (certification scale)."""
    xbf = xb.astype(jnp.float32)
    nb, d = xbf.shape
    n2 = jnp.sum(jnp.square(xbf), axis=1)
    # reduce_precision, NOT a bf16 cast round-trip: under XLA's
    # allow-excess-precision the round-trip folds away and the lo plane
    # silently becomes zero (measured: wrong neighbors at 2.4e-2)
    hi32 = jax.lax.reduce_precision(xbf, 8, 7)
    hi = hi32.astype(jnp.bfloat16)
    lo = (xbf - hi32).astype(jnp.bfloat16)
    yT_hi = jnp.pad(hi.T, ((0, d_pad - d), (0, nbp - nb)))
    yT_lo = jnp.pad(lo.T, ((0, d_pad - d), (0, nbp - nb)))
    vals = n2 if metric_l2 else jnp.zeros_like(n2)
    n2s = jnp.pad(vals, (0, nbp - nb), constant_values=jnp.inf)[None]
    return yT_hi, yT_lo, n2s, jnp.sqrt(jnp.max(n2))


@functools.partial(
    jax.jit, static_argnames=("k", "qt", "ct", "metric_l2", "interpret")
)
def _flat_screen_program(
    xq, yT_hi, yT_lo, n2s, xb, ymax, k, qt, ct, metric_l2, carry=None,
    interpret=False,
):
    """bf16 screen + EXACT re-rank + per-row exactness certificate, one
    device program. The screen is the recon-GEMM kernel (hi/lo bf16 query
    against the bf16 store, ~14x less MXU work than the f32-HIGHEST
    6-pass kernel); the top-128 candidates are re-ranked exactly in f32.
    A row is certified exact iff (a) its exact k-th key clears the 128th
    screen key by delta = 2^-12 ||q|| max||y|| (the hi/lo-store cross-term
    error bound with margin), so no excluded point can beat it, and
    (b) the eviction floor clears the same bound (no queue loss can
    either).
    Uncertified rows are re-run through the f32 path by the caller —
    the composite stays exact (IndexFlat contract, IndexFlat.cpp:40)."""
    from ..ops.distances import rerank_exact
    from ..ops.pallas_knn import LANES, ivf_recon_fused_pallas

    nq, d = xq.shape
    d_pad = yT_hi.shape[0]
    xqp = jnp.pad(xq, ((0, 0), (0, d_pad - d))) if d_pad > d else xq
    dummy_lid = jnp.zeros((1, 1), jnp.int32)
    v, idx, ev = ivf_recon_fused_pallas(
        xqp, yT_hi, n2s, dummy_lid, None, yT_lo=yT_lo, qt=qt, ct=ct,
        qdepth=3, interpret=interpret,
    )
    metric = MetricType.L2 if metric_l2 else MetricType.INNER_PRODUCT
    D, I = rerank_exact(xq, xb, idx, k, metric=metric)
    qn = jnp.sum(jnp.square(xq), axis=1)
    if metric_l2:
        key_k = D[:, k - 1] - qn  # kernel-key space (missing ||q||^2)
    else:
        key_k = -2.0 * D[:, k - 1]  # kernel key = -2 q.y
    # hi/lo store + hi/lo query: the dropped ql.yl term is bounded by
    # 2^-15 ||q|| ||y||; f32 accumulation and the n2-vs-rerank provenance
    # difference add ~d*2^-24 * scale terms. 2^-12 carries an 8x margin
    # over the sum (2^-14 was measured UNSOUND: one of 17 sampled rows
    # returned a wrong neighbor at 2.4e-2 relative)
    delta = (2.0**-12) * jnp.sqrt(qn) * ymax
    flag = jnp.logical_or(
        key_k > v[:, LANES - 1] - delta,
        jnp.min(ev, -1) < key_k + delta,
    )
    out = jnp.concatenate(
        [D, I.astype(jnp.float32), flag.astype(jnp.float32)[:, None]],
        axis=1,
    )
    if carry is not None:
        # chain the previous sub-batch's packed rows through this program
        # so ALL sub-batches come home in ONE device->host read (each read
        # costs a ~38 ms tunnel round trip — the ivf_pq.py carry pattern)
        out = jnp.concatenate([carry, out], axis=0)
    return out


# striped large-k path counters (benchs/smoke_tpu + job_flat gates)
striped_stats = {"nq": 0, "flagged": 0, "storms": 0}


def _pack_flat_lk(D, I, flag, pack16):
    """Pack (D f32 [nq,k], I int32, flag bool) into one int32 buffer:
    ids always exact int32; D as f32-bitcast lanes (exact) or f16 pairs
    (pack16)."""
    if pack16:
        d16 = D.astype(jnp.float16)
        if D.shape[1] % 2:
            d16 = jnp.pad(d16, ((0, 0), (0, 1)))
        u16 = jax.lax.bitcast_convert_type(d16, jnp.uint16).astype(jnp.uint32)
        dpk = jax.lax.bitcast_convert_type(
            u16[:, 0::2] | (u16[:, 1::2] << 16), jnp.int32
        )
    else:
        dpk = jax.lax.bitcast_convert_type(D, jnp.int32)
    return jnp.concatenate(
        [I.astype(jnp.int32), dpk, flag.astype(jnp.int32)[:, None]], axis=1
    )


def _unpack_flat_lk(packed, k, pack16):
    packed = np.asarray(packed)
    I = packed[:, :k]
    if pack16:
        kh = (k + 1) // 2
        D = np.ascontiguousarray(packed[:, k : k + kh]).view(
            np.float16
        )[:, :k].astype(np.float32)
        off = k + kh
    else:
        D = np.ascontiguousarray(packed[:, k : 2 * k]).view(np.float32)
        off = 2 * k
    return D, I, packed[:, off] != 0


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "qt", "ct", "P", "u", "metric_l2", "pack16", "interpret"
    ),
)
def _flat_striped_program(
    xq, yT_hi, yT_lo, n2s, xb, ymax, k, qt, ct, P, u, metric_l2,
    pack16=False, carry=None, interpret=False,
):
    """Large-k (k > SCREEN_MAX_K) exact flat search: stripe-parallel
    bf16 screen + union re-rank + certificate, one device program.

    The insert-cascade select's cost scales with k_lanes (k=1024 measured
    7.9 s / 8192 q — 7x below BASELINE row 9); this path never runs a
    large-k select. The store is split into P contiguous column stripes
    (both bench datasets are i.i.d. ROW-ordered, so a stripe is a uniform
    sample: true top-k membership per stripe ~ Binomial(k, 1/P), mean
    k/P << 128); each stripe runs the FAST 128-lane screen kernel, the
    P*128 screened candidates merge by key, the top-u re-rank exactly in
    f32 (query-chunked — one [nq, u, d] gather is a 3.2 GB transient).

    Certificate (per query, delta = the hi/lo screen error bound): exact
    iff no stripe could hide a true top-k member —
      (a) every stripe's worst KEPT key clears key_k + delta (no >128
          overflow), (b) no stripe's eviction floor dips below it, and
      (c) the union's u-th admitted key clears it (no truncation loss).
    Flagged rows re-run through the exact f32 path (reference analogue:
    BlockSelect over tile partials, gpu/utils/BlockSelectKernel.cuh).

    Results pack into ONE int32 buffer: exact int32 ids + distances as
    f32 BITCAST lanes (integer lanes pass the pipeline untouched) — the
    exact-D default; ``pack16`` packs f16 distance pairs instead (~25%
    less wire at k=1024: the f32 readback alone is ~67 MB per 8192 q on
    a 45 MB/s wire; ids and recall unaffected — the serving bench's
    pack_d2h='f16' opt-in)."""
    from ..ops.distances import rerank_exact
    from ..ops.pallas_knn import LANES, ivf_recon_fused_pallas

    nq, d = xq.shape
    d_pad = yT_hi.shape[0]
    xqp = jnp.pad(xq, ((0, 0), (0, d_pad - d))) if d_pad > d else xq
    W = yT_hi.shape[1] // P
    dummy_lid = jnp.zeros((1, 1), jnp.int32)
    vs, idxs, evmins = [], [], []
    for s in range(P):
        sl = slice(s * W, (s + 1) * W)
        v, idx, ev = ivf_recon_fused_pallas(
            xqp, yT_hi[:, sl], n2s[:, sl], dummy_lid, None,
            # qdepth 4 (not the screen path's 3): stripe queues see k/P
            # true members against 128 lanes, and every eviction loss
            # near the global k-th costs a whole-query repair
            yT_lo=yT_lo[:, sl], qt=qt, ct=ct, qdepth=4,
            interpret=interpret,
        )
        vs.append(v)
        idxs.append(idx + jnp.int32(s * W))
        evmins.append(jnp.min(ev, -1))
    V = jnp.concatenate(vs, axis=1)  # [nq, P*LANES] screen keys (min=best)
    X = jnp.concatenate(idxs, axis=1)
    nv, pos = jax.lax.top_k(-V, u)
    cand = jnp.take_along_axis(X, pos, axis=1)
    # store-pad columns carry +inf screen keys; if one is admitted
    # (underfull tail stripe) its clamped gather would DUPLICATE a real
    # row — mask to -1 (rerank_exact's missing-candidate sentinel)
    cand = jnp.where(nv > -jnp.inf, cand, -1)
    u_kth = -nv[:, u - 1]
    metric = MetricType.L2 if metric_l2 else MetricType.INNER_PRODUCT

    # query-chunked exact re-rank: bound the [blk, u, d] gather transient
    blk = max(1, min(nq, (1 << 28) // max(1, u * d * 4)))
    while nq % blk:
        blk -= 1

    def rr(args):
        xq_b, cand_b = args
        return rerank_exact(xq_b, xb, cand_b, k, metric=metric)

    D, I = jax.lax.map(
        rr,
        (xq.reshape(nq // blk, blk, d), cand.reshape(nq // blk, blk, u)),
    )
    D = D.reshape(nq, k)
    I = I.reshape(nq, k)

    qn = jnp.sum(jnp.square(xq), axis=1)
    key_k = D[:, k - 1] - qn if metric_l2 else -2.0 * D[:, k - 1]
    # same error-bound anatomy as _flat_screen_program (2^-12 carries an
    # 8x margin over the hi/lo cross-term + accumulation terms)
    delta = (2.0**-12) * jnp.sqrt(qn) * ymax
    bound = key_k + delta
    worst_kept = jnp.stack([v[:, LANES - 1] for v in vs], axis=1)
    ev_min = jnp.stack(evmins, axis=1)
    flag = (
        (u_kth <= bound)
        | jnp.any(worst_kept <= bound[:, None], axis=1)
        | jnp.any(ev_min <= bound[:, None], axis=1)
    )
    out = _pack_flat_lk(D, I.astype(jnp.int32), flag, pack16)
    if carry is not None:
        out = jnp.concatenate([carry, out], axis=0)
    return out


class IndexFlat(Index):
    """Exact exhaustive index (reference: faiss/IndexFlat.h:23)."""

    # db sizes below this use the plain XLA path (padding overhead dominates)
    PALLAS_MIN_NB = 16384

    def __init__(self, d: int, metric=MetricType.L2, metric_arg: float = 0.0):
        super().__init__(d, metric, metric_arg)
        self._pending = []  # host-side staged adds
        self._xb = None  # consolidated device array [ntotal, d]
        self._norms = None  # cached device L2 norms
        self._xbT = None  # transposed padded device copy for the fused kernel
        self._screen = None  # bf16 screen store (yT, n2s, ymax)
        self._screen_lk = None  # large-k striped variant (+perm pad)
        # device storage dtype: np.float16 halves HBM + upload time at
        # ~2^-11 rounding (GpuIndexFlatConfig.useFloat16, gpu/GpuIndexFlat.h)
        self.storage_dtype = np.float32

    # -- population -------------------------------------------------------
    def add(self, x) -> None:
        from ..base import staged_device

        x = self._check_input(x)
        if len(x) == 0:
            return
        dev = staged_device(x)
        if dev is not None and not self._pending:
            # an add flow already uploaded this batch — append the device
            # copy directly instead of re-uploading at consolidation
            import jax.numpy as jnp

            dev = dev.astype(jnp.dtype(self.storage_dtype))
            self._xb = (
                dev if self._xb is None else jnp.concatenate([self._xb, dev])
            )
            self._norms = None
            self._xbT = None
            self._screen = None
            self._screen_lk = None
            self.ntotal += len(x)
            return
        self._pending.append(x)
        self.ntotal += len(x)

    def reset(self) -> None:
        self._pending = []
        self._xb = None
        self._norms = None
        self._xbT = None
        self._screen = None
        self._screen_lk = None
        self.ntotal = 0

    def merge_from(self, other: "IndexFlat", add_id: int = 0) -> None:
        del add_id  # flat ids are sequential
        if other.d != self.d or other.metric_type != self.metric_type:
            raise ValueError("incompatible indexes for merge")
        if other.ntotal:
            self.add(other.vectors())
        other.reset()

    def remove_ids(self, sel) -> int:
        xb = self.vectors()
        ids = np.arange(self.ntotal, dtype=np.int64)
        keep = ~sel.mask_for_ids(ids)
        nremoved = int((~keep).sum())
        self.reset()
        if keep.any():
            self.add(xb[keep])
        return nremoved

    # -- device staging -----------------------------------------------------
    def _consolidate(self):
        if self._pending:
            parts = []
            if self._xb is not None:
                parts.append(np.asarray(self._xb))
            parts.extend(self._pending)
            host = np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            self._xb = jnp.asarray(host.astype(self.storage_dtype, copy=False))
            self._pending = []
            self._norms = None
            self._xbT = None
            self._screen = None
            self._screen_lk = None
        if self._xb is not None and self._norms is None and (
            self.metric_type == MetricType.L2
        ):
            # l2_norms handles the f32 upcast chunked (a one-piece upcast
            # of a 10M-row fp16 store is a 4 GB transient)
            self._norms = dops.l2_norms(self._xb)
        return self._xb

    def vectors(self) -> np.ndarray:
        """All stored vectors as numpy [ntotal, d]."""
        xb = self._consolidate()
        if xb is None:
            return np.empty((0, self.d), dtype=np.float32)
        return np.asarray(xb, dtype=np.float32)

    # -- queries ------------------------------------------------------------
    def search(
        self, x, k: int, *, params: Optional[SearchParameters] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        x = self._check_input(x)
        if k < 1:
            raise ValueError("k must be >= 1")
        nq = len(x)
        largest = is_similarity_metric(self.metric_type)
        D = np.full((nq, k), -np.inf if largest else np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        xb = self._consolidate()
        if xb is None or nq == 0:
            return D, I

        y_mask = None
        if params is not None and params.sel is not None:
            mask_host = params.sel.mask_for_ids(
                np.arange(self.ntotal, dtype=np.int64)
            )
            y_mask = jnp.asarray(mask_host)

        if y_mask is None and self._use_fused_kernel(k):
            return self._search_fused(x, k, D, I)

        for start, padded, real in query_buckets(nq):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            d, i = dops.knn(
                jnp.asarray(xq),
                xb.astype(jnp.float32),
                k,
                metric=self.metric_type,
                metric_arg=self.metric_arg,
                y_norms=self._norms,
                y_mask=y_mask,
            )
            D[start : start + real] = np.asarray(d)[:real]
            I[start : start + real] = np.asarray(i)[:real]
        return D, I

    def range_search(
        self, x, radius: float, *, params: Optional[SearchParameters] = None
    ) -> RangeSearchResult:
        """Exact range search (reference: IndexFlat range_search).

        Chunked distance tiles; thresholding and CSR assembly happen on host
        (the variable-size output cannot live under jit — the reference's
        RangeSearchPartialResult buffering, AuxIndexStructures.h:66).
        """
        x = self._check_input(x)
        xb = self._consolidate()
        nq = len(x)
        largest = is_similarity_metric(self.metric_type)
        lims = np.zeros(nq + 1, dtype=np.uint64)
        if xb is None or nq == 0:
            return RangeSearchResult(
                lims, np.empty(0, np.float32), np.empty(0, np.int64)
            )
        sel_mask = None
        if params is not None and params.sel is not None:
            sel_mask = params.sel.mask_for_ids(np.arange(self.ntotal, np.int64))

        all_d, all_i = [[] for _ in range(nq)], [[] for _ in range(nq)]
        chunk = 1 << 16
        for c0 in range(0, self.ntotal, chunk):
            c1 = min(c0 + chunk, self.ntotal)
            Dt = np.asarray(
                dops.pairwise_distances(
                    jnp.asarray(x), xb[c0:c1], self.metric_type, self.metric_arg
                )
            )
            hit = Dt > radius if largest else Dt < radius
            if sel_mask is not None:
                hit &= sel_mask[None, c0:c1]
            qi, ci = np.nonzero(hit)
            for q, c, dv in zip(qi, ci + c0, Dt[qi, ci]):
                all_d[q].append(dv)
                all_i[q].append(c)
        counts = np.array([len(v) for v in all_i], dtype=np.uint64)
        lims[1:] = np.cumsum(counts)
        distances = np.concatenate([np.asarray(v, np.float32) for v in all_d]) if lims[-1] else np.empty(0, np.float32)
        labels = np.concatenate([np.asarray(v, np.int64) for v in all_i]) if lims[-1] else np.empty(0, np.int64)
        return RangeSearchResult(lims, distances, labels)

    # -- reconstruction -------------------------------------------------------
    def reconstruct_n(self, n0: int, ni: int) -> np.ndarray:
        if n0 < 0 or n0 + ni > self.ntotal:
            raise IndexError("reconstruct range out of bounds")
        return self.vectors()[n0 : n0 + ni].copy()

    def reconstruct_batch(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        return self.vectors()[keys].copy()

    # -- flat codec: codes are raw float bytes (IndexFlatCodes.h) -------------
    def sa_code_size(self) -> int:
        return self.d * 4

    def sa_encode(self, x) -> np.ndarray:
        return self._check_input(x).view(np.uint8).reshape(len(x), -1).copy()

    def sa_decode(self, codes) -> np.ndarray:
        codes = np.ascontiguousarray(codes, dtype=np.uint8)
        return codes.view(np.float32).reshape(len(codes), self.d).copy()


    # ---- fused Pallas path (TPU WarpSelect analogue) -----------------------
    def _use_fused_kernel(self, k: int) -> bool:
        import jax

        return (
            jax.default_backend() not in ("cpu",)
            and k <= 2048  # BlockSelect range: chained 128-lane rank buffers
            and self.metric_type in (MetricType.L2, MetricType.INNER_PRODUCT)
            and self.ntotal >= self.PALLAS_MIN_NB
            and self.d <= 2048
        )

    def _xbT_dev(self):
        from ..ops import pallas_knn as pk

        if self._xbT is None:
            xb = self._consolidate()
            nbp = -(-self.ntotal // 1024) * 1024
            host = np.zeros((self.d, nbp), np.float32)
            host[:, : self.ntotal] = np.asarray(xb).T
            self._xbT = jnp.asarray(host)
        return self._xbT

    # bf16-screen path: screen + exact re-rank + certificate; uncertified
    # rows fall back to the f32-HIGHEST kernel. ~6x faster at SIFT1M k=100.
    SCREEN_MAX_K = 100  # leaves >=28 certificate ranks in the 128 buffer
    flat_screen = True
    flat_screen_max_bytes = 2 << 30

    def _screen_ok(self, k):
        d_pad = -(-self.d // 128) * 128
        nbp = -(-self.ntotal // 1024) * 1024
        return (
            self.flat_screen
            and k <= self.SCREEN_MAX_K
            and self.ntotal < (1 << 24)  # ids ride as exact f32 values
            and nbp * (4 * d_pad + 4) <= self.flat_screen_max_bytes
        )

    def _screen_dev(self):
        if self._screen is None:
            xb = self._consolidate()
            d_pad = -(-self.d // 128) * 128
            nbp = -(-self.ntotal // 1024) * 1024
            self._screen = _stage_flat_screen(
                xb, d_pad, nbp, self.metric_type == MetricType.L2
            )
        return self._screen

    # striped large-k screen (k > SCREEN_MAX_K): stripe budget is wider
    # than the small-k screen's — it exists FOR the multi-GB stores
    flat_striped = True
    flat_striped_max_bytes = 12 << 30
    # packed-readback wire format for the striped path: None = exact f32
    # distances (bitcast lanes); "f16" halves the distance payload
    # (~25% less wire at k=1024) at 2^-11 rounding — ids stay exact
    pack_d2h = None

    def _striped_plan(self, k):
        """(P, W, nbp_lk, u) for the striped large-k path, or None when
        the path does not apply. P sized so a stripe's expected true
        top-k membership k/P stays <= LANES/4 (overflow flags then sit
        ~6+ sigma out on i.i.d.-ordered rows)."""
        if not (
            self.flat_striped
            and self.SCREEN_MAX_K < k <= 1536
            and self.ntotal >= max(self.PALLAS_MIN_NB, 8 * k)
        ):
            return None
        import math

        P = 1 << max(1, math.ceil(math.log2(max(2, (4 * k) / 128))))
        nbp = -(-self.ntotal // 1024) * 1024
        P = min(P, nbp // 1024)
        if P * 128 < k + 128:
            return None
        W = -(-nbp // (P * 1024)) * 1024
        if W < 8192:
            # narrow stripes put the 128-queue under real insert pressure
            # (measured: 6% hit rate ~ constant eviction-loss flags) —
            # let the cascade handle small stores
            return None
        nbp_lk = P * W
        d_pad = -(-self.d // 128) * 128
        if nbp_lk * (4 * d_pad + 4) > self.flat_striped_max_bytes:
            return None
        u = min(P * 128, k + 512)
        return P, W, nbp_lk, u

    def _screen_lk_dev(self, nbp_lk):
        """Screen store padded to the stripe grid (re-uses the small-k
        staging when the widths agree)."""
        if self._screen is not None and self._screen[2].shape[1] == nbp_lk:
            return self._screen
        if self._screen_lk is None or self._screen_lk[2].shape[1] != nbp_lk:
            xb = self._consolidate()
            d_pad = -(-self.d // 128) * 128
            self._screen_lk = _stage_flat_screen(
                xb, d_pad, nbp_lk, self.metric_type == MetricType.L2
            )
        return self._screen_lk

    def search_submit(self, x, k, *, params=None):
        """Non-blocking dispatch of the screened flat search (see
        Index.search_submit); eager fallback for every other path."""
        x = self._check_input(x)
        if (
            k >= 1
            and len(x) > 0
            and (params is None or params.sel is None)
            and self._consolidate() is not None
            and self._use_fused_kernel(k)
        ):
            if self._screen_ok(k):
                return ("flat_screen", self._screen_submit(x, k))
            if self._striped_plan(k) is not None:
                return ("flat_striped", self._striped_submit(x, k))
        return ("eager", self.search(x, k, params=params))

    def search_collect(self, handle):
        tag, st = handle
        if tag == "eager":
            return st
        if tag == "flat_striped":
            return self._striped_collect(st)
        return self._screen_collect(st)

    def _striped_submit(self, x, k):
        """DISPATCH phase of the striped large-k search (all sub-batches
        enqueued, nothing read — the _screen_submit discipline)."""
        nq = len(x)
        plan = self._striped_plan(k)
        P, W, nbp_lk, u = plan
        metric_l2 = self.metric_type == MetricType.L2
        yT_hi, yT_lo, n2s, ymax = self._screen_lk_dev(nbp_lk)
        xb = self._consolidate()
        pack16 = getattr(self, "pack_d2h", None) == "f16"
        pending = []
        carry = None
        for start, padded, real in query_buckets(nq, max_batch=4096):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            qt = min(padded, 256)
            carry = _flat_striped_program(
                jnp.asarray(xq), yT_hi, yT_lo, n2s, xb, ymax, k, qt,
                1024, P, u, metric_l2, pack16=pack16, carry=carry,
                interpret=getattr(self, "fused_interpret", False),
            )
            pending.append((start, padded, real))
        return {"carry": carry, "pending": pending, "x": x, "k": k,
                "nq": nq, "pack16": pack16}

    def _striped_collect(self, st, D=None, I=None):
        """READ phase + certificate repairs (int32 payload: exact ids,
        distances f32-bitcast or f16 per pack_d2h)."""
        carry, pending, x, k, nq = (
            st["carry"], st["pending"], st["x"], st["k"], st["nq"],
        )
        largest = is_similarity_metric(self.metric_type)
        if D is None:
            D = np.full((nq, k), -np.inf if largest else np.inf, np.float32)
            I = np.full((nq, k), -1, np.int64)
        allp = np.asarray(carry)
        po = 0
        for start, padded, real in pending:
            packed = allp[po : po + padded]
            po += padded
            d, i, flag = _unpack_flat_lk(packed, k, st["pack16"])
            d = np.array(d[:real])
            i = i[:real].astype(np.int64)
            flag = flag[:real]
            striped_stats["nq"] += int(real)
            striped_stats["flagged"] += int(flag.sum())
            if flag.mean() > 0.25:
                striped_stats["storms"] += 1
                # certification storm (distance-concentrated data):
                # striping stops paying — serve the rest via the cascade
                self.flat_striped = False
                rest = slice(start, nq)
                Dr, Ir = self._search_fused(
                    x[rest], k, D[rest].copy(), I[rest].copy()
                )
                D[rest] = Dr
                I[rest] = Ir
                return D, I
            if flag.any():
                rows = np.nonzero(flag)[0]
                d_fix, i_fix = self._exact_knn_rows(
                    np.ascontiguousarray(x[start + rows]), k
                )
                d[rows] = d_fix
                i[rows] = i_fix
            D[start : start + real] = d
            I[start : start + real] = i
        return D, I

    def _search_striped(self, x, k, D, I):
        st = self._striped_submit(x, k)
        return self._striped_collect(st, D, I)

    def _search_screened(self, x, k, D, I):
        """bf16 screen + exact re-rank (_flat_screen_program); rows whose
        exactness certificate fails re-run through the exact XLA path.
        If certification fails on a large fraction (heavily
        distance-concentrated data: rank-k and rank-128 keys inside the
        bf16 error band), the screen stops paying — disable it for this
        index and serve everything from the f32 kernel."""
        st = self._screen_submit(x, k)
        return self._screen_collect(st, D, I)

    def _screen_submit(self, x, k):
        """DISPATCH phase: every sub-batch enqueued, nothing read (jax
        async dispatch) — see Index.search_submit for the streaming use."""
        nq = len(x)
        metric_l2 = self.metric_type == MetricType.L2
        yT_hi, yT_lo, n2s, ymax = self._screen_dev()
        xb = self._consolidate()
        # dispatch every sub-batch before reading any result: the 4 MB
        # query uploads and multi-MB packed readbacks overlap other
        # sub-batches' compute on the tunnel
        pending = []
        carry = None
        for start, padded, real in query_buckets(nq, max_batch=4096):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            qt = min(padded, 256)
            carry = _flat_screen_program(
                jnp.asarray(xq), yT_hi, yT_lo, n2s, xb, ymax, k, qt,
                1024, metric_l2, carry=carry,
            )
            pending.append((start, padded, real))
        return {"carry": carry, "pending": pending, "x": x, "k": k,
                "nq": nq}

    def _screen_collect(self, st, D=None, I=None):
        """READ phase: ONE packed read brings every sub-batch home (carry
        chaining), then certificate repairs."""
        carry, pending, x, k, nq = (
            st["carry"], st["pending"], st["x"], st["k"], st["nq"],
        )
        largest = is_similarity_metric(self.metric_type)
        if D is None:
            D = np.full((nq, k), -np.inf if largest else np.inf, np.float32)
            I = np.full((nq, k), -1, np.int64)
        xb = self._consolidate()
        allp = np.asarray(carry)
        po = 0
        for start, padded, real in pending:
            packed = allp[po : po + padded]
            po += padded
            d = np.array(packed[:real, :k])  # writable: repairs below
            i = np.rint(packed[:real, k : 2 * k]).astype(np.int64)
            flag = packed[:real, 2 * k] != 0.0
            if flag.mean() > 0.25:
                self.flat_screen = False  # not worth it on this data
                rest = slice(start, nq)
                Dr, Ir = self._search_fused(
                    x[rest], k, D[rest].copy(), I[rest].copy()
                )
                D[rest] = Dr
                I[rest] = Ir
                return D, I
            if flag.any():
                rows = np.nonzero(flag)[0]
                d_fix, i_fix = self._exact_knn_rows(
                    np.ascontiguousarray(x[start + rows]), k
                )
                d[rows] = d_fix
                i[rows] = i_fix
            D[start : start + real] = d
            I[start : start + real] = i
        return D, I

    def _exact_knn_rows(self, xq_rows, k):
        """Exact f32 kNN for certificate-repair rows.

        Rows are padded to power-of-two buckets so varying lossy-row counts
        reuse one compiled shape (each fresh shape is a 1-10 min remote
        compile over the tunnel), and at 10M-scale the database scan tile
        is halved to bound the score transient (a [2048, 131072] f32 tile
        plus the resident f32 store + transposed kernel store exhausted
        v5e HBM on Deep10M)."""
        nr = len(xq_rows)
        D = np.empty((nr, k), np.float32)
        I = np.empty((nr, k), np.int64)
        xb = self._consolidate()
        db_chunk = (1 << 16) if self.ntotal > (1 << 22) else (1 << 17)
        for start, padded, real in query_buckets(nr, max_batch=2048):
            xq = xq_rows[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            d, i = dops.knn(
                jnp.asarray(xq),
                xb.astype(jnp.float32),
                k,
                metric=self.metric_type,
                metric_arg=self.metric_arg,
                y_norms=self._norms,
                db_chunk=db_chunk,
            )
            D[start : start + real] = np.asarray(d)[:real]
            I[start : start + real] = np.asarray(i)[:real]
        return D, I

    def _search_fused(self, x, k, D, I):
        """Fused GEMM+select kernel with exactness repair for lossy rows
        (ops/pallas_knn.py)."""
        from ..ops import pallas_knn as pk

        if self._screen_ok(k):
            return self._search_screened(x, k, D, I)
        if self._striped_plan(k) is not None:
            return self._search_striped(x, k, D, I)
        nq = len(x)
        metric_l2 = self.metric_type == MetricType.L2
        xbT = self._xbT_dev()
        k_lanes = max(128, -(-k // 128) * 128)
        for start, padded, real in query_buckets(nq):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            qt = min(padded, 512)
            v, i, ev = pk.knn_fused_pallas(
                jnp.asarray(xq),
                xbT,
                self.ntotal,
                metric_l2=metric_l2,
                qt=qt,
                k_lanes=k_lanes,
            )
            # reduce/slice ON DEVICE: the tunnel moves ~45 MB/s, so the
            # full [nq, k_lanes] v/i/ev transfer would dominate the search
            kk = min(k, k_lanes)
            if metric_l2:
                lossy_dev = jnp.min(ev, -1) < v[:, kk - 1]
            else:
                lossy_dev = jnp.max(ev, -1) > v[:, kk - 1]
            v_dev, i_dev = v[:, :kk], i[:, :kk]
            v = np.array(v_dev[:real])  # writable: lossy rows repaired below
            i = np.array(i_dev[:real])
            lossy = np.asarray(lossy_dev)[:real]
            if lossy.any():
                # exact repair through the XLA path for the affected rows
                rows = np.nonzero(lossy)[0]
                d_fix, i_fix = self._exact_knn_rows(
                    np.ascontiguousarray(x[start + rows]), k
                )
                v[rows, :k] = d_fix
                i[rows, :k] = i_fix
            D[start : start + real] = v[:, :k]
            I[start : start + real] = i[:, :k]
        return D, I


@functools.partial(jax.jit, static_argnames=("chunk",))
def _sq8_norms(codes, scale, off, chunk=1 << 20):
    """||row||^2 of an SQ8 store, dequantizing row blocks on the fly (a
    one-piece decode of a 100M-row store would be a 38 GB f32 transient;
    chunks dynamic-slice the store in place — a pad+reshape would COPY
    the whole uint8 store next to the argument, +9.6 GB at 100M x 96)."""
    n, d = codes.shape
    chunk = min(chunk, n)
    nch = max(1, -(-n // chunk))

    def body(_, ci):
        start = jnp.minimum(ci * chunk, n - chunk)
        blk = jax.lax.dynamic_slice_in_dim(codes, start, chunk)
        v = blk.astype(jnp.float32) * scale + off
        return None, jnp.sum(jnp.square(v), -1)

    _, n2 = jax.lax.scan(body, None, jnp.arange(nch))
    if nch * chunk == n:
        return n2.reshape(-1)
    # the tail window was shifted back onto the last `chunk` rows: keep
    # its final n - (nch-1)*chunk entries (static slicing — a scatter
    # reassembly at 100M indices blows up memory-space assignment)
    head = n2[:-1].reshape(-1)
    return jnp.concatenate([head, n2[-1][chunk - (n - head.shape[0]):]])


class IndexFlatSQ8(IndexFlat):
    """Flat store held as trained per-dim SQ8 codes — 1 byte/dim in HBM.

    The Refine(SQ8) layout (reference: index_factory "Refine(SQ8)" =
    IndexRefine over IndexScalarQuantizer, index_factory.cpp): as the
    refine store of IndexRefine it makes exact-style re-ranking possible
    where f16 does not fit — 100M x 96 is 9.6 GB here vs 19.2 GB f16 on a
    16 GB chip. Candidate rows are gathered as uint8 (4x less HBM gather
    traffic than f32) and dequantized per-dim after the gather
    (ops/distances.rerank_exact sq_scale/sq_off).

    Standalone search decodes row blocks on the fly (chunked; no full
    f32 materialization). ``params.sel`` is not supported here — use
    IndexFlat for selector workloads.
    """

    def __init__(self, d: int, metric=MetricType.L2):
        super().__init__(d, metric)
        from ..codecs.sq import QuantizerType, ScalarQuantizer

        self.sq = ScalarQuantizer(d, QuantizerType.QT_8bit)
        self.is_trained = False
        self._sq_scale_dev = None
        self._sq_off_dev = None

    def train(self, x) -> None:
        self.sq.train(self._check_input(x))
        self.is_trained = True
        self._sq_scale_dev = None
        self._sq_off_dev = None

    def add(self, x) -> None:
        x = self._check_input(x)
        if len(x) == 0:
            return
        if not self.is_trained:
            self.train(x)  # per-dim min/max from the first batch
        self._pending.append(self.sq.compute_codes(x))
        self.ntotal += len(x)

    def add_codes(self, codes: np.ndarray) -> None:
        """Append pre-encoded SQ8 rows (device-side builders encode on
        chip and hand the downloaded codes straight in)."""
        codes = np.ascontiguousarray(codes, np.uint8)
        if codes.shape[1] != self.d:
            raise ValueError("code width mismatch")
        if not self.is_trained:
            raise RuntimeError("train before add_codes")
        self._pending.append(codes)
        self.ntotal += len(codes)

    def _sq_params(self):
        """Device (scale, off) with decode(row) = row * scale + off."""
        if self._sq_scale_dev is None:
            vmin = np.broadcast_to(
                np.asarray(self.sq.trained[0], np.float32), (self.d,)
            )
            vdiff = np.broadcast_to(
                np.asarray(self.sq.trained[1], np.float32), (self.d,)
            )
            scale = vdiff / 256.0
            self._sq_scale_dev = jnp.asarray(scale)
            self._sq_off_dev = jnp.asarray(vmin + 0.5 * scale)
        return self._sq_scale_dev, self._sq_off_dev

    def _consolidate(self):
        if self._pending:
            parts = []
            if self._xb is not None:
                parts.append(np.asarray(self._xb))
            parts.extend(self._pending)
            host = (
                np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            )
            self._xb = jnp.asarray(np.ascontiguousarray(host, np.uint8))
            self._pending = []
            self._norms = None
        if (
            self._xb is not None
            and self._norms is None
            and self.metric_type == MetricType.L2
        ):
            scale, off = self._sq_params()
            self._norms = _sq8_norms(self._xb, scale, off)
        return self._xb

    def vectors(self) -> np.ndarray:
        xb = self._consolidate()
        if xb is None:
            return np.empty((0, self.d), dtype=np.float32)
        return self.sq.decode(np.asarray(xb))

    def reconstruct_n(self, n0: int, ni: int) -> np.ndarray:
        xb = self._consolidate()
        return self.sq.decode(np.asarray(xb[n0 : n0 + ni]))

    def reconstruct(self, key):
        return self.reconstruct_n(int(key), 1)[0]

    def search(self, x, k, *, params=None):
        if params is not None and params.sel is not None:
            raise NotImplementedError(
                "IndexFlatSQ8 does not support id selectors"
            )
        x = self._check_input(x)
        if k < 1:
            raise ValueError("k must be >= 1")
        nq = len(x)
        largest = is_similarity_metric(self.metric_type)
        D = np.full((nq, k), -np.inf if largest else np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        xb = self._consolidate()
        if xb is None or nq == 0:
            return D, I
        scale, off = self._sq_params()
        # decode + scan row blocks; per-block top-k merged on host
        blk = 1 << 20
        for start, padded, real in query_buckets(nq):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            xq_dev = jnp.asarray(xq)
            best_d = np.full((real, k), D[0, 0], np.float32)
            best_i = np.full((real, k), -1, np.int64)
            for s in range(0, self.ntotal, blk):
                e = min(s + blk, self.ntotal)
                dec = xb[s:e].astype(jnp.float32) * scale + off
                d_b, i_b = dops.knn(
                    xq_dev, dec, min(k, e - s), metric=self.metric_type
                )
                d_b = np.asarray(d_b)[:real]
                i_b = np.asarray(i_b)[:real].astype(np.int64) + s
                cd = np.concatenate([best_d, d_b], axis=1)
                cidx = np.concatenate([best_i, i_b], axis=1)
                ordr = np.argsort(-cd if largest else cd, axis=1, kind="stable")[
                    :, :k
                ]
                best_d = np.take_along_axis(cd, ordr, axis=1)
                best_i = np.take_along_axis(cidx, ordr, axis=1)
            D[start : start + real] = best_d
            I[start : start + real] = best_i
        return D, I


class IndexFlatL2(IndexFlat):
    """reference: faiss/IndexFlat.h:85."""

    def __init__(self, d: int):
        super().__init__(d, MetricType.L2)


class IndexFlatIP(IndexFlat):
    """reference: faiss/IndexFlat.h:79."""

    def __init__(self, d: int):
        super().__init__(d, MetricType.INNER_PRODUCT)


class IndexFlat1D(IndexFlat):
    """1-D exact search via sorted values (reference: IndexFlat.h:201).

    On TPU the generic GEMM path already handles d=1; this subclass keeps the
    API (update_permutation) and uses a host-side sorted array for the
    single-vector fast path.
    """

    def __init__(self, continuous_update: bool = True):
        super().__init__(1, MetricType.L2)
        self.continuous_update = continuous_update
        self.perm = np.empty(0, dtype=np.int64)

    def add(self, x):
        super().add(x)
        if self.continuous_update:
            self.update_permutation()

    def update_permutation(self):
        vals = self.vectors()[:, 0]
        self.perm = np.argsort(vals, kind="stable").astype(np.int64)
