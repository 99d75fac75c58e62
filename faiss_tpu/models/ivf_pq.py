"""IndexIVFPQ — the workhorse index (reference: faiss/IndexIVFPQ.{h,cpp}).

By-residual product quantization inside inverted lists, with precomputed
term-2 tables (initialize_IVFPQ_precomputed_table, IndexIVFPQ.cpp:407) so the
scan is pure table gathers + bias. The FastScan variants
(IndexIVFPQFastScan, reference faiss/IndexIVFPQFastScan.h /
IndexIVFFastScan.cpp) are the nbits=4 configuration of the same TPU kernel —
the SIMD-shuffle LUT trick maps to small-ksub table gathers / one-hot MXU
contractions, not a separate packed layout.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

import functools

import jax

from ..codecs.pq import ProductQuantizer
from ..metric import MetricType
from ..ops import pq_ops
from ..ops.ivf_ops import ivf_pq_scan
from .ivf import IndexIVF


def pack_invlists_grouped(listnos, nlist, ct, seed=0xFA155):
    """Group-packed layout for the fused ADC kernel (pallas_knn docstring).

    Lists are bin-packed into groups of <=128 lists balanced by slot count
    (greedy longest-first), every group padded to a COMMON chunk count so
    chunk->group is the static map ``j // cpg``. Within-list order is
    shuffled so the kernel's pair-reduction sees decorrelated candidates.

    Returns a dict with:
      pos       [n]    packed position of every input slot
      order     [n]    input slot per packed rank (pos[i] places order-th)
      slot_map  [S]    input slot per packed position (-1 = pad)
      lid       [S]    local list id (0..127) within the group (<- 0 on pads)
      list_perm [ngroups*128] original list id per grouped column (-1 unused)
      ngroups, cpg, S
    """
    import heapq

    n = len(listnos)
    lengths = np.bincount(listnos, minlength=nlist).astype(np.int64)
    ngroups = max(1, -(-nlist // 128))
    # greedy balance: longest lists first into the lightest group
    heap = [(0, 0, g) for g in range(ngroups)]
    heapq.heapify(heap)
    group_lists = [[] for _ in range(ngroups)]
    for li in np.argsort(-lengths, kind="stable"):
        slots, cnt, g = heapq.heappop(heap)
        group_lists[g].append(int(li))
        cnt += 1
        if cnt < 128:
            heapq.heappush(heap, (slots + int(lengths[li]), cnt, g))
    cpg = max(
        1,
        max(
            -(-int(sum(lengths[li] for li in gl)) // ct)
            for gl in group_lists
        ),
    )
    S = ngroups * cpg * ct
    packed_start = np.zeros(nlist, np.int64)
    local_of = np.zeros(nlist, np.int32)
    list_perm = np.full(ngroups * 128, -1, np.int64)
    for g, gl in enumerate(group_lists):
        running = g * cpg * ct
        for loc, li in enumerate(gl):
            packed_start[li] = running
            local_of[li] = loc
            list_perm[g * 128 + loc] = li
            running += int(lengths[li])

    perm = np.random.RandomState(seed).permutation(n)
    order = perm[np.argsort(listnos[perm], kind="stable")]
    sorted_ln = listnos[order]
    off = np.zeros(nlist, np.int64)
    np.cumsum(lengths[:-1], out=off[1:])
    rank = np.arange(n, dtype=np.int64) - off[sorted_ln]
    pos = packed_start[sorted_ln] + rank
    slot_map = np.full(S, -1, np.int64)
    slot_map[pos] = order
    lid = np.zeros(S, np.int32)
    lid[pos] = local_of[sorted_ln]
    return {
        "pos": pos,
        "order": order,
        "slot_map": slot_map,
        "lid": lid,
        "list_perm": list_perm,
        "ngroups": ngroups,
        "cpg": cpg,
        "S": S,
    }


@functools.partial(
    jax.jit, static_argnames=("k", "kc", "qt", "ct", "nprobe")
)
def _fused_search_rerank(
    xq, centroids_g, cn2g, pq_cb, codesT, n2s, lid, slot_map, xb,
    k, kc, qt, ct, nprobe,
):
    """One-dispatch big-batch IVFPQ search + exact re-rank.

    Chains: ADC LUTs + grouped coarse bias (MXU, optionally nprobe-masked) ->
    fused Pallas ADC+select -> slot translation -> exact re-rank of the top
    kc (gather + contraction). Keeping it in one program avoids per-op
    tunnel round-trips (~35 ms each) and all host staging.
    """
    from ..ops.distances import rerank_exact
    from ..ops.pallas_knn import ivfpq_fused_pallas

    luts = -2.0 * pq_ops.pq_ip_tables(xq, pq_cb)
    cm2 = _masked_coarse_bias(xq, centroids_g, cn2g, nprobe)
    nq = xq.shape[0]
    v, slots_raw, ev = ivfpq_fused_pallas(
        cm2,
        luts.reshape(nq, -1).astype(jnp.bfloat16),
        codesT,
        n2s,
        lid,
        qt=qt,
        ct=ct,
    )
    slots = jnp.where(
        slots_raw >= 0, slot_map[jnp.maximum(slots_raw, 0)], -1
    )[:, :kc]
    D, I = rerank_exact(xq, xb, slots, k)
    # kernel contract (pallas_knn docstring): a row is lossy iff the best
    # evicted key beats its kc-th kept key — caller must repair those rows
    lossy = jnp.min(ev, -1) < v[:, kc - 1]
    return D, I, lossy


def _masked_coarse_bias(xq, centroids_g, cn2g, nprobe):
    """-2 q.c per grouped list column; unprobed columns get +1e9 (the
    nprobe-faithful mask — search_preassigned semantics, IndexIVF.cpp:401).
    ``nprobe == 0`` means exhaustive (no masking); unused group columns are
    never probed because their cn2g is +inf."""
    cm2 = -2.0 * jax.lax.dot_general(
        xq, centroids_g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if nprobe:
        key = cn2g[None, :] + cm2  # coarse L2 distance (missing ||q||^2)
        _, cols = jax.lax.top_k(-key, nprobe)
        rows = jnp.arange(xq.shape[0], dtype=jnp.int32)[:, None]
        probed = (
            jnp.zeros(cm2.shape, jnp.bool_).at[rows, cols].set(True)
        )
        cm2 = jnp.where(probed, cm2, 1e9)
    return cm2

# cap on the term-2 precomputed table size
# (reference: precomputed_table_max_bytes, IndexIVFPQ.cpp:375 — 2 GiB)
precomputed_table_max_bytes = 2 << 30


class IndexIVFPQ(IndexIVF):
    """reference: faiss/IndexIVFPQ.h:31."""

    def __init__(
        self,
        quantizer,
        d: int,
        nlist: int,
        M: int,
        nbits: int = 8,
        metric=MetricType.L2,
    ):
        super().__init__(quantizer, d, nlist, metric)
        self.pq = ProductQuantizer(d, M, nbits)
        self.by_residual = True
        self.code_size = self.pq.code_size
        # 0 = auto (enable when it fits), 1 = yes, -1 = disable
        self.use_precomputed_table = 0
        self._term2 = None  # [nlist, M, ksub] device
        # big-batch implem (IndexIVFFastScan.h:252 dispatch analogue):
        # queries >= this threshold score ALL codes by one-hot GEMM instead
        # of per-query list gathers. 0 disables.
        self.big_batch_threshold = 2048
        self._brute = None  # flat device arrays for the big-batch implem
        self.is_trained = False

    # -- training ---------------------------------------------------------
    def train_encoder(self, x: np.ndarray, assign: np.ndarray) -> None:
        if self.by_residual:
            centroids = self._centroids_host()
            x = x - centroids[assign]
        self.pq.cp.verbose = False
        self.pq.train(x)
        self._term2 = None

    def _centroids_host(self) -> np.ndarray:
        return self.quantizer.vectors()

    # -- codec ---------------------------------------------------------------
    def encode_vectors(self, x, listnos):
        from ..base import staged_device
        from .flat import IndexFlat

        x_dev = staged_device(x) if isinstance(x, np.ndarray) else None
        if (
            x_dev is not None
            and isinstance(self.quantizer, IndexFlat)
            and self.pq.nbits <= 8
        ):
            # residual + PQ assignment fully on device from the staged copy
            cent = self.quantizer._consolidate()
            resid = (
                x_dev - cent[jnp.asarray(listnos, jnp.int32)]
                if self.by_residual
                else x_dev
            )
            codes = pq_ops.pq_encode(resid, self.pq._dev())
            return np.asarray(codes).astype(np.uint8)
        if self.by_residual:
            x = x - self._centroids_host()[listnos]
        return self.pq.compute_codes_int(x)

    def decode_vectors(self, codes, listnos):
        out = self.pq.decode_int(codes)
        if self.by_residual:
            out = out + self._centroids_host()[listnos]
        return out

    def sa_code_size(self) -> int:
        return self.code_size

    # -- precomputed tables -----------------------------------------------------
    def precompute_table(self) -> None:
        """term2[c, m, k] = ||y_mk||^2 + 2 c_m . y_mk (IndexIVFPQ.cpp:407)."""
        pq = self.pq
        centroids = self._centroids_host().reshape(
            self.nlist, pq.M, pq.dsub
        )  # [nlist, M, dsub]
        cb = pq.centroids  # [M, ksub, dsub]
        y_norms = np.sum(cb**2, axis=-1)  # [M, ksub]
        cdoty = 2.0 * np.einsum("cmd,mkd->cmk", centroids, cb)
        self._term2 = jnp.asarray((y_norms[None] + cdoty).astype(np.float32))

    def _maybe_term2(self):
        if not self.by_residual or self.metric_type != MetricType.L2:
            return None
        if self.use_precomputed_table == -1:
            raise NotImplementedError(
                "IVFPQ L2 residual search requires precomputed tables in this "
                "implementation (use_precomputed_table >= 0)"
            )
        nbytes = self.nlist * self.pq.M * self.pq.ksub * 4
        if self.use_precomputed_table == 0 and nbytes > precomputed_table_max_bytes:
            raise MemoryError(
                f"precomputed table of {nbytes} bytes exceeds cap; "
                "raise precomputed_table_max_bytes"
            )
        if self._term2 is None:
            self.precompute_table()
        return self._term2

    # -- device layout: padded uint8 codes ------------------------------------------
    def _stage_codes(self, slot_ids, lengths, max_len, sorted_ln, ranks, order):
        M = self.pq.M
        pad_codes = np.zeros((self.nlist, max_len, M), np.uint8)
        if self.ntotal:
            pad_codes[sorted_ln, ranks] = self._codes_host[order].astype(np.uint8)
        return {
            "codes": jnp.asarray(pad_codes),
            "slot_ids": jnp.asarray(slot_ids),
            "lengths": jnp.asarray(lengths),
            "code_norms": None,
        }

    # -- big-batch exhaustive-ADC implem ------------------------------------------
    FUSED_CT = 1024  # slots per kernel chunk (group-packed, multi-list)

    def _build_brute(self):
        if self._brute is not None:
            return self._brute
        pq = self.pq
        centroids = self._centroids_host()
        codes = self._codes_host.astype(np.uint8)
        listnos = self._listnos_host
        # ||y||^2 = ||c_l||^2 + sum_m term2[l, m, code_m]
        cb = pq.centroids
        y_norms = np.sum(cb**2, axis=-1)  # [M, ksub]
        cmk = centroids.reshape(self.nlist, pq.M, pq.dsub)
        cdoty = 2.0 * np.einsum("cmd,mkd->cmk", cmk, cb)
        term2 = (y_norms[None] + cdoty).astype(np.float32)
        # per-m gathers avoid materializing term2[listnos] ([n, M, ksub],
        # gigabytes at 1M scale on the host)
        t2sum = np.zeros(len(codes), np.float32)
        ln64 = listnos.astype(np.int64)
        for m in range(pq.M):
            t2sum += term2[:, m, :][ln64, codes[:, m].astype(np.int64)]
        n2 = ((centroids**2).sum(1)[listnos] + t2sum).astype(np.float32)
        self._brute = {
            "codes": jnp.asarray(codes),
            "listnos": jnp.asarray(listnos.astype(np.int32)),
            "n2": jnp.asarray(n2),
            "centroids": jnp.asarray(centroids),
        }
        # fused-kernel staging: group-packed layout (lists bin-packed into
        # 128-list groups; within-list order shuffled so pair-reduction sees
        # decorrelated candidates — see pack_invlists_grouped)
        g = pack_invlists_grouped(listnos, self.nlist, self.FUSED_CT)
        pos, order, S = g["pos"], g["order"], g["S"]
        codesT = np.zeros((pq.M, S), np.uint8)
        codesT[:, pos] = codes[order].T
        n2s = np.full((1, S), np.inf, np.float32)
        n2s[0, pos] = n2[order]
        lp = g["list_perm"]
        cent_g = np.zeros((len(lp), centroids.shape[1]), np.float32)
        cent_g[lp >= 0] = centroids[lp[lp >= 0]]
        cn2g = np.full(len(lp), np.inf, np.float32)
        cn2g[lp >= 0] = (cent_g[lp >= 0] ** 2).sum(1)
        self._brute.update(
            codesT=jnp.asarray(codesT),
            n2s=jnp.asarray(n2s),
            lid=jnp.asarray(g["lid"][None, :]),
            centroids_g=jnp.asarray(cent_g),
            cn2g=jnp.asarray(cn2g),
            slot_map=g["slot_map"],
            slot_map_dev=jnp.asarray(g["slot_map"].astype(np.int32)),
        )
        return self._brute

    def _search_big_batch_refined(self, x, k, kc, refine_xb, nprobe=0):
        """Big-batch search + exact re-rank in one device program
        (used by IndexRefineFlat when wrapping this index).
        ``nprobe == 0`` scans everything; otherwise unprobed lists are
        masked in the coarse bias (faithful nprobe semantics)."""
        from ..base import query_buckets

        nq = len(x)
        br = self._build_brute()
        D = np.full((nq, k), np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        kc = min(kc, 128)
        if nprobe >= self.nlist:
            nprobe = 0
        for start, padded, real in query_buckets(nq):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            d, slots, lossy = _fused_search_rerank(
                jnp.asarray(xq),
                br["centroids_g"],
                br["cn2g"],
                self.pq._dev(),
                br["codesT"],
                br["n2s"],
                br["lid"],
                br["slot_map_dev"],
                refine_xb,
                k,
                kc,
                min(padded, 256),
                self.FUSED_CT,
                nprobe,
            )
            slots = np.asarray(slots)[:real, :k]
            D[start : start + real] = np.asarray(d)[:real, :k]
            I[start : start + real] = np.where(
                slots >= 0, self._ids_host[np.maximum(slots, 0)], -1
            )
            bad = np.where(np.asarray(lossy)[:real])[0]
            if len(bad):
                Df, If = self._repair_rows_refined(
                    x[start + bad], k, kc, refine_xb, nprobe
                )
                D[start + bad] = Df
                I[start + bad] = If
        return D, I

    def _repair_rows_refined(self, x_rows, k, kc, refine_xb, nprobe=0):
        """Exact-path redo for kernel-flagged lossy rows: XLA brute ADC
        top-kc (no pair-reduction loss) + the same exact re-rank."""
        from ..ops.distances import rerank_exact

        Dc, slots = self._big_batch_xla(x_rows, kc, nprobe)
        D, I = rerank_exact(
            jnp.asarray(x_rows), refine_xb,
            jnp.asarray(np.where(slots >= 0, slots, -1).astype(np.int32)), k,
        )
        I = np.asarray(I).astype(np.int64)
        return np.asarray(D), np.where(
            I >= 0, self._ids_host[np.maximum(I, 0)], -1
        )

    def _big_batch_xla(self, x, k, nprobe=0):
        """Exhaustive ADC via one-hot GEMM + approx select (the exact
        fallback used for lossy-row repair and CPU runs). Returns slot ids."""
        from ..base import query_buckets

        nq = len(x)
        br = self._build_brute()
        cb = self.pq._dev()
        if nprobe >= self.nlist:
            nprobe = 0
        D = np.full((nq, k), np.inf, np.float32)
        S = np.full((nq, k), -1, np.int64)
        for start, padded, real in query_buckets(nq):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            xq_dev = jnp.asarray(xq)
            luts = -2.0 * pq_ops.pq_ip_tables(xq_dev, cb)
            qn2 = np.square(xq).sum(1)
            coarse_ip = xq_dev @ br["centroids"].T
            if nprobe:
                cn2 = jnp.sum(jnp.square(br["centroids"]), -1)
                key = cn2[None, :] - 2.0 * coarse_ip
                _, cols = jax.lax.top_k(-key, nprobe)
                rows = jnp.arange(coarse_ip.shape[0])[:, None]
                probed = (
                    jnp.zeros(coarse_ip.shape, jnp.bool_)
                    .at[rows, cols]
                    .set(True)
                )
                coarse_ip = jnp.where(probed, coarse_ip, -5e8)
            dd, ii = pq_ops.ivfpq_brute_adc_knn(
                luts, coarse_ip, jnp.asarray(qn2), br["codes"],
                br["listnos"], br["n2"], k,
            )
            ddh = np.asarray(dd)[:real]
            iih = np.asarray(ii)[:real]
            if nprobe:  # candidates from masked lists are not results
                iih = np.where(ddh < 5e8, iih, -1)
                ddh = np.where(ddh < 5e8, ddh, np.inf)
            D[start : start + real] = ddh
            S[start : start + real] = iih
        return D, S

    def _search_big_batch(self, x, k, nprobe=0):
        """Big-batch ADC over the group-packed layout (``nprobe == 0`` =
        exhaustive; otherwise the coarse bias masks unprobed lists).

        Preferred path: the fused Pallas ADC+select kernel
        (ops/pallas_knn.ivfpq_fused_pallas) on TPU for k <= 128; fallback is
        the XLA one-hot GEMM + approx select (ops/pq_ops.ivfpq_brute_adc_knn).
        """
        import jax

        from ..base import query_buckets

        nq = len(x)
        br = self._build_brute()
        cb = self.pq._dev()
        if nprobe >= self.nlist:
            nprobe = 0
        use_fused = (
            jax.default_backend() not in ("cpu",)
            and k <= 128
            and self.pq.ksub <= 16
        )
        if not use_fused:
            D, S = self._big_batch_xla(x, k, nprobe)
            I = np.where(S >= 0, self._ids_host[np.maximum(S, 0)], -1)
            return D, I
        from ..ops.pallas_knn import ivfpq_fused_pallas

        D = np.full((nq, k), np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        for start, padded, real in query_buckets(nq):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            xq_dev = jnp.asarray(xq)
            luts = -2.0 * pq_ops.pq_ip_tables(xq_dev, cb)
            qn2 = np.square(xq).sum(1)
            # all staging stays on device: a host round-trip of the
            # [nq, ngroups*128] bias matrix costs seconds over the tunnel
            cm2 = _masked_coarse_bias(
                xq_dev, br["centroids_g"], br["cn2g"], nprobe
            )
            qt = min(padded, 256)
            v, slots_dev, ev = ivfpq_fused_pallas(
                cm2,
                jnp.asarray(luts.reshape(padded, -1), jnp.bfloat16),
                br["codesT"],
                br["n2s"],
                br["lid"],
                qt=qt,
                ct=self.FUSED_CT,
            )
            d = np.asarray(v)[:real, :k] + qn2[:real, None]
            raw = np.asarray(slots_dev)[:real, :k]
            slots = np.where(
                raw >= 0, br["slot_map"][np.maximum(raw, 0)], -1
            )
            if nprobe:  # masked-list sentinels are not results
                slots = np.where(d < 5e8, slots, -1)
                d = np.where(d < 5e8, d, np.inf)
            d = np.maximum(d, 0.0)
            # repair kernel-flagged lossy rows (see pallas_knn contract)
            ev_min = np.asarray(jnp.min(ev, -1))[:real]
            bad = np.where(ev_min < np.asarray(v)[:real, k - 1])[0]
            if len(bad):
                db, sb = self._big_batch_xla(x[start + bad], k, nprobe)
                d[bad] = db
                slots[bad] = sb
            D[start : start + real] = d
            I[start : start + real] = np.where(
                slots >= 0, self._ids_host[np.maximum(slots, 0)], -1
            )
        return D, I

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        use_big = (
            self.big_batch_threshold
            and len(x) >= self.big_batch_threshold
            and self.by_residual
            and self.metric_type == MetricType.L2
            and (params is None or params.sel is None)
            and self.ntotal > 0
        )
        if use_big:
            self._check_trained()
            nprobe = self.nprobe
            if params is not None and getattr(params, "nprobe", 0):
                nprobe = params.nprobe
            return self._search_big_batch(x, k, min(nprobe, self.nlist))
        return super().search(x, k, params=params)

    def add_core(self, x, ids, listnos) -> None:
        super().add_core(x, ids, listnos)
        self._brute = None

    def reset(self) -> None:
        super().reset()
        self._brute = None

    # -- scan --------------------------------------------------------------------
    def _scan(self, xq_dev, probes, coarse_dis, k, dev, sel_mask):
        pq = self.pq
        cb = pq._dev()
        if self.metric_type == MetricType.L2:
            if self.by_residual:
                term2 = self._maybe_term2()
                # term3 = -2 q . y
                luts = -2.0 * pq_ops.pq_ip_tables(xq_dev, cb)
                bias = coarse_dis
            else:
                term2 = None
                luts = pq_ops.pq_distance_tables(xq_dev, cb)
                bias = jnp.zeros_like(coarse_dis)
            return ivf_pq_scan(
                luts,
                probes,
                bias,
                dev["codes"],
                dev["slot_ids"],
                dev["lengths"],
                k,
                largest=False,
                term2=term2,
                sel_mask=sel_mask,
            )
        # inner product: d = q.c_list + q.y
        luts = pq_ops.pq_ip_tables(xq_dev, cb)
        bias = coarse_dis if self.by_residual else jnp.zeros_like(coarse_dis)
        return ivf_pq_scan(
            luts,
            probes,
            bias,
            dev["codes"],
            dev["slot_ids"],
            dev["lengths"],
            k,
            largest=True,
            term2=None,
            sel_mask=sel_mask,
        )


class IndexIVFPQFastScan(IndexIVFPQ):
    """4-bit IVFPQ (reference: faiss/IndexIVFPQFastScan.h:25)."""

    def __init__(self, quantizer, d, nlist, M, nbits=4, metric=MetricType.L2, bbs=32):
        if nbits != 4:
            raise ValueError("FastScan requires nbits=4")
        super().__init__(quantizer, d, nlist, M, nbits, metric)
        self.bbs = bbs


class IndexIVFPQR(IndexIVFPQ):
    """IVFPQ + residual refinement (reference: faiss/IndexIVFPQR.h:21).

    A second PQ encodes the residual left after IVFPQ reconstruction; search
    retrieves k*k_factor IVFPQ candidates and re-ranks them with the refined
    reconstruction.
    """

    def __init__(
        self, quantizer, d, nlist, M, nbits, M_refine, nbits_refine, metric=MetricType.L2
    ):
        super().__init__(quantizer, d, nlist, M, nbits, metric)
        self.refine_pq = ProductQuantizer(d, M_refine, nbits_refine)
        self.k_factor = 4
        self._refine_codes: Optional[np.ndarray] = None

    def train_encoder(self, x, assign):
        super().train_encoder(x, assign)
        # refine PQ trains on the residual after IVFPQ reconstruction
        centroids = self._centroids_host()
        res = x - centroids[assign]
        codes = self.pq.compute_codes_int(res)
        recon = self.pq.decode_int(codes)
        self.refine_pq.cp.verbose = False
        self.refine_pq.train(res - recon)

    def add_core(self, x, ids, listnos):
        x = np.ascontiguousarray(x, np.float32)
        listnos = np.asarray(listnos, np.int32).ravel()
        recon_in = self.decode_for_refine(x, listnos)
        rcodes = self.refine_pq.compute_codes_int(x - recon_in)
        self._refine_codes = (
            rcodes
            if self._refine_codes is None
            else np.concatenate([self._refine_codes, rcodes])
        )
        super().add_core(x, ids, listnos)

    def decode_for_refine(self, x, listnos):
        codes = self.encode_vectors(x, listnos)
        return self.decode_vectors(codes, listnos)

    def reset(self):
        super().reset()
        self._refine_codes = None

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        kc = max(k, int(k * self.k_factor))
        Dc, Ic = super().search(x, kc, params=params)
        # map ids back to slots for refined reconstruction
        id_to_slot = {int(i): s for s, i in enumerate(self._ids_host)}
        nq = len(x)
        D = np.full((nq, k), np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        for q in range(nq):
            cands = [id_to_slot[int(i)] for i in Ic[q] if i >= 0]
            if not cands:
                continue
            slots = np.array(cands, np.int64)
            base = self.decode_vectors(
                self._codes_host[slots], self._listnos_host[slots]
            )
            refined = base + self.refine_pq.decode_int(self._refine_codes[slots])
            d2 = ((refined - x[q][None]) ** 2).sum(1)
            order = np.argsort(d2, kind="stable")[:k]
            D[q, : len(order)] = d2[order]
            I[q, : len(order)] = self._ids_host[slots[order]]
        return D, I
