"""IVF indexes — analogue of faiss/IndexIVF.{h,cpp} + invlists/.

Design (SURVEY.md §7): inverted lists are padded device arrays
``codes [nlist, max_len, ...]`` + lengths, rebuilt lazily from a host-side
flat entry store (codes / listnos / ids per slot). The flat store plays the
role of ArrayInvertedLists + DirectMap (reconstruct / remove / merge are
trivial on it); the padded device form is the scan-time layout (the analogue
of the GPU interleaved-by-32 layout, gpu/impl/IVFInterleaved.cuh:30).

Search = coarse quantization (device knn against centroids) + ivf scan kernel
(ops/ivf_ops.py) + slot->id mapping at the boundary. This replaces the whole
InvertedListScanner / parallel_mode machinery (IndexIVF.cpp:626-752) — query
parallelism is the batch dimension on the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Index, SearchParameters, query_buckets
from ..clustering import Clustering, ClusteringParameters
from ..metric import MetricType, is_similarity_metric
from ..ops import distances as dops
from ..ops.ivf_ops import ivf_flat_scan
from .flat import IndexFlat


class IndexIVFStats:
    """Search statistics (reference: IndexIVF.h:583 IndexIVFStats)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.nq = 0
        self.nlist = 0
        self.ndis = 0
        self.nheap_updates = 0
        self.quantization_time = 0.0
        self.search_time = 0.0


indexIVF_stats = IndexIVFStats()


class SearchParametersIVF(SearchParameters):
    """reference: IndexIVF.h:68."""

    def __init__(self, nprobe: int = 0, max_codes: int = 0, sel=None):
        super().__init__(sel=sel)
        self.nprobe = int(nprobe)
        self.max_codes = int(max_codes)


class Level1Quantizer:
    """Coarse-quantizer management (reference: IndexIVF.h:30).

    Owns the quantizer index and trains it by k-means (train_q1,
    IndexIVF.cpp). ``clustering_index`` optionally redirects assignment to
    another index type during training (API parity; our Clustering always
    assigns on-device).
    """

    def __init__(self, quantizer: Optional[Index], nlist: int, d: int, metric):
        self.nlist = int(nlist)
        self.quantizer = quantizer if quantizer is not None else IndexFlat(d, metric)
        self.own_fields = quantizer is None
        self.cp = ClusteringParameters()
        self.clustering_index = None
        self.quantizer_trains_alone = 0

    def train_q1(self, x: np.ndarray, verbose: bool, metric) -> None:
        d = x.shape[1]
        if self.quantizer.ntotal == self.nlist:
            return  # already trained (quantizer provided pre-populated)
        if self.quantizer_trains_alone == 1:
            self.quantizer.train(x)
            return
        cp = self.cp
        cp.verbose = verbose
        cp.spherical = cp.spherical or metric == MetricType.INNER_PRODUCT
        clus = Clustering(d, self.nlist, cp)
        clus.train(x)
        self.quantizer.reset()
        self.quantizer.add(clus.centroids)


class IndexIVF(Index, Level1Quantizer):
    """Base IVF index (reference: IndexIVF.h:194).

    Subclasses implement the codec: encode_vectors / decode_vectors /
    code shape, and may override the scan kernel.
    """

    def __init__(
        self,
        quantizer: Optional[Index],
        d: int,
        nlist: int,
        metric=MetricType.L2,
    ):
        Index.__init__(self, d, metric)
        Level1Quantizer.__init__(self, quantizer, nlist, d, self.metric_type)
        self.nprobe = 1
        self.max_codes = 0
        self.by_residual = False
        self.is_trained = self.quantizer.ntotal == self.nlist
        # host-side flat entry store (ArrayInvertedLists + DirectMap analogue)
        self._codes_host: Optional[np.ndarray] = None  # [ntotal, ...] codec dtype
        self._listnos_host = np.empty(0, np.int32)
        self._ids_host = np.empty(0, np.int64)
        self._device = None  # padded device arrays cache

    # ---- codec interface (IndexIVF.h:270 encode_vectors) -------------------
    def train_encoder(self, x: np.ndarray, assign: np.ndarray) -> None:
        del x, assign

    def encode_vectors(self, x: np.ndarray, listnos: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def decode_vectors(self, codes: np.ndarray, listnos: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    # ---- training -----------------------------------------------------------
    def train(self, x) -> None:
        x = self._check_input(x)
        self.train_q1(x, self.verbose, self.metric_type)
        if isinstance(self.quantizer, IndexFlat):
            # top-1 assignment via the chunked assign GEMM — the same
            # program shape the bulk-add path uses, so a cold process
            # compiles ONE assignment program instead of also paying the
            # fused flat-knn kernel's remote compile
            _, assign = dops.assign_flat(
                jnp.asarray(x), self.quantizer._consolidate(),
                metric=self.quantizer.metric_type,
            )
            assign = np.asarray(assign)
        else:
            _, assign = self.quantizer.search(x, 1)
        self.train_encoder(x, assign.ravel())
        self.is_trained = True

    # ---- population ----------------------------------------------------------
    def add(self, x) -> None:
        self.add_with_ids(x, None)

    def add_with_ids(self, x, ids) -> None:
        from ..base import add_page_rows, device_staging

        x = self._check_input(x)
        self._check_trained()
        n = len(x)
        if n == 0:
            return
        page = add_page_rows(self.d)
        if n > page:
            # paged add (gpu/GpuIndex.cu:474 kAddPageSize analogue): bounds
            # the staged copy + residual + encode working set on device
            for s in range(0, n, page):
                self.add_with_ids(
                    x[s:s + page],
                    None if ids is None else np.asarray(ids)[s:s + page],
                )
            return
        if isinstance(self.quantizer, IndexFlat) and n >= 4096:
            # bulk path: stage x on device ONCE; assignment, residual
            # encoding and any refine-index storage reuse the same copy
            # (gpu/GpuIndex.cu:554 paged-add analogue)
            with device_staging(x) as x_dev:
                _, assign = dops.assign_flat(
                    x_dev, self.quantizer._consolidate(),
                    metric=self.quantizer.metric_type,
                )
                self.add_core(x, ids, np.asarray(assign))
            return
        _, assign = self.quantizer.search(x, 1)
        self.add_core(x, ids, assign.ravel())

    def add_core(self, x, ids, listnos) -> None:
        """Add with precomputed coarse assignment
        (reference: IndexIVF.h add_core; contrib/ivf_tools.add_preassigned)."""
        n = len(x)
        listnos = np.asarray(listnos, np.int32).ravel()
        codes = self.encode_vectors(x, listnos)
        if ids is None:
            ids = np.arange(self.ntotal, self.ntotal + n, dtype=np.int64)
        else:
            ids = np.asarray(ids, np.int64).ravel()
            if len(ids) != n:
                raise ValueError("ids length mismatch")
        if self._codes_host is None:
            self._codes_host = codes
        else:
            self._codes_host = np.concatenate([self._codes_host, codes])
        self._listnos_host = np.concatenate([self._listnos_host, listnos])
        self._ids_host = np.concatenate([self._ids_host, ids])
        self.ntotal += n
        self._device = None

    def reset(self) -> None:
        self._codes_host = None
        self._listnos_host = np.empty(0, np.int32)
        self._ids_host = np.empty(0, np.int64)
        self.ntotal = 0
        self._device = None

    def update_vectors(self, ids, x) -> None:
        """Replace the stored vectors of existing ids in place
        (reference: IndexIVF.h:375 update_vectors / DirectMap::update_codes).
        Each id keeps its identity; the new vector is coarse-assigned and
        re-encoded, possibly moving to a different inverted list. The flat
        entry store makes this an in-place write — no hole management."""
        x = self._check_input(x)
        self._check_trained()
        ids = np.asarray(ids, np.int64).ravel()
        if len(ids) != len(x):
            raise ValueError("ids/x length mismatch")
        order = np.argsort(self._ids_host, kind="stable")
        loc = np.searchsorted(self._ids_host[order], ids)
        if (loc >= len(order)).any() or (
            self._ids_host[order[np.minimum(loc, len(order) - 1)]] != ids
        ).any():
            raise ValueError("did not find all entries to update")
        pos = order[loc]
        _, assign = self.quantizer.search(x, 1)
        assign = np.asarray(assign, np.int32).ravel()
        codes = self.encode_vectors(x, assign)
        self._codes_host[pos] = codes
        self._listnos_host[pos] = assign
        self._device = None
        self._brute = None  # big-batch staging caches (IVFFlat / IVFPQ)
        # list-membership CSR (IVFFlat exact replay): its ntotal cache key
        # cannot see an in-place list reassignment — clear explicitly or
        # flagged rows replay against stale list membership
        self._list_csr_cache = None

    def remove_ids(self, sel) -> int:
        keep = ~sel.mask_for_ids(self._ids_host)
        nremoved = int((~keep).sum())
        if nremoved:
            self._codes_host = self._codes_host[keep]
            self._listnos_host = self._listnos_host[keep]
            self._ids_host = self._ids_host[keep]
            self.ntotal -= nremoved
            self._device = None
        return nremoved

    def merge_from(self, other: "IndexIVF", add_id: int = 0) -> None:
        self.check_compatible_for_merge(other)
        if other.ntotal:
            self._codes_host = (
                other._codes_host.copy()
                if self._codes_host is None
                else np.concatenate([self._codes_host, other._codes_host])
            )
            self._listnos_host = np.concatenate(
                [self._listnos_host, other._listnos_host]
            )
            self._ids_host = np.concatenate(
                [self._ids_host, other._ids_host + add_id]
            )
            self.ntotal += other.ntotal
            self._device = None
        other.reset()

    def check_compatible_for_merge(self, other) -> None:
        if (
            type(other) is not type(self)
            or other.d != self.d
            or other.nlist != self.nlist
            or other.metric_type != self.metric_type
        ):
            raise ValueError("incompatible indexes for merge")

    # ---- padded device layout --------------------------------------------------
    def _pad_to(self, n: int) -> int:
        return max(128, -(-n // 128) * 128)

    def _build_device(self):
        if self._device is not None:
            return self._device
        nlist = self.nlist
        n = self.ntotal
        lengths = np.bincount(self._listnos_host, minlength=nlist).astype(np.int32)
        max_len = self._pad_to(int(lengths.max()) if n else 1)
        order = np.argsort(self._listnos_host, kind="stable").astype(np.int32)
        sorted_ln = self._listnos_host[order]
        offsets = np.zeros(nlist, np.int64)
        np.cumsum(lengths[:-1], out=offsets[1:])
        ranks = np.arange(n, dtype=np.int64) - offsets[sorted_ln]
        slot_ids = np.full((nlist, max_len), -1, np.int32)
        slot_ids[sorted_ln, ranks] = order
        self._device = self._stage_codes(
            slot_ids, lengths, max_len, sorted_ln, ranks, order
        )
        return self._device

    def _stage_codes(self, slot_ids, lengths, max_len, sorted_ln, ranks, order):
        """Build device arrays for the scan kernel; IVF-Flat default:
        padded raw vectors + cached norms."""
        d = self.d
        pad_codes = np.zeros((self.nlist, max_len, d), np.float32)
        if self.ntotal:
            pad_codes[sorted_ln, ranks] = self._codes_host[order]
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

    # ---- search -------------------------------------------------------------
    def _coarse_search(self, xq_host: np.ndarray, nprobe: int):
        """Coarse quantization, kept on device when the quantizer is flat."""
        q = self.quantizer
        if isinstance(q, IndexFlat):
            xb = q._consolidate()
            d, i = dops.knn(
                jnp.asarray(xq_host),
                xb,
                nprobe,
                metric=q.metric_type,
                y_norms=q._norms,
            )
            return d, i.astype(jnp.int32)
        d, i = q.search(xq_host, nprobe)
        return jnp.asarray(d), jnp.asarray(i.astype(np.int32))

    def _scan(self, xq_dev, probes, coarse_dis, k, dev, sel_mask):
        """Codec-specific list scan; returns (dists, slots). IVF-Flat default."""
        return ivf_flat_scan(
            xq_dev,
            probes,
            dev["codes"],
            dev["slot_ids"],
            dev["lengths"],
            k,
            metric=self.metric_type,
            code_norms=dev["code_norms"],
            sel_mask=sel_mask,
        )

    def search(
        self, x, k: int, *, params: Optional[SearchParameters] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        x = self._check_input(x)
        self._check_trained()
        nprobe = self.nprobe
        max_codes = self.max_codes
        sel = None
        if params is not None:
            sel = params.sel
            if getattr(params, "nprobe", 0):
                nprobe = params.nprobe
            if getattr(params, "max_codes", 0):
                max_codes = params.max_codes
        nprobe = min(max(1, nprobe), self.nlist)

        nq = len(x)
        largest = is_similarity_metric(self.metric_type)
        D = np.full((nq, k), -np.inf if largest else np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        if self.ntotal == 0 or nq == 0:
            return D, I

        dev = self._build_device()
        sel_mask = None
        if sel is not None:
            sel_mask = jnp.asarray(sel.mask_for_ids(self._ids_host))

        lengths_host = None
        if max_codes:
            lengths_host = np.bincount(self._listnos_host, minlength=self.nlist)

        indexIVF_stats.nq += nq
        for start, padded, real in query_buckets(nq):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            coarse_dis, probes = self._coarse_search(xq, nprobe)
            if max_codes:
                # stop probing once the per-query scanned-code budget is hit
                # (reference: SearchParametersIVF::max_codes, IndexIVF.h:68)
                ph = np.asarray(probes)
                cum = np.cumsum(
                    np.where(ph >= 0, lengths_host[np.maximum(ph, 0)], 0),
                    axis=1,
                )
                keep = np.concatenate(
                    [np.ones((len(ph), 1), bool), cum[:, :-1] < max_codes],
                    axis=1,
                )
                probes = jnp.asarray(np.where(keep, ph, -1).astype(np.int32))
            xq_dev = jnp.asarray(xq)
            dists, slots = self._scan(xq_dev, probes, coarse_dis, k, dev, sel_mask)
            slots = np.asarray(slots)[:real]
            D[start : start + real] = np.asarray(dists)[:real]
            I[start : start + real] = np.where(
                slots >= 0, self._ids_host[np.maximum(slots, 0)], -1
            )
        return D, I

    def search_preassigned(
        self, x, k: int, assign, centroid_dis, *, params=None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Search with externally computed coarse assignment
        (reference: IndexIVF.h:301; contrib/ivf_tools.search_preassigned)."""
        x = self._check_input(x)
        nq = len(x)
        dev = self._build_device()
        sel_mask = None
        if params is not None and params.sel is not None:
            sel_mask = jnp.asarray(params.sel.mask_for_ids(self._ids_host))
        largest = is_similarity_metric(self.metric_type)
        D = np.full((nq, k), -np.inf if largest else np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        assign = np.asarray(assign, np.int32)
        centroid_dis = np.asarray(centroid_dis, np.float32)
        for start, padded, real in query_buckets(nq):
            xq = x[start : start + real]
            pr = assign[start : start + real]
            cd = centroid_dis[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
                pr = np.pad(pr, ((0, padded - real), (0, 0)), constant_values=-1)
                cd = np.pad(cd, ((0, padded - real), (0, 0)))
            dists, slots = self._scan(
                jnp.asarray(xq), jnp.asarray(pr), jnp.asarray(cd), k, dev, sel_mask
            )
            slots = np.asarray(slots)[:real]
            D[start : start + real] = np.asarray(dists)[:real]
            I[start : start + real] = np.where(
                slots >= 0, self._ids_host[np.maximum(slots, 0)], -1
            )
        return D, I

    # ---- reconstruction -----------------------------------------------------
    def make_direct_map(self, new_maintain: bool = True) -> None:
        pass  # the flat entry store always supports reconstruction

    def _slots_of_ids(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized id -> slot lookup (DirectMap analogue,
        invlists/DirectMap.h:38). Raises on any missing id."""
        order = np.argsort(self._ids_host, kind="stable")
        pos = np.searchsorted(self._ids_host, keys, sorter=order)
        pos = np.clip(pos, 0, len(order) - 1)
        slots = order[pos]
        bad = self._ids_host[slots] != keys
        if bad.any():
            raise KeyError(f"id {keys[bad][0]} not found")
        return slots

    def reconstruct(self, key: int) -> np.ndarray:
        return self.reconstruct_batch(np.array([key], np.int64))[0]

    def reconstruct_batch(self, keys) -> np.ndarray:
        keys = np.asarray(keys, np.int64).ravel()
        slots = self._slots_of_ids(keys)
        return self.decode_vectors(
            self._codes_host[slots], self._listnos_host[slots]
        )

    def reconstruct_n(self, n0: int, ni: int) -> np.ndarray:
        return self.reconstruct_batch(np.arange(n0, n0 + ni, dtype=np.int64))

    # ---- invlist introspection (InvertedLists.h API surface) ------------------
    def get_list_size(self, list_no: int) -> int:
        return int((self._listnos_host == list_no).sum())

    def invlists_ids(self, list_no: int) -> np.ndarray:
        return self._ids_host[self._listnos_host == list_no]


@functools.partial(jax.jit, donate_argnums=(0,))
def _flat_stage_step(yT, sm_c, xb, start):
    """Gather one window of packed slots straight into the DONATED bf16
    transposed store (dynamic_update_slice at ``start``). Donation writes
    the store in-place, so the live set per step is the store + one
    window's f32 row gather (~100 MB at d=96)."""
    valid = sm_c >= 0
    sm = jnp.maximum(sm_c, 0)
    yc = jnp.where(valid[:, None], xb[sm], 0.0).astype(jnp.bfloat16).T
    d_pad = yT.shape[0]
    if d_pad > yc.shape[0]:
        yc = jnp.pad(yc, ((0, d_pad - yc.shape[0]), (0, 0)))
    return jax.lax.dynamic_update_slice(yT, yc, (0, start))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _flat_stage_step2(yT_hi, yT_lo, sm_c, xb, start):
    """hi/lo variant of _flat_stage_step: one gather feeds BOTH donated
    bf16 planes (hi parts + lo residuals — together f32-faithful to
    ~2^-17, the exact-contract scoring mode). reduce_precision, NOT a
    bf16 cast round-trip: under XLA's allow-excess-precision the
    round-trip folds away and the lo plane silently becomes zero."""
    valid = sm_c >= 0
    sm = jnp.maximum(sm_c, 0)
    yf = jnp.where(valid[:, None], xb[sm], 0.0).astype(jnp.float32)
    hi32 = jax.lax.reduce_precision(yf, 8, 7)
    hi = hi32.astype(jnp.bfloat16).T
    lo = (yf - hi32).astype(jnp.bfloat16).T
    d_pad = yT_hi.shape[0]
    if d_pad > hi.shape[0]:
        hi = jnp.pad(hi, ((0, d_pad - hi.shape[0]), (0, 0)))
        lo = jnp.pad(lo, ((0, d_pad - lo.shape[0]), (0, 0)))
    return (
        jax.lax.dynamic_update_slice(yT_hi, hi, (0, start)),
        jax.lax.dynamic_update_slice(yT_lo, lo, (0, start)),
    )


@jax.jit
def _flat_stage_meta(n2, slot_map, listnos, local_of):
    valid = slot_map >= 0
    sm = jnp.maximum(slot_map, 0)
    n2s = jnp.where(valid, n2[sm], jnp.inf)[None]
    lid = jnp.where(
        valid, local_of[listnos.astype(jnp.int32)[sm]], 0
    )[None]
    return n2s, lid


def _stage_flat_brute(xb, slot_map, listnos, local_of, d_pad, hilo=False):
    """Group-packed staging for the fused IVF-Flat scan: bf16 transposed
    vector store + exact per-slot norms + local list ids, all via slot_map
    GATHERS (packed position -> input slot; -1 = pad — scatters of 1M
    indices OOM the TPU memory-space assignment).

    Eager host loop over jitted window steps with a DONATED store: the
    previous all-in-one jit kept a full-store f32 gather plus the
    transpose/pad chain plus the parts' concatenate live inside one XLA
    program (several GB at 10M x 96 — measured OOM on v5e). A host-read
    fence per step keeps the async dispatch queue from piling step
    transients; norms run through the chunked l2_norms scan.

    ``hilo``: also stage the bf16 lo-residual plane (exact-contract
    scoring mode; returns (yT, yT_lo, n2s, lid))."""
    n2 = dops.l2_norms(xb)
    S_pad = int(slot_map.shape[0])
    ch = min(1 << 18, S_pad)
    yT = jnp.zeros((d_pad, S_pad), jnp.bfloat16)
    yT_lo = jnp.zeros((d_pad, S_pad), jnp.bfloat16) if hilo else None
    for s in range(0, S_pad, ch):
        # ragged tail: shift the window back onto the last full ch slots
        # (recomputes an already-written overlap — bit-identical values)
        s = min(s, S_pad - ch)
        smw = jax.lax.dynamic_slice_in_dim(slot_map, s, ch)
        if hilo:
            yT, yT_lo = _flat_stage_step2(yT, yT_lo, smw, xb, s)
        else:
            yT = _flat_stage_step(yT, smw, xb, s)
        np.asarray(yT[:1, :1])  # fence
    n2s, lid = _flat_stage_meta(n2, slot_map, listnos, local_of)
    if hilo:
        return yT, yT_lo, n2s, lid
    return yT, n2s, lid


class IndexIVFFlat(IndexIVF):
    """IVF with raw float vectors in lists (reference: IndexIVFFlat.h:22).

    Big L2 batches on TPU dispatch to the fused recon-GEMM kernel
    (ops/pallas_knn.ivf_recon_fused_pallas): one [qt, d] x [d, ct] MXU scan
    over the group-packed bf16 vector store with in-kernel top-k select,
    probe-masked per query, then an EXACT f32 re-rank of the top-kc
    candidates in the same device program. The reference counterpart is the
    GPU IVFFlat interleaved-layout scan (gpu/impl/IVFFlatScan.cu); candidate
    selection is bf16 (exact re-rank restores f32 distances), rows whose
    eviction floor reaches rank k are repaired through the per-probe path.

    Candidate screening defaults to hi+lo bf16 store planes
    (``brute_hilo = True``): keys are f32-faithful to ~2^-17, so the
    top-kc candidate set matches the exact ranking and the eviction-floor
    flag is truthful — the exact-within-probed-lists contract holds on
    the fast path (measured inter@10 0.9992 on clustered data where a
    single bf16 plane silently collapses to 0.35 with almost no flags).

    APPROXIMATION NOTE: ``brute_hilo = False`` opts into single-plane
    bf16 screening (half the scan HBM/MXU cost): on distance-concentrated
    data a true neighbor can then rank past the kc=min(128, max(2k,
    k+32)) candidate buffer without tripping the eviction-floor repair —
    a divergence from the reference's contract that the k+32..2k margin
    only absorbs on well-spread data (recall@10 0.9999 on SIFT1M-scale
    mixtures). ``big_batch_threshold = 0`` disables the fused path
    entirely (strict per-probe exact scans).
    """

    # fused big-batch knobs (shared semantics with IndexIVFPQ);
    # big_batch_threshold = 0 disables the fused bf16-screen path entirely
    FUSED_CT = 1024
    big_batch_threshold = 128
    pipeline_batch = 4096  # sub-batch size for tunnel-overlap pipelining
    # Optional query-transfer compression for the big-batch path
    # (GpuIndexConfig-style opt-in knob: None = exact f32 — the IVFFlat
    # contract; "float16" halves the H2D bytes, every distance then sees
    # the f16-rounded query, ~6e-4 relative). The tunnel moves ~45 MB/s,
    # so the 4 MB f32 upload for 8192 queries costs ~90 ms of a ~345 ms
    # batch — set this where that trade is right.
    query_h2d_dtype = None
    recon_scan_max_bytes = 4 << 30
    refined_qdepth = 3  # candidates are near-results: keep the deep queue
    fused_interpret = False  # CPU interpret-mode testing knob
    fused_fmax = 16  # flush cap / home-sort rotation / two-phase select
    fused_sort_rot = False  # (shared semantics with IndexIVFPQ)
    fused_cheap_after = 0
    # bf16-selection candidate margin for the fused big-batch scan
    # (0 = auto: min(128, max(2k, k+32))). Clustered distributions
    # concentrate distances and flag far more eviction-floor rows than
    # the bench mixture; raising kc toward the 128 kernel cap trades a
    # slightly bigger exact re-rank for fewer replays.
    big_batch_kc = 0
    # packed-readback wire format (see IndexIVFPQ.pack_d2h): "f16" packs
    # exact int32 slot ids + f16 distance pairs for ~23% less D2H wire
    pack_d2h = None
    # f32-faithful candidate selection (default): stage hi+lo bf16 store
    # planes and score with the 3-pass contraction (2x scan HBM/MXU cost
    # vs False). On distance-concentrated data the single bf16 plane
    # cannot separate candidates — measured inter@10 0.35 with almost no
    # eviction flags on clustered data (silent), and 89.8% replay rate on
    # clustered Deep10M (219 QPS); hi/lo keys keep the exact-within-
    # probed contract on the fast path.
    brute_hilo = True
    # replay chunking budget: bytes of gathered [rows, maxc, d_pad] f32
    # per rerank_exact call on the exact replay path
    replay_gather_bytes = 1 << 30
    # tunnel-RT economy (IndexIVFPQ.rt_econ analogue): all sub-batches
    # ride ONE staged upload; per-bucket views are device slices
    rt_econ = False
    _brute = None
    _list_csr_cache = None

    def __init__(self, quantizer, d, nlist, metric=MetricType.L2):
        super().__init__(quantizer, d, nlist, metric)
        self.code_size = d * 4

    def add_core(self, x, ids, listnos) -> None:
        super().add_core(x, ids, listnos)
        self._brute = None
        self._list_csr_cache = None

    def reset(self) -> None:
        super().reset()
        self._brute = None
        self._list_csr_cache = None

    def _build_brute(self):
        if self._brute is not None:
            return self._brute
        self._dyn_bucket = None  # worklist size is layout-dependent
        from .ivf_pq import pack_invlists_grouped

        centroids = self.quantizer.vectors()
        listnos = self._listnos_host
        xb = np.ascontiguousarray(self._codes_host, np.float32)
        g = pack_invlists_grouped(
            listnos, self.nlist, self.FUSED_CT, centroids=centroids
        )
        ct = self.FUSED_CT
        slot_map = np.concatenate(
            [g["slot_map"], np.full(ct, -1, np.int64)]
        )
        lp = g["list_perm"]
        local_of = np.zeros(self.nlist, np.int32)
        local_of[lp[lp >= 0]] = (
            np.arange(len(lp), dtype=np.int32)[lp >= 0] % 128
        )
        d_pad = -(-self.d // 128) * 128
        xb_dev = jnp.asarray(xb)
        slot_map_dev = jnp.asarray(slot_map.astype(np.int32))
        staged = _stage_flat_brute(
            xb_dev, slot_map_dev, jnp.asarray(listnos.astype(np.int32)),
            jnp.asarray(local_of), d_pad, hilo=self.brute_hilo
        )
        if self.brute_hilo:
            yT, yT_lo, n2s, lid = staged
        else:
            (yT, n2s, lid), yT_lo = staged, None
        cent_g = np.zeros((len(lp), centroids.shape[1]), np.float32)
        cent_g[lp >= 0] = centroids[lp[lp >= 0]]
        cn2g = np.full(len(lp), np.inf, np.float32)
        cn2g[lp >= 0] = (cent_g[lp >= 0] ** 2).sum(1)
        # dyn-chunk metadata (chunk span per grouped column + chunk->group)
        S = g["S"]
        nchunks = S // ct
        cs, cl = g["col_start"], g["col_len"]
        chunk_first = np.where(cl > 0, cs // ct, nchunks).astype(np.int32)
        chunk_last = np.where(
            cl > 0, (cs + np.maximum(cl, 1) - 1) // ct, nchunks
        ).astype(np.int32)
        cgroup = np.concatenate(
            [np.repeat(np.arange(g["ngroups"], dtype=np.int32), g["cpg"]),
             np.zeros(1, np.int32)]
        )
        self._brute = {
            "xb": xb_dev,
            "yT": yT,
            "yT_lo": yT_lo,
            "n2s": n2s,
            "lid": lid,
            "slot_map": slot_map,
            "slot_map_dev": slot_map_dev,
            "centroids_g": jnp.asarray(cent_g),
            "cn2g": jnp.asarray(cn2g),
            "chunk_first": jnp.asarray(chunk_first),
            "chunk_last": jnp.asarray(chunk_last),
            "cgroup": jnp.asarray(cgroup),
            "nchunks": nchunks,
            "max_span": int((chunk_last - chunk_first).max()) + 1,
        }
        # host-read fence: staging transients peak at several GB at 10M
        # scale; without a sync jax's async dispatch overlaps them with
        # the first search program's allocations and the OOM surfaces
        # there (block_until_ready does NOT sync under the axon tunnel)
        np.asarray(yT[0, :1])
        return self._brute

    def _big_batch_gate(self, x, k, params):
        """(nprobe, use_big): the ONE fused big-batch eligibility test —
        search() and search_submit() must agree or the same query diverges
        between the eager and streamed entry points."""
        nprobe = self.nprobe
        max_codes = self.max_codes
        if params is not None:
            if getattr(params, "nprobe", 0):
                nprobe = params.nprobe
            if getattr(params, "max_codes", 0):
                max_codes = params.max_codes
        d_pad = -(-self.d // 128) * 128
        import jax as _jax

        use_big = bool(
            self.big_batch_threshold
            and len(x) >= self.big_batch_threshold
            and self.metric_type == MetricType.L2
            and (params is None or params.sel is None)
            and not max_codes
            and k <= 64
            and self.ntotal > 0
            and (self.ntotal + 2 * self.FUSED_CT) * 2 * d_pad
            * (4 if self.brute_hilo else 2)
            <= self.recon_scan_max_bytes
            and (_jax.default_backend() not in ("cpu",)
                 or self.fused_interpret)
        )
        return nprobe, use_big

    def search(self, x, k: int, *, params=None):
        x = self._check_input(x)
        nprobe, use_big = self._big_batch_gate(x, k, params)
        if use_big:
            self._check_trained()
            return self._search_big_batch_flat(
                x, k, min(max(1, nprobe), self.nlist), params
            )
        return super().search(x, k, params=params)

    # dyn-chunk worklist cap (shared semantics with IndexIVFPQ; the
    # adaptive cache is keyed by nprobe — see IndexIVFPQ._dyn_bucket_for)
    dyn_msteps = 0
    _dyn_bucket = None
    dyn_engage_frac = 0.08
    # soft probing (see IndexIVFPQ.strict_probe): worklist chunks scanned
    # without the {0,1e9} penalty — recall >= the strict scan at the same
    # worklists, and the dyn path engages up to soft_engage_frac
    strict_probe = True
    soft_engage_frac = 0.7

    def _dyn_bucket_for(self, xq_dev, br, nprobe, qt):
        from .ivf_pq import _dyn_probe_counts

        if self.dyn_msteps:
            return min(self.dyn_msteps, br["nchunks"])
        if self._dyn_bucket is None:
            self._dyn_bucket = {}
        if nprobe not in self._dyn_bucket:
            cnt = _dyn_probe_counts(
                xq_dev, br["centroids_g"], br["cn2g"], br["chunk_first"],
                br["chunk_last"], nprobe, qt, br["max_span"], br["nchunks"],
            )
            m = int(np.asarray(jnp.max(cnt)))
            self._dyn_bucket[nprobe] = min(br["nchunks"], -(-m // 64) * 64)
        return self._dyn_bucket[nprobe]

    def search_submit(self, x, k, *, params=None):
        """Non-blocking dispatch of the fused big-batch flat search (see
        Index.search_submit); eager fallback otherwise."""
        x = self._check_input(x)
        nprobe, use_big = self._big_batch_gate(x, k, params)
        if not use_big:
            return ("eager", self.search(x, k, params=params))
        self._check_trained()
        return (
            "fused",
            self._sbbf_submit(
                x, k, min(max(1, nprobe), self.nlist), params
            ),
        )

    def search_collect(self, handle):
        tag, st = handle
        if tag == "eager":
            return st
        return self._sbbf_collect(st)

    def _search_big_batch_flat(self, x, k, nprobe, params):
        return self._sbbf_collect(self._sbbf_submit(x, k, nprobe, params))

    def _sbbf_submit(self, x, k, nprobe, params):
        """DISPATCH phase (async, nothing blocks on the device link); see
        IndexIVFPQ._sbbr_submit for the submit/collect streaming design."""
        from ..base import query_buckets
        from .ivf_pq import (
            _fused_search_rerank_recon,
            _fused_search_rerank_recon_dyn,
        )

        nq = len(x)
        br = self._build_brute()
        # candidate margin over k absorbs bf16 ranking noise before the
        # exact re-rank; eviction-floor flags at rank k trigger repair
        kc = min(128, self.big_batch_kc or max(2 * k, k + 32))
        if nprobe >= self.nlist:
            nprobe = 0
        # queries cross as f32 by default (compressed staging would break
        # IVFFlat's exact-distance contract; query_h2d_dtype opts in)
        # dispatch every sub-batch before reading any result (tunnel
        # overlap — same structure as IndexIVFPQ._search_big_batch_refined)
        pending = []
        carry = None  # single-read chaining across sub-batches
        buckets = list(query_buckets(nq, max_batch=self.pipeline_batch))
        xq_all = None
        offs = [0] * len(buckets)
        if self.rt_econ and len(buckets) > 1:
            o = 0
            offs = []
            for _, padded, _ in buckets:
                offs.append(o)
                o += padded
            xq_pad = np.zeros((o, x.shape[1]), np.float32)
            for (start, padded, real), op in zip(buckets, offs):
                xq_pad[op : op + real] = x[start : start + real]
            if self.query_h2d_dtype == "float16":
                xq_all = jnp.asarray(xq_pad.astype(np.float16)).astype(
                    jnp.float32
                )
            else:
                xq_all = jnp.asarray(xq_pad)
        for (start, padded, real), op in zip(buckets, offs):
            qt = min(padded, 256)
            if xq_all is not None:
                xq_dev = jax.lax.slice_in_dim(
                    xq_all, op, op + padded, axis=0
                )
            else:
                xq = x[start : start + real]
                if padded != real:
                    xq = np.pad(xq, ((0, padded - real), (0, 0)))
                if self.query_h2d_dtype == "float16":
                    xq_dev = jnp.asarray(xq.astype(np.float16)).astype(
                        jnp.float32
                    )
                else:
                    xq_dev = jnp.asarray(xq)
            use_dyn = bool(nprobe) and padded >= 128
            if use_dyn:
                msteps = self._dyn_bucket_for(xq_dev, br, nprobe, qt)
                frac = (
                    self.soft_engage_frac
                    if not self.strict_probe
                    else self.dyn_engage_frac
                )
                use_dyn = msteps <= int(frac * br["nchunks"])
            if use_dyn:
                packed = _fused_search_rerank_recon_dyn(
                    xq_dev,
                    br["centroids_g"],
                    br["cn2g"],
                    br["yT"],
                    br["n2s"],
                    br["lid"],
                    br["slot_map_dev"],
                    br["xb"],
                    br["chunk_first"],
                    br["chunk_last"],
                    br["cgroup"],
                    k,
                    kc,
                    qt,
                    self.FUSED_CT,
                    nprobe,
                    msteps,
                    br["max_span"],
                    qdepth=self.refined_qdepth,
                    strict_probe=self.strict_probe,
                    carry=carry,
                    yT_lo=br["yT_lo"],
                    pack16=(self.pack_d2h == "f16"),
                    interpret=self.fused_interpret,
                )
                carry = packed
            else:
                packed = _fused_search_rerank_recon(
                    xq_dev,
                    br["centroids_g"],
                    br["cn2g"],
                    br["yT"],
                    br["n2s"],
                    br["lid"],
                    br["slot_map_dev"],
                    br["xb"],
                    k,
                    kc,
                    qt,
                    self.FUSED_CT,
                    nprobe,
                    qdepth=self.refined_qdepth,
                    lossy_rank=min(k, kc - 1),
                    fmax=self.fused_fmax,
                    sort_rot=self.fused_sort_rot,
                    cheap_after=self.fused_cheap_after,
                    carry=carry,
                    yT_lo=br["yT_lo"],
                    pack16=(self.pack_d2h == "f16"),
                    interpret=self.fused_interpret,
                )
                carry = packed
            pending.append((start, real, padded, packed, use_dyn))
        return {
            "pending": pending, "nq": nq, "k": k, "nprobe": nprobe,
            "br": br, "x": x, "params": params,
        }

    def _sbbf_collect(self, st):
        """READ phase: the chained LAST handle holds every row -> one read."""
        from .ivf_pq import _unpack_results

        pending, nq, k, nprobe, br, x, params = (
            st["pending"], st["nq"], st["k"], st["nprobe"], st["br"],
            st["x"], st["params"],
        )
        D = np.full((nq, k), np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        total_rows = sum(p[2] for p in pending)
        if len(pending) > 1 and pending[-1][3].shape[0] == total_rows:
            allp = np.asarray(pending[-1][3])
        elif len(pending) > 1:
            allp = np.concatenate(
                [a[-p[2] :] for a, p in zip(
                    jax.device_get([p[3] for p in pending]), pending
                )]
            )
        else:
            allp = np.asarray(pending[0][3])[-pending[0][2] :]
        from .ivf_pq import ivf_fast_scan_stats as _fss

        po = 0
        for start, real, padded, packed, was_dyn in pending:
            d, slots, lossy, nd = _unpack_results(allp[po : po + padded], k)
            po += padded
            _fss.nq += real
            _fss.lossy_rows += int(lossy[:real].sum())
            if was_dyn and nd > 0 and not self.dyn_msteps:
                # worklist overflow: widen this nprobe's bucket next call
                self._dyn_bucket[nprobe] = min(
                    br["nchunks"], self._dyn_bucket[nprobe] + 64
                )
            slots = slots[:real, :k]
            d = d[:real, :k]
            lossy = lossy[:real]
            D[start : start + real] = d
            I[start : start + real] = np.where(
                slots >= 0, self._ids_host[np.maximum(slots, 0)], -1
            )
            if lossy.any():
                # a queue eviction reached rank k: replay those rows
                # exactly over their probed lists. The padded per-list
                # layout (super().search) is only safe at small scale —
                # under clustered skew its [nlist, max_len, d] f32 store
                # explodes (28.9 GB at Deep10M, nlist=8192, max list 9.2k)
                # — so at scale the replay goes through the memory-bounded
                # candidate-CSR re-rank instead.
                bad = np.where(lossy)[0]
                if nprobe == 0:
                    # full probe: every row is a candidate; exact scan
                    Db, Ib = super(IndexIVFFlat, self).search(
                        x[start + bad], k, params=params
                    )
                else:
                    Db, Ib = self._replay_rows_exact(x[start + bad], k,
                                                     nprobe)
                    # soft/dyn probing may have scanned chunks beyond the
                    # strict nprobe lists: keep whichever of (kernel,
                    # replay) wins per rank so replay never loses a valid
                    # extra candidate the kernel already re-ranked exactly
                    Db, Ib = _merge_topk_rows(
                        D[start + bad], I[start + bad], Db, Ib, k
                    )
                D[start + bad] = Db
                I[start + bad] = Ib
        return D, I

    def _list_csr(self):
        """CSR of add-order row indices per list (host, cached)."""
        if (self._list_csr_cache is None
                or self._list_csr_cache[2] != self.ntotal):
            ln = self._listnos_host
            order = np.argsort(ln, kind="stable").astype(np.int32)
            counts = np.bincount(ln, minlength=self.nlist)
            offs = np.zeros(self.nlist + 1, np.int64)
            np.cumsum(counts, out=offs[1:])
            self._list_csr_cache = (order, offs, self.ntotal)
        return self._list_csr_cache[0], self._list_csr_cache[1]

    def _replay_rows_exact(self, xq_bad, k, nprobe):
        """Exact-within-probed replay for eviction-flagged rows, memory-
        bounded: strict coarse assignment, probed-list candidates gathered
        host-side from the list CSR, exact f32 re-rank on device in
        shape-bucketed chunks (never stages the padded per-list layout).
        Reference contract: IndexIVFFlat scans exactly the nprobe closest
        lists (IndexIVFFlat.cpp scan_codes); compile shapes are bucketed
        (rows: power-of-two chunk, candidates: multiples of 2048)."""
        br = self._build_brute()
        order, offs = self._list_csr()
        nb = len(xq_bad)
        cent = jnp.asarray(self.quantizer.vectors())
        probes = np.empty((nb, nprobe), np.int64)
        for s0, padded, real in query_buckets(nb):
            xqp = np.zeros((padded, self.d), np.float32)
            xqp[:real] = xq_bad[s0 : s0 + real]
            _, p = dops.knn(jnp.asarray(xqp), cent, nprobe,
                            metric=self.metric_type)
            probes[s0 : s0 + real] = np.asarray(p)[:real]
        lens = (offs[probes + 1] - offs[probes]).sum(1)
        maxc = max(1, int(lens.max()))
        maxc_b = -(-maxc // 2048) * 2048
        d_pad = -(-self.d // 128) * 128
        rows_fit = int(self.replay_gather_bytes // (maxc_b * d_pad * 4))
        rows = max(8, rows_fit)
        C = 8
        while C * 2 <= rows:
            C *= 2
        C = min(C, 1024)
        # Extreme list skew: when even 8 rows of [maxc_b, d_pad] overshoot
        # the budget, re-rank each row's candidates in fixed-width column
        # segments and merge — never silently gather up to 8x the budget.
        col_chunk = maxc_b
        if rows_fit < 8:
            col_chunk = max(
                2048,
                int(self.replay_gather_bytes // (C * d_pad * 4))
                // 2048 * 2048,
            )
        D = np.empty((nb, k), np.float32)
        slots_out = np.empty((nb, k), np.int64)
        for s in range(0, nb, C):
            m = min(C, nb - s)
            cand = np.full((C, maxc_b), -1, np.int32)
            for i in range(m):
                p = 0
                for ll in probes[s + i]:
                    seg = order[offs[ll] : offs[ll + 1]]
                    cand[i, p : p + len(seg)] = seg
                    p += len(seg)
            xqc = np.zeros((C, self.d), np.float32)
            xqc[:m] = xq_bad[s : s + m]
            if col_chunk >= maxc_b:
                dd, ii = dops.rerank_exact(
                    jnp.asarray(xqc), br["xb"], jnp.asarray(cand), k,
                    metric=self.metric_type,
                )
                D[s : s + m] = np.asarray(dd)[:m]
                slots_out[s : s + m] = np.asarray(ii)[:m]
            else:
                # per-segment top-k + id-dedup merge == top-k of the union;
                # ragged tail shifts back onto the last full window (the
                # overlap re-scores duplicate slots; the merge dedups them)
                xqc_dev = jnp.asarray(xqc)
                Dm = np.full((m, k), np.inf, np.float32)
                Im = np.full((m, k), -1, np.int64)
                for c0 in range(0, maxc_b, col_chunk):
                    c0 = min(c0, maxc_b - col_chunk)
                    dd, ii = dops.rerank_exact(
                        xqc_dev, br["xb"],
                        jnp.asarray(cand[:, c0 : c0 + col_chunk]), k,
                        metric=self.metric_type,
                    )
                    Dm, Im = _merge_topk_rows(
                        Dm, Im, np.asarray(dd)[:m],
                        np.asarray(ii)[:m].astype(np.int64), k,
                    )
                D[s : s + m] = Dm
                slots_out[s : s + m] = Im
        I = np.where(
            slots_out >= 0, self._ids_host[np.maximum(slots_out, 0)], -1
        )
        return D, I

    def encode_vectors(self, x, listnos):
        del listnos
        return np.ascontiguousarray(x, np.float32)

    def decode_vectors(self, codes, listnos):
        del listnos
        return np.ascontiguousarray(codes, np.float32)

    def sa_code_size(self) -> int:
        return self.code_size

    def sa_encode(self, x):
        return self._check_input(x).view(np.uint8).reshape(len(x), -1).copy()

    def sa_decode(self, codes):
        codes = np.ascontiguousarray(codes, np.uint8)
        return codes.view(np.float32).reshape(len(codes), self.d).copy()


def _merge_topk_rows(Da, Ia, Db, Ib, k):
    """Host merge of two exact per-row top-k result sets (L2, smaller
    wins), deduplicating by id: used to combine the kernel's kept
    candidates (which may include soft-probe extras) with the strict
    replay so neither side's valid candidates are lost."""
    Dm = np.concatenate([Da, Db], axis=1)
    Im = np.concatenate([Ia, Ib], axis=1)
    Dm = np.where(Im < 0, np.inf, Dm)
    ordm = np.argsort(Dm, axis=1, kind="stable")
    Dm = np.take_along_axis(Dm, ordm, axis=1)
    Im = np.take_along_axis(Im, ordm, axis=1)
    Do = np.full((len(Dm), k), np.inf, Da.dtype)
    Io = np.full((len(Dm), k), -1, Ia.dtype)
    for r in range(len(Dm)):
        seen = set()
        w = 0
        for c in range(Dm.shape[1]):
            idc = Im[r, c]
            if idc < 0 or idc in seen:
                continue
            seen.add(idc)
            Do[r, w] = Dm[r, c]
            Io[r, w] = idc
            w += 1
            if w == k:
                break
    return Do, Io


def _ivf_range_search(index: "IndexIVF", x, radius: float, params=None):
    """Range search over probed lists (reference: IndexIVF::range_search).

    Distances for each query's probed lists are computed by decoding the
    candidates (codec-faithful), thresholded on host with CSR assembly —
    variable-size output cannot live under jit.
    """
    from ..base import RangeSearchResult

    x = index._check_input(x)
    nq = len(x)
    nprobe = index.nprobe
    sel = None
    if params is not None:
        sel = params.sel
        if getattr(params, "nprobe", 0):
            nprobe = params.nprobe
    nprobe = min(max(1, nprobe), index.nlist)
    largest = is_similarity_metric(index.metric_type)
    lims = np.zeros(nq + 1, np.uint64)
    if index.ntotal == 0 or nq == 0:
        return RangeSearchResult(lims, np.empty(0, np.float32), np.empty(0, np.int64))

    _, probes = index._coarse_search(x, nprobe)
    probes = np.asarray(probes)
    all_d = [[] for _ in range(nq)]
    all_i = [[] for _ in range(nq)]
    listnos = index._listnos_host
    # per-list slot buckets (CSR over lists) so each query touches only its
    # probed lists' candidates instead of an O(ntotal) isin scan
    order = np.argsort(listnos, kind="stable")
    lengths = np.bincount(listnos, minlength=index.nlist)
    offsets = np.zeros(index.nlist + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    for q in range(nq):
        pls = probes[q][probes[q] >= 0]
        cand = (
            np.concatenate([order[offsets[l] : offsets[l + 1]] for l in pls])
            if len(pls)
            else np.empty(0, np.int64)
        )
        if sel is not None:
            keep = sel.mask_for_ids(index._ids_host[cand])
            cand = cand[keep]
        if len(cand) == 0:
            continue
        recon = index.decode_vectors(
            index._codes_host[cand], index._listnos_host[cand]
        )
        if index.metric_type == MetricType.L2:
            d = ((recon - x[q][None]) ** 2).sum(1)
            hit = d < radius
        else:
            d = recon @ x[q]
            hit = d > radius
        all_d[q] = d[hit].astype(np.float32)
        all_i[q] = index._ids_host[cand[hit]]
    counts = np.array([len(v) for v in all_i], np.uint64)
    lims[1:] = np.cumsum(counts)
    D = np.concatenate([np.asarray(v, np.float32) for v in all_d]) if lims[-1] else np.empty(0, np.float32)
    I = np.concatenate([np.asarray(v, np.int64) for v in all_i]) if lims[-1] else np.empty(0, np.int64)
    return RangeSearchResult(lims, D, I)


IndexIVF.range_search = _ivf_range_search
