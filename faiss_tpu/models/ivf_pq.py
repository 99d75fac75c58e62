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
import time

import jax

from ..codecs.pq import ProductQuantizer
from ..metric import MetricType
from ..ops import pq_ops
from ..ops.ivf_ops import ivf_pq_scan
from .ivf import IndexIVF


def _proximity_group_lists(centroids, lengths, ngroups, lam=0.25, iters=8):
    """Assign lists to ngroups groups of <=128, spatially coherent and
    roughly slot-balanced: k-means over the coarse centroids, then greedy
    capacity-constrained assignment (longest lists first, nearest cluster
    with room, slot load as a tie-break penalty). Spatial coherence is what
    makes per-tile probed-chunk unions small in the dynamic-chunk scan."""
    nlist, d = centroids.shape
    rs = np.random.RandomState(7)
    means = centroids[rs.choice(nlist, ngroups, replace=False)].copy()
    c2 = (centroids**2).sum(1)

    def dists(means):  # |c - m|^2 via the GEMM identity (broadcasting a
        # [nlist, G, d] temp is ~50x slower at this size)
        return (
            c2[:, None] + (means**2).sum(1)[None] - 2.0 * centroids @ means.T
        )

    for _ in range(iters):
        lab = dists(means).argmin(1)
        for g in range(ngroups):
            sel = lab == g
            if sel.any():
                means[g] = centroids[sel].mean(0)
    d2 = dists(means)  # [nlist, G]
    scale = np.median(d2) + 1e-9
    cap = np.full(ngroups, 128, np.int64)
    load = np.zeros(ngroups, np.float64)
    budget = max(1.0, lengths.sum() / ngroups)
    group_lists = [[] for _ in range(ngroups)]
    for li in np.argsort(-lengths, kind="stable"):
        cost = d2[li] / scale + lam * (load / budget)
        cost[cap <= 0] = np.inf
        g = int(cost.argmin())
        group_lists[g].append(int(li))
        cap[g] -= 1
        load[g] += lengths[li]
    # balance repair: the exhaustive kernel pads every group to the MAX
    # group's chunk count, so overload directly inflates the scan. When
    # nlist == 128*ngroups every group is at its list-count cap, so balance
    # by SWAPPING a longer list from the heaviest group with a shorter one
    # from the lightest (the pair whose length delta best halves the gap).
    for _ in range(8 * ngroups):
        g_hi = int(load.argmax())
        g_lo = int(load.argmin())
        if load[g_hi] - budget <= budget * 0.02:
            break
        A = np.asarray(group_lists[g_hi])
        B = np.asarray(group_lists[g_lo])
        delta = lengths[A][:, None] - lengths[B][None, :]
        target = (load[g_hi] - load[g_lo]) / 2.0
        i, j = np.unravel_index(
            np.abs(delta - target).argmin(), delta.shape
        )
        if delta[i, j] <= 0:
            break
        a, b = int(A[i]), int(B[j])
        group_lists[g_hi][group_lists[g_hi].index(a)] = b
        group_lists[g_lo][group_lists[g_lo].index(b)] = a
        load[g_hi] -= delta[i, j]
        load[g_lo] += delta[i, j]
    return group_lists


def pack_invlists_grouped(listnos, nlist, ct, seed=0xFA155, centroids=None):
    """Group-packed layout for the fused ADC kernel (pallas_knn docstring).

    Lists are bin-packed into groups of <=128 lists balanced by slot count
    (greedy longest-first), every group padded to a COMMON chunk count so
    chunk->group is the static map ``j // cpg``. Lists stay CONTIGUOUS
    (a list's candidates then arrive in the same grid step spread across
    lanes — measured to halve queue-eviction losses vs random placement)
    but the order WITHIN each list is shuffled, and the kernel pairs slots
    ct/2 apart, so same-list top-k candidates essentially never collide in
    the pair-reduction.

    With ``centroids`` given, groups are additionally SPATIALLY COHERENT
    (_proximity_group_lists): a query's nprobe-nearest lists then fall in
    few groups/chunks, which is what the dynamic-chunk kernel
    (ivfpq_fused_dyn_pallas) exploits to skip unprobed chunks.

    Returns a dict with:
      pos       [n]    packed position of every input slot
      order     [n]    input slot per packed rank (pos[i] places order-th)
      slot_map  [S]    input slot per packed position (-1 = pad)
      lid       [S]    local list id (0..127) within the group (<- 0 on pads)
      list_perm [ngroups*128] original list id per grouped column (-1 unused)
      col_start [ngroups*128] packed start position of each grouped column
      col_len   [ngroups*128] packed slot count of each grouped column
      ngroups, cpg, S
    """
    import heapq

    n = len(listnos)
    lengths = np.bincount(listnos, minlength=nlist).astype(np.int64)
    ngroups = max(1, -(-nlist // 128))
    if centroids is not None:
        group_lists = _proximity_group_lists(
            np.asarray(centroids, np.float32), lengths, ngroups
        )
    else:
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
    group_of = np.zeros(nlist, np.int32)
    local_of = np.zeros(nlist, np.int32)
    list_perm = np.full(ngroups * 128, -1, np.int64)
    for g, gl in enumerate(group_lists):
        for loc, li in enumerate(gl):
            group_of[li] = g
            local_of[li] = loc
            list_perm[g * 128 + loc] = li

    rng = np.random.RandomState(seed)
    g_of = group_of[listnos]  # [n] group of every slot
    # order: by group, lists contiguous within the group, random inside
    # each list
    order = np.lexsort((rng.rand(n), listnos, g_of))
    cnt = np.bincount(g_of, minlength=ngroups).astype(np.int64)
    start_of = np.zeros(ngroups, np.int64)
    np.cumsum(cnt[:-1], out=start_of[1:])
    g_sorted = g_of[order]
    rank_in_group = np.arange(n, dtype=np.int64) - start_of[g_sorted]
    pos = g_sorted.astype(np.int64) * (cpg * ct) + rank_in_group
    slot_map = np.full(S, -1, np.int64)
    slot_map[pos] = order
    lid = np.zeros(S, np.int32)
    lid[pos] = local_of[listnos[order]]
    # packed span of each grouped column (lists are contiguous within a
    # group, appearing in ascending list-id order — matches the lexsort)
    col_start = np.zeros(ngroups * 128, np.int64)
    col_len = np.zeros(ngroups * 128, np.int64)
    for g, gl in enumerate(group_lists):
        off = g * cpg * ct
        for li in sorted(gl):
            col = g * 128 + local_of[li]
            col_start[col] = off
            col_len[col] = lengths[li]
            off += lengths[li]
    return {
        "pos": pos,
        "order": order,
        "slot_map": slot_map,
        "lid": lid,
        "list_perm": list_perm,
        "col_start": col_start,
        "col_len": col_len,
        "ngroups": ngroups,
        "cpg": cpg,
        "S": S,
    }


# queries cross the host->device tunnel compressed: the tunnel moves
# ~20-30 MB/s with a ~35 ms fixed round trip, so at nq=8192, d=128 the f32
# upload alone costs ~190 ms. "float16" halves it (2^-11 rounding,
# immaterial after the exact re-rank; measured recall delta < 1e-3);
# "int8" quarters it with a per-row scalar quantizer (range/255 rounding,
# the GpuIndex fp16/int8 query option analogue). None = exact f32.
# Module default; override per-index via IndexIVFPQ.query_h2d_dtype
# (GpuIndexConfig-style knob — coarse probing, LUTs AND the "exact" re-rank
# all see the dequantized query, so distances deviate from true f32 by the
# quantizer's rounding; set to None for exact-f32 semantics).
QUERY_H2D_DTYPE = "int8"
_UNSET = object()


class IVFFastScanStats:
    """Counters for the fused big-batch scans (reference:
    IndexIVFFastScan.h:409 IVFFastScanStats). ``ndis`` counts slots whose
    key entered selection (the exhaustive kernel streams every slot;
    the dyn kernel streams only worklist chunks), ``chunks_*`` the
    dyn-worklist economy, ``lossy_rows`` eviction-floor flags absorbed by
    the exact re-rank."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.nq = 0
        self.ndis = 0
        self.chunks_scanned = 0
        self.chunks_skipped = 0
        self.lossy_rows = 0
        self.t_scan = 0.0

    def __repr__(self):
        return (
            f"IVFFastScanStats(nq={self.nq}, ndis={self.ndis}, "
            f"chunks_scanned={self.chunks_scanned}, "
            f"chunks_skipped={self.chunks_skipped}, "
            f"lossy_rows={self.lossy_rows}, t_scan={self.t_scan:.3f}s)"
        )


ivf_fast_scan_stats = IVFFastScanStats()


def _stage_queries(xq: np.ndarray, dtype=_UNSET) -> jnp.ndarray:
    if dtype is _UNSET:
        dtype = QUERY_H2D_DTYPE
    if dtype == "int8":
        # per-row SQ; (lo, step) ride along bitcast into the same uint8
        # buffer so the upload stays ONE transfer (one tunnel round trip)
        lo = xq.min(1, keepdims=True)
        step = np.maximum(xq.max(1, keepdims=True) - lo, 1e-20) / 255.0
        u8 = np.round((xq - lo) / step).astype(np.uint8)
        meta = np.concatenate([lo, step], 1).astype(np.float32)
        return jnp.asarray(
            np.concatenate([u8, meta.view(np.uint8)], axis=1)
        )
    if dtype is not None:
        xq = xq.astype(dtype)
    return jnp.asarray(xq)


def _dequantize_queries(xq):
    """Inverse of _stage_queries on device (f32 result)."""
    if xq.dtype == jnp.uint8:
        d = xq.shape[1] - 8
        u8 = xq[:, :d].astype(jnp.float32)
        meta = jax.lax.bitcast_convert_type(
            xq[:, d:].reshape(-1, 2, 4), jnp.float32
        )  # [nq, 2]
        lo = meta[:, 0:1]
        step = meta[:, 1:2]
        return u8 * step + lo
    return xq.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "kc", "qt", "ct", "nprobe", "qdepth", "pack16", "interpret"
    ),
)
def _fused_search_rerank(
    xq, centroids_g, cn2g, cbt, codesT, n2s, lid, slot_map, xb,
    k, kc, qt, ct, nprobe, qdepth=3, pack16=False, sq_scale=None,
    sq_off=None, interpret=False,
):
    """One-dispatch big-batch IVFPQ search + exact re-rank.

    Chains: ADC LUTs (block-diagonal GEMM) + grouped coarse bias (MXU,
    optionally nprobe-masked) -> fused Pallas ADC+select -> slot translation
    -> exact re-rank of the top kc (gather + contraction). Keeping it in one
    program avoids per-op tunnel round-trips (~35 ms each) and host staging.
    """
    from ..ops.distances import rerank_exact
    from ..ops.pallas_knn import ivfpq_fused_pallas

    if slot_map.shape[0] >= (1 << 24) and not pack16:
        raise NotImplementedError(
            "the f32 packed result transfer stores slot ids as exact f32 "
            "values (< 2^24); layouts beyond 2^24 slots must use "
            'pack_d2h = "f16" (int32 ids are exact at any size)'
        )
    xq = _dequantize_queries(xq)
    luts = -2.0 * jax.lax.dot_general(
        xq, cbt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [nq, M*ksub] flattened ADC tables (pq_blockdiag_codebook)
    cm2 = _masked_coarse_bias(xq, centroids_g, cn2g, nprobe)
    v, slots_raw, ev = ivfpq_fused_pallas(
        cm2,
        luts.astype(jnp.bfloat16),
        codesT,
        n2s,
        lid,
        qt=qt,
        ct=ct,
        qdepth=qdepth,
        interpret=interpret,
    )
    slots = jnp.where(
        slots_raw >= 0, slot_map[jnp.maximum(slots_raw, 0)], -1
    )[:, :kc]
    D, I = rerank_exact(xq, xb, slots, k, sq_scale=sq_scale, sq_off=sq_off)
    # kernel contract (pallas_knn docstring): a row is lossy iff the best
    # evicted key beats its kc-th kept key — caller must repair those rows
    lossy = jnp.min(ev, -1) < v[:, kc - 1]
    return _pack_results(D, I, lossy, jnp.zeros((), jnp.int32), pack16)


def _pack_results(D, I, lossy, extra, pack16=False):
    """Pack (D f32 [nq,k], I int32 [nq,k], lossy bool [nq], extra scalar)
    into ONE buffer. Every separate device->host read costs a ~35 ms
    tunnel round-trip; one packed read amortizes them all.

    Default format (f32, [nq, 2k+2]): ids are packed as f32 VALUES (exact
    below 2^24 — slot ids index the packed layout, well under that), NOT
    bitcast: small int32 bit patterns are f32 denormals, which the TPU
    pipeline flushes to zero.

    ``pack16`` format (int32, [nq, k + ceil(k/2) + 2]): slots ride as
    int32 (bit-exact), distances as f16 PAIRS bitcast into int32 lanes
    (integer lanes pass the pipeline untouched — no denormal flush).
    ~23%% less D2H wire at k=10 for 2^-11-relative distance rounding; the
    serving bench opts in via ``pack_d2h = "f16"`` (recall depends only
    on ids).
    """
    nq, k = D.shape
    if pack16:
        d16 = D.astype(jnp.float16)
        if k % 2:
            d16 = jnp.pad(d16, ((0, 0), (0, 1)))
        u = jax.lax.bitcast_convert_type(d16, jnp.uint16).astype(jnp.uint32)
        dpk = jax.lax.bitcast_convert_type(
            u[:, 0::2] | (u[:, 1::2] << 16), jnp.int32
        )
        return jnp.concatenate(
            [
                I.astype(jnp.int32),
                dpk,
                lossy.astype(jnp.int32)[:, None],
                jnp.broadcast_to(extra.astype(jnp.int32), (nq, 1)),
            ],
            axis=1,
        )
    return jnp.concatenate(
        [
            D,
            I.astype(jnp.float32),
            lossy.astype(jnp.float32)[:, None],
            jnp.broadcast_to(extra.astype(jnp.float32), (nq, 1)),
        ],
        axis=1,
    )


def _unpack_results(packed: np.ndarray, k: int):
    """Host-side inverse of _pack_results: (D, I(slots), lossy, extra).
    The pack16 format is self-identifying by dtype (int32 buffer)."""
    packed = np.asarray(packed)
    if packed.dtype == np.int32:
        kh = (k + 1) // 2
        I = packed[:, :k]
        d16 = np.ascontiguousarray(packed[:, k : k + kh]).view(np.float16)
        D = d16[:, :k].astype(np.float32)
        lossy = packed[:, k + kh] != 0
        extra = int(packed[0, k + kh + 1])
        return D, I, lossy, extra
    D = packed[:, :k]
    I = np.rint(packed[:, k : 2 * k]).astype(np.int32)
    lossy = packed[:, 2 * k] != 0.0
    extra = int(round(float(packed[0, 2 * k + 1])))
    return D, I, lossy, extra


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

def _dyn_probe_bitmap(
    xq, centroids_g, cn2g, chunk_first, chunk_last, nprobe, qt, max_span,
    nchunks, approx=False,
):
    """Shared probe/sort/bitmap stages of the dynamic-chunk search.

    Returns (perm, pcols_sorted, cm2, bitmap [T, nchunks+1]) for home-group-
    sorted queries; the trailing bitmap column is the PAD chunk (cleared).
    ``approx`` routes the probe top-k through lax.approx_max_k (TPU-native,
    measured 31.5 -> 11.9 ms on the 8192x4096 serving shape); fine for the
    soft-probe path, where the worklist only needs to COVER the best lists."""
    nq = xq.shape[0]
    T = nq // qt
    cm2 = -2.0 * jax.lax.dot_general(
        xq, centroids_g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    key = cn2g[None, :] + cm2
    if approx and nprobe <= 4:
        # iterative argmin: for tiny nprobe, nprobe dense select passes
        # over [nq, G*128] beat a top-k sort network (and unlike
        # approx_max_k they are exact)
        cols = []
        kw = key
        liota = jnp.arange(key.shape[1], dtype=jnp.int32)[None, :]
        for _ in range(nprobe):
            c = jnp.argmin(kw, axis=1).astype(jnp.int32)
            cols.append(c)
            kw = jnp.where(liota == c[:, None], jnp.inf, kw)
        pcols = jnp.stack(cols, axis=1)
    elif approx:
        _, pcols = jax.lax.approx_max_k(-key, nprobe)
    else:
        _, pcols = jax.lax.top_k(-key, nprobe)
    perm = jnp.argsort(pcols[:, 0] // 128, stable=True)
    pcols_s = pcols[perm]
    cf = chunk_first[pcols_s]  # [nq, nprobe]
    clast = chunk_last[pcols_s]
    # scatter-free bitmap: a list's chunks are the CONTIGUOUS range
    # [chunk_first, chunk_last], so membership is two VPU compares per
    # probe (TPU scatters serialize; max_span enumeration materialized a
    # [nq, nprobe, nchunks] bool per span step — 670 MB/step at 10M scale,
    # measured OOM). Folded over the probe axis to bound the transient to
    # one [nq, nchunks+1] plane. ``max_span`` is kept in the signature as
    # a compile key only.
    del max_span
    ciota = jnp.arange(nchunks + 1, dtype=jnp.int32)
    q2c = None
    for j in range(nprobe):
        m = (ciota[None, :] >= cf[:, j, None]) & (
            ciota[None, :] <= clast[:, j, None]
        )  # [nq, nchunks+1]
        q2c = m if q2c is None else (q2c | m)
    bitmap = q2c.reshape(T, qt, nchunks + 1).any(axis=1)
    bitmap = bitmap.at[:, nchunks].set(False)
    return perm, pcols_s, cm2, bitmap


@functools.partial(
    jax.jit, static_argnames=("nprobe", "qt", "max_span", "nchunks")
)
def _dyn_probe_counts(
    xq, centroids_g, cn2g, chunk_first, chunk_last, nprobe, qt, max_span,
    nchunks,
):
    """Per-tile probed-chunk union sizes (sizes the dynamic worklist; the
    caller syncs the [T] counts once per index/nprobe to pick a bucket).
    ``xq`` may be a staged (int8-quantized) query buffer — dequantize, do
    not astype: the staged buffer is [nq, d+8] uint8 with packed meta."""
    _, _, _, bitmap = _dyn_probe_bitmap(
        _dequantize_queries(xq), centroids_g, cn2g, chunk_first, chunk_last,
        nprobe, qt, max_span, nchunks,
    )
    return jnp.sum(bitmap, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "kc", "qt", "ct", "nprobe", "msteps", "max_span", "pack16",
        "interpret",
    ),
)
def _fused_search_rerank_dyn(
    xq, centroids_g, cn2g, cbt, codesT, n2s, lid, slot_map, xb,
    chunk_first, chunk_last, cgroup,
    k, kc, qt, ct, nprobe, msteps, max_span, pack16=False, sq_scale=None,
    sq_off=None, interpret=False,
):
    """nprobe-sparse big-batch IVFPQ search + exact re-rank (one dispatch).

    The TPU implem_12 (IndexIVFFastScan.cpp:1166): queries are sorted by
    home GROUP (so a 256-query tile's probed lists share chunks), each
    tile's probed-chunk union becomes a scalar-prefetch worklist, and the
    dynamic-chunk Pallas kernel scans only those chunks. All of it — coarse
    top-k, query permutation, worklist construction, kernel, re-rank,
    un-permutation — runs in one jitted program on device.
    Returns (D, I(slots), lossy, ndropped) for the original query order;
    ndropped counts probed chunks that overflowed the msteps worklist cap
    (those queries effectively probe fewer lists).
    """
    from ..ops.distances import rerank_exact
    from ..ops.pallas_knn import ivfpq_fused_dyn_pallas

    if slot_map.shape[0] >= (1 << 24) and not pack16:
        raise NotImplementedError(
            "the f32 packed result transfer stores slot ids as exact f32 "
            "values (< 2^24); layouts beyond 2^24 slots must use "
            'pack_d2h = "f16" (int32 ids are exact at any size)'
        )
    xq = _dequantize_queries(xq)
    nq = xq.shape[0]
    nchunks = cgroup.shape[0] - 1  # trailing PAD chunk
    perm, pcols_s, cm2, bitmap = _dyn_probe_bitmap(
        xq, centroids_g, cn2g, chunk_first, chunk_last, nprobe, qt,
        max_span, nchunks,
    )
    xq_s = xq[perm]
    rows = jnp.arange(nq, dtype=jnp.int32)[:, None]
    probed = jnp.zeros(cm2.shape, jnp.bool_).at[rows, pcols_s].set(True)
    cm2_s = jnp.where(probed, cm2[perm], 1e9)
    luts = -2.0 * jax.lax.dot_general(
        xq_s, cbt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # per-tile worklist: probed chunk ids ascending, PAD id past the count
    cnt = jnp.sum(bitmap, axis=1)
    order = jnp.argsort(~bitmap, axis=1, stable=True)
    cmap = order[:, :msteps].astype(jnp.int32)
    step_i = jnp.arange(msteps, dtype=jnp.int32)[None, :]
    cmap = jnp.where(step_i < cnt[:, None], cmap, nchunks)
    ndropped = jnp.sum(jnp.maximum(cnt - msteps, 0))
    v, slots_raw, ev = ivfpq_fused_dyn_pallas(
        cm2_s, luts.astype(jnp.bfloat16), codesT, n2s, lid, cmap, cgroup,
        qt=qt, ct=ct, interpret=interpret,
    )
    slots = jnp.where(
        slots_raw >= 0, slot_map[jnp.maximum(slots_raw, 0)], -1
    )[:, :kc]
    D, I = rerank_exact(xq_s, xb, slots, k, sq_scale=sq_scale, sq_off=sq_off)
    lossy = jnp.min(ev, -1) < v[:, kc - 1]
    inv = jnp.argsort(perm, stable=True)
    return _pack_results(D[inv], I[inv], lossy[inv], ndropped, pack16)


_RR_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
}


@functools.partial(
    jax.jit, static_argnames=("k", "kc", "qt", "ct", "nprobe", "qdepth",
                              "lossy_rank", "fmax", "sort_rot",
                              "cheap_after", "rr_prec", "pack16",
                              "interpret")
)
def _fused_search_rerank_recon(
    xq, centroids_g, cn2g, yT, n2s, lid, slot_map, xb,
    k, kc, qt, ct, nprobe, qdepth=3, lossy_rank=None, fmax=16,
    sort_rot=False, cheap_after=0, carry=None, xb_n2=None,
    yT_lo=None, rr_prec="highest", pack16=False, sq_scale=None,
    sq_off=None, interpret=False,
):
    """One-dispatch big-batch IVF search + exact re-rank, scoring against
    the DECODED reconstruction store (ivf_recon_fused_pallas) instead of
    one-hot ADC — same candidate ranking, ~2.5x less MXU work. Used whenever
    the bf16 decoded store fits ``recon_scan_max_bytes``. Also serves
    IndexIVFFlat with yT holding the raw vectors. ``lossy_rank`` sets the
    rank against which the eviction floor flags a row (default kc-1:
    "any top-kc candidate lost"; IVF-Flat uses ~k: "a lost candidate could
    displace the k-th result").

    ``sort_rot``: sort queries by HOME group and rotate each tile's chunk
    scan order to start at its own region (kernel ``rot``); the select
    threshold then tightens within the first few steps, which is what makes
    a sparse flush cap (``fmax``) loss-free. Results are un-permuted before
    packing."""
    from ..ops.distances import rerank_exact
    from ..ops.pallas_knn import ivf_recon_fused_pallas

    if slot_map.shape[0] >= (1 << 24) and not pack16:
        raise NotImplementedError(
            "the f32 packed result transfer stores slot ids as exact f32 "
            "values (< 2^24); layouts beyond 2^24 slots must use "
            'pack_d2h = "f16" (int32 ids are exact at any size)'
        )
    xq = _dequantize_queries(xq)
    inv = None
    if sort_rot:
        keyc = cn2g[None, :] - 2.0 * jax.lax.dot_general(
            xq, centroids_g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        home = jnp.argmin(keyc, axis=1) // 128  # home GROUP per query
        perm = jnp.argsort(home, stable=True)
        inv = jnp.argsort(perm, stable=True)
        xq = xq[perm]
    mask = (
        _probe_penalty(xq, centroids_g, cn2g, nprobe) if nprobe else None
    )
    d_pad = yT.shape[0]
    if xq.shape[1] < d_pad:
        xq = jnp.pad(xq, ((0, 0), (0, d_pad - xq.shape[1])))
    v, slots_raw, ev = ivf_recon_fused_pallas(
        xq, yT, n2s, lid, mask, yT_lo=yT_lo,
        qt=qt, ct=ct, qdepth=qdepth, fmax=fmax, rot=sort_rot,
        cheap_after=cheap_after if sort_rot else 0,
        interpret=interpret,
    )
    slots = jnp.where(
        slots_raw >= 0, slot_map[jnp.maximum(slots_raw, 0)], -1
    )[:, :kc]
    D, I = rerank_exact(
        xq[:, : xb.shape[1]], xb, slots, k, xb_n2=xb_n2,
        precision=_RR_PREC[rr_prec], sq_scale=sq_scale, sq_off=sq_off,
    )
    lossy = jnp.min(ev, -1) < v[:, kc - 1 if lossy_rank is None else lossy_rank]
    if inv is not None:
        D, I, lossy = D[inv], I[inv], lossy[inv]
    out = _pack_results(D, I, lossy, jnp.zeros((), jnp.int32), pack16)
    if carry is not None:  # single-read chaining (see recon_dyn)
        out = jnp.concatenate([carry, out], axis=0)
    return out


def _probe_penalty(xq, centroids_g, cn2g, nprobe):
    """{0, 1e9} additive penalty per grouped list column: 0 on each query's
    nprobe nearest lists, 1e9 elsewhere (search_preassigned semantics)."""
    cm2 = -2.0 * jax.lax.dot_general(
        xq, centroids_g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    key = cn2g[None, :] + cm2
    _, cols = jax.lax.top_k(-key, nprobe)
    rows = jnp.arange(xq.shape[0], dtype=jnp.int32)[:, None]
    probed = jnp.zeros(cm2.shape, jnp.bool_).at[rows, cols].set(True)
    return jnp.where(probed, 0.0, 1e9)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "kc", "qt", "ct", "nprobe", "msteps", "max_span", "qdepth",
        "strict_probe", "rr_prec", "pack16", "interpret",
    ),
)
def _fused_search_rerank_recon_dyn(
    xq, centroids_g, cn2g, yT, n2s, lid, slot_map, xb,
    chunk_first, chunk_last, cgroup,
    k, kc, qt, ct, nprobe, msteps, max_span, qdepth=3, strict_probe=True,
    carry=None, xb_n2=None, yT_lo=None, rr_prec="highest", pack16=False,
    sq_scale=None, sq_off=None, interpret=False,
):
    """nprobe-sparse recon-GEMM big-batch search + exact re-rank (one
    dispatch): the dyn-chunk worklist flow of _fused_search_rerank_dyn
    with the decoded-store score producer — scans only the probed chunks
    AND does it at recon-GEMM speed.

    ``strict_probe=False`` (soft probing): no {0,1e9} penalty — every slot
    in a worklist chunk competes on its true key. Strictly higher recall
    than the penalized scan at the same worklists and much cheaper (the
    penalty one-hot GEMM is ~20% of the step cost); the trade is that
    results are no longer exactly "nprobe lists only" (search_preassigned
    parity keeps strict_probe=True)."""
    from ..ops.distances import rerank_exact
    from ..ops.pallas_knn import ivf_recon_fused_dyn_pallas

    if slot_map.shape[0] >= (1 << 24) and not pack16:
        raise NotImplementedError(
            "the f32 packed result transfer stores slot ids as exact f32 "
            "values (< 2^24); layouts beyond 2^24 slots must use "
            'pack_d2h = "f16" (int32 ids are exact at any size)'
        )
    xq = _dequantize_queries(xq)
    nq = xq.shape[0]
    nchunks = cgroup.shape[0] - 1  # trailing PAD chunk
    perm, pcols_s, cm2, bitmap = _dyn_probe_bitmap(
        xq, centroids_g, cn2g, chunk_first, chunk_last, nprobe, qt,
        max_span, nchunks, approx=not strict_probe,
    )
    xq_s = xq[perm]
    if strict_probe:
        rows = jnp.arange(nq, dtype=jnp.int32)[:, None]
        probed = (
            jnp.zeros(cm2.shape, jnp.bool_).at[rows, pcols_s].set(True)
        )
        penalty = jnp.where(probed, 0.0, 1e9)
    else:
        penalty = None
    cnt = jnp.sum(bitmap, axis=1)
    order = jnp.argsort(~bitmap, axis=1, stable=True)
    cmap = order[:, :msteps].astype(jnp.int32)
    step_i = jnp.arange(msteps, dtype=jnp.int32)[None, :]
    cmap = jnp.where(step_i < cnt[:, None], cmap, nchunks)
    ndropped = jnp.sum(jnp.maximum(cnt - msteps, 0))
    d_pad = yT.shape[0]
    xq_p = (
        jnp.pad(xq_s, ((0, 0), (0, d_pad - xq_s.shape[1])))
        if xq_s.shape[1] < d_pad
        else xq_s
    )
    v, slots_raw, ev = ivf_recon_fused_dyn_pallas(
        penalty, xq_p, yT, n2s, lid, cmap, cgroup, yT_lo=yT_lo,
        qt=qt, ct=ct, qdepth=qdepth, penalized=strict_probe,
        interpret=interpret,
    )
    slots = jnp.where(
        slots_raw >= 0, slot_map[jnp.maximum(slots_raw, 0)], -1
    )[:, :kc]
    D, I = rerank_exact(
        xq_s, xb, slots, k, xb_n2=xb_n2, precision=_RR_PREC[rr_prec],
        sq_scale=sq_scale, sq_off=sq_off,
    )
    lossy = jnp.min(ev, -1) < v[:, kc - 1]
    inv = jnp.argsort(perm, stable=True)
    out = _pack_results(D[inv], I[inv], lossy[inv], ndropped, pack16)
    if carry is not None:
        # chain the previous sub-batch's packed result through this
        # program so ALL sub-batches come home in ONE device->host read
        # (each read costs a ~38 ms tunnel round trip)
        out = jnp.concatenate([carry, out], axis=0)
    return out


# packed slots decoded per staging step (one-hot temp = CH x M*ksub bf16)
_STAGE_CH = 1 << 18


@functools.partial(
    jax.jit, donate_argnums=(0,), static_argnames=("by_residual",)
)
def _recon_stage_step(
    yT, sm_c, codes, listnos, cent, cbtT_hi, cbtT_lo, start, by_residual
):
    """Decode one window of packed slots straight into the DONATED
    transposed store: gather codes through the slot_map window, one-hot
    contraction against the block-diagonal codebook (hi/lo bf16 planes,
    f32-faithful to ~16 bits — a row-gather of [n*M, dsub=4] codebook
    entries would pad each tiny row to 128 lanes, 32x HBM), add the list
    centroid (by_residual), bf16-round, transpose, and
    dynamic_update_slice at ``start``. Donation writes the store
    in-place, so the live set per step is the store + one window's
    one-hot/decode transients (~400 MB)."""
    valid = sm_c >= 0
    sm = jnp.maximum(sm_c, 0)
    cseg = codes[sm].astype(jnp.int32)  # [ch, M]
    M = cseg.shape[1]
    Kf = cbtT_hi.shape[0]
    ksub = Kf // M
    rbit = jnp.arange(ksub, dtype=jnp.int32)
    oh = (cseg[:, :, None] == rbit).reshape(len(cseg), Kf).astype(
        jnp.bfloat16
    )
    dec = jax.lax.dot_general(
        oh, cbtT_hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        oh, cbtT_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [ch, d] f32
    if by_residual:
        dec = dec + cent[listnos.astype(jnp.int32)[sm]]
    yc = jnp.where(
        valid[:, None], dec.astype(jnp.bfloat16), jnp.bfloat16(0.0)
    ).T  # [d, ch]
    d_pad = yT.shape[0]
    if d_pad > yc.shape[0]:
        yc = jnp.pad(yc, ((0, d_pad - yc.shape[0]), (0, 0)))
    return jax.lax.dynamic_update_slice(yT, yc, (0, start))


def _stage_recon_device(codes, listnos, cent, cbt, slot_map, d_pad, by_residual):
    """Decoded-reconstruction store for the recon-GEMM kernel:
    y = c_list + pq_decode(code), bf16, TRANSPOSED [d_pad, S_pad], dims
    zero-padded to a lane multiple, laid out by GATHERING through
    slot_map (packed position -> input slot; -1 = pad — scatters of 1M
    indices OOM the TPU memory-space assignment).

    Eager host loop over jitted window steps with a DONATED store. The
    previous all-in-one jit materialized the full [n, d] recon PLUS the
    gathered parts PLUS their concatenate inside one XLA program (~7 GB
    peak at 10M x 96 — measured OOM on v5e with the RFlat refine store
    resident). Decoding directly into the packed layout never builds the
    un-packed recon at all; a host-read fence per step keeps the async
    dispatch queue from piling step transients."""
    # reduce_precision, NOT a bf16 cast round-trip (XLA's
    # allow-excess-precision folds the round-trip and zeroes the lo part)
    cbtT = cbt.T  # [M*ksub, d]
    cbtT_hi32 = jax.lax.reduce_precision(cbtT, 8, 7)
    cbtT_hi = cbtT_hi32.astype(jnp.bfloat16)
    cbtT_lo = (cbtT - cbtT_hi32).astype(jnp.bfloat16)
    S_pad = int(slot_map.shape[0])
    ch = min(_STAGE_CH, S_pad)
    yT = jnp.zeros((d_pad, S_pad), jnp.bfloat16)
    for s in range(0, S_pad, ch):
        # ragged tail: shift the window back onto the last full ch slots
        # (recomputes an already-written overlap — bit-identical values)
        s = min(s, S_pad - ch)
        yT = _recon_stage_step(
            yT,
            jax.lax.dynamic_slice_in_dim(slot_map, s, ch),
            codes,
            listnos,
            cent,
            cbtT_hi,
            cbtT_lo,
            s,
            by_residual,
        )
        np.asarray(yT[:1, :1])  # fence
    return yT


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _brute_stage_step(
    codesT, n2s, lid, sm_w, codes, listnos, term2, cn2, local_of, start
):
    """One window of _stage_brute_device_windowed: gather the window's
    slots, compute per-slot norms from term2, and dynamic_update_slice
    into the DONATED packed stores."""
    M = codes.shape[1]
    valid = sm_w >= 0
    sm = jnp.maximum(sm_w, 0)
    cw = codes[sm]  # [w, M] uint8
    ln = listnos[sm]  # [w] int32
    t2sum = jnp.sum(
        term2[ln[:, None], jnp.arange(M, dtype=jnp.int32)[None, :],
              cw.astype(jnp.int32)],
        axis=1,
    )
    n2w = cn2[ln] + t2sum
    codesT = jax.lax.dynamic_update_slice(
        codesT, jnp.where(valid[:, None], cw, 0).T, (0, start)
    )
    n2s = jax.lax.dynamic_update_slice(
        n2s, jnp.where(valid, n2w, jnp.inf)[None], (0, start)
    )
    lid = jax.lax.dynamic_update_slice(
        lid, jnp.where(valid, local_of[ln], 0)[None], (0, start)
    )
    return codesT, n2s, lid


def _stage_brute_device_windowed(
    codes, listnos, term2, cn2, slot_map, local_of, window=1 << 22
):
    """Windowed variant of _stage_brute_device for 100M-scale layouts.

    The one-shot program gathers a [n, M] f32 term2 temp (12.8 GB at
    100M x M=32 — measured-OOM class) plus full-size where/transpose
    transients; this version walks slot windows with DONATED stores so
    the live set is the three packed outputs + one window's transients
    (~0.5 GB at window=4M). Does NOT build the input-order n2 (the XLA
    fallback path that wants it is not used at this scale).

    Ragged tail: the last window shifts back onto the final `window`
    slots and recomputes the overlap — pure layout writes, bit-identical.
    """
    S_pad = int(slot_map.shape[0])
    w = min(window, S_pad)
    M = codes.shape[1]
    codesT = jnp.zeros((M, S_pad), codes.dtype)
    n2s = jnp.full((1, S_pad), jnp.inf, jnp.float32)
    lid = jnp.zeros((1, S_pad), local_of.dtype)
    for s in range(0, S_pad, w):
        s = min(s, S_pad - w)
        codesT, n2s, lid = _brute_stage_step(
            codesT, n2s, lid,
            jax.lax.dynamic_slice_in_dim(slot_map, s, w),
            codes, listnos, term2, cn2, local_of, s,
        )
        np.asarray(n2s[0, :1])  # fence the dispatch queue per window
    return codesT, n2s, lid


@jax.jit
def _stage_brute_device(codes, listnos, term2, cn2, slot_map, local_of):
    """Device-side group-packed staging for the fused kernels.

    From the already-staged codes/listnos, computes in one program:
      n2     [n]        ||y||^2 = ||c_l||^2 + sum_m term2[l, m, code_m]
      codesT [M, S_pad] codes gathered into the packed layout (transposed)
      n2s    [1, S_pad] per-slot norms (+inf on pads / the PAD chunk)
      lid    [1, S_pad] local list id within the 128-list group
    All layout moves are GATHERS through slot_map (packed position ->
    input slot, -1 = pad): scatters of 1M indices OOM the TPU compiler's
    memory-space assignment, gathers are clean. The equivalent host loop
    (32 fancy-indexed gathers + transpose scatter) costs ~7 s at 1M x 32
    scale (gpu/GpuIndexIVFPQ.cu precomputed-term staging analogue)."""
    n, M = codes.shape
    c32 = codes.astype(jnp.int32)
    ln = listnos.astype(jnp.int32)
    t2sum = jnp.sum(
        term2[ln[:, None], jnp.arange(M, dtype=jnp.int32)[None, :], c32],
        axis=1,
    )
    n2 = cn2[ln] + t2sum  # [n] f32
    valid = slot_map >= 0
    sm = jnp.maximum(slot_map, 0)
    codesT = jnp.where(valid[:, None], codes[sm], 0).T  # [M, S_pad]
    n2s = jnp.where(valid, n2[sm], jnp.inf)[None]
    lid = jnp.where(valid, local_of[ln[sm]], 0)[None]
    return n2, codesT, n2s, lid


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
        # polysemous filtering inside lists (IndexIVFPQ.h:47-60); 0 = off.
        # Requires do_polysemous_training for the Hamming distances to be
        # meaningful (like the reference).
        self.polysemous_ht = 0
        self.do_polysemous_training = False
        self.polysemous_training = None
        # 0 = auto (enable when it fits), 1 = yes, -1 = disable
        self.use_precomputed_table = 0
        self._term2 = None  # [nlist, M, ksub] device
        # fused-implem dispatch (IndexIVFFastScan.h:252 analogue): queries
        # >= this threshold go to the fused ADC kernel, which scans the
        # group-packed codes for a whole 256-query tile at once — on the MXU
        # that is CHEAPER than list-major gathering even for a single query
        # tile (the TPU answer to implem_12's sort-by-list), so the
        # threshold defaults to one bucket. 0 disables.
        self.big_batch_threshold = 128
        self._brute = None  # flat device arrays for the big-batch implem
        self.is_trained = False

    # -- training ---------------------------------------------------------
    def train_encoder(self, x: np.ndarray, assign: np.ndarray) -> None:
        if self.by_residual:
            centroids = self._centroids_host()
            x = x - centroids[assign]
        self.pq.cp.verbose = False
        self.pq.train(x)
        if self.do_polysemous_training:
            from ..codecs.polysemous import PolysemousTraining

            pt = self.polysemous_training or PolysemousTraining()
            pt.optimize_pq_for_hamming(self.pq)
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
            # (which may be an fp16 upload — upcast before the arithmetic)
            cent = self.quantizer._consolidate()
            x_dev = x_dev.astype(jnp.float32)
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
    # slots per kernel chunk (group-packed, multi-list). 2048 measured best
    # end-to-end with 4096-query pipeline sub-batches (151 ms vs 176 at
    # 1024 on the SIFT1M-scale bench: fewer per-step fixed costs at the
    # sub-batch grid size)
    FUSED_CT = 2048
    # HBM budget for the bf16 decoded-reconstruction store backing the
    # recon-GEMM kernel (2*d bytes/slot; _make_recon_kernel). Within budget
    # the scan is a dense [qt, d] x [d, ct] GEMM — the MXU-native FastScan;
    # beyond it the code-streaming one-hot ADC kernel (M/2 bytes/slot) is
    # used instead.
    recon_scan_max_bytes = 4 << 30

    def _build_brute(self):
        if self._brute is not None:
            return self._brute
        self._dyn_bucket = None  # worklist size is layout-dependent
        pq = self.pq
        centroids = self._centroids_host()
        codes = self._codes_host.astype(np.uint8)
        listnos = self._listnos_host
        # term2[l, m, k] = ||y_mk||^2 + 2 c_lm . y_mk (IndexIVFPQ.cpp:407)
        cb = pq.centroids
        y_norms = np.sum(cb**2, axis=-1)  # [M, ksub]
        cmk = centroids.reshape(self.nlist, pq.M, pq.dsub)
        cdoty = 2.0 * np.einsum("cmd,mkd->cmk", cmk, cb)
        term2 = (y_norms[None] + cdoty).astype(np.float32)
        codes_dev = jnp.asarray(codes)
        listnos_dev = jnp.asarray(listnos.astype(np.int32))
        # fused-kernel staging: group-packed layout (lists bin-packed into
        # SPATIALLY COHERENT 128-list groups; within-list order shuffled so
        # pair-reduction sees decorrelated candidates — pack_invlists_grouped)
        g = pack_invlists_grouped(
            listnos, self.nlist, self.FUSED_CT, centroids=centroids
        )
        pos, order, S = g["pos"], g["order"], g["S"]
        ct = self.FUSED_CT
        nchunks = S // ct
        local_of = np.zeros(self.nlist, np.int32)
        lp = g["list_perm"]
        local_of[lp[lp >= 0]] = np.arange(len(lp), dtype=np.int32)[lp >= 0] % 128
        # per-slot norms + packed layout run ON DEVICE via slot_map gathers
        # (the host loop of 32 fancy-indexed gathers plus a 32 MB transpose
        # scatter costs ~7 s at 1M scale; the device does it in
        # milliseconds from the already-staged codes). One trailing
        # all-+inf PAD chunk backs the dynamic-chunk kernel's sentinel
        # worklist entries (slot_map -1).
        slot_map = np.concatenate([g["slot_map"], np.full(ct, -1, np.int64)])
        slot_map_dev = jnp.asarray(slot_map.astype(np.int32))
        if len(codes) > (32 << 20):
            # 100M-scale: the one-shot program's [n, M] f32 term2 temp
            # alone is 12.8 GB — stage in donated windows instead
            codesT_dev, n2s_dev, lid_dev = _stage_brute_device_windowed(
                codes_dev,
                listnos_dev,
                jnp.asarray(term2),
                jnp.asarray((centroids**2).sum(1).astype(np.float32)),
                slot_map_dev,
                jnp.asarray(local_of),
            )
            n2_dev = None  # input-order norms only feed _big_batch_xla
        else:
            n2_dev, codesT_dev, n2s_dev, lid_dev = _stage_brute_device(
                codes_dev,
                listnos_dev,
                jnp.asarray(term2),
                jnp.asarray((centroids**2).sum(1).astype(np.float32)),
                slot_map_dev,
                jnp.asarray(local_of),
            )
        self._brute = {
            "codes": codes_dev,
            "listnos": listnos_dev,
            "n2": n2_dev,
            "centroids": jnp.asarray(centroids),
        }
        lp = g["list_perm"]
        cent_g = np.zeros((len(lp), centroids.shape[1]), np.float32)
        cent_g[lp >= 0] = centroids[lp[lp >= 0]]
        cn2g = np.full(len(lp), np.inf, np.float32)
        cn2g[lp >= 0] = (cent_g[lp >= 0] ** 2).sum(1)
        # dynamic-chunk metadata: chunk span of each grouped column (+ the
        # chunk -> group map; sentinel/empty columns point at the PAD chunk)
        cs, cl = g["col_start"], g["col_len"]
        chunk_first = np.where(cl > 0, cs // ct, nchunks).astype(np.int32)
        chunk_last = np.where(
            cl > 0, (cs + np.maximum(cl, 1) - 1) // ct, nchunks
        ).astype(np.int32)
        cgroup = np.concatenate(
            [np.repeat(np.arange(g["ngroups"], dtype=np.int32), g["cpg"]),
             np.zeros(1, np.int32)]
        )
        # decoded-reconstruction store for the recon-GEMM kernel (the fast
        # path whenever HBM has room: dense GEMM beats one-hot ADC 2.5x)
        d_pad = -(-self.d // 128) * 128
        cbt_dev = jnp.asarray(pq_ops.pq_blockdiag_codebook(pq.centroids))
        yT_dev = None
        if (S + ct) * d_pad * 2 <= self.recon_scan_max_bytes:
            yT_dev = _stage_recon_device(
                codes_dev,
                listnos_dev,
                self._brute["centroids"],
                cbt_dev,
                slot_map_dev,
                d_pad,
                self.by_residual,
            )
        self._brute.update(
            yT=yT_dev,
            codesT=codesT_dev,
            n2s=n2s_dev,
            lid=lid_dev,
            centroids_g=jnp.asarray(cent_g),
            cn2g=jnp.asarray(cn2g),
            cbt=cbt_dev,
            slot_map=slot_map,
            slot_map_dev=slot_map_dev,
            chunk_first=jnp.asarray(chunk_first),
            chunk_last=jnp.asarray(chunk_last),
            cgroup=jnp.asarray(cgroup),
            nchunks=nchunks,
            max_span=int((chunk_last - chunk_first).max()) + 1,
            cpg=g["cpg"],
        )
        # host-read fence: staging transients peak at ~7 GB at 10M scale;
        # without a sync jax's async dispatch overlaps them with the first
        # search program's allocations and the OOM surfaces there
        # (block_until_ready does NOT sync under the axon tunnel)
        np.asarray((yT_dev if yT_dev is not None else n2s_dev)[0, :1])
        return self._brute

    # dynamic-chunk worklist cap (0 = adapt: first batch measures the max
    # per-tile probed-chunk union and rounds it up to a 64 bucket; later
    # batches reuse the bucket and bump it if any chunks were dropped).
    # The adaptive cache is keyed by nprobe — unions grow with it, and a
    # stale small bucket silently truncates worklists (measured: an
    # nprobe=1 bucket reused at nprobe=32 dropped recall to 0.19).
    dyn_msteps = 0
    _dyn_bucket = None  # dict {nprobe: bucket} once first used
    # engage the dyn kernel only below this probed-chunk fraction
    # (strict mode: the {0,1e9} penalty GEMM makes dyn steps ~40% dearer)
    dyn_engage_frac = 0.08
    # SOFT probing (strict_probe=False): skip the penalty — every slot in
    # a worklist chunk competes on its true key (recall >= the strict scan
    # at the same worklists; measured r3: worklist gaps are DMA-free and
    # the dyn step costs the same as the sequential stream). nprobe then
    # selects the worklist SIZE, not an exact list filter; results may
    # include better candidates from unprobed lists sharing a chunk.
    strict_probe = True
    soft_engage_frac = 0.7
    # per-lane insertion-queue depth for the REFINED fused path: 2 trades a
    # few more queue evictions (absorbed by the exact re-rank; measured
    # candidate recall -0.005) for a 15% faster kernel. The unrefined path,
    # whose candidates ARE the results, stays at the default depth 3.
    refined_qdepth = 2
    # refined-path sub-batch size: batches are split so the tunnel overlaps
    # one sub-batch's upload/readback with another's compute (the
    # dispatch-all-then-read-all structure in _search_big_batch_refined)
    pipeline_batch = 4096
    # Per-index query upload compression ("int8" / "float16" / None=f32);
    # defaults to the module-level QUERY_H2D_DTYPE ("int8"). The int8
    # default is SAFE for this index because the candidate set it affects
    # is re-ranked with exact f32 distances against the original queries
    # (the refine stage) — quantization error only perturbs which kc
    # candidates reach the re-rank, measured <0.001 recall@10 impact at
    # k_factor>=8 on the bench mixture. All distance stages (coarse, LUT,
    # exact re-rank) see the dequantized query. Set None for bit-exact f32
    # upload semantics at ~4x the query H2D cost (45 MB/s tunnel), or
    # "float16" as the middle ground (used by unrefined IVF-Flat serving).
    query_h2d_dtype = _UNSET
    # run the fused Pallas programs in interpret mode (CPU testing of the
    # full big-batch-refined path, including staging + dyn-bucket logic)
    fused_interpret = False
    # ONE staged upload + ONE concatenated readback across sub-batches.
    # Measured SLOWER on the axon tunnel (eager slice/concat dispatches
    # cost more than the saved RTs; A/B x3: 162-192 vs 144-161 ms) —
    # default off, kept as a knob for direct-attached TPUs.
    rt_econ = False
    # Packed-readback wire format: None = f32 rows (exact distances);
    # "f16" = int32 rows with exact int32 slot ids + f16 distance pairs
    # (~23% less D2H at k=10; 2^-11-relative distance rounding — ids, and
    # therefore recall, are unaffected). Serving opts in.
    pack_d2h = None
    # recon-kernel flush-schedule cap + home-group query sort/rotation
    # (see _fused_search_rerank_recon sort_rot); tuned on TPU
    fused_fmax = 16
    fused_sort_rot = False
    fused_cheap_after = 0  # two-phase select boundary (needs sort_rot)

    def _dyn_bucket_for(self, xq_dev, br, nprobe, qt):
        if self.dyn_msteps:
            return min(self.dyn_msteps, br["nchunks"])
        if self._dyn_bucket is None:
            self._dyn_bucket = {}
        if nprobe not in self._dyn_bucket:
            cnt = _dyn_probe_counts(
                xq_dev, br["centroids_g"], br["cn2g"], br["chunk_first"],
                br["chunk_last"], nprobe, qt, br["max_span"],
                br["nchunks"],
            )
            m = int(np.asarray(jnp.max(cnt)))  # one host sync per nprobe
            self._dyn_bucket[nprobe] = min(br["nchunks"], -(-m // 64) * 64)
        return self._dyn_bucket[nprobe]

    def _search_big_batch_refined(
        self, x, k, kc, refine_xb, nprobe=0, refine_n2=None, refine_sq=None
    ):
        """Big-batch search + exact re-rank in one device program
        (used by IndexRefineFlat when wrapping this index).
        ``nprobe == 0`` scans everything; a selective nprobe additionally
        routes through the dynamic-chunk kernel, which scans only the
        probed chunks (implem_12 semantics, IndexIVFFastScan.cpp:1166).
        ``refine_sq``: (scale, off) when refine_xb is an SQ8 code store
        (rows dequantize after the candidate gather)."""
        return self._sbbr_collect(
            self._sbbr_submit(x, k, kc, refine_xb, nprobe, refine_n2,
                              refine_sq=refine_sq)
        )

    def _sbbr_submit(self, x, k, kc, refine_xb, nprobe=0, refine_n2=None,
                     refine_sq=None):
        """DISPATCH phase of the refined big-batch search: stage + enqueue
        every sub-batch program WITHOUT blocking on results (jax async
        dispatch — nothing here waits on the device link). Returns an
        opaque state for :meth:`_sbbr_collect`. Splitting submit/collect
        lets a serving loop overlap batch i's readback with batch i+1's
        upload/compute across *separate* search calls — the same
        double-buffering the reference GPU layer gets from its paged
        bfKnn pipeline (gpu/GpuDistance.cu paged copies)."""
        from ..base import query_buckets

        nq = len(x)
        br = self._build_brute()
        if br.get("yT") is None and self.pq.ksub > 16:
            # no decoded store (HBM cap) and the one-hot kernel is
            # infeasible at this ksub: candidates from the XLA ADC path,
            # exact re-rank on device
            from ..ops.distances import rerank_exact

            kc = min(kc, 128)
            _, S = self._big_batch_xla(x, kc, nprobe)
            D, I = rerank_exact(
                jnp.asarray(x), refine_xb,
                jnp.asarray(S.astype(np.int32)), k,
                sq_scale=None if refine_sq is None else refine_sq[0],
                sq_off=None if refine_sq is None else refine_sq[1],
            )
            D = np.asarray(D)
            I = np.asarray(I)
            # rerank_exact returns packed slot positions; translate to the
            # stored user ids like every other _big_batch consumer does
            I = np.where(I >= 0, self._ids_host[np.maximum(I, 0)], -1)
            return {"eager": (D, I.astype(np.int64))}
        kc = min(kc, 128)
        if nprobe >= self.nlist:
            nprobe = 0
        # store norms for the exact re-rank: the refine IndexFlat caches
        # them per buffer (_consolidate) and invalidates on add/reset —
        # callers pass them down; only compute here when not provided
        # (never cache by id(refine_xb): CPython id reuse after a buffer
        # rebuild would validate stale norms)
        if refine_n2 is None and refine_sq is None:
            refine_n2 = jnp.sum(
                jnp.square(refine_xb.astype(jnp.float32)), axis=1
            )
        # SQ8 store: rows dequantize after the gather; norms (when not
        # precomputed by the store) come from the dequantized candidates
        # in-kernel, and HIGH precision matches the 8-bit payload
        sq_kw = dict(
            sq_scale=None if refine_sq is None else refine_sq[0],
            sq_off=None if refine_sq is None else refine_sq[1],
        )
        rr_kw = dict(
            xb_n2=refine_n2,
            rr_prec=(
                "high"
                if refine_xb.dtype in (jnp.float16, jnp.uint8)
                else "highest"
            ),
            pack16=(self.pack_d2h == "f16"),
            **sq_kw,
        )
        # DISPATCH phase: enqueue every sub-batch before reading any result,
        # so the tunnel overlaps batch i+1's upload/compute with batch i's
        # compute/readback (jax async dispatch; the per-batch read is the
        # only blocking point). pipeline_batch splits large nq for overlap.
        #
        # Tunnel-RT economy (each host<->device sync costs ~38 ms): ALL
        # sub-batches ride ONE staged upload (device slices per bucket) and
        # ONE packed readback (device concat in the read phase).
        buckets = list(query_buckets(nq, max_batch=self.pipeline_batch))
        if self.rt_econ:
            offs = []
            o = 0
            for _, padded, _ in buckets:
                offs.append(o)
                o += padded
            xq_pad = np.zeros((o, x.shape[1]), np.float32)
            for (start, padded, real), op in zip(buckets, offs):
                xq_pad[op : op + real] = x[start : start + real]
            xq_all = _stage_queries(xq_pad, self.query_h2d_dtype)
        else:
            offs = [0] * len(buckets)
        pending = []
        carry = None  # single-read chaining across sub-batches
        for (start, padded, real), op in zip(buckets, offs):
            use_recon = br.get("yT") is not None
            # qt=256 measured best for BOTH kernels (qt=512 runs the recon
            # kernel 6x slower — Mosaic pipelining degrades at that tile)
            qt = min(padded, 256)
            if self.rt_econ:
                xq_dev = jax.lax.slice_in_dim(
                    xq_all, op, op + padded, axis=0
                )
            else:
                xqh = x[start : start + real]
                if padded != real:
                    xqh = np.pad(xqh, ((0, padded - real), (0, 0)))
                xq_dev = _stage_queries(xqh, self.query_h2d_dtype)
            use_dyn = bool(nprobe) and padded >= 128
            if use_dyn:
                msteps = self._dyn_bucket_for(xq_dev, br, nprobe, qt)
                frac = (
                    self.soft_engage_frac
                    if not self.strict_probe
                    else self.dyn_engage_frac
                )
                use_dyn = msteps <= int(frac * br["nchunks"])
            if use_dyn and use_recon:
                packed = _fused_search_rerank_recon_dyn(
                    xq_dev,
                    br["centroids_g"],
                    br["cn2g"],
                    br["yT"],
                    br["n2s"],
                    br["lid"],
                    br["slot_map_dev"],
                    refine_xb,
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
                    interpret=self.fused_interpret,
                    **rr_kw,
                )
                carry = packed
            elif use_dyn:
                carry = None  # one-hot paths are not chainable
                packed = _fused_search_rerank_dyn(
                    xq_dev,
                    br["centroids_g"],
                    br["cn2g"],
                    br["cbt"],
                    br["codesT"],
                    br["n2s"],
                    br["lid"],
                    br["slot_map_dev"],
                    refine_xb,
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
                    pack16=(self.pack_d2h == "f16"),
                    interpret=self.fused_interpret,
                    **sq_kw,
                )
            elif use_recon:
                packed = _fused_search_rerank_recon(
                    xq_dev,
                    br["centroids_g"],
                    br["cn2g"],
                    br["yT"],
                    br["n2s"],
                    br["lid"],
                    br["slot_map_dev"],
                    refine_xb,
                    k,
                    kc,
                    qt,
                    self.FUSED_CT,
                    nprobe,
                    qdepth=self.refined_qdepth,
                    fmax=self.fused_fmax,
                    sort_rot=self.fused_sort_rot,
                    cheap_after=self.fused_cheap_after,
                    carry=carry,
                    interpret=self.fused_interpret,
                    **rr_kw,
                )
                carry = packed
            else:
                carry = None  # one-hot path: per-batch reads
                packed = _fused_search_rerank(
                    xq_dev,
                    br["centroids_g"],
                    br["cn2g"],
                    br["cbt"],
                    br["codesT"],
                    br["n2s"],
                    br["lid"],
                    br["slot_map_dev"],
                    refine_xb,
                    k,
                    kc,
                    qt,
                    self.FUSED_CT,
                    nprobe,
                    qdepth=self.refined_qdepth,
                    pack16=(self.pack_d2h == "f16"),
                    interpret=self.fused_interpret,
                    **sq_kw,
                )
            nch = br["nchunks"]
            nscan = msteps if use_dyn else nch
            ivf_fast_scan_stats.nq += real
            # per-QUERY keys: every query in a tile scores every slot the
            # tile streams (tiles = padded // qt, qt queries each)
            ivf_fast_scan_stats.ndis += padded * nscan * self.FUSED_CT
            ivf_fast_scan_stats.chunks_scanned += nscan
            ivf_fast_scan_stats.chunks_skipped += nch - nscan
            pending.append((start, real, padded, packed, use_dyn))
        return {
            "pending": pending, "nq": nq, "k": k, "nprobe": nprobe,
            "br": br,
        }

    def _sbbr_collect(self, st):
        """READ phase of the refined big-batch search. Preferred: the
        dispatch loop CHAINED each sub-batch's packed rows through the next
        program (carry), so the LAST handle holds every row and ONE host
        read (~38 ms tunnel RT each) fetches all of them. Fallbacks:
        rt_econ device concat, batched device_get, or per-batch reads (a
        chained mid-stream packed carries its predecessors — its own rows
        are the tail slice)."""
        if "eager" in st:
            return st["eager"]
        pending, nq, k, nprobe, br = (
            st["pending"], st["nq"], st["k"], st["nprobe"], st["br"],
        )
        D = np.full((nq, k), np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        t_read0 = time.perf_counter()
        total_rows = sum(p[2] for p in pending)
        if len(pending) > 1 and pending[-1][3].shape[0] == total_rows:
            allp = np.asarray(pending[-1][3])
        elif len(pending) > 1 and self.rt_econ:
            allp = np.asarray(
                jnp.concatenate([p[3][-p[2] :] for p in pending], axis=0)
            )
        elif len(pending) > 1:
            # device_get on the list lets the client batch transfers
            allp = np.concatenate(
                [a[-p[2] :] for a, p in zip(
                    jax.device_get([p[3] for p in pending]), pending
                )]
            )
        else:
            allp = np.asarray(pending[0][3])[-pending[0][2] :]
        po = 0
        for start, real, padded, packed, was_dyn in pending:
            d, slots, lossy, nd = _unpack_results(
                allp[po : po + padded], k
            )
            po += padded
            ivf_fast_scan_stats.lossy_rows += int(lossy[:real].sum())
            if was_dyn and nd > 0 and not self.dyn_msteps:
                # post-hoc monitor: a worklist overflow means some probed
                # chunks were skipped this batch — widen the bucket for the
                # next call (recall impact is bounded to this batch)
                self._dyn_bucket[nprobe] = min(
                    br["nchunks"], self._dyn_bucket[nprobe] + 64
                )
            slots = slots[:real, :k]
            D[start : start + real] = d[:real, :k]
            I[start : start + real] = np.where(
                slots >= 0, self._ids_host[np.maximum(slots, 0)], -1
            )
            # NOTE on the eviction floor: a flagged row lost >=1 of its
            # ADC-top-kc candidates, but the EXACT re-rank over the other
            # kc-1 absorbs that (measured: unrepaired flagged rows score
            # HIGHER than rows re-routed through the approximate XLA repair
            # path — 0.998 vs 0.987 recall@10). The refined path therefore
            # keeps the kernel output; the unrefined path, whose candidates
            # ARE the results, still repairs (_search_big_batch).
            del lossy
        ivf_fast_scan_stats.t_scan += time.perf_counter() - t_read0
        return D, I

    def _big_batch_xla(self, x, k, nprobe=0):
        """Exhaustive ADC via one-hot GEMM + approx select (the exact
        fallback used for lossy-row repair and CPU runs). Returns slot ids."""
        from ..base import query_buckets

        nq = len(x)
        br = self._build_brute()
        if br["n2"] is None:
            raise NotImplementedError(
                "the XLA ADC fallback needs input-order norms, which the "
                "windowed (>32M vectors) staging does not build — use the "
                "fused big-batch path"
            )
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
            luts = -2.0 * (xq_dev @ br["cbt"])
            qn2 = np.square(xq).sum(1)
            # all staging stays on device: a host round-trip of the
            # [nq, ngroups*128] bias matrix costs seconds over the tunnel
            cm2 = _masked_coarse_bias(
                xq_dev, br["centroids_g"], br["cn2g"], nprobe
            )
            qt = min(padded, 256)
            v, slots_dev, ev = ivfpq_fused_pallas(
                cm2,
                jnp.asarray(luts, jnp.bfloat16),
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
        max_codes = self.max_codes
        if params is not None and getattr(params, "max_codes", 0):
            max_codes = params.max_codes
        use_big = (
            self.big_batch_threshold
            and len(x) >= self.big_batch_threshold
            and self.by_residual
            and self.metric_type == MetricType.L2
            and (params is None or params.sel is None)
            and not self.polysemous_ht  # ht filter runs in the probe scan
            and not max_codes  # scan budget only exists in the probe scan
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
    def _query_residual_codes(self, xq_dev, probes):
        """PQ codes of the query residual per probed list, for the
        polysemous Hamming filter (IndexIVFPQ.cpp polysemous path)."""
        xq = np.asarray(xq_dev)
        pr = np.asarray(probes)
        nq, nprobe = pr.shape
        cents = self._centroids_host()[np.maximum(pr, 0)]  # [nq, nprobe, d]
        resid = (xq[:, None, :] - cents).reshape(nq * nprobe, self.d)
        qc = self.pq.compute_codes_int(resid).reshape(nq, nprobe, self.pq.M)
        return jnp.asarray(qc.astype(np.int32))

    def _scan(self, xq_dev, probes, coarse_dis, k, dev, sel_mask):
        pq = self.pq
        cb = pq._dev()
        ht = int(self.polysemous_ht)
        qcodes = (
            self._query_residual_codes(xq_dev, probes)
            if ht and self.by_residual
            else None
        )
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
                qcodes=qcodes,
                ht=ht if qcodes is not None else 0,
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
        nq = len(x)
        D = np.full((nq, k), np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        # vectorized refined re-rank (chunked over queries to bound the
        # [chunk*kc, d] reconstruction buffer)
        order_ids = np.argsort(self._ids_host, kind="stable")
        sorted_ids = self._ids_host[order_ids]
        chunk = max(1, (1 << 22) // max(kc * self.d, 1))
        for s in range(0, nq, chunk):
            Icc = Ic[s : s + chunk]
            valid = Icc >= 0
            safe = np.where(valid, Icc, sorted_ids[0])
            slots = order_ids[
                np.clip(np.searchsorted(sorted_ids, safe), 0,
                        len(sorted_ids) - 1)
            ]
            flat = slots.ravel()
            base = self.decode_vectors(
                self._codes_host[flat], self._listnos_host[flat]
            )
            refined = base + self.refine_pq.decode_int(
                self._refine_codes[flat]
            )
            refined = refined.reshape(len(Icc), -1, self.d)
            d2 = ((refined - x[s : s + chunk, None, :]) ** 2).sum(-1)
            d2 = np.where(valid, d2, np.inf).astype(np.float32)
            top = np.argsort(d2, axis=1, kind="stable")[:, :k]
            dd = np.take_along_axis(d2, top, axis=1)
            ii = np.take_along_axis(
                np.where(valid, Icc, -1), top, axis=1
            )
            kk = dd.shape[1]
            D[s : s + chunk, :kk] = dd
            I[s : s + chunk, :kk] = np.where(np.isinf(dd), -1, ii)
        return D, I
