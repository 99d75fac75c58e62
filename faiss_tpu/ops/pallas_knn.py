"""Fused brute-force k-NN Pallas kernel — the TPU WarpSelect/BlockSelect.

The reference's GPU backend fuses tiled GEMM distances with register-resident
k-select (gpu/utils/WarpSelectKernel.cuh: per-thread sorted queues that spill
into a warp-wide queue via odd-even merge networks when full;
gpu/impl/Distance.cu tiling). This kernel is the same structure mapped to
TPU hardware:

  - the database is stored TRANSPOSED ([d, nb]) so each db block feeds the
    MXU directly as the GEMM rhs; Mosaic otherwise inserts a per-step VPU
    transpose that dominates runtime (measured ~170x slowdown).
  - grid (query_tiles, db_tiles); the db axis iterates innermost so VMEM
    scratch state persists per query tile.
  - each step: the MXU computes a [QT, CT] score tile; per 128-lane subtile,
    elements better than the current k-th best bubble branch-free into
    per-lane sorted insertion queues of depth QDEPTH (VPU min/max chains —
    the per-thread queues).
  - queues spill into the running sorted top-K buffer with bitonic networks
    built from lane-rolls (pltpu.roll) on a DETERMINISTIC schedule keyed on
    the scalar grid index (dense early, sparse late). Data-dependent spills
    (WarpSelect's trigger) are deliberately avoided: on this hardware a
    vector-condition branch per subtile costs ~16us of pipeline drain, two
    orders of magnitude more than the insert chain itself.
  - a queue overflow between scheduled spills would lose an element, so the
    kernel tracks the best evicted value per lane branch-free; the host
    re-runs the (rare, typically zero) affected query rows through the exact
    XLA path. The composite is exact.
  - scores never touch HBM: traffic is db + queries + [QT, K] outputs.

Selection key is the metric-monotone part only (L2: ||b||^2 - 2 q.b; the
query norm is added after selection), min-select in all cases (IP scores are
negated). K = 128 lanes; callers with k <= 128 slice the result.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # top-K buffer width == lane count == max supported k
QDEPTH = 3  # per-lane insertion-queue depth (WarpSelect thread-queue T)


def _cmpex_ref(wv, wi, lane, s, same):
    """In-place bitonic compare-exchange at lane distance s.

    ``same``: per lane, True where this lane keeps the pair minimum. Ties
    keep self on both sides (no element duplicated/dropped). Ref write-back
    per stage keeps Mosaic's stack allocation bounded.
    """
    v = wv[:]
    i = wi[:]
    pv_u = pltpu.roll(v, LANES - s, 1)  # partner value from lane + s
    pi_u = pltpu.roll(i, LANES - s, 1)
    pv_d = pltpu.roll(v, s, 1)  # partner value from lane - s
    pi_d = pltpu.roll(i, s, 1)
    is_low = (lane & s) == 0
    pv = jnp.where(is_low, pv_u, pv_d)
    pi = jnp.where(is_low, pi_u, pi_d)
    le = v <= pv
    ge = v >= pv
    keep = jnp.logical_or(
        jnp.logical_and(same, le), jnp.logical_and(jnp.logical_not(same), ge)
    )
    wv[:] = jnp.where(keep, v, pv)
    wi[:] = jnp.where(keep, i, pi)


def _sort_asc_ref(wv, wi, lane):
    """In-place ascending bitonic sort along the 128-lane axis (28 stages)."""
    for size_exp in range(1, 8):
        for s_exp in reversed(range(size_exp)):
            same = ((lane >> s_exp) & 1) == ((lane >> size_exp) & 1)
            _cmpex_ref(wv, wi, lane, 1 << s_exp, same)


def _merge_desc_into_ref(rv_ref, ri_ref, wv, wi, lane):
    """Merge descending (wv, wi) into ascending top-K (rv_ref, ri_ref).

    [rv; wv] is bitonic; elementwise halving keeps the best K, 7 ascending
    stages restore order. Result written to rv_ref/ri_ref.
    """
    rv = rv_ref[:]
    ri = ri_ref[:]
    mv = wv[:]
    mi = wi[:]
    keep_r = rv <= mv
    wv[:] = jnp.where(keep_r, rv, mv)
    wi[:] = jnp.where(keep_r, ri, mi)
    for s_exp in reversed(range(7)):
        same = ((lane >> s_exp) & 1) == 0  # all blocks ascending
        _cmpex_ref(wv, wi, lane, 1 << s_exp, same)
    rv_ref[:] = wv[:]
    ri_ref[:] = wi[:]


def _cascade_desc_into_buffers(rv_ref, ri_ref, wv, wi, lane, nbuf):
    """Merge descending (wv, wi) through ``nbuf`` ascending 128-wide rank
    buffers stored side by side in rv_ref/ri_ref [qt, nbuf*128] — the k>128
    select (the BlockSelect k<=2048 analogue, gpu/utils/BlockSelectKernel.cuh,
    as a chain of bitonic merge/halving networks). Invariant: buffer r holds
    global ranks [r*128, (r+1)*128) ascending; the merge's rejected (larger)
    half cascades into the next buffer.
    """
    for r in range(nbuf):
        sl = slice(r * LANES, (r + 1) * LANES)
        rv = rv_ref[:, sl]
        ri = ri_ref[:, sl]
        mv = wv[:]
        mi = wi[:]
        keep_r = rv <= mv
        # rejected (max) half — becomes the next buffer's input
        wv[:] = jnp.where(keep_r, mv, rv)
        wi[:] = jnp.where(keep_r, mi, ri)
        # kept (min) half, bitonic -> 7 ascending stages
        kv = jnp.where(keep_r, rv, mv)
        ki = jnp.where(keep_r, ri, mi)
        rv_ref[:, sl] = kv
        ri_ref[:, sl] = ki
        for s_exp in reversed(range(7)):
            same = ((lane >> s_exp) & 1) == 0
            _cmpex_slice(rv_ref, ri_ref, sl, lane, 1 << s_exp, same)
        if r + 1 < nbuf:
            # rejected half is bitonic; restore DESCENDING order for the
            # next merge (7 stages, descending comparators)
            for s_exp in reversed(range(7)):
                same = ((lane >> s_exp) & 1) == 1
                _cmpex_ref(wv, wi, lane, 1 << s_exp, same)


def _cmpex_slice(rv_ref, ri_ref, sl, lane, s, same):
    """Compare-exchange on a 128-lane column slice of a wider ref."""
    v = rv_ref[:, sl]
    i = ri_ref[:, sl]
    pv_u = pltpu.roll(v, LANES - s, 1)
    pi_u = pltpu.roll(i, LANES - s, 1)
    pv_d = pltpu.roll(v, s, 1)
    pi_d = pltpu.roll(i, s, 1)
    is_low = (lane & s) == 0
    pv = jnp.where(is_low, pv_u, pv_d)
    pi = jnp.where(is_low, pi_u, pi_d)
    le = v <= pv
    ge = v >= pv
    keep = jnp.logical_or(
        jnp.logical_and(same, le), jnp.logical_and(jnp.logical_not(same), ge)
    )
    rv_ref[:, sl] = jnp.where(keep, v, pv)
    ri_ref[:, sl] = jnp.where(keep, i, pi)


def _make_kernel(qt, ct, d, metric_l2, precision, k_lanes=LANES):
    n_sub = ct // LANES
    nbuf = k_lanes // LANES  # rank buffers (k>128: BlockSelect-style chain)
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else None

    def flush_queues(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane):
        """Spill all lane queues into the sorted top-K buffers (warp merge)."""
        for t in range(QDEPTH):
            wv[:] = -qv_ref[t]  # negate: ascending sort of -v == v descending
            wi[:] = qi_ref[t]
            _sort_asc_ref(wv, wi, lane)
            wv[:] = -wv[:]
            _cascade_desc_into_buffers(rv_ref, ri_ref, wv, wi, lane, nbuf)
        qv_ref[:] = jnp.full((QDEPTH, qt, LANES), jnp.inf, jnp.float32)
        qi_ref[:] = jnp.full((QDEPTH, qt, LANES), -1, jnp.int32)

    def kernel(nb_ref, q_ref, db_ref, out_v_ref, out_i_ref, out_ev_ref,
               rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, ev_ref, s_ref):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (qt, LANES), 1)

        @pl.when(j == 0)
        def _init():
            rv_ref[:] = jnp.full((qt, k_lanes), jnp.inf, jnp.float32)
            ri_ref[:] = jnp.full((qt, k_lanes), -1, jnp.int32)
            qv_ref[:] = jnp.full((QDEPTH, qt, LANES), jnp.inf, jnp.float32)
            qi_ref[:] = jnp.full((QDEPTH, qt, LANES), -1, jnp.int32)
            ev_ref[:] = jnp.full((qt, LANES), jnp.inf, jnp.float32)

        # scheduled spill: dense early (queues churn while theta is loose),
        # geometrically sparser later. Scalar-only condition — cheap branch.
        interval = jnp.clip(j // 4, 1, 32)
        do_flush = jnp.logical_and(j > 0, j % interval == 0)

        @pl.when(do_flush)
        def _scheduled():
            flush_queues(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane)

        q = q_ref[:]  # [qt, d]
        db = db_ref[:]  # [d, ct]  (transposed layout)
        ip = jax.lax.dot_general(
            q,
            db,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [qt, ct]
        if metric_l2:
            bnorm = jnp.sum(db.astype(jnp.float32) * db.astype(jnp.float32), 0)
            s_ref[:] = bnorm[None, :] - 2.0 * ip
        else:
            s_ref[:] = -ip

        nb = nb_ref[0]
        base = j * ct

        # theta only changes at flushes, so hoist it out of the subtile loop
        theta = rv_ref[:, k_lanes - 1 : k_lanes]  # current kth best per query
        for t in range(n_sub):
            col = base + t * LANES + lane  # [qt, LANES]
            sv = s_ref[:, t * LANES : (t + 1) * LANES]
            # only elements better than theta enter the queues
            sv = jnp.where(jnp.logical_and(col < nb, sv < theta), sv, jnp.inf)

            # branch-free bubble insert (sorted queue, worst at QDEPTH-1)
            cv = sv
            ci = col
            for lev in range(QDEPTH):
                lv = qv_ref[lev]
                li = qi_ref[lev]
                lt = cv < lv
                qv_ref[lev] = jnp.where(lt, cv, lv)
                qi_ref[lev] = jnp.where(lt, ci, li)
                cv = jnp.where(lt, lv, cv)
                ci = jnp.where(lt, li, ci)
            # cv is the evicted value (inf if the queue had room): track the
            # best evicted so the host can detect (and redo) a real loss.
            ev_ref[:] = jnp.minimum(ev_ref[:], cv)

        @pl.when(j == nj - 1)
        def _finish():
            flush_queues(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane)
            out = rv_ref[:]
            if metric_l2:
                qnorm = jnp.sum(q.astype(jnp.float32) * q.astype(jnp.float32), -1)
                out = jnp.maximum(out + qnorm[:, None], 0.0)
                out = jnp.where(ri_ref[:] >= 0, out, jnp.inf)
                out_ev_ref[:] = ev_ref[:] + qnorm[:, None]
            else:
                out = -out
                out = jnp.where(ri_ref[:] >= 0, out, -jnp.inf)
                out_ev_ref[:] = -ev_ref[:]
            out_v_ref[:] = out
            out_i_ref[:] = ri_ref[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric_l2", "precision", "qt", "ct", "k_lanes", "interpret"
    ),
)
def knn_fused_pallas(
    x: jax.Array,  # [nq, d] f32, nq % qt == 0
    yT: jax.Array,  # [d, nb_padded] f32 TRANSPOSED db, padded to ct multiple
    nb: jax.Array,  # scalar int32: true db size
    metric_l2: bool = True,
    precision: str = "highest",
    qt: int = 512,
    ct: int = 1024,
    k_lanes: int = LANES,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k_lanes nearest neighbors, best-first, plus eviction floor.

    ``k_lanes`` must be a multiple of 128 (up to 2048 — the BlockSelect
    range, gpu/utils/BlockSelectKernel.cuh): ranks live in k_lanes/128
    chained sorted buffers. Returns (values [nq, k_lanes], indices int32,
    evicted [nq, 128]). A query row's result is guaranteed exact iff
    ``evicted.min(-1)`` does not beat its k_lanes-th value (callers redo the
    rare offending rows). Missing entries (nb < k_lanes) have index -1.
    """
    nq, d = x.shape
    nbp = yT.shape[1]
    assert nq % qt == 0 and nbp % ct == 0
    assert k_lanes % LANES == 0 and 0 < k_lanes <= 2048
    grid = (nq // qt, nbp // ct)
    kernel = _make_kernel(qt, ct, d, metric_l2, precision, k_lanes)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nb scalar
            pl.BlockSpec((qt, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ct), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qt, k_lanes), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, k_lanes), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, k_lanes), jnp.float32),
            jax.ShapeDtypeStruct((nq, k_lanes), jnp.int32),
            jax.ShapeDtypeStruct((nq, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qt, k_lanes), jnp.float32),  # top-K values
            pltpu.VMEM((qt, k_lanes), jnp.int32),  # top-K ids
            pltpu.VMEM((QDEPTH, qt, LANES), jnp.float32),  # lane queues
            pltpu.VMEM((QDEPTH, qt, LANES), jnp.int32),
            pltpu.VMEM((qt, LANES), jnp.float32),  # sort workspace
            pltpu.VMEM((qt, LANES), jnp.int32),
            pltpu.VMEM((qt, LANES), jnp.float32),  # eviction floor
            pltpu.VMEM((qt, ct), jnp.float32),  # score tile staging
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    # named_scope -> HLO metadata -> visible as a row in jax.profiler traces
    with jax.named_scope(f"faiss_tpu.knn_fused[qt={qt},ct={ct},d={d},k={k_lanes}]"):
        out_v, out_i, out_ev = call(jnp.asarray(nb, jnp.int32).reshape(1), x, yT)
    return out_v, out_i, out_ev


# ---------------------------------------------------------------------------
# Fused IVF-PQ ADC + k-select (the FastScan big-batch kernel)
# ---------------------------------------------------------------------------


def _make_adc_kernel(qt, ct, M, ksub, qdepth=QDEPTH):
    """ADC score producer + the same queue/flush select as the flat kernel.

    Chunks hold ``ct`` slots of a 128-list GROUP (lists packed back to back,
    group padded to a ct multiple — the analogue of the reference's
    block-packed FastScan layout, impl/fast_scan/fast_scan.h:47). Scores:

        key[q, c] = n2[c] + cm2g[q, group(j)*128 + lid[c]] + (-2 q.pq(code[c]))

    The PQ term is an MXU contraction of the flattened LUTs with a one-hot
    expansion of the codes built in-kernel (the register-LUT shuffle of
    impl/fast_scan/kernels_simd256.h as a matmul); the coarse term is a
    second MXU contraction of the group's bias block with a one-hot of the
    per-slot local list id — exact, since one-hot selection in bf16x3 passes
    reproduces the f32 bias bit-for-bit.
    """
    n_sub = ct // LANES
    K = M * ksub

    def kernel(luts_ref, bias_ref, codes_ref, n2_ref, lid_ref,
               out_v_ref, out_i_ref, out_ev_ref,
               rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, ev_ref):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (qt, LANES), 1)

        @pl.when(j == 0)
        def _init():
            rv_ref[:] = jnp.full((qt, LANES), jnp.inf, jnp.float32)
            ri_ref[:] = jnp.full((qt, LANES), -1, jnp.int32)
            qv_ref[:] = jnp.full((qdepth, qt, LANES), jnp.inf, jnp.float32)
            qi_ref[:] = jnp.full((qdepth, qt, LANES), -1, jnp.int32)
            ev_ref[:] = jnp.full((qt, LANES), jnp.inf, jnp.float32)

        interval = jnp.clip(j // 4, 1, 16)
        do_flush = jnp.logical_and(j > 0, j % interval == 0)

        @pl.when(do_flush)
        def _scheduled():
            flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane)

        # one-hot expansion of the chunk's codes: [K, ct] bf16
        codes = codes_ref[:].astype(jnp.int32)  # [M, ct]
        rep = jnp.repeat(codes, ksub, axis=0)  # [K, ct]; row m*ksub+r <- m
        rbit = jax.lax.broadcasted_iota(jnp.int32, (K, ct), 0) % ksub
        oh = jnp.where(rep == rbit, 1.0, 0.0).astype(jnp.bfloat16)
        ip = jax.lax.dot_general(
            luts_ref[:], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [qt, ct] = -2 q.pq(code)
        # coarse bias per slot: one-hot of the local list id against the
        # group's 128 bias columns ([qt, 128] @ [128, ct] on the MXU).
        # The MXU pass is bf16: split the f32 bias into hi+lo bf16 parts so
        # the one-hot selection reproduces it to ~16 mantissa bits — a plain
        # bf16 pass loses 0.4% of a value that dominates the L2 key and
        # visibly degrades the candidate ranking.
        lid = lid_ref[:].astype(jnp.int32)  # [1, ct]
        lrow = jax.lax.broadcasted_iota(jnp.int32, (LANES, ct), 0)
        listoh = jnp.where(lrow == lid, 1.0, 0.0).astype(jnp.bfloat16)
        b32 = bias_ref[:]
        b_hi = b32.astype(jnp.bfloat16)
        b_lo = (b32 - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        bias = jax.lax.dot_general(
            b_hi, listoh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            b_lo, listoh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [qt, ct]: -2 q.c_list(slot), f32-faithful
        skey = ip + n2_ref[:] + bias  # [qt, ct] (n2 broadcasts [1, ct])

        base = j * ct
        theta = rv_ref[:, LANES - 1 : LANES]
        # pair-reduce subtile t with t + n_sub/2 before the insert chain:
        # the chain is the VPU bound. Partners sit ct/2 slots apart — FARTHER
        # than a typical inverted list (lists are contiguous runs in the
        # group-packed layout), so two of a query's top-128 colliding on the
        # same (lane, pair) slot needs either two independent lists (~1e-3)
        # or a single list longer than ct/2 — tracked through the eviction
        # floor. (A deeper 4->1 reduction was measured STRICTLY worse: 3x
        # the pair-drop rate and no net VPU win.)
        assert n_sub % 2 == 0
        half = n_sub // 2
        for t in range(half):
            c0 = base + t * LANES + lane
            c1 = c0 + half * LANES
            s0 = skey[:, t * LANES : (t + 1) * LANES]
            s1 = skey[:, (t + half) * LANES : (t + half + 1) * LANES]
            sel = s0 <= s1
            sv = jnp.where(sel, s0, s1)
            col = jnp.where(sel, c0, c1)
            dropped = jnp.where(sel, s1, s0)
            ev_ref[:] = jnp.minimum(
                ev_ref[:], jnp.where(dropped < theta, dropped, jnp.inf)
            )
            sv = jnp.where(sv < theta, sv, jnp.inf)
            cv = sv
            ci = col
            for lev in range(qdepth):
                lv = qv_ref[lev]
                li = qi_ref[lev]
                lt = cv < lv
                qv_ref[lev] = jnp.where(lt, cv, lv)
                qi_ref[lev] = jnp.where(lt, ci, li)
                cv = jnp.where(lt, lv, cv)
                ci = jnp.where(lt, li, ci)
            ev_ref[:] = jnp.minimum(ev_ref[:], cv)

        @pl.when(j == nj - 1)
        def _finish():
            flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane)
            out_v_ref[:] = rv_ref[:]
            out_i_ref[:] = ri_ref[:]
            out_ev_ref[:] = ev_ref[:]

    def flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane):
        for t in range(qdepth):
            wv[:] = -qv_ref[t]
            wi[:] = qi_ref[t]
            _sort_asc_ref(wv, wi, lane)
            wv[:] = -wv[:]
            _merge_desc_into_ref(rv_ref, ri_ref, wv, wi, lane)
        qv_ref[:] = jnp.full(qv_ref.shape, jnp.inf, jnp.float32)
        qi_ref[:] = jnp.full(qi_ref.shape, -1, jnp.int32)

    return kernel


def _make_adc_kernel_dyn(qt, ct, M, ksub):
    """Dynamic-chunk ADC kernel: same math as _make_adc_kernel, but grid
    step j visits chunk ``cmap[i, j]`` instead of chunk j — the TPU analogue
    of IndexIVFFastScan's implem_12 (sort (query, probe) pairs by list and
    scan each list once, IndexIVFFastScan.cpp:1166). Queries are pre-sorted
    by home group so each tile's probed lists concentrate in few chunks;
    the per-tile chunk worklist (padded with a sentinel all-inf chunk) is a
    scalar-prefetch input that drives the DMA index maps."""
    n_sub = ct // LANES
    K = M * ksub

    def kernel(cmap_ref, cgroup_ref, luts_ref, bias_ref, codes_ref, n2_ref,
               lid_ref, out_v_ref, out_i_ref, out_ev_ref,
               rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, ev_ref):
        del cgroup_ref  # used by the index maps only
        i = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (qt, LANES), 1)

        @pl.when(j == 0)
        def _init():
            rv_ref[:] = jnp.full((qt, LANES), jnp.inf, jnp.float32)
            ri_ref[:] = jnp.full((qt, LANES), -1, jnp.int32)
            qv_ref[:] = jnp.full((QDEPTH, qt, LANES), jnp.inf, jnp.float32)
            qi_ref[:] = jnp.full((QDEPTH, qt, LANES), -1, jnp.int32)
            ev_ref[:] = jnp.full((qt, LANES), jnp.inf, jnp.float32)

        interval = jnp.clip(j // 4, 1, 16)
        do_flush = jnp.logical_and(j > 0, j % interval == 0)

        @pl.when(do_flush)
        def _scheduled():
            flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane)

        codes = codes_ref[:].astype(jnp.int32)  # [M, ct]
        rep = jnp.repeat(codes, ksub, axis=0)  # [K, ct]
        rbit = jax.lax.broadcasted_iota(jnp.int32, (K, ct), 0) % ksub
        oh = jnp.where(rep == rbit, 1.0, 0.0).astype(jnp.bfloat16)
        ip = jax.lax.dot_general(
            luts_ref[:], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        lid = lid_ref[:].astype(jnp.int32)
        lrow = jax.lax.broadcasted_iota(jnp.int32, (LANES, ct), 0)
        listoh = jnp.where(lrow == lid, 1.0, 0.0).astype(jnp.bfloat16)
        b32 = bias_ref[:]
        b_hi = b32.astype(jnp.bfloat16)
        b_lo = (b32 - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        bias = jax.lax.dot_general(
            b_hi, listoh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            b_lo, listoh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        skey = ip + n2_ref[:] + bias

        # slot ids are positions in the packed layout: chunk * ct + offset
        base = cmap_ref[i, j] * ct
        theta = rv_ref[:, LANES - 1 : LANES]
        assert n_sub % 2 == 0
        half = n_sub // 2
        for t in range(half):
            c0 = base + t * LANES + lane
            c1 = c0 + half * LANES
            s0 = skey[:, t * LANES : (t + 1) * LANES]
            s1 = skey[:, (t + half) * LANES : (t + half + 1) * LANES]
            sel = s0 <= s1
            sv = jnp.where(sel, s0, s1)
            col = jnp.where(sel, c0, c1)
            dropped = jnp.where(sel, s1, s0)
            ev_ref[:] = jnp.minimum(
                ev_ref[:], jnp.where(dropped < theta, dropped, jnp.inf)
            )
            sv = jnp.where(sv < theta, sv, jnp.inf)
            cv = sv
            ci = col
            for lev in range(QDEPTH):
                lv = qv_ref[lev]
                li = qi_ref[lev]
                lt = cv < lv
                qv_ref[lev] = jnp.where(lt, cv, lv)
                qi_ref[lev] = jnp.where(lt, ci, li)
                cv = jnp.where(lt, lv, cv)
                ci = jnp.where(lt, li, ci)
            ev_ref[:] = jnp.minimum(ev_ref[:], cv)

        @pl.when(j == nj - 1)
        def _finish():
            flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane)
            out_v_ref[:] = rv_ref[:]
            out_i_ref[:] = ri_ref[:]
            out_ev_ref[:] = ev_ref[:]

    def flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane):
        for t in range(QDEPTH):
            wv[:] = -qv_ref[t]
            wi[:] = qi_ref[t]
            _sort_asc_ref(wv, wi, lane)
            wv[:] = -wv[:]
            _merge_desc_into_ref(rv_ref, ri_ref, wv, wi, lane)
        qv_ref[:] = jnp.full(qv_ref.shape, jnp.inf, jnp.float32)
        qi_ref[:] = jnp.full(qi_ref.shape, -1, jnp.int32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("qt", "ct", "interpret")
)
def ivfpq_fused_dyn_pallas(
    biasg: jax.Array,  # [nq, ngroups*128] f32 (pre-sorted queries, masked)
    luts: jax.Array,  # [nq, M*ksub] bf16 flattened ADC tables
    codesT: jax.Array,  # [M, (nchunks+1)*ct] group-packed codes + PAD chunk
    n2: jax.Array,  # [1, (nchunks+1)*ct] f32 (+inf on pads & PAD chunk)
    lid: jax.Array,  # [1, (nchunks+1)*ct] int32 local list ids
    cmap: jax.Array,  # [nq//qt, msteps] int32 chunk worklist per query tile
    cgroup: jax.Array,  # [nchunks+1] int32 group of each chunk
    qt: int = 256,
    ct: int = 1024,
    interpret: bool = False,
):
    """nprobe-sparse fused IVF-PQ ADC + top-128 select.

    Identical math/contract to ivfpq_fused_pallas, but each query tile only
    visits its cmap worklist of chunks (unioned probed chunks; sentinel
    entries point at the trailing all-+inf PAD chunk). At nprobe << nlist
    with proximity-packed groups this skips most of the grid — the scan cost
    scales with probed data like the reference's list-major batch implems
    (IndexIVFFastScan.h:273) instead of with ntotal."""
    nq = luts.shape[0]
    M = codesT.shape[0]
    ksub = luts.shape[1] // M
    msteps = cmap.shape[1]
    assert cmap.shape[0] == nq // qt
    grid = (nq // qt, msteps)
    kernel = _make_adc_kernel_dyn(qt, ct, M, ksub)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, M * ksub), lambda i, j, cm, cg: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 128), lambda i, j, cm, cg: (i, cg[cm[i, j]]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, ct), lambda i, j, cm, cg: (0, cm[i, j]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda i, j, cm, cg: (0, cm[i, j]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda i, j, cm, cg: (0, cm[i, j]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qt, LANES), lambda i, j, cm, cg: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, LANES), lambda i, j, cm, cg: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, LANES), lambda i, j, cm, cg: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((qt, LANES), jnp.float32),
            pltpu.VMEM((qt, LANES), jnp.int32),
            pltpu.VMEM((QDEPTH, qt, LANES), jnp.float32),
            pltpu.VMEM((QDEPTH, qt, LANES), jnp.int32),
            pltpu.VMEM((qt, LANES), jnp.float32),
            pltpu.VMEM((qt, LANES), jnp.int32),
            pltpu.VMEM((qt, LANES), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nq, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nq, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nq, LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cmap, cgroup, luts, biasg, codesT, n2, lid)


def _make_adc_kernel_v3(qt, ct, K, int8, qdepth):
    """v3 ADC kernel: the one-hot expansion is PRECOMPUTED in HBM.

    v2 rebuilds the [K, ct] one-hot on the VPU every grid step (measured at
    roughly a third of the step time at qt=256/ct=1024). v3 streams a
    precomputed [K+128, ct] one-hot block per chunk instead — rows 0..K-1
    are the PQ code one-hot, rows K..K+127 the local-list one-hot (the
    coarse-bias selector). DMA cost is ~1.3 MB/step bf16 (0.65 int8),
    overlapped by the Mosaic pipeline; the VPU build disappears.

    ``int8`` mode additionally runs the PQ term as an int8 MXU contraction
    against uint8-quantized LUTs (reference utils/quantize_lut.h semantics:
    per-query scale ``a``, per-(q,m) bias folded into a per-query constant
    ``c``; dequant is skey = a*acc + c + ...) — 2x MXU rate and half the
    one-hot DMA.
    """
    n_sub = ct // LANES

    def kernel(luts_ref, meta_ref, bias_ref, oh_ref, n2_ref,
               out_v_ref, out_i_ref, out_ev_ref,
               rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, ev_ref):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (qt, LANES), 1)

        @pl.when(j == 0)
        def _init():
            rv_ref[:] = jnp.full((qt, LANES), jnp.inf, jnp.float32)
            ri_ref[:] = jnp.full((qt, LANES), -1, jnp.int32)
            qv_ref[:] = jnp.full((qdepth, qt, LANES), jnp.inf, jnp.float32)
            qi_ref[:] = jnp.full((qdepth, qt, LANES), -1, jnp.int32)
            ev_ref[:] = jnp.full((qt, LANES), jnp.inf, jnp.float32)

        interval = jnp.clip(j // 4, 1, 16)
        do_flush = jnp.logical_and(j > 0, j % interval == 0)

        @pl.when(do_flush)
        def _scheduled():
            flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane)

        oh_pq = oh_ref[0:K, :]  # [K, ct]
        oh_list = oh_ref[K : K + LANES, :]  # [128, ct]
        if int8:
            acc = jax.lax.dot_general(
                luts_ref[:], oh_pq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [qt, ct] int32: sum of quantized LUT entries
            a = meta_ref[:, 0:LANES]  # [qt, 128] per-query scale (bcast)
            c = meta_ref[:, LANES : 2 * LANES]  # per-query dequant constant
            ipf = None
        else:
            ipf = jax.lax.dot_general(
                luts_ref[:], oh_pq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [qt, ct] f32: -2 q.pq(code)
            oh_lb = oh_list
        if int8:
            oh_lb = oh_list.astype(jnp.bfloat16)
        b32 = bias_ref[:]
        b_hi = b32.astype(jnp.bfloat16)
        b_lo = (b32 - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        bias = jax.lax.dot_general(
            b_hi, oh_lb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            b_lo, oh_lb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [qt, ct] exact -2 q.c_list(slot)
        rest = bias + n2_ref[:]  # [qt, ct]

        base = j * ct
        theta = rv_ref[:, LANES - 1 : LANES]
        assert n_sub % 2 == 0
        half = n_sub // 2
        for t in range(half):
            c0 = base + t * LANES + lane
            c1 = c0 + half * LANES
            if int8:
                s0 = (
                    a * acc[:, t * LANES : (t + 1) * LANES].astype(jnp.float32)
                    + c + rest[:, t * LANES : (t + 1) * LANES]
                )
                s1 = (
                    a * acc[:, (t + half) * LANES : (t + half + 1) * LANES].astype(jnp.float32)
                    + c + rest[:, (t + half) * LANES : (t + half + 1) * LANES]
                )
            else:
                skey = ipf + rest
                s0 = skey[:, t * LANES : (t + 1) * LANES]
                s1 = skey[:, (t + half) * LANES : (t + half + 1) * LANES]
            sel = s0 <= s1
            sv = jnp.where(sel, s0, s1)
            col = jnp.where(sel, c0, c1)
            dropped = jnp.where(sel, s1, s0)
            ev_ref[:] = jnp.minimum(
                ev_ref[:], jnp.where(dropped < theta, dropped, jnp.inf)
            )
            sv = jnp.where(sv < theta, sv, jnp.inf)
            cv = sv
            ci = col
            for lev in range(qdepth):
                lv = qv_ref[lev]
                li = qi_ref[lev]
                lt = cv < lv
                qv_ref[lev] = jnp.where(lt, cv, lv)
                qi_ref[lev] = jnp.where(lt, ci, li)
                cv = jnp.where(lt, lv, cv)
                ci = jnp.where(lt, li, ci)
            ev_ref[:] = jnp.minimum(ev_ref[:], cv)

        @pl.when(j == nj - 1)
        def _finish():
            flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane)
            out_v_ref[:] = rv_ref[:]
            out_i_ref[:] = ri_ref[:]
            out_ev_ref[:] = ev_ref[:]

    def flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane):
        for t in range(qdepth):
            wv[:] = -qv_ref[t]
            wi[:] = qi_ref[t]
            _sort_asc_ref(wv, wi, lane)
            wv[:] = -wv[:]
            _merge_desc_into_ref(rv_ref, ri_ref, wv, wi, lane)
        qv_ref[:] = jnp.full(qv_ref.shape, jnp.inf, jnp.float32)
        qi_ref[:] = jnp.full(qi_ref.shape, -1, jnp.int32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("qt", "ct", "qdepth", "interpret")
)
def ivfpq_fused_pallas_v3(
    biasg: jax.Array,  # [nq, ngroups*128] f32: -2 q.c per GROUPED list column
    luts: jax.Array,  # [nq, K] bf16 exact LUTs, or int8 quantized (see meta)
    meta: jax.Array,  # [nq, 256] f32: cols 0:128 scale a, 128:256 constant c
    ohT: jax.Array,  # [K+128, S] one-hot: PQ rows then local-list rows
    n2: jax.Array,  # [1, S] f32 ||y||^2 per slot (+inf on pads)
    qt: int = 256,
    ct: int = 1024,
    qdepth: int = QDEPTH,
    interpret: bool = False,
):
    """Fused IVF-PQ ADC + top-128 select over a PRECOMPUTED one-hot layout.

    Same contract as ivfpq_fused_pallas (group-packed lists, returns keys
    missing ||q||^2 + slots + eviction floor); the one-hot expansion of the
    codes is staged once in HBM (`expand_onehot`) instead of rebuilt on the
    VPU each step. ``luts.dtype == int8`` selects the uint8-quantized-LUT
    mode (reference utils/quantize_lut.h): skey = meta_a*acc + meta_c + ...
    """
    nq = luts.shape[0]
    K = luts.shape[1]
    S = ohT.shape[1]
    assert ohT.shape[0] == K + LANES
    nchunks = S // ct
    assert biasg.shape[1] % 128 == 0
    ngroups = biasg.shape[1] // 128
    assert nchunks % ngroups == 0, (nchunks, ngroups)
    cpg = nchunks // ngroups
    int8 = luts.dtype == jnp.int8
    grid = (nq // qt, nchunks)
    kernel = _make_adc_kernel_v3(qt, ct, K, int8, qdepth)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 128), lambda i, j: (i, j // cpg),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K + LANES, ct), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qt, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nq, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nq, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qt, LANES), jnp.float32),
            pltpu.VMEM((qt, LANES), jnp.int32),
            pltpu.VMEM((qdepth, qt, LANES), jnp.float32),
            pltpu.VMEM((qdepth, qt, LANES), jnp.int32),
            pltpu.VMEM((qt, LANES), jnp.float32),
            pltpu.VMEM((qt, LANES), jnp.int32),
            pltpu.VMEM((qt, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(luts, meta, biasg, ohT, n2)


def _make_recon_kernel(qt, ct, d, masked, qdepth, db_hilo=False,
                       fmax=16, rot=0, cheap_after=0, dbg="full"):
    """Reconstruction-GEMM score producer + the shared queue/flush select.

    Scores ADC keys as a DIRECT MXU contraction against the decoded
    reconstructions y = c_list + pq_decode(code) stored bf16 [d, S]:

        key[q, c] = n2[c] - 2 q.y[c]   (+1e9 on unprobed lists if masked)

    Mathematically the same ranking as the one-hot ADC kernel (the ADC
    score IS ||q - recon||^2), but d MACs/slot instead of M*ksub + 128:
    at d=128, M=32, ksub=16 that is 2.5x less MXU work even with the hi/lo
    query split, and the per-step VPU one-hot build disappears entirely.
    The trade is HBM capacity: 2*d bytes/slot instead of M/2. This is the
    TPU answer to FastScan's register-LUT machinery when HBM has room —
    dense GEMM is what the MXU is for (and it is also exactly the fused
    IVF-Flat scan when y holds the raw vectors).

    The query arrives f32 and is split hi+lo bf16 in-kernel, so q is
    represented to ~16 mantissa bits; the only approximation left is y's
    own bf16 storage (immaterial next to PQ error, and absorbed by the
    exact re-rank). Masked mode adds a {0, 1e9} per-(query, list) penalty
    via the local-list one-hot (search_preassigned semantics).

    ``db_hilo``: the store holds TWO stacked bf16 planes (rows 0..d-1 the
    hi parts, d..2d-1 the lo residuals), and the contraction runs three
    passes (qh.yh + qh.yl + ql.yh) — f32-faithful to ~2^-17 relative.
    This is the exact-search configuration (IndexFlat screen): the tight
    error bound is what makes the per-row exactness certificate pass.
    """
    n_sub = ct // LANES

    def kernel(*refs):
        ylo_ref = None
        if masked and db_hilo:
            (q_ref, bias_ref, yT_ref, ylo_ref, n2_ref, lid_ref,
             out_v_ref, out_i_ref, out_ev_ref,
             rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, ev_ref) = refs
        elif masked:
            (q_ref, bias_ref, yT_ref, n2_ref, lid_ref,
             out_v_ref, out_i_ref, out_ev_ref,
             rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, ev_ref) = refs
        elif db_hilo:
            (q_ref, yT_ref, ylo_ref, n2_ref,
             out_v_ref, out_i_ref, out_ev_ref,
             rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, ev_ref) = refs
        else:
            (q_ref, yT_ref, n2_ref,
             out_v_ref, out_i_ref, out_ev_ref,
             rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, ev_ref) = refs
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (qt, LANES), 1)

        @pl.when(j == 0)
        def _init():
            rv_ref[:] = jnp.full((qt, LANES), jnp.inf, jnp.float32)
            ri_ref[:] = jnp.full((qt, LANES), -1, jnp.int32)
            qv_ref[:] = jnp.full((qdepth, qt, LANES), jnp.inf, jnp.float32)
            qi_ref[:] = jnp.full((qdepth, qt, LANES), -1, jnp.int32)
            ev_ref[:] = jnp.full((qt, LANES), jnp.inf, jnp.float32)

        interval = jnp.clip(j // 4, 1, fmax)
        do_flush = jnp.logical_and(j > 0, j % interval == 0)

        @pl.when(do_flush)
        def _scheduled():
            flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane)

        q = q_ref[:]  # [qt, d] f32
        q_hi = q.astype(jnp.bfloat16)
        q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        if db_hilo:
            y_hi = yT_ref[:]  # [d, ct] bf16 hi plane
            y_lo = ylo_ref[:]  # bf16 lo residual plane (separate operand)
            ip = (
                jax.lax.dot_general(
                    q_hi, y_hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + jax.lax.dot_general(
                    q_hi, y_lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + jax.lax.dot_general(
                    q_lo, y_hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # q.y to ~2^-17 relative (ql.yl term is below that)
        else:
            y = yT_ref[:]  # [d, ct] bf16 (transposed decoded store)
            ip = jax.lax.dot_general(
                q_hi, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                q_lo, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [qt, ct] = q.y to ~16 query mantissa bits
        skey = n2_ref[:] - 2.0 * ip
        if masked:
            lid = lid_ref[:].astype(jnp.int32)  # [1, ct]
            lrow = jax.lax.broadcasted_iota(jnp.int32, (LANES, ct), 0)
            listoh = jnp.where(lrow == lid, 1.0, 0.0).astype(jnp.bfloat16)
            penalty = jax.lax.dot_general(
                bias_ref[:].astype(jnp.bfloat16), listoh,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [qt, ct]: 0 on probed lists, ~1e9 otherwise
            skey = skey + penalty

        if rot:
            i = pl.program_id(0)
            jc = jax.lax.rem(j + i * rot, nj)
        else:
            jc = j
        base = jc * ct
        theta = rv_ref[:, LANES - 1 : LANES]
        assert n_sub % 2 == 0
        half = n_sub // 2

        def _careful_select():
            if dbg == "seqq":
                # debug: sequential strips, per-strip theta-filtered queue
                # insert, no pair reduce, no ev tracking
                for t in range(n_sub):
                    sl = skey[:, t * LANES : (t + 1) * LANES]
                    cv = jnp.where(sl < theta, sl, jnp.inf)
                    ci = base + t * LANES + lane
                    for lev in range(qdepth):
                        lv = qv_ref[lev]
                        li = qi_ref[lev]
                        lt = cv < lv
                        qv_ref[lev] = jnp.where(lt, cv, lv)
                        qi_ref[lev] = jnp.where(lt, ci, li)
                        cv = jnp.where(lt, lv, cv)
                        ci = jnp.where(lt, li, ci)
                    ev_ref[:] = jnp.minimum(ev_ref[:], cv)
                return
            if dbg == "pair":
                # debug: identical slicing pattern, min-only ops, no
                # scratch writes inside the loop (isolates skey
                # materialization cost from select state updates)
                mm = None
                for t in range(half):
                    s0 = skey[:, t * LANES : (t + 1) * LANES]
                    s1 = skey[
                        :, (t + half) * LANES : (t + half + 1) * LANES
                    ]
                    sv = jnp.minimum(s0, s1)
                    mm = sv if mm is None else jnp.minimum(mm, sv)
                ev_ref[:] = jnp.minimum(ev_ref[:], mm)
                return
            for t in range(half):
                c0 = base + t * LANES + lane
                c1 = c0 + half * LANES
                s0 = skey[:, t * LANES : (t + 1) * LANES]
                s1 = skey[:, (t + half) * LANES : (t + half + 1) * LANES]
                sel = s0 <= s1
                sv = jnp.where(sel, s0, s1)
                col = jnp.where(sel, c0, c1)
                if dbg == "noq":  # debug: pair-reduce + theta only
                    ev_ref[:] = jnp.minimum(
                        ev_ref[:], jnp.where(sv < theta, sv, jnp.inf)
                    )
                    continue
                if dbg != "noev":
                    dropped = jnp.where(sel, s1, s0)
                    ev_ref[:] = jnp.minimum(
                        ev_ref[:],
                        jnp.where(dropped < theta, dropped, jnp.inf),
                    )
                sv = jnp.where(sv < theta, sv, jnp.inf)
                cv = sv
                ci = col
                for lev in range(qdepth):
                    lv = qv_ref[lev]
                    li = qi_ref[lev]
                    lt = cv < lv
                    qv_ref[lev] = jnp.where(lt, cv, lv)
                    qi_ref[lev] = jnp.where(lt, ci, li)
                    cv = jnp.where(lt, lv, cv)
                    ci = jnp.where(lt, li, ci)
                if dbg != "noev":
                    ev_ref[:] = jnp.minimum(ev_ref[:], cv)

        def _cheap_select():
            # tail-phase select (valid under sort_rot: after the home
            # region the threshold is tight and candidates that beat it
            # are rare). Linear min2 fold across the ct/128 subtiles:
            # keeps the per-lane best (with column) + the exact runner-up
            # value, so the eviction-floor contract stays truthful (the
            # best candidate this step drops IS m2), at ~4 VPU ops per
            # subtile instead of the careful path's ~17.
            m1 = skey[:, :LANES]
            c1 = base + lane
            m2 = jnp.full((qt, LANES), jnp.inf, jnp.float32)
            for t in range(1, n_sub):
                sl = skey[:, t * LANES : (t + 1) * LANES]
                cl = base + t * LANES + lane
                lt1 = sl < m1
                m2 = jnp.where(lt1, m1, jnp.minimum(m2, sl))
                m1 = jnp.minimum(m1, sl)
                c1 = jnp.where(lt1, cl, c1)
            ev_ref[:] = jnp.minimum(
                ev_ref[:], jnp.where(m2 < theta, m2, jnp.inf)
            )
            sv = jnp.where(m1 < theta, m1, jnp.inf)
            cv = sv
            ci = c1
            for lev in range(qdepth):
                lv = qv_ref[lev]
                li = qi_ref[lev]
                lt = cv < lv
                qv_ref[lev] = jnp.where(lt, cv, lv)
                qi_ref[lev] = jnp.where(lt, ci, li)
                cv = jnp.where(lt, lv, cv)
                ci = jnp.where(lt, li, ci)
            ev_ref[:] = jnp.minimum(ev_ref[:], cv)

        if cheap_after:
            pl.when(j < cheap_after)(_careful_select)
            pl.when(j >= cheap_after)(_cheap_select)
        else:
            _careful_select()

        @pl.when(j == nj - 1)
        def _finish():
            flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane)
            out_v_ref[:] = rv_ref[:]
            out_i_ref[:] = ri_ref[:]
            out_ev_ref[:] = ev_ref[:]

    def flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane):
        for t in range(qdepth):
            wv[:] = -qv_ref[t]
            wi[:] = qi_ref[t]
            _sort_asc_ref(wv, wi, lane)
            wv[:] = -wv[:]
            _merge_desc_into_ref(rv_ref, ri_ref, wv, wi, lane)
        qv_ref[:] = jnp.full(qv_ref.shape, jnp.inf, jnp.float32)
        qi_ref[:] = jnp.full(qi_ref.shape, -1, jnp.int32)

    return kernel


def _make_recon_kernel_dyn(qt, ct, d, qdepth, penalized=True,
                           db_hilo=False):
    """Dynamic-chunk recon kernel: grid step j visits chunk ``cmap[i, j]``
    (the per-tile probed-chunk worklist — implem_12 semantics,
    IndexIVFFastScan.cpp:1166) with the recon-GEMM score producer and,
    when ``penalized``, the {0, 1e9} probe-penalty mask of the masked
    recon kernel. ``penalized=False`` is the SOFT-probe serving mode:
    every slot in a worklist chunk competes on its true key — candidates
    from unprobed lists in shared chunks only improve recall, and the
    penalty machinery (a [qt,128]x[128,ct] one-hot GEMM + wide iota
    compare per step, measured ~+1.3 us/step) disappears. Scan cost
    scales with the probed-chunk union instead of ntotal.

    ``db_hilo``: hi+lo bf16 store planes, 3-pass contraction — the
    f32-faithful scoring of _make_recon_kernel's db_hilo mode, for the
    exact-contract IVF-Flat path on distance-concentrated data (single
    bf16-plane selection flags ~90% of rows into the exact replay on
    clustered Deep10M; f32-faithful keys make flags rare)."""
    n_sub = ct // LANES

    def kernel(*refs):
        ylo_ref = None
        if penalized and db_hilo:
            (cmap_ref, cgroup_ref, q_ref, bias_ref, yT_ref, ylo_ref,
             n2_ref, lid_ref, out_v_ref, out_i_ref, out_ev_ref,
             rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, ev_ref) = refs
        elif penalized:
            (cmap_ref, cgroup_ref, q_ref, bias_ref, yT_ref, n2_ref,
             lid_ref, out_v_ref, out_i_ref, out_ev_ref,
             rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, ev_ref) = refs
        elif db_hilo:
            (cmap_ref, cgroup_ref, q_ref, yT_ref, ylo_ref, n2_ref,
             out_v_ref, out_i_ref, out_ev_ref,
             rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, ev_ref) = refs
        else:
            (cmap_ref, cgroup_ref, q_ref, yT_ref, n2_ref,
             out_v_ref, out_i_ref, out_ev_ref,
             rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, ev_ref) = refs
        del cgroup_ref  # used by the index maps only
        i = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (qt, LANES), 1)

        @pl.when(j == 0)
        def _init():
            rv_ref[:] = jnp.full((qt, LANES), jnp.inf, jnp.float32)
            ri_ref[:] = jnp.full((qt, LANES), -1, jnp.int32)
            qv_ref[:] = jnp.full((qdepth, qt, LANES), jnp.inf, jnp.float32)
            qi_ref[:] = jnp.full((qdepth, qt, LANES), -1, jnp.int32)
            ev_ref[:] = jnp.full((qt, LANES), jnp.inf, jnp.float32)

        interval = jnp.clip(j // 4, 1, 16)
        do_flush = jnp.logical_and(j > 0, j % interval == 0)

        @pl.when(do_flush)
        def _scheduled():
            flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane)

        q = q_ref[:]  # [qt, d] f32
        q_hi = q.astype(jnp.bfloat16)
        q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        if db_hilo:
            y_hi = yT_ref[:]  # [d, ct] bf16 hi plane
            y_lo = ylo_ref[:]  # bf16 lo residual plane
            ip = (
                jax.lax.dot_general(
                    q_hi, y_hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + jax.lax.dot_general(
                    q_hi, y_lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + jax.lax.dot_general(
                    q_lo, y_hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # q.y to ~2^-17 relative
        else:
            y = yT_ref[:]  # [d, ct] bf16
            ip = jax.lax.dot_general(
                q_hi, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                q_lo, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if penalized:
            lid = lid_ref[:].astype(jnp.int32)
            lrow = jax.lax.broadcasted_iota(jnp.int32, (LANES, ct), 0)
            listoh = jnp.where(lrow == lid, 1.0, 0.0).astype(jnp.bfloat16)
            penalty = jax.lax.dot_general(
                bias_ref[:].astype(jnp.bfloat16), listoh,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            skey = n2_ref[:] - 2.0 * ip + penalty
        else:
            skey = n2_ref[:] - 2.0 * ip

        base = cmap_ref[i, j] * ct
        theta = rv_ref[:, LANES - 1 : LANES]
        assert n_sub % 2 == 0
        half = n_sub // 2
        for t in range(half):
            c0 = base + t * LANES + lane
            c1 = c0 + half * LANES
            s0 = skey[:, t * LANES : (t + 1) * LANES]
            s1 = skey[:, (t + half) * LANES : (t + half + 1) * LANES]
            sel = s0 <= s1
            sv = jnp.where(sel, s0, s1)
            col = jnp.where(sel, c0, c1)
            dropped = jnp.where(sel, s1, s0)
            ev_ref[:] = jnp.minimum(
                ev_ref[:], jnp.where(dropped < theta, dropped, jnp.inf)
            )
            sv = jnp.where(sv < theta, sv, jnp.inf)
            cv = sv
            ci = col
            for lev in range(qdepth):
                lv = qv_ref[lev]
                li = qi_ref[lev]
                lt = cv < lv
                qv_ref[lev] = jnp.where(lt, cv, lv)
                qi_ref[lev] = jnp.where(lt, ci, li)
                cv = jnp.where(lt, lv, cv)
                ci = jnp.where(lt, li, ci)
            ev_ref[:] = jnp.minimum(ev_ref[:], cv)

        @pl.when(j == nj - 1)
        def _finish():
            flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane)
            out_v_ref[:] = rv_ref[:]
            out_i_ref[:] = ri_ref[:]
            out_ev_ref[:] = ev_ref[:]

    def flush_adc(rv_ref, ri_ref, qv_ref, qi_ref, wv, wi, lane):
        for t in range(qdepth):
            wv[:] = -qv_ref[t]
            wi[:] = qi_ref[t]
            _sort_asc_ref(wv, wi, lane)
            wv[:] = -wv[:]
            _merge_desc_into_ref(rv_ref, ri_ref, wv, wi, lane)
        qv_ref[:] = jnp.full(qv_ref.shape, jnp.inf, jnp.float32)
        qi_ref[:] = jnp.full(qi_ref.shape, -1, jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("qt", "ct", "qdepth", "penalized", "interpret"),
)
def ivf_recon_fused_dyn_pallas(
    biasg: jax.Array,  # [nq, ngroups*128] f32 {0, 1e9} probe penalty
    xq: jax.Array,  # [nq, d_pad] f32 (pre-sorted by home group)
    yT: jax.Array,  # [d_pad, (nchunks+1)*ct] bf16 decoded store + PAD chunk
    n2: jax.Array,  # [1, (nchunks+1)*ct] f32 (+inf on pads & PAD chunk)
    lid: jax.Array,  # [1, (nchunks+1)*ct] int32 local list ids
    cmap: jax.Array,  # [nq//qt, msteps] int32 chunk worklist per query tile
    cgroup: jax.Array,  # [nchunks+1] int32 group of each chunk
    yT_lo=None,  # [d_pad, S] bf16 lo residual plane (exact-contract mode)
    qt: int = 256,
    ct: int = 1024,
    qdepth: int = QDEPTH,
    penalized: bool = True,
    interpret: bool = False,
):
    """nprobe-sparse recon-GEMM IVF scan + top-128 select: the dyn-chunk
    worklist structure of ivfpq_fused_dyn_pallas with the decoded-store
    score producer of ivf_recon_fused_pallas. ``penalized=False`` = soft
    probing (no {0,1e9} mask — see _make_recon_kernel_dyn). ``yT_lo``
    engages the f32-faithful hi/lo 3-pass contraction."""
    nq = xq.shape[0]
    d = xq.shape[1]
    assert yT.shape[0] == d
    db_hilo = yT_lo is not None
    msteps = cmap.shape[1]
    assert cmap.shape[0] == nq // qt
    grid = (nq // qt, msteps)
    kernel = _make_recon_kernel_dyn(qt, ct, d, qdepth, penalized=penalized,
                                    db_hilo=db_hilo)
    in_specs = [
        pl.BlockSpec((qt, d), lambda i, j, cm, cg: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if penalized:
        in_specs.append(
            pl.BlockSpec((qt, 128), lambda i, j, cm, cg: (i, cg[cm[i, j]]),
                         memory_space=pltpu.VMEM)
        )
    in_specs.append(
        pl.BlockSpec((d, ct), lambda i, j, cm, cg: (0, cm[i, j]),
                     memory_space=pltpu.VMEM)
    )
    if db_hilo:
        in_specs.append(
            pl.BlockSpec((d, ct), lambda i, j, cm, cg: (0, cm[i, j]),
                         memory_space=pltpu.VMEM)
        )
    in_specs.append(
        pl.BlockSpec((1, ct), lambda i, j, cm, cg: (0, cm[i, j]),
                     memory_space=pltpu.VMEM)
    )
    if penalized:
        in_specs.append(
            pl.BlockSpec((1, ct), lambda i, j, cm, cg: (0, cm[i, j]),
                         memory_space=pltpu.VMEM)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((qt, LANES), lambda i, j, cm, cg: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, LANES), lambda i, j, cm, cg: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, LANES), lambda i, j, cm, cg: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((qt, LANES), jnp.float32),
            pltpu.VMEM((qt, LANES), jnp.int32),
            pltpu.VMEM((qdepth, qt, LANES), jnp.float32),
            pltpu.VMEM((qdepth, qt, LANES), jnp.int32),
            pltpu.VMEM((qt, LANES), jnp.float32),
            pltpu.VMEM((qt, LANES), jnp.int32),
            pltpu.VMEM((qt, LANES), jnp.float32),
        ],
    )
    if penalized:
        operands = (cmap, cgroup, xq, biasg, yT)
    else:
        operands = (cmap, cgroup, xq, yT)
    if db_hilo:
        operands += (yT_lo,)
    operands += (n2,)
    if penalized:
        operands += (lid,)
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nq, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nq, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nq, LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    with jax.named_scope(  # jax.profiler trace row
        f"faiss_tpu.ivf_recon_fused_dyn[qt={qt},ct={ct},d={d}]"
    ):
        return call(*operands)


@functools.partial(
    jax.jit,
    static_argnames=(
        "qt", "ct", "qdepth", "fmax", "rot", "cheap_after", "dbg",
        "interpret",
    ),
)
def ivf_recon_fused_pallas(
    xq: jax.Array,  # [nq, d_pad] f32 queries (zero-padded dims)
    yT: jax.Array,  # [d_pad, S] bf16 TRANSPOSED decoded reconstructions
    n2: jax.Array,  # [1, S] f32 ||y||^2 per slot (+inf on pads)
    lid: jax.Array,  # [1, S] int32 local list ids (masked mode)
    biasg,  # [nq, ngroups*128] f32 {0, 1e9} probe mask, or None
    yT_lo=None,  # [d_pad, S] bf16 lo residual plane (exact-search mode)
    qt: int = 512,
    ct: int = 1024,
    qdepth: int = QDEPTH,
    fmax: int = 16,  # flush-interval cap (sparser = cheaper, more evictions)
    rot: bool = False,  # rotate chunk order: tile i starts at its home region
    cheap_after: int = 0,  # steps after which the cheap tail select engages
    dbg: str = "full",  # kernel-bisection debug modes (noev / noq)
    interpret: bool = False,
):
    """Fused IVF scan + top-128 select over DECODED reconstructions.

    Same group-packed layout and return contract as ivfpq_fused_pallas
    (keys missing ||q||^2, packed slot ids, eviction floor), but the score
    producer is a direct [qt, d] x [d, ct] GEMM against the bf16 decoded
    store — see _make_recon_kernel. ``biasg=None`` scans exhaustively
    (nprobe=0); otherwise biasg carries a {0, 1e9} probe penalty per
    grouped list column. With yT holding raw vectors this IS the fused
    IVF-Flat big-batch scan.
    """
    nq, d = xq.shape
    S = yT.shape[1]
    db_hilo = yT_lo is not None
    assert yT.shape[0] == d and S % ct == 0
    nchunks = S // ct
    masked = biasg is not None
    grid = (nq // qt, nchunks)
    # per-tile rotated chunk order: with queries sorted by home group
    # (proximity packing puts a group's lists in a contiguous chunk run),
    # tile i scans its own region FIRST, so the select threshold tightens
    # within a few steps and the sparse flush schedule loses nothing
    rstride = (nchunks // max(1, nq // qt)) if rot else 0
    if rstride:
        def cmap(i, j):
            return jax.lax.rem(j + i * rstride, nchunks)
    else:
        def cmap(i, j):
            return j
    kernel = _make_recon_kernel(qt, ct, d, masked, qdepth, db_hilo,
                                fmax=fmax, rot=rstride,
                                cheap_after=cheap_after, dbg=dbg)
    in_specs = [
        pl.BlockSpec((qt, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [xq]
    if masked:
        ngroups = biasg.shape[1] // 128
        cpg = max(1, nchunks // ngroups)
        assert nchunks - cpg * ngroups in (0, 1), (nchunks, ngroups)
        in_specs.append(
            pl.BlockSpec(
                (qt, 128),
                lambda i, j: (i, jnp.minimum(cmap(i, j) // cpg, ngroups - 1)),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(biasg)
    in_specs.append(
        pl.BlockSpec((d, ct), lambda i, j: (0, cmap(i, j)),
                     memory_space=pltpu.VMEM)
    )
    operands.append(yT)
    if db_hilo:
        in_specs.append(
            pl.BlockSpec((d, ct), lambda i, j: (0, cmap(i, j)),
                         memory_space=pltpu.VMEM)
        )
        operands.append(yT_lo)
    in_specs.append(
        pl.BlockSpec((1, ct), lambda i, j: (0, cmap(i, j)),
                     memory_space=pltpu.VMEM)
    )
    operands.append(n2)
    if masked:
        in_specs.append(
            pl.BlockSpec((1, ct), lambda i, j: (0, cmap(i, j)),
                         memory_space=pltpu.VMEM)
        )
        operands.append(lid)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((qt, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nq, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nq, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qt, LANES), jnp.float32),
            pltpu.VMEM((qt, LANES), jnp.int32),
            pltpu.VMEM((qdepth, qt, LANES), jnp.float32),
            pltpu.VMEM((qdepth, qt, LANES), jnp.int32),
            pltpu.VMEM((qt, LANES), jnp.float32),
            pltpu.VMEM((qt, LANES), jnp.int32),
            pltpu.VMEM((qt, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    scope = (f"faiss_tpu.ivf_recon_fused[qt={qt},ct={ct},d={d},"
             f"S={S},masked={masked},hilo={db_hilo}]")
    with jax.named_scope(scope):  # jax.profiler trace row
        return call(*operands)


@functools.partial(
    jax.jit, static_argnames=("qt", "ct", "qdepth", "interpret")
)
def ivfpq_fused_pallas(
    biasg: jax.Array,  # [nq, ngroups*128] f32: -2 q.c per GROUPED list column
    luts: jax.Array,  # [nq, M*ksub] bf16: flattened -2 q.pq tables
    codesT: jax.Array,  # [M, nchunks*ct] uint8 codes, group-packed transposed
    n2: jax.Array,  # [1, nchunks*ct] f32: ||y||^2 per slot (+inf on pads)
    lid: jax.Array,  # [1, nchunks*ct] int32: local list id within group
    qt: int = 256,
    ct: int = 1024,
    qdepth: int = QDEPTH,
    interpret: bool = False,
):
    """Fused exhaustive IVF-PQ ADC + top-128 select (group-packed layout).

    Lists are bin-packed into groups of <=128 (``pack_invlists_grouped``);
    every group spans the same number of chunks, so chunk j's bias block is
    the static slice ``biasg[:, (j // cpg)*128 : ...]``. Unprobed lists can
    be masked by setting their biasg column to a large value — the
    nprobe-faithful mode (search_preassigned semantics, IndexIVF.cpp:401).
    Returns (keys [nq,128] missing ||q||^2, slots [nq,128], evicted floor) —
    callers add ||q||^2 and repair lossy rows like knn_fused_pallas.
    """
    nq = luts.shape[0]
    M = codesT.shape[0]
    ksub = luts.shape[1] // M
    nchunks = codesT.shape[1] // ct
    assert biasg.shape[1] % 128 == 0
    ngroups = biasg.shape[1] // 128
    # trailing all-+inf PAD chunk(s) (the dynamic-chunk layout appends one)
    # fall outside the group grid: clamp their bias block to the last group
    # — inert, since their n2 is +inf
    cpg = max(1, nchunks // ngroups)  # chunks per group
    assert nchunks - cpg * ngroups in (0, 1), (nchunks, ngroups)
    grid = (nq // qt, nchunks)
    kernel = _make_adc_kernel(qt, ct, M, ksub, qdepth)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, M * ksub), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (qt, 128),
                lambda i, j: (i, jnp.minimum(j // cpg, ngroups - 1)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((M, ct), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qt, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nq, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nq, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qt, LANES), jnp.float32),
            pltpu.VMEM((qt, LANES), jnp.int32),
            pltpu.VMEM((qdepth, qt, LANES), jnp.float32),
            pltpu.VMEM((qdepth, qt, LANES), jnp.int32),
            pltpu.VMEM((qt, LANES), jnp.float32),
            pltpu.VMEM((qt, LANES), jnp.int32),
            pltpu.VMEM((qt, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    with jax.named_scope(  # jax.profiler trace row
        f"faiss_tpu.ivfpq_fused_adc[qt={qt},ct={ct},M={M},ksub={ksub}]"
    ):
        return call(luts, biasg, codesT, n2, lid)
