"""IVF scan kernels — the TPU replacement for InvertedListScanner.

The reference scans inverted lists with per-codec scanner objects inside
OpenMP loops (IndexIVF::search_preassigned, IndexIVF.cpp:401; scanner
dispatch IndexIVF.h:358) and, on GPU, with a warp-per-32-vector interleaved
layout (gpu/impl/IVFInterleaved.cuh:30). The TPU-native formulation:

  - inverted lists are PADDED dense arrays ``codes [nlist, max_len, ...]``
    with per-list lengths — XLA needs static shapes, padding is masked out
    at select time (the analogue of the GPU backend padding lists to
    multiples of 32).
  - a probe step is a GATHER of each query's p-th list followed by a batched
    distance contraction and a fused k-select merge; ``lax.scan`` walks the
    nprobe axis so peak memory is one [nq, max_len] tile.
  - ids stored in the lists are int32 *slots* (positions); the host maps
    slots to user int64 ids at the API boundary (models/ivf.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..metric import MetricType
from .topk import merge_topk


@functools.partial(jax.jit, static_argnames=("k", "metric", "precision"))
def ivf_flat_scan(
    xq: jax.Array,  # [nq, d] f32
    probes: jax.Array,  # [nq, nprobe] int32 (may contain -1 padding)
    codes: jax.Array,  # [nlist, max_len, d] f32 (padded invlists)
    slot_ids: jax.Array,  # [nlist, max_len] int32
    lengths: jax.Array,  # [nlist] int32
    k: int,
    metric: MetricType = MetricType.L2,
    code_norms: Optional[jax.Array] = None,  # [nlist, max_len] f32 (L2 only)
    sel_mask: Optional[jax.Array] = None,  # [ntotal] bool over slots
    precision: str = "highest",
) -> Tuple[jax.Array, jax.Array]:
    """Scan each query's probed lists, return (dists [nq,k], slots [nq,k]).

    Equivalent to IVFFlatScanner::scan_codes over all (query, probe) pairs
    (simd_impl/IVFFlatScanner-inl.h) with the heap replaced by fused
    k-select merges.
    """
    nq, d = xq.shape
    nprobe = probes.shape[1]
    max_len = codes.shape[1]
    largest = metric == MetricType.INNER_PRODUCT
    sentinel = -jnp.inf if largest else jnp.inf
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else None

    x_norms = jnp.sum(jnp.square(xq), axis=-1) if metric == MetricType.L2 else None
    col = jnp.arange(max_len, dtype=jnp.int32)

    def body(carry, p):
        vals, ids = carry
        ln = probes[:, p]  # [nq]
        safe_ln = jnp.maximum(ln, 0)
        cl = codes[safe_ln]  # [nq, max_len, d]
        sl = slot_ids[safe_ln]  # [nq, max_len]
        # batched contraction: q . c  -> [nq, max_len]
        ip = jax.lax.dot_general(
            xq[:, None, :],
            cl,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        )[:, 0, :]
        if metric == MetricType.L2:
            if code_norms is not None:
                cn = code_norms[safe_ln]
            else:
                cn = jnp.sum(jnp.square(cl), axis=-1)
            dist = jnp.maximum(x_norms[:, None] + cn - 2.0 * ip, 0.0)
        else:
            dist = ip
        valid = jnp.logical_and(
            col[None, :] < lengths[safe_ln][:, None], ln[:, None] >= 0
        )
        if sel_mask is not None:
            valid = jnp.logical_and(valid, sel_mask[jnp.maximum(sl, 0)])
        dist = jnp.where(valid, dist, sentinel)
        sl = jnp.where(valid, sl, -1)
        vals, ids = merge_topk(vals, ids, dist, sl, k, largest=largest)
        return (vals, ids), None

    init = (
        jnp.full((nq, k), sentinel, jnp.float32),
        jnp.full((nq, k), -1, jnp.int32),
    )
    (vals, ids), _ = jax.lax.scan(body, init, jnp.arange(nprobe))
    return vals, ids


@functools.partial(jax.jit, static_argnames=("nlist", "max_len"))
def build_padded_invlists(
    listnos: jax.Array,  # [n] int32 assignment of each slot to a list
    order: jax.Array,  # [n] int32 slots sorted by listno (host argsort)
    lengths: jax.Array,  # [nlist] int32
    offsets: jax.Array,  # [nlist] int32 start of each list in `order`
    nlist: int,
    max_len: int,
) -> jax.Array:
    """Produce slot_ids [nlist, max_len] from a sorted slot order.

    The scatter from CSR to padded layout; codes are then gathered by slot.
    """
    del listnos
    pos = (
        offsets[:, None] + jnp.arange(max_len, dtype=jnp.int32)[None, :]
    )  # [nlist, max_len]
    valid = jnp.arange(max_len, dtype=jnp.int32)[None, :] < lengths[:, None]
    safe = jnp.clip(pos, 0, order.shape[0] - 1)
    slots = order[safe]
    return jnp.where(valid, slots, -1)


@functools.partial(jax.jit, static_argnames=("k", "largest", "ht"))
def ivf_pq_scan(
    luts: jax.Array,  # [nq, M, ksub] query-side ADC tables (term3 / full)
    probes: jax.Array,  # [nq, nprobe] int32
    bias: jax.Array,  # [nq, nprobe] f32 per-(q,probe) additive term (term1)
    codes: jax.Array,  # [nlist, max_len, M] uint8/int32 PQ codes
    slot_ids: jax.Array,  # [nlist, max_len] int32
    lengths: jax.Array,  # [nlist] int32
    k: int,
    largest: bool = False,
    term2: Optional[jax.Array] = None,  # [nlist, M, ksub] list-side tables
    sel_mask: Optional[jax.Array] = None,  # [ntotal] bool over slots
    qcodes: Optional[jax.Array] = None,  # [nq, nprobe, M] query residual codes
    ht: int = 0,  # polysemous Hamming threshold (0 = off)
) -> Tuple[jax.Array, jax.Array]:
    """IVF-PQ ADC scan over probed lists.

    Implements the decomposition of IndexIVFPQ precomputed tables
    (IndexIVFPQ.cpp:407 initialize_IVFPQ_precomputed_table):

        d(q, list c + code y) = ||q - c||^2                      (bias)
                              + ||y||^2 + 2 c.y                  (term2[list])
                              - 2 q.y                            (luts[query])

    summed over PQ subspaces via table gathers; IP and non-residual paths
    pass term2=None with the appropriate luts/bias. Fused with per-probe
    k-select merges (the IVFInterleaved 2-pass select analogue,
    gpu/impl/IVFInterleaved.cuh).
    """
    nq, M, ksub = luts.shape
    nprobe = probes.shape[1]
    max_len = codes.shape[1]
    sentinel = -jnp.inf if largest else jnp.inf
    col = jnp.arange(max_len, dtype=jnp.int32)

    def body(carry, p):
        vals, ids = carry
        ln = probes[:, p]
        safe_ln = jnp.maximum(ln, 0)
        cl = codes[safe_ln].astype(jnp.int32)  # [nq, max_len, M]
        sl = slot_ids[safe_ln]
        tab = luts if term2 is None else luts + term2[safe_ln]

        def madd(acc, m):
            tab_m = jax.lax.dynamic_index_in_dim(
                tab, m, axis=1, keepdims=False
            )  # [nq, ksub]
            code_m = cl[:, :, m]  # [nq, max_len]
            acc = acc + jnp.take_along_axis(tab_m, code_m, axis=1)
            return acc, None

        acc0 = jnp.zeros((nq, max_len), jnp.float32)
        dist, _ = jax.lax.scan(madd, acc0, jnp.arange(M))
        dist = dist + bias[:, p][:, None]

        valid = jnp.logical_and(
            col[None, :] < lengths[safe_ln][:, None], ln[:, None] >= 0
        )
        if sel_mask is not None:
            valid = jnp.logical_and(valid, sel_mask[jnp.maximum(sl, 0)])
        if ht and qcodes is not None:
            # polysemous pre-filter on the residual codes
            # (reference: IndexIVFPQ.h:47 polysemous_ht; the Hamming test
            # is a vectorized XOR+popcount mask, not a branch)
            qc = qcodes[:, p, :]  # [nq, M]
            hamm = jnp.sum(
                jax.lax.population_count(qc[:, None, :] ^ cl), axis=-1
            )
            valid = jnp.logical_and(valid, hamm < ht)
        dist = jnp.where(valid, dist, sentinel)
        sl = jnp.where(valid, sl, -1)
        vals, ids = merge_topk(vals, ids, dist, sl, k, largest=largest)
        return (vals, ids), None

    init = (
        jnp.full((nq, k), sentinel, jnp.float32),
        jnp.full((nq, k), -1, jnp.int32),
    )
    (vals, ids), _ = jax.lax.scan(body, init, jnp.arange(nprobe))
    return vals, ids
