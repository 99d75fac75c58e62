"""Dense distance kernels — the TPU replacement for faiss/utils/distances.*.

The reference computes exhaustive distances with hand-written SIMD kernels and
BLAS tiling (exhaustive_L2sqr_blas_default_impl, utils/distances.cpp:425;
tiles of 4096x1024). On TPU the entire layer collapses onto the MXU:

  - inner product / L2 are a single GEMM (``ip = x @ y.T``,
    ``L2 = ||x||^2 + ||y||^2 - 2 x.y``), tiled by XLA.
  - brute-force k-NN fuses GEMM chunks with on-chip k-select (topk.py),
    scanning the database in HBM-sized chunks under ``lax.scan`` so the full
    [nq, nb] distance matrix never materializes — the analogue of the
    reference's blocked BLAS + ResultHandler pipeline
    (knn_L2sqr, utils/distances.cpp:834).
  - "extra" metrics (L1/Linf/Lp/..., utils/extra_distances.cpp) are VPU
    elementwise reductions over broadcast tiles.

All kernels are shape-polymorphic in nq and jit-cached per (shape, k, metric).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..metric import MetricType
from .topk import merge_topk, topk

# Database-chunk length for streamed brute-force scans. 2^17 rows keeps a
# [nq=8192, 131072] f32 score tile ~4 GiB below; chunking keeps peak HBM use
# bounded regardless of nb (reference analogue: bs_y = 1024 blocking,
# distances.cpp:438).
DEFAULT_DB_CHUNK = 1 << 17


def l2_norms(x: jax.Array) -> jax.Array:
    """Row-wise squared L2 norms (reference: fvec_norms_L2sqr).

    Chunked under one jit for large 2-D stores: a 10M x 96 fp16 store
    upcast to f32 in one piece is a ~4 GB transient (measured OOM on v5e
    with the serving stores resident); the scan bounds it to one chunk."""
    if x.ndim == 2 and x.shape[0] > (1 << 20):
        return _l2_norms_chunked(x)
    return jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)


@jax.jit
def _l2_norms_chunked(x: jax.Array) -> jax.Array:
    n = x.shape[0]
    chunk = 1 << 20
    nch = -(-n // chunk)
    pad = nch * chunk - n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    xp = xp.reshape(nch, chunk, -1)

    def body(_, xc):
        return None, jnp.sum(jnp.square(xc.astype(jnp.float32)), axis=-1)

    _, out = jax.lax.scan(body, None, xp)
    return out.reshape(-1)[:n]


def _split3_bf16(x: jax.Array):
    """3-way bf16 split: x ~= hi + mid + lo to ~24 mantissa bits.
    lax.reduce_precision, NOT a bf16 cast round-trip (the round-trip folds
    away under --xla_allow_excess_precision and the residual goes zero)."""
    h32 = jax.lax.reduce_precision(x, 8, 7)
    r = x - h32
    m32 = jax.lax.reduce_precision(r, 8, 7)
    return (
        h32.astype(jnp.bfloat16),
        m32.astype(jnp.bfloat16),
        (r - m32).astype(jnp.bfloat16),
    )


def dot_f32_6pass(x: jax.Array, y: jax.Array, dimension_numbers) -> jax.Array:
    """f32-exact GEMM as six bf16 MXU passes (3-way split of both sides,
    dropping the three <=2^-32-relative cross terms; each bf16 x bf16
    product is exact in f32). Measured MORE accurate than XLA's
    Precision.HIGHEST (max relerr 1.4e-7 vs 4.9e-7 against float64) and
    ~50x faster on this TPU stack, where HIGHEST lowers catastrophically
    (12.4 s vs ~0.25 s for [8192,128]x[128,1M])."""
    xh, xm, xl = _split3_bf16(x)
    yh, ym, yl = _split3_bf16(y)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.float32,
    )
    # smallest-magnitude terms first: tighter f32 accumulation
    return (
        (dot(xl, yh) + dot(xm, ym) + dot(xh, yl))
        + (dot(xm, yh) + dot(xh, ym))
        + dot(xh, yh)
    )


def pairwise_inner_product(
    x: jax.Array, y: jax.Array, precision: str = "highest"
) -> jax.Array:
    """[nx, d] x [ny, d] -> [nx, ny] inner products on the MXU.

    ``precision="highest"`` keeps fp32 accuracy (the reference accumulates
    fp32, utils/distances.cpp) — on TPU backends it runs as the explicit
    six-pass bf16 decomposition (dot_f32_6pass), which exceeds f32
    accuracy and avoids this stack's pathological Precision.HIGHEST
    lowering; "default" allows single-pass bf16 MXU for throughput at a
    small recall cost (like the reference's bf16 option,
    gpu/GpuDistance.h compute16bit paths).
    """
    dn = (((1,), (1,)), ((), ()))
    if precision == "highest" and jax.default_backend() != "cpu":
        return dot_f32_6pass(x, y, dn)
    return jax.lax.dot_general(
        x,
        y,
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if precision == "highest" else None,
    )


def pairwise_l2sqr(
    x: jax.Array,
    y: jax.Array,
    y_norms: Optional[jax.Array] = None,
    x_norms: Optional[jax.Array] = None,
) -> jax.Array:
    """Squared L2 distances via the norm expansion (distances.cpp:425)."""
    ip = pairwise_inner_product(x, y)
    if x_norms is None:
        x_norms = l2_norms(x)
    if y_norms is None:
        y_norms = l2_norms(y)
    d2 = x_norms[:, None] + y_norms[None, :] - 2.0 * ip
    return jnp.maximum(d2, 0.0)


def _extra_metric_tile(
    x: jax.Array, y: jax.Array, metric: MetricType, metric_arg: float
) -> jax.Array:
    """Elementwise-metric distances for a tile: [nx, d], [ny, d] -> [nx, ny].

    VPU path for the metrics in faiss/utils/extra_distances-inl.h.
    """
    xf = x.astype(jnp.float32)[:, None, :]
    yf = y.astype(jnp.float32)[None, :, :]
    if metric == MetricType.L1:
        return jnp.sum(jnp.abs(xf - yf), axis=-1)
    if metric == MetricType.Linf:
        return jnp.max(jnp.abs(xf - yf), axis=-1)
    if metric == MetricType.Lp:
        return jnp.sum(jnp.abs(xf - yf) ** metric_arg, axis=-1)
    if metric == MetricType.Canberra:
        num = jnp.abs(xf - yf)
        den = jnp.abs(xf) + jnp.abs(yf)
        return jnp.sum(jnp.where(den > 0, num / den, 0.0), axis=-1)
    if metric == MetricType.BrayCurtis:
        num = jnp.sum(jnp.abs(xf - yf), axis=-1)
        den = jnp.sum(jnp.abs(xf + yf), axis=-1)
        return jnp.where(den > 0, num / den, 0.0)
    if metric == MetricType.JensenShannon:
        m = 0.5 * (xf + yf)
        # kl with 0log0 = 0 (matches reference extra_distances-inl.h)
        def kl(a, b):
            r = a * jnp.log(a / b)
            return jnp.where(a > 0, r, 0.0)

        return jnp.sum(0.5 * (kl(xf, m) + kl(yf, m)), axis=-1)
    if metric == MetricType.Jaccard:
        num = jnp.sum(jnp.minimum(xf, yf), axis=-1)
        den = jnp.sum(jnp.maximum(xf, yf), axis=-1)
        sim = jnp.where(den > 0, num / den, 0.0)
        return 1.0 - sim
    if metric == MetricType.NaNEuclidean:
        # sklearn nan_euclidean: scale by d / num_present (extra_distances-inl.h)
        present = jnp.logical_and(~jnp.isnan(xf), ~jnp.isnan(yf))
        diff = jnp.where(present, xf - yf, 0.0)
        d = x.shape[-1]
        npresent = jnp.sum(present, axis=-1)
        s = jnp.sum(diff * diff, axis=-1)
        return jnp.where(npresent > 0, d * s / npresent, jnp.inf)
    if metric == MetricType.ABS_INNER_PRODUCT:
        return jnp.sum(jnp.abs(xf * yf), axis=-1)
    if metric == MetricType.GOWER:
        # Gower: numeric dims in [0,1] -> mean |diff|; negative pairs treated
        # as categorical (0 if equal else 1); NaN dims ignored.
        both_num = jnp.logical_and(xf >= 0, yf >= 0)
        valid = jnp.logical_and(~jnp.isnan(xf), ~jnp.isnan(yf))
        num_part = jnp.abs(xf - yf)
        cat_part = jnp.where(xf == yf, 0.0, 1.0)
        per_dim = jnp.where(both_num, num_part, cat_part)
        per_dim = jnp.where(valid, per_dim, 0.0)
        nvalid = jnp.sum(valid, axis=-1)
        return jnp.where(nvalid > 0, jnp.sum(per_dim, axis=-1) / nvalid, jnp.nan)
    raise ValueError(f"unsupported extra metric {metric!r}")


def pairwise_distances(
    x: jax.Array,
    y: jax.Array,
    metric: MetricType = MetricType.L2,
    metric_arg: float = 0.0,
) -> jax.Array:
    """Full [nx, ny] distance matrix (reference: pairwise_L2sqr et al.)."""
    if metric == MetricType.L2:
        return pairwise_l2sqr(x, y)
    if metric == MetricType.INNER_PRODUCT:
        return pairwise_inner_product(x, y)
    return _extra_metric_tile(x, y, metric, metric_arg)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "metric_arg", "db_chunk", "exact", "precision"),
)
def knn(
    x: jax.Array,
    y: jax.Array,
    k: int,
    metric: MetricType = MetricType.L2,
    metric_arg: float = 0.0,
    y_norms: Optional[jax.Array] = None,
    y_mask: Optional[jax.Array] = None,
    db_chunk: int = DEFAULT_DB_CHUNK,
    exact: bool = True,
    precision: str = "highest",
) -> Tuple[jax.Array, jax.Array]:
    """Brute-force k-NN of queries x against database y.

    Fused chunked-GEMM + k-select (reference: knn_L2sqr / knn_inner_product,
    utils/distances.cpp:834,648, and GPU bfKnn, gpu/GpuDistance.cu). Returns
    (distances [nq, k], labels [nq, k] int64), best-first; missing entries
    (k > nb) get dist=+inf/-inf and id=-1, matching reference semantics.
    ``y_mask`` (bool [nb]) excludes rows — the IDSelector path
    (impl/IDSelector.h) rendered as a score mask.
    """
    nq = x.shape[0]
    nb = y.shape[0]
    largest = metric in (MetricType.INNER_PRODUCT, MetricType.ABS_INNER_PRODUCT)
    kk = min(k, nb) if nb > 0 else 0

    if nb == 0 or kk == 0:
        fill = -jnp.inf if largest else jnp.inf
        return (
            jnp.full((nq, k), fill, jnp.float32),
            jnp.full((nq, k), -1, jnp.int64),
        )

    if metric == MetricType.L2 and y_norms is None:
        y_norms = l2_norms(y)
    x_norms = l2_norms(x) if metric == MetricType.L2 else None
    sentinel = -jnp.inf if largest else jnp.inf

    if nb <= db_chunk:
        scores = _score_tile(x, y, metric, metric_arg, x_norms, y_norms, precision)
        if y_mask is not None:
            scores = jnp.where(y_mask[None, :], scores, sentinel)
        vals, ids = topk(scores, kk, largest=largest, exact=exact)
        ids = ids.astype(jnp.int32)
        if y_mask is not None:
            # entries that selected a masked row (all-masked case) -> -1
            picked_ok = jnp.take(y_mask, ids, axis=0)
            ids = jnp.where(picked_ok, ids, -1)
            vals = jnp.where(picked_ok, vals, sentinel)
    else:
        # Scan chunks by dynamic-slicing y IN PLACE: a pad+reshape copy of
        # the database doubles HBM (3.9 GB extra at Deep10M 10M x 96 f32 —
        # measured RESOURCE_EXHAUSTED with the flat store also resident).
        # The last chunk is clamped to [nb - db_chunk, nb); rows the
        # previous chunk already scored are masked off via col < ci*chunk.
        nchunks = -(-nb // db_chunk)

        def body(carry, ci):
            vals, ids = carry
            start_c = jnp.minimum(ci * db_chunk, nb - db_chunk)
            ytile = jax.lax.dynamic_slice_in_dim(y, start_c, db_chunk)
            yntile = (
                jax.lax.dynamic_slice_in_dim(y_norms, start_c, db_chunk)
                if metric == MetricType.L2
                else None
            )
            mtile = (
                jax.lax.dynamic_slice_in_dim(y_mask, start_c, db_chunk)
                if y_mask is not None
                else None
            )
            scores = _score_tile(
                x, ytile, metric, metric_arg, x_norms, yntile, precision
            )
            col = jnp.arange(db_chunk, dtype=jnp.int32) + start_c
            valid = col >= ci * db_chunk  # tail-overlap rows already scored
            if mtile is not None:
                valid = jnp.logical_and(valid, mtile)
            scores = jnp.where(valid[None, :], scores, sentinel)
            cv, cp = topk(scores, kk, largest=largest, exact=exact)
            cids = jnp.where(valid[cp], col[cp], -1)
            vals, ids = merge_topk(vals, ids, cv, cids, kk, largest=largest)
            return (vals, ids), None

        init = (
            jnp.full((nq, kk), sentinel, jnp.float32),
            jnp.full((nq, kk), -1, jnp.int32),
        )
        (vals, ids), _ = jax.lax.scan(
            body, init, jnp.arange(nchunks, dtype=jnp.int32)
        )

    # Pad out to k if nb < k (faiss fills with -1 / +-inf).
    if kk < k:
        fill = -jnp.inf if largest else jnp.inf
        vals = jnp.concatenate(
            [vals, jnp.full((nq, k - kk), fill, vals.dtype)], axis=-1
        )
        ids = jnp.concatenate([ids, jnp.full((nq, k - kk), -1, ids.dtype)], axis=-1)
    return vals, ids.astype(jnp.int64)


@functools.partial(jax.jit, static_argnames=("metric", "chunk"))
def assign_flat(
    x: jax.Array,  # [n, d] device
    centroids: jax.Array,  # [nc, d]
    metric: MetricType = MetricType.L2,
    chunk: int = 1 << 14,
) -> Tuple[jax.Array, jax.Array]:
    """Top-1 assignment of a LARGE batch against a flat centroid set,
    chunked over queries under one jit (the bulk-add / k-means assign path;
    the reference pages CPU inputs through the GPU the same way,
    gpu/GpuIndex.cu:554). Returns (dist [n] f32, assign [n] int32)."""
    x = x.astype(jnp.float32)  # staged copies may be fp16 (device_staging)
    n = x.shape[0]
    c_norms = l2_norms(centroids)
    nchunks = max(1, -(-n // chunk))
    pad = nchunks * chunk - n
    xp = (jnp.pad(x, ((0, pad), (0, 0))) if pad else x).reshape(
        nchunks, chunk, -1
    )

    def body(_, xc):
        ip = pairwise_inner_product(xc, centroids)
        if metric == MetricType.INNER_PRODUCT:
            key = -ip
        else:
            key = c_norms[None, :] - 2.0 * ip
        a = jnp.argmin(key, axis=1).astype(jnp.int32)
        best = jnp.min(key, axis=1)
        if metric == MetricType.INNER_PRODUCT:
            best = -best
        else:
            best = jnp.maximum(best + l2_norms(xc), 0.0)
        return None, (best, a)

    _, (dist, assign) = jax.lax.scan(body, None, xp)
    return dist.reshape(-1)[:n], assign.reshape(-1)[:n]


def _score_tile(x, y, metric, metric_arg, x_norms, y_norms, precision="highest"):
    if metric == MetricType.L2:
        ip = pairwise_inner_product(x, y, precision)
        yn = y_norms if y_norms is not None else l2_norms(y)
        xn = x_norms if x_norms is not None else l2_norms(x)
        return jnp.maximum(xn[:, None] + yn[None, :] - 2.0 * ip, 0.0)
    if metric == MetricType.INNER_PRODUCT:
        return pairwise_inner_product(x, y, precision)
    return _extra_metric_tile(x, y, metric, metric_arg)


@functools.partial(jax.jit, static_argnames=("k", "metric", "precision"))
def rerank_exact(
    xq: jax.Array,  # [nq, d]
    xb: jax.Array,  # [nb, d] exact vectors
    cand: jax.Array,  # [nq, kc] int32 candidate ids (-1 = missing)
    k: int,
    metric: MetricType = MetricType.L2,
    xb_n2: jax.Array = None,  # optional precomputed ||xb||^2 [nb]
    precision=jax.lax.Precision.HIGHEST,
    sq_scale: jax.Array = None,  # [d] — xb holds SQ8 codes: row*scale+off
    sq_off: jax.Array = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact re-ranking of per-query candidate lists (the IndexRefineFlat
    inner loop, IndexRefine.cpp, as one batched gather + contraction).

    ``xb_n2`` (store norms precomputed ONCE at staging) turns the per-call
    ||cv||^2 pass over the gathered [nq, kc, d] block into a [nq, kc]
    gather — on the serving path that pass was ~40% of the rerank cost.
    ``precision`` trades dot passes for exactness: HIGHEST (6-pass) for
    f32-exact contracts, HIGH (3-pass, ~2^-21 relative) is plenty when the
    store itself is f16.

    ``sq_scale``/``sq_off``: the store is uint8 SQ codes (Refine(SQ8) —
    1 byte/dim in HBM, the 100M-on-one-chip refine layout); gathered rows
    dequantize per-dim AFTER the gather, so the HBM gather traffic is 4x
    lighter than f32 and the contraction runs on reconstructed values."""
    largest = metric == MetricType.INNER_PRODUCT
    sentinel = -jnp.inf if largest else jnp.inf
    safe = jnp.maximum(cand, 0)
    cv = xb[safe].astype(jnp.float32)  # [nq, kc, d] (xb may be fp16 store)
    if sq_scale is not None:
        cv = cv * sq_scale + sq_off
    if precision == jax.lax.Precision.HIGHEST:
        # batched M=1 contraction: an f32 elementwise multiply + tree
        # reduce on the VPU is exact and single-pass — the MXU has no
        # M=1 tile, and Precision.HIGHEST's lowering is pathological on
        # this stack (see dot_f32_6pass)
        ip = jnp.sum(xq[:, None, :].astype(jnp.float32) * cv, axis=-1)
    else:
        ip = jax.lax.dot_general(
            xq[:, None, :], cv, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )[:, 0, :]
    if metric == MetricType.L2:
        cn2 = (
            xb_n2[safe]
            if xb_n2 is not None
            else jnp.sum(jnp.square(cv), -1)
        )
        d = jnp.sum(jnp.square(xq), -1)[:, None] + cn2 - 2.0 * ip
        d = jnp.maximum(d, 0.0)
    else:
        d = ip
    d = jnp.where(cand >= 0, d, sentinel)
    vals, pos = topk(d, min(k, cand.shape[1]), largest=largest)
    ids = jnp.take_along_axis(cand, pos, axis=1)
    return vals, jnp.where(jnp.isinf(vals), -1, ids)
