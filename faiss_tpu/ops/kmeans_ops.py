"""k-means device kernels: fused assign + centroid accumulation.

The reference's hot loop is an assignment GEMM (index.search with k=1 inside
Clustering::train_encoded, Clustering.cpp:60) followed by OpenMP-parallel
weighted sums (compute_centroids, impl/ClusteringHelpers.h:66). On TPU both
steps fuse into one scan over data chunks:

  assign:  argmin_c ||x||^2 + ||c||^2 - 2 x.c      (MXU GEMM + VPU argmin)
  update:  sums += onehot(assign).T @ x            (MXU GEMM — the TPU-native
                                                    segment-sum; scatter-add is
                                                    slow on TPU)

returning (sums [k,d], counts [k], objective, per-point assignment). The
small O(k) empty-cluster bookkeeping stays on host (clustering.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

DEFAULT_POINT_CHUNK = 1 << 14  # 16384 points per scan step


@functools.partial(jax.jit, static_argnames=("chunk", "precision"))
def kmeans_assign_update(
    x: jax.Array,
    centroids: jax.Array,
    weights: Optional[jax.Array] = None,
    chunk: int = DEFAULT_POINT_CHUNK,
    precision: str = "highest",
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One Lloyd iteration's reduction over all points.

    Returns (sums [k, d] f32, counts [k] f32, objective scalar,
    assignment [n] int32). Objective = sum of squared L2 distances to the
    assigned centroid (matches ClusteringIterationStats.obj,
    Clustering.cpp:331).
    """
    n, d = x.shape
    k = centroids.shape[0]
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else None
    c_norms = jnp.sum(jnp.square(centroids), axis=-1)

    nchunks = max(1, -(-n // chunk))
    pad = nchunks * chunk - n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    xp = xp.reshape(nchunks, chunk, d)
    if weights is not None:
        wp = jnp.pad(weights, (0, pad)) if pad else weights
        wp = wp.reshape(nchunks, chunk)

    def body(carry, inputs):
        sums, counts, obj = carry
        if weights is not None:
            ci, xc, wc = inputs
        else:
            ci, xc = inputs
            wc = None
        ip = jax.lax.dot_general(
            xc,
            centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        x_norm = jnp.sum(jnp.square(xc), axis=-1)
        d2 = x_norm[:, None] + c_norms[None, :] - 2.0 * ip
        assign = jnp.argmin(d2, axis=-1).astype(jnp.int32)
        best = jnp.maximum(jnp.min(d2, axis=-1), 0.0)

        row = jnp.arange(chunk) + ci * chunk
        valid = (row < n).astype(jnp.float32)
        w = valid if wc is None else valid * wc

        onehot = (
            jax.nn.one_hot(assign, k, dtype=jnp.float32) * w[:, None]
        )  # [chunk, k]
        sums = sums + jax.lax.dot_general(
            onehot,
            xc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        counts = counts + jnp.sum(onehot, axis=0)
        obj = obj + jnp.sum(best * valid)
        return (sums, counts, obj), assign

    init = (
        jnp.zeros((k, d), jnp.float32),
        jnp.zeros((k,), jnp.float32),
        jnp.zeros((), jnp.float32),
    )
    xs = (jnp.arange(nchunks), xp, wp) if weights is not None else (
        jnp.arange(nchunks),
        xp,
    )
    (sums, counts, obj), assigns = jax.lax.scan(body, init, xs)
    return sums, counts, obj, assigns.reshape(-1)[:n]


def _split_empty_clusters(new_c, counts, key):
    """On-device empty-cluster split (split_clusters policy,
    impl/ClusteringHelpers.h:85): each empty slot takes a donor sampled
    ~ categorical(counts - 1), perturbed by (1 +/- EPS); a donor hit by
    >= 1 empty slot shrinks once. Returns (centroids, nsplit)."""
    k = new_c.shape[0]
    EPS = 1.0 / 1024.0
    empty = counts <= 0
    nsplit = jnp.sum(empty).astype(jnp.int32)
    logits = jnp.log(jnp.maximum(counts - 1.0, 1e-30))
    donors = jax.random.categorical(key, logits, shape=(k,))
    # out-of-bounds index k marks "no split" and is dropped by the scatter
    used = (
        jnp.zeros((k,), jnp.bool_)
        .at[jnp.where(empty, donors, k)]
        .set(True, mode="drop")
    )
    new_c = jnp.where(empty[:, None], new_c[donors] * (1.0 + EPS), new_c)
    new_c = jnp.where(
        jnp.logical_and(used, jnp.logical_not(empty))[:, None],
        new_c * (1.0 - EPS),
        new_c,
    )
    return new_c, nsplit


def _hi_lo(a):
    """Split f32 into bf16 hi + bf16 lo planes. MUST go through
    lax.reduce_precision: under --xla_allow_excess_precision (set by the
    axon compile env) the (a - bf16(a).astype(f32)) round-trip folds away
    and the lo plane silently becomes zero (NOTES.md)."""
    hi = jax.lax.reduce_precision(a, 8, 7)
    lo = a - hi
    return hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=(
        "niter", "chunk", "spherical", "int_centroids", "frozen", "split",
        "weighted",
    ),
)
def kmeans_fused_loop(
    x: jax.Array,  # [n, d] f32 training points
    init: jax.Array,  # [k, d] f32 initial centroids
    key: jax.Array,  # PRNG key (empty-cluster donor sampling)
    weights: Optional[jax.Array] = None,  # [n] f32 or None
    *,
    niter: int,
    chunk: int = DEFAULT_POINT_CHUNK,
    spherical: bool = False,
    int_centroids: bool = False,
    frozen: bool = False,
    split: bool = True,
    weighted: bool = False,
):
    """ALL Lloyd iterations in one device program (lax.scan over iters).

    The host-loop version (one ``kmeans_assign_update`` dispatch per
    iteration) pays ~3 tunnel round-trips + a centroid re-upload per
    iteration — over the remote TPU link that is >100 ms/iter of pure
    overhead. Here the whole training runs device-side and the host syncs
    once, reading (centroids, per-iter stats).

    Numerics: the assignment GEMM runs 3 bf16 passes (x_hi.c_hi + x_hi.c_lo
    + x_lo.c_hi -> f32-faithful to ~2^-16 relative, 2x faster than
    Precision.HIGHEST's 6 passes); centroid sums use hi/lo x against an
    EXACT bf16 one-hot with f32 accumulation, so means match f32 to ~2^-16.

    Empty-cluster handling runs ON DEVICE: donors sampled per slot
    ~ categorical(counts - 1) (the split_clusters policy,
    impl/ClusteringHelpers.h:85); a donor hit by >=1 empty slot shrinks by
    (1-EPS) and each empty slot takes donor*(1+EPS). Divergence from the
    reference: donor picks use the JAX PRNG (not numpy RandomState) and
    count bookkeeping between multiple same-iteration splits is not
    sequential — same policy, different stream.

    Returns (centroids [k, d] f32, objs [niter], sumsq_counts [niter],
    tot_counts [niter], nsplits [niter] int32, counts_last [k]).
    """
    n, d = x.shape
    k = init.shape[0]
    EPS = 1.0 / 1024.0

    # uint8 storage path (MNIST8m-class data, BASELINE.md row 12): every
    # value in [0, 255] is EXACTLY representable in bf16, so the points
    # stay uint8 in HBM (1 byte/dim — 8.1M x 784 = 6.35 GB vs 25.4 GB of
    # hi/lo bf16 planes, which would not fit a single v5e) and each scan
    # chunk decodes to an exact single bf16 plane on the fly. The
    # assignment GEMM is then x_exact . (c_hi + c_lo): f32-faithful with
    # 2 MXU passes instead of 3.
    if x.dtype == jnp.uint8:
        if weighted:
            raise NotImplementedError("uint8 k-means path is unweighted")
        return _kmeans_fused_loop_u8(
            x, init, key, niter=niter, chunk=chunk, spherical=spherical,
            int_centroids=int_centroids, frozen=frozen, split=split,
        )

    nchunks = max(1, -(-n // chunk))
    pad = nchunks * chunk - n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    valid = (jnp.arange(nchunks * chunk) < n).astype(jnp.float32)
    if weighted:
        wfull = (jnp.pad(weights, (0, pad)) if pad else weights) * valid
    else:
        wfull = valid
    # per-point operands staged once, chunked for the inner scan
    x_norm = jnp.sum(jnp.square(xp), axis=-1) * (wfull > 0)
    xh, xl = _hi_lo(xp)
    if weighted:
        wxh, wxl = _hi_lo(xp * wfull[:, None])
    else:
        wxh, wxl = xh, xl
    shape_c = (nchunks, chunk)
    xh = xh.reshape(nchunks, chunk, d)
    xl = xl.reshape(nchunks, chunk, d)
    wxh = wxh.reshape(nchunks, chunk, d)
    wxl = wxl.reshape(nchunks, chunk, d)
    x_norm = x_norm.reshape(shape_c)
    wc = wfull.reshape(shape_c)

    def bdot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def iteration(carry, _):
        c, key = carry
        key, sub = jax.random.split(key)
        c_norms = jnp.sum(jnp.square(c), axis=-1)
        ch, cl = _hi_lo(c)

        def body(acc, inputs):
            sums, counts, obj = acc
            xhc, xlc, wxhc, wxlc, xnc, wcc = inputs
            ip = bdot(xhc, ch) + bdot(xhc, cl) + bdot(xlc, ch)
            d2 = xnc[:, None] + c_norms[None, :] - 2.0 * ip
            assign = jnp.argmin(d2, axis=-1).astype(jnp.int32)
            best = jnp.maximum(jnp.min(d2, axis=-1), 0.0)
            onehot = jax.nn.one_hot(assign, k, dtype=jnp.bfloat16)
            ohw = onehot * (wcc > 0).astype(jnp.bfloat16)[:, None]
            sums = sums + jax.lax.dot_general(
                ohw, wxhc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                ohw, wxlc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # counts must carry exact f32 weights (a bf16 pass would skew
            # weighted means ~0.4%); the [k, chunk] x [chunk, 1] GEMV is
            # negligible next to the assignment GEMM
            counts = counts + jax.lax.dot_general(
                ohw.astype(jnp.float32), wcc[:, None],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )[:, 0]
            obj = obj + jnp.sum(best * wcc)
            return (sums, counts, obj), None

        init_acc = (
            jnp.zeros((k, d), jnp.float32),
            jnp.zeros((k,), jnp.float32),
            jnp.zeros((), jnp.float32),
        )
        (sums, counts, obj), _ = jax.lax.scan(
            body, init_acc, (xh, xl, wxh, wxl, x_norm, wc)
        )

        if frozen:
            new_c = c
            nsplit = jnp.zeros((), jnp.int32)
        else:
            nz = counts > 0
            new_c = jnp.where(
                nz[:, None], sums / jnp.maximum(counts, 1e-30)[:, None], c
            )
            if split:
                new_c, nsplit = _split_empty_clusters(new_c, counts, sub)
            else:
                nsplit = jnp.zeros((), jnp.int32)
            if spherical:
                nrm = jnp.linalg.norm(new_c, axis=1, keepdims=True)
                new_c = new_c / jnp.maximum(nrm, 1e-30)
            if int_centroids:
                new_c = jnp.round(new_c)
        ys = (obj, jnp.sum(jnp.square(counts)), jnp.sum(counts), nsplit,
              counts)
        return (new_c, key), ys

    (centroids, _), (objs, sumsq, tots, nsplits, counts_all) = jax.lax.scan(
        iteration, (init, key), None, length=niter
    )
    return centroids, objs, sumsq, tots, nsplits, counts_all[-1]


def _kmeans_fused_loop_u8(
    x, init, key, *, niter, chunk, spherical, int_centroids, frozen, split
):
    """uint8-resident body of kmeans_fused_loop (see dtype branch there).

    Per chunk: decode uint8 -> bf16 (exact), x_norm recomputed in-chunk
    (pre-staging a full [n] f32 norm would walk a 25 GB f32 temp at
    MNIST8m scale), assignment ip = x_bf16 . c_hi + x_bf16 . c_lo, and
    the one-hot update GEMM runs one exact bf16 pass against the decoded
    chunk. Returns the same tuple as kmeans_fused_loop.
    """
    n, d = x.shape
    k = init.shape[0]

    # NO pad+reshape: that materializes a full padded COPY of the store
    # next to the argument (measured +6.8 GB at MNIST8m scale — OOM).
    # Chunks dynamic-slice the store in place; the ragged tail re-reads
    # a window shifted back onto the last `chunk` rows and masks rows
    # already covered by the previous chunk (same fix as dops.knn).
    chunk = min(chunk, n)
    nchunks = max(1, -(-n // chunk))

    def iteration(carry, _):
        c, key = carry
        key, sub = jax.random.split(key)
        c_norms = jnp.sum(jnp.square(c), axis=-1)
        ch, cl = _hi_lo(c)

        def body(acc, ci):
            sums, counts, obj = acc
            start = jnp.minimum(ci * chunk, n - chunk)
            xc_u8 = jax.lax.dynamic_slice_in_dim(x, start, chunk)
            xb = xc_u8.astype(jnp.bfloat16)  # exact for [0, 255]
            xnc = jnp.sum(
                jnp.square(xb.astype(jnp.float32)), axis=-1
            )
            ip = jax.lax.dot_general(
                xb, ch, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                xb, cl, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d2 = xnc[:, None] + c_norms[None, :] - 2.0 * ip
            assign = jnp.argmin(d2, axis=-1).astype(jnp.int32)
            best = jnp.maximum(jnp.min(d2, axis=-1), 0.0)
            # a shifted tail window re-reads rows the previous chunk
            # already counted — mask to rows NEW to this chunk
            gidx = start + jnp.arange(chunk)
            valid = (gidx >= ci * chunk) & (gidx < n)
            onehot = jax.nn.one_hot(assign, k, dtype=jnp.bfloat16)
            ohw = onehot * valid.astype(jnp.bfloat16)[:, None]
            sums = sums + jax.lax.dot_general(
                ohw, xb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            counts = counts + jnp.sum(ohw.astype(jnp.float32), axis=0)
            obj = obj + jnp.sum(best * valid.astype(jnp.float32))
            return (sums, counts, obj), None

        init_acc = (
            jnp.zeros((k, d), jnp.float32),
            jnp.zeros((k,), jnp.float32),
            jnp.zeros((), jnp.float32),
        )
        (sums, counts, obj), _ = jax.lax.scan(
            body, init_acc, jnp.arange(nchunks)
        )

        if frozen:
            new_c = c
            nsplit = jnp.zeros((), jnp.int32)
        else:
            nz = counts > 0
            new_c = jnp.where(
                nz[:, None], sums / jnp.maximum(counts, 1e-30)[:, None], c
            )
            if split:
                new_c, nsplit = _split_empty_clusters(new_c, counts, sub)
            else:
                nsplit = jnp.zeros((), jnp.int32)
            if spherical:
                nrm = jnp.linalg.norm(new_c, axis=1, keepdims=True)
                new_c = new_c / jnp.maximum(nrm, 1e-30)
            if int_centroids:
                new_c = jnp.round(new_c)
        ys = (obj, jnp.sum(jnp.square(counts)), jnp.sum(counts), nsplit,
              counts)
        return (new_c, key), ys

    (centroids, _), (objs, sumsq, tots, nsplits, counts_all) = jax.lax.scan(
        iteration, (init, key), None, length=niter
    )
    return centroids, objs, sumsq, tots, nsplits, counts_all[-1]


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "spherical", "int_centroids", "frozen", "split", "weighted"
    ),
)
def kmeans_fused_iter(
    x, c, key, weights=None, *, chunk=DEFAULT_POINT_CHUNK, spherical=False,
    int_centroids=False, frozen=False, split=True, weighted=False,
):
    """ONE Lloyd iteration of kmeans_fused_loop as its own program.

    The whole-loop program gives the fastest warm path but its remote
    compile costs minutes in a cold process (the driver benchmark runs
    cold). This single-iteration body compiles fast; the host chains
    device arrays across iterations WITHOUT syncing (jax async dispatch),
    so a cold 20-iteration train costs one small compile + ~20 enqueues +
    one final readback. Returns (new_c, obj, sumsq, tot, nsplit, counts).
    """
    out = kmeans_fused_loop.__wrapped__(
        x, c, key, weights, niter=1, chunk=chunk, spherical=spherical,
        int_centroids=int_centroids, frozen=frozen, split=split,
        weighted=weighted,
    )
    centroids, objs, sumsq, tots, nsplits, counts = out
    return centroids, objs[0], sumsq[0], tots[0], nsplits[0], counts


@functools.partial(jax.jit, static_argnames=("p", "keep", "chunk"))
def superkm_assign_update(
    x: jax.Array,  # [n, d] f32 (randomly rotated — ADSampling assumption)
    centroids: jax.Array,  # [k, d] f32
    coeff: float,  # chi2 threshold ratio for p dims (precompute_ad_thresholds)
    key: jax.Array,  # PRNG key (empty-cluster donor sampling)
    p: int,
    keep: int,  # exact re-rank candidate width (batch form of the prune)
    chunk: int = DEFAULT_POINT_CHUNK,
):
    """One SuperKMeans Lloyd iteration (super_kmeans_assign_iteration,
    faiss/SuperKMeans.cpp, in TPU batch form).

    Screen: partial distance over the front p dims; est = part / coeff is a
    high-confidence lower bound of the full distance (chi-squared tail).
    The ``keep`` best-bounded centroids are re-ranked exactly at full d —
    per point k*p + keep*d MACs instead of k*d. Update = the same one-hot
    GEMM as kmeans_fused_loop; empty clusters split on device
    (_split_empty_clusters).

    Returns (new_centroids, tau [n] exact assigned distance, obj,
    sum(counts^2), sum(counts), pruned_pair_fraction).
    """
    n, d = x.shape
    k = centroids.shape[0]
    nchunks = max(1, -(-n // chunk))
    pad = nchunks * chunk - n
    xp_full = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    valid = (jnp.arange(nchunks * chunk) < n).astype(jnp.float32)
    x_norm = jnp.sum(jnp.square(xp_full), axis=-1)
    xn_p = jnp.sum(jnp.square(xp_full[:, :p]), axis=-1)
    xh, xl = _hi_lo(xp_full)
    cn = jnp.sum(jnp.square(centroids), axis=-1)
    cn_p = jnp.sum(jnp.square(centroids[:, :p]), axis=-1)
    ch_p, cl_p = _hi_lo(centroids[:, :p])

    xh_c = xh.reshape(nchunks, chunk, d)
    xl_c = xl.reshape(nchunks, chunk, d)
    xn_c = x_norm.reshape(nchunks, chunk)
    xnp_c = xn_p.reshape(nchunks, chunk)
    v_c = valid.reshape(nchunks, chunk)

    def body(acc, inputs):
        sums, counts, obj, npruned = acc
        xhc, xlc, xnc, xnpc, vc = inputs
        xhp = xhc[:, :p]
        xlp = xlc[:, :p]
        part = xnpc[:, None] + cn_p[None, :] - 2.0 * (
            jax.lax.dot_general(
                xhp, ch_p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                xlp, ch_p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                xhp, cl_p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        est = jnp.maximum(part, 0.0) / coeff  # full-distance lower bound
        _, cand = jax.lax.top_k(-est, keep)  # [chunk, keep]
        g = centroids[cand]  # [chunk, keep, d]
        xc = xhc.astype(jnp.float32) + xlc.astype(jnp.float32)
        full = (
            xnc[:, None]
            + jnp.sum(jnp.square(g), -1)
            - 2.0 * jnp.einsum(
                "nd,ncd->nc", xc, g, preferred_element_type=jnp.float32
            )
        )
        j = jnp.argmin(full, axis=-1)
        best = jnp.maximum(
            jnp.take_along_axis(full, j[:, None], 1)[:, 0], 0.0
        )
        assign = jnp.take_along_axis(cand, j[:, None], 1)[:, 0].astype(
            jnp.int32
        )
        # pairs the partial screen would discard given tau = best
        npruned = npruned + jnp.sum(
            (est > best[:, None]).astype(jnp.float32) * vc[:, None]
        )
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.bfloat16)
        ohw = onehot * vc.astype(jnp.bfloat16)[:, None]
        sums = sums + jax.lax.dot_general(
            ohw, xhc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            ohw, xlc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = counts + jnp.sum(ohw.astype(jnp.float32) * vc[:, None], 0)
        obj = obj + jnp.sum(best * vc)
        return (sums, counts, obj, npruned), best * vc

    init_acc = (
        jnp.zeros((k, d), jnp.float32),
        jnp.zeros((k,), jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
    )
    (sums, counts, obj, npruned), taus = jax.lax.scan(
        body, init_acc, (xh_c, xl_c, xn_c, xnp_c, v_c)
    )
    nz = counts > 0
    new_c = jnp.where(
        nz[:, None], sums / jnp.maximum(counts, 1e-30)[:, None], centroids
    )
    new_c, _ = _split_empty_clusters(new_c, counts, key)
    return (
        new_c,
        taus.reshape(-1)[:n],
        obj,
        jnp.sum(jnp.square(counts)),
        jnp.sum(counts),
        npruned / (n * k),
    )


@functools.partial(jax.jit, static_argnames=("k", "niter", "precision"))
def batched_kmeans(
    xs: jax.Array,  # [M, n, dsub] — M independent clustering problems
    init: jax.Array,  # [M, k, dsub] initial centroids
    k: int,
    niter: int = 25,
    precision: str = "highest",
) -> jax.Array:
    """M independent Lloyd k-means runs in one device program.

    Used for PQ codebook training (ProductQuantizer::train runs one k-means
    per subspace, ProductQuantizer.cpp) — batching all subspaces into single
    MXU calls removes M*niter host round-trips. Empty clusters keep their
    previous centroid (the reference splits big clusters instead,
    ClusteringHelpers.h:85; with k << n the difference is negligible for
    codebooks and keeps the loop host-sync-free).
    """
    M, n, dsub = xs.shape
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else None
    x_norms = jnp.sum(jnp.square(xs), axis=-1)  # [M, n]

    def iter_body(centroids, _):
        c_norms = jnp.sum(jnp.square(centroids), axis=-1)  # [M, k]
        ip = jnp.einsum(
            "mnd,mkd->mnk",
            xs,
            centroids,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        d2 = x_norms[..., None] + c_norms[:, None, :] - 2.0 * ip
        assign = jnp.argmin(d2, axis=-1)  # [M, n]
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # [M, n, k]
        sums = jnp.einsum(
            "mnk,mnd->mkd",
            onehot,
            xs,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        counts = jnp.sum(onehot, axis=1)  # [M, k]
        new_c = jnp.where(
            counts[..., None] > 0, sums / jnp.maximum(counts[..., None], 1.0), centroids
        )
        return new_c, None

    centroids, _ = jax.lax.scan(iter_body, init, None, length=niter)
    return centroids
