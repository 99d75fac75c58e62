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
