"""ADSampling thresholds + PDX layout — analogue of faiss/impl/AdSampling.h
and faiss/impl/PdxLayout.h (the dimension-progressive pruning machinery
behind SuperKMeans; Gao & Long, ADSampling, SIGMOD'23).

The idea: after a random rotation, the partial squared distance over the
first p dims of a d-dim vector is ~ (p/d)*chi2_p-distributed relative to
the full distance, so a candidate can be pruned once its partial distance
exceeds ``full_bound * coeff[p]`` where coeff[p] is a chi-squared quantile.
On TPU the scan is two-phase (partial-dim GEMM screen -> exact re-rank of
survivors) rather than per-candidate early exit — same bound, batch form.
"""

from __future__ import annotations

from statistics import NormalDist
from typing import Tuple

import numpy as np

_NORMAL = NormalDist()


def normal_quantile(p: float) -> float:
    """Inverse standard normal CDF (AdSampling.h:18)."""
    return _NORMAL.inv_cdf(p)


def chi2_quantile_wh(p: int, alpha: float) -> float:
    """Chi-squared quantile via the Wilson-Hilferty cube-root approximation
    (AdSampling.h:21): chi2_p(alpha) ~= p * (1 - 2/(9p) + z*sqrt(2/(9p)))^3.
    Accurate to ~2% for p >= 16 and alpha away from 1."""
    z = normal_quantile(alpha)
    a = 2.0 / (9.0 * p)
    return p * (1.0 - a + z * np.sqrt(a)) ** 3


def precompute_ad_thresholds(d: int, epsilon: float) -> np.ndarray:
    """coeff[p] = chi2_quantile_wh(p, 1 - epsilon) / d for p in [1, d];
    coeff[0] reserved at 0 (AdSampling.h:26). Consumers needing the 2%
    tolerance should use p >= 16 (SuperKMeans d_prime_min)."""
    out = np.zeros(d + 1, np.float32)
    for p in range(1, d + 1):
        out[p] = chi2_quantile_wh(p, 1.0 - epsilon) / d
    return out


def pdxify(Y: np.ndarray, pdx_block_size: int) -> np.ndarray:
    """Row-major [k, d] -> PDX block-column-major (PdxLayout.h:19): within
    each dim-block, values are contiguous per DIM across all k rows."""
    k, d = Y.shape
    out = np.empty(k * d, Y.dtype)
    pos = 0
    for b0 in range(0, d, pdx_block_size):
        blk = Y[:, b0 : b0 + pdx_block_size]  # [k, bs]
        out[pos : pos + blk.size] = blk.T.ravel()
        pos += blk.size
    return out


def de_pdxify(Y_pdx: np.ndarray, k: int, d: int, pdx_block_size: int):
    """Inverse of pdxify (PdxLayout.h:28)."""
    out = np.empty((k, d), Y_pdx.dtype)
    pos = 0
    for b0 in range(0, d, pdx_block_size):
        bs = min(pdx_block_size, d - b0)
        blk = Y_pdx[pos : pos + k * bs].reshape(bs, k)
        out[:, b0 : b0 + bs] = blk.T
        pos += k * bs
    return out


def compute_partial_norms(X: np.ndarray, p: int) -> np.ndarray:
    """norms[i] = sum_{m<p} X[i, m]^2 (PdxLayout.h:36)."""
    return np.sum(np.square(X[:, :p].astype(np.float64)), axis=1).astype(
        np.float32
    )


def assign_adsampling(
    x: np.ndarray,
    centroids: np.ndarray,
    d_prime: int = 32,
    epsilon: float = 1e-3,
    keep: int = 64,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dimension-progressive nearest-centroid assignment (the SuperKMeans
    assign step, SuperKMeans.h:34, in batch two-phase form).

    Phase 1 computes partial distances on the first d_prime dims and keeps
    every centroid whose SCALED partial distance could still win:
        keep  iff  partial <= best_partial_estimate / coeff[d_prime]
    Phase 2 computes exact distances for the ``keep`` best-bounded
    candidates only. With epsilon small and ``keep`` sized for the data's
    distance concentration, the assignment equals exact argmin w.h.p.;
    returns (dist [n], assign [n] int32) with exact distances.
    """
    import jax
    import jax.numpy as jnp

    x = np.ascontiguousarray(x, np.float32)
    centroids = np.ascontiguousarray(centroids, np.float32)
    n, d = x.shape
    k = len(centroids)
    p = min(max(16, d_prime), d)
    coeff = float(precompute_ad_thresholds(d, epsilon)[p])

    xp = jnp.asarray(x[:, :p])
    cp = jnp.asarray(centroids[:, :p])
    part = (
        jnp.sum(xp**2, 1)[:, None]
        + jnp.sum(cp**2, 1)[None, :]
        - 2.0 * xp @ cp.T
    )  # [n, k] partial distances
    # partial/coeff is a high-confidence LOWER bound of the full distance
    # (chi2 tail): candidates whose bound already exceeds the best bound
    # cannot win; the batch form keeps the C best-bounded candidates
    # (>= all unpruned ones for any realistic epsilon)
    est = part / max(coeff, 1e-12)
    C = min(k, keep)
    _, cand = jax.lax.top_k(-est, C)  # [n, C]
    xc = jnp.asarray(x)
    cf = jnp.asarray(centroids)
    gathered = cf[cand]  # [n, C, d]
    full = (
        jnp.sum(xc**2, 1)[:, None]
        + jnp.sum(gathered**2, -1)
        - 2.0 * jnp.einsum("nd,ncd->nc", xc, gathered)
    )
    j = jnp.argmin(full, 1)
    dist = jnp.take_along_axis(full, j[:, None], 1)[:, 0]
    assign = jnp.take_along_axis(cand, j[:, None], 1)[:, 0]
    return (
        np.maximum(np.asarray(dist), 0.0),
        np.asarray(assign).astype(np.int32),
    )
