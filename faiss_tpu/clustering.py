"""k-means clustering — the analogue of faiss/Clustering.{h,cpp}.

Keeps the reference's training semantics (Clustering::train_encoded,
Clustering.cpp:60): NaN checks, subsampling to <= k*max_points_per_centroid,
seeded init (RANDOM / KMEANS_PLUS_PLUS / AFK_MC2), niter Lloyd iterations with
empty-cluster splitting (split_clusters, impl/ClusteringHelpers.h:85), nredo
restarts keeping the best objective, spherical / int_centroids /
frozen-centroid options, and per-iteration stats. The hot loop runs on TPU
via ops/kmeans_ops.kmeans_assign_update.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

EPS = 1.0 / 1024.0  # centroid-split perturbation (ClusteringHelpers.h:99)


@dataclass
class ClusteringIterationStats:
    """Per-iteration stats (reference: Clustering.h:82)."""

    obj: float
    time: float
    time_search: float
    imbalance_factor: float
    nsplit: int


@dataclass
class ClusteringParameters:
    """Training knobs (reference: Clustering.h:26-77)."""

    niter: int = 25
    nredo: int = 1
    verbose: bool = False
    spherical: bool = False
    int_centroids: bool = False
    update_index: bool = True  # kept for API parity; always true here
    frozen_centroids: bool = False
    min_points_per_centroid: int = 39
    max_points_per_centroid: int = 256
    seed: int = 1234
    decode_block_size: int = 32768
    check_input_data_for_NaNs: bool = True
    init_method: str = "random"  # random | kmeans++ | afkmc2
    # (reference init enum: Clustering.h:63-72 / ClusteringInitialization.h)


def imbalance_factor(counts: np.ndarray) -> float:
    """n * sum(c^2) / (sum c)^2 (reference: utils/utils.cpp imbalance_factor)."""
    tot = counts.sum()
    if tot == 0:
        return float("nan")
    return float(len(counts) * (counts.astype(np.float64) ** 2).sum() / tot**2)


def _afk_mc2_init(
    x: np.ndarray, k: int, rs: np.random.RandomState, chain_length: int = 200
) -> np.ndarray:
    """AFK-MC^2 seeding (reference: impl/ClusteringInitialization.cpp,
    Bachem et al. NeurIPS'16): approximates k-means++ with a Metropolis
    chain over a mixture proposal q = 0.5 d(x,c1)/sum + 0.5/n, avoiding the
    full distance update per pick."""
    n = len(x)
    centroids = np.empty((k, x.shape[1]), np.float32)
    centroids[0] = x[rs.randint(n)]
    d1 = ((x - centroids[0]) ** 2).sum(1)
    q = 0.5 * d1 / max(d1.sum(), 1e-30) + 0.5 / n
    cum = np.cumsum(q)
    for i in range(1, k):
        cand = np.searchsorted(cum, rs.rand(chain_length))
        cand = np.minimum(cand, n - 1)
        # distances of the chain candidates to current centroids
        dc = ((x[cand][:, None, :] - centroids[None, :i, :]) ** 2).sum(-1).min(1)
        cur = cand[0]
        cur_d = dc[0]
        for j in range(1, chain_length):
            a = (dc[j] * q[cur]) / max(cur_d * q[cand[j]], 1e-30)
            if a >= 1 or rs.rand() < a:
                cur, cur_d = cand[j], dc[j]
        centroids[i] = x[cur]
    return centroids


def _kmeans_pp_init(x: np.ndarray, k: int, rs: np.random.RandomState) -> np.ndarray:
    """k-means++ seeding (reference: impl/ClusteringInitialization.cpp).

    Distance updates run vectorized on host numpy; n here is already
    subsampled to <= 256k points so this is cheap.
    """
    n = len(x)
    centroids = np.empty((k, x.shape[1]), dtype=np.float32)
    centroids[0] = x[rs.randint(n)]
    d2 = ((x - centroids[0]) ** 2).sum(1)
    for i in range(1, k):
        probs = d2 / max(d2.sum(), 1e-30)
        centroids[i] = x[rs.choice(n, p=probs)]
        d2 = np.minimum(d2, ((x - centroids[i]) ** 2).sum(1))
    return centroids


class Clustering:
    """Lloyd's k-means (reference: faiss/Clustering.h:95)."""

    def __init__(self, d: int, k: int, cp: Optional[ClusteringParameters] = None):
        self.d = int(d)
        self.k = int(k)
        self.cp = cp or ClusteringParameters()
        # mirror parameters as attributes for faiss-style access
        for name, val in vars(self.cp).items():
            setattr(self, name, val)
        self.centroids: Optional[np.ndarray] = None
        self.iteration_stats: List[ClusteringIterationStats] = []

    # -- data preparation (Clustering.cpp:107 subsample_training_set) -------
    def _prepare(self, x: np.ndarray, weights, rs):
        n = len(x)
        if self.cp.check_input_data_for_NaNs and not np.isfinite(x).all():
            raise ValueError("input contains NaN or Inf")
        if n < self.k:
            raise ValueError(f"need at least k={self.k} points, got {n}")
        max_n = self.k * self.cp.max_points_per_centroid
        if n > max_n:
            perm = rs.permutation(n)[:max_n]
            x = x[perm]
            weights = weights[perm] if weights is not None else None
            if self.verbose:
                print(f"Sampling a subset of {max_n} / {n} for training")
        elif n < self.k * self.cp.min_points_per_centroid and self.verbose:
            print(
                f"WARNING clustering {n} points to {self.k} centroids: please "
                f"provide at least {self.k * self.cp.min_points_per_centroid} "
                "training points"
            )
        return x, weights

    def _init_centroids(self, x: np.ndarray, rs) -> np.ndarray:
        if self.centroids is not None and len(self.centroids) == self.k:
            return np.array(self.centroids, dtype=np.float32)  # warm start
        if self.cp.init_method == "kmeans++":
            c = _kmeans_pp_init(x, self.k, rs)
        elif self.cp.init_method == "afkmc2":
            c = _afk_mc2_init(x, self.k, rs)
        else:
            perm = rs.permutation(len(x))[: self.k]
            c = x[perm].astype(np.float32).copy()
        return c

    @staticmethod
    def _split_clusters(centroids, counts, rs):
        """Re-seed empty clusters by splitting big ones
        (reference: impl/ClusteringHelpers.h:85 split_clusters)."""
        k = len(centroids)
        nsplit = 0
        n = counts.sum()
        for ci in np.nonzero(counts == 0)[0]:
            # probabilistic pick proportional to count - 1
            probs = np.maximum(counts - 1, 0).astype(np.float64)
            probs /= max(probs.sum(), 1e-30)
            cj = rs.choice(k, p=probs)
            centroids[ci] = centroids[cj]
            centroids[ci] *= 1 + EPS
            centroids[cj] *= 1 - EPS
            counts[ci] = counts[cj] // 2
            counts[cj] -= counts[ci]
            nsplit += 1
        del n
        return nsplit

    def _postprocess(self, centroids: np.ndarray) -> np.ndarray:
        if self.cp.spherical:
            norms = np.linalg.norm(centroids, axis=1, keepdims=True)
            centroids = centroids / np.maximum(norms, 1e-30)
        if self.cp.int_centroids:
            centroids = np.round(centroids)
        return centroids

    # -- training (Clustering.cpp:47 / train_encoded:60) ---------------------
    def train(self, x, weights=None) -> float:
        """Lloyd's k-means. The WHOLE niter loop runs as one device program
        (ops/kmeans_ops.kmeans_fused_loop — assignment GEMM in bf16 hi/lo +
        fused one-hot update + on-device empty-cluster splits), so training
        costs one dispatch + one stats readback per redo instead of ~3
        tunnel round-trips per iteration."""
        import jax

        # uint8 data (MNIST8m-class pixels) stays uint8 on DEVICE: every
        # value in [0,255] is exact in bf16, so the assignment GEMM is
        # f32-faithful from a 1-byte/dim store (4x less HBM than f32 —
        # the difference between fitting 8.1M x 784 on one chip or not).
        # kmeans++/afkmc2 inits do signed float arithmetic on x -> cast.
        u8 = (
            getattr(x, "dtype", None) == np.uint8
            and weights is None
            and self.cp.init_method == "random"
        )
        x = np.ascontiguousarray(x, dtype=np.uint8 if u8 else np.float32)
        if x.ndim != 2 or x.shape[1] != self.d:
            raise ValueError(f"expected [n, {self.d}] training data")
        if weights is not None:
            weights = np.ascontiguousarray(weights, dtype=np.float32)
        rs = np.random.RandomState(self.cp.seed)
        x, weights = self._prepare(x, weights, rs)
        xd = jnp.asarray(x)
        wd = jnp.asarray(weights) if weights is not None else None
        n = len(x)
        # chunk: cover small n in one scan step; cap the [chunk, k] distance
        # buffer for big runs (shape reuse: power-of-two buckets). The cap is
        # k-AWARE: the per-step transients ([chunk, k] f32 distances + the
        # bf16 one-hot update operand) must stay ~<=3 GB — at k=32768 an
        # uncapped 1<<17 chunk compiles to a 17 GB program (measured OOM on
        # the 16 GB v5e, Deep100M coarse train). k<=4096 keeps the historic
        # 1<<17 shape so the scored SIFT1M bench shapes are unaffected.
        chunk = 1 << max(10, min(17, (n - 1).bit_length()))
        kcap = (1 << 29) // max(128, self.k)  # ~2 GB f32 distance buffer
        kcap = 1 << max(10, kcap.bit_length() - 1)
        chunk = min(chunk, kcap)

        best_obj = np.inf
        best_centroids = None
        best_stats: List[ClusteringIterationStats] = []

        from .callbacks import InterruptCallback
        from .ops import kmeans_ops as _ko

        for redo in range(self.cp.nredo):
            InterruptCallback.check()
            t0 = time.time()
            centroids = self._init_centroids(x, rs)
            centroids = self._postprocess(centroids)
            key = jax.random.PRNGKey(self.cp.seed + 7919 * redo)
            # host-chained single-iteration programs: compiles fast in cold
            # processes (the whole-loop lax.scan program costs minutes of
            # remote compile), dispatches are async (no per-iter sync) and
            # all stats come home in one device_get
            cdev = jnp.asarray(centroids)
            per_iter = []
            for _ in range(self.cp.niter):
                key, sub = jax.random.split(key)
                cdev, obj_d, ss_d, tt_d, ns_d, counts_last = (
                    _ko.kmeans_fused_iter(
                        xd, cdev, sub, wd,
                        chunk=min(chunk, 1 << 17),
                        spherical=self.cp.spherical,
                        int_centroids=self.cp.int_centroids,
                        frozen=self.cp.frozen_centroids,
                        weighted=wd is not None,
                    )
                )
                per_iter.append((obj_d, ss_d, tt_d, ns_d))
            centroids = np.asarray(cdev)
            stats_host = jax.device_get(per_iter)
            objs = np.array([float(p[0]) for p in stats_host])
            sumsq = np.array([float(p[1]) for p in stats_host], np.float64)
            tots = np.array([float(p[2]) for p in stats_host], np.float64)
            nsplits = np.array([int(p[3]) for p in stats_host])
            t_total = time.time() - t0
            stats = [
                ClusteringIterationStats(
                    obj=float(objs[it]),
                    time=t_total / max(1, self.cp.niter),
                    time_search=t_total / max(1, self.cp.niter),
                    imbalance_factor=float(
                        self.k * sumsq[it] / max(tots[it] ** 2, 1e-30)
                    ),
                    nsplit=int(nsplits[it]),
                )
                for it in range(self.cp.niter)
            ]
            obj = float(objs[-1]) if self.cp.niter else np.inf
            if self.verbose:
                for it, s in enumerate(stats):
                    print(
                        f"  Iteration {it}: objective={s.obj:g} "
                        f"imbalance={s.imbalance_factor:.3f} "
                        f"nsplit={s.nsplit}"
                    )
            if obj < best_obj or best_centroids is None:
                best_obj, best_centroids, best_stats = obj, centroids, stats
            if self.cp.nredo > 1:
                self.centroids = None  # force re-init on next redo

        self.centroids = best_centroids
        self.iteration_stats = best_stats
        return best_obj


@dataclass
class SuperKMeansParameters(ClusteringParameters):
    """SuperKMeans knobs (reference: SuperKMeans.h:26-58)."""

    d_prime_fraction: float = 0.125
    pruning_low: float = 0.5
    pruning_high: float = 0.9
    d_prime_adjust: float = 0.20
    d_prime_min: int = 16
    epsilon: float = 1e-3  # ADSampling chi-squared tail mass
    keep: int = 64  # batch-form candidate width (see assign_adsampling)


class SuperKMeans:
    """k-means with ADSampling-pruned assignment
    (reference: faiss/SuperKMeans.{h,cpp}; Gao & Long SIGMOD'23).

    The reference prunes per (point, centroid) pair inside a PDX-laid-out
    scan: a centroid is discarded once its partial distance over the front
    d' dims exceeds tau * coeff[d'] (tau = exact distance to the current
    assignment). The TPU batch form does the same screen as a partial-dim
    GEMM and re-ranks the ``keep`` best-bounded centroids exactly — per
    point, full-d work drops from k·d to d'·k + keep·d, which is the win
    once k is large (coarse quantizers for 100M+ scale indexes).

    Keeps the reference's adaptive d' controller (SuperKMeans.cpp
    adapt_d_prime): observed pruning above the band shrinks d', below it
    grows d'; d' moves in buckets of 16 so the jitted assignment reuses
    compiled shapes. Data is randomly rotated up-front (the chi-squared
    bound's assumption); centroids are returned in the ORIGINAL basis.
    """

    def __init__(self, d: int, k: int, cp: Optional[SuperKMeansParameters] = None):
        self.d = int(d)
        self.k = int(k)
        self.cp = cp or SuperKMeansParameters()
        self.centroids: Optional[np.ndarray] = None
        self.iteration_stats: List[ClusteringIterationStats] = []
        self.pruning_fractions: List[float] = []

    def train(self, x, weights=None) -> float:
        import jax
        import jax.numpy as jnp

        from .ops.adsampling import precompute_ad_thresholds
        from .ops.kmeans_ops import kmeans_fused_loop, superkm_assign_update
        from .transforms import RandomRotationMatrix

        cp = self.cp
        x = np.ascontiguousarray(x, np.float32)
        rs = np.random.RandomState(cp.seed)
        base = Clustering(self.d, self.k, cp)
        x, weights = base._prepare(x, weights, rs)
        n = len(x)

        rot = RandomRotationMatrix(self.d, self.d)
        rot.train(x)
        xr = rot.apply(x)
        xd = jnp.asarray(xr)

        centroids = base._init_centroids(xr, rs)
        key = jax.random.PRNGKey(cp.seed)
        if weights is not None:
            # the ADSampling-pruned update has no weighted reduction:
            # weighted training runs the exact fused loop for ALL
            # iterations rather than silently dropping the weights after
            # iteration 0
            cdev, objs, _, _, _, _ = kmeans_fused_loop(
                xd, jnp.asarray(centroids), key, jnp.asarray(weights),
                niter=cp.niter, spherical=cp.spherical, weighted=True,
            )
            self.iteration_stats = [
                ClusteringIterationStats(
                    obj=float(o), time=0.0, time_search=0.0,
                    imbalance_factor=0.0, nsplit=0,
                )
                for o in np.asarray(objs)
            ]
            self.centroids = rot.reverse_transform(np.asarray(cdev))
            return float(np.asarray(objs)[-1])
        # iteration 0: one exact full-d Lloyd step (SuperKMeans.cpp:66
        # "iter 0 computes exact assignments"; seeds tau for the bound)
        cdev, objs0, _, _, _, _ = kmeans_fused_loop(
            xd, jnp.asarray(centroids), key, None,
            niter=1, spherical=cp.spherical, weighted=False,
        )
        coeffs = precompute_ad_thresholds(self.d, cp.epsilon)
        d_prime = max(cp.d_prime_min, int(self.d * cp.d_prime_fraction))
        d_prime = min(d_prime, max(cp.d_prime_min, self.d // 2))
        stats: List[ClusteringIterationStats] = []
        obj = float(objs0[0])
        t0 = time.time()
        tau = None
        for it in range(1, cp.niter):
            p = min(self.d, -(-d_prime // 16) * 16)  # 16-bucketed shapes
            key, sub = jax.random.split(key)
            cdev, tau, obj_dev, sumsq, tot, pruned = superkm_assign_update(
                xd, cdev, float(coeffs[p]), sub, p, min(cp.keep, self.k),
            )
            obj = float(obj_dev)
            frac = float(pruned)
            self.pruning_fractions.append(frac)
            # stay-in-band controller (SuperKMeans.cpp adapt_d_prime)
            if frac > cp.pruning_high:
                d_prime = max(
                    cp.d_prime_min,
                    int(round(d_prime * (1 - cp.d_prime_adjust))),
                )
            elif frac < cp.pruning_low:
                d_prime = min(
                    self.d, int(round(d_prime * (1 + cp.d_prime_adjust)))
                )
            stats.append(
                ClusteringIterationStats(
                    obj=obj,
                    time=(time.time() - t0) / it,
                    time_search=0.0,
                    imbalance_factor=float(
                        self.k * float(sumsq) / max(float(tot) ** 2, 1e-30)
                    ),
                    nsplit=0,
                )
            )
            if cp.verbose:
                print(
                    f"  SuperKMeans it {it}: obj={obj:g} d'={d_prime} "
                    f"pruned={frac:.3f}"
                )
        self.iteration_stats = stats
        self.centroids = rot.reverse_transform(np.asarray(cdev))
        return obj


def kmeans_clustering(d, k, x, niter=25, **kw) -> np.ndarray:
    """Simple entry point (reference: Clustering.h kmeans_clustering:436)."""
    cp = ClusteringParameters(niter=niter, **kw)
    clus = Clustering(d, k, cp)
    clus.train(x)
    return clus.centroids


class Kmeans:
    """sklearn-style wrapper (reference: python/extra_wrappers.py:484)."""

    def __init__(self, d: int, k: int, **kwargs):
        self.d, self.k = int(d), int(k)
        cp = ClusteringParameters()
        self.gpu = kwargs.pop("gpu", False)  # accepted for API parity
        for name, val in kwargs.items():
            if hasattr(cp, name):
                setattr(cp, name, val)
            else:
                raise TypeError(f"unknown Kmeans parameter {name!r}")
        self.cp = cp
        self.centroids: Optional[np.ndarray] = None
        self.obj: Optional[np.ndarray] = None
        self.iteration_stats = []

    def train(self, x, weights=None, init_centroids=None) -> float:
        clus = Clustering(self.d, self.k, self.cp)
        if init_centroids is not None:
            clus.centroids = np.ascontiguousarray(init_centroids, np.float32)
        best = clus.train(x, weights=weights)
        self.centroids = clus.centroids
        self.iteration_stats = clus.iteration_stats
        self.obj = np.array([s.obj for s in clus.iteration_stats])
        self.index = None  # built lazily in assign()
        return best

    def assign(self, x):
        from .models.flat import IndexFlatL2

        if self.index is None:
            self.index = IndexFlatL2(self.d)
            self.index.add(self.centroids)
        D, I = self.index.search(np.ascontiguousarray(x, np.float32), 1)
        return D.ravel(), I.ravel()


def kmeans1d(x, k: int):
    """Optimal 1-D k-means by dynamic programming
    (reference: impl/kmeans1d.{h,cpp} smawk-based; this is the O(k n^2) DP —
    exact, used for small n in SQ training).

    Returns (centroids [k], assignment [n]).
    """
    x = np.sort(np.asarray(x, np.float64).ravel())
    n = len(x)
    k = min(k, n)
    # prefix sums for O(1) interval cost
    ps = np.concatenate([[0.0], np.cumsum(x)])
    ps2 = np.concatenate([[0.0], np.cumsum(x * x)])

    def cost(i, j):  # cost of cluster over x[i:j]
        m = j - i
        if m <= 0:
            return 0.0
        s = ps[j] - ps[i]
        s2 = ps2[j] - ps2[i]
        return s2 - s * s / m

    INF = np.inf
    B = np.zeros((k + 1, n + 1), np.int64)
    # layer-by-layer DP, vectorized over (i, j) in column chunks:
    # D[c, j] = min_{c-1 <= i < j} D[c-1, i] + cost(i, j)
    ii = np.arange(n + 1)
    Dprev = np.full(n + 1, INF)
    Dprev[0] = 0.0
    chunk = max(1, (1 << 22) // (n + 1))  # ~32 MB of doubles per tile
    for c in range(1, k + 1):
        Dcur = np.full(n + 1, INF)
        lo = c - 1  # smallest admissible split point
        for j0 in range(1, n + 1, chunk):
            js = np.arange(j0, min(j0 + chunk, n + 1))
            m = js[None, :] - ii[lo:, None]
            s = ps[js][None, :] - ps[ii[lo:]][:, None]
            s2 = ps2[js][None, :] - ps2[ii[lo:]][:, None]
            with np.errstate(invalid="ignore", divide="ignore"):
                cst = s2 - s * s / m
            tot = np.where(m > 0, Dprev[lo:, None] + cst, INF)
            amin = np.argmin(tot, axis=0)
            Dcur[js] = tot[amin, np.arange(len(js))]
            B[c, js] = amin + lo
        Dprev = Dcur
    D = None  # layers folded into Dprev; only B is needed below
    # backtrack
    bounds = [n]
    for c in range(k, 0, -1):
        bounds.append(int(B[c, bounds[-1]]))
    bounds = bounds[::-1]
    centroids = np.empty(k, np.float32)
    assign = np.empty(n, np.int64)
    for c in range(k):
        i, j = bounds[c], bounds[c + 1]
        centroids[c] = x[i:j].mean() if j > i else (x[min(i, n - 1)])
        assign[i:j] = c
    return centroids, assign


class ProgressiveDimClusteringParameters(ClusteringParameters):
    """reference: Clustering.h ProgressiveDimClusteringParameters."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self.progressive_dim_steps = 10
        self.apply_pca = True


class ProgressiveDimClustering:
    """k-means over growing dimension prefixes
    (reference: Clustering.h ProgressiveDimClustering — used for OPQ-style
    training where early iterations on few dims give robust seeds).
    """

    def __init__(self, d: int, k: int, cp=None):
        self.d, self.k = int(d), int(k)
        self.cp = cp or ProgressiveDimClusteringParameters()
        self.centroids = None
        self.iteration_stats = []

    def train(self, x) -> float:
        x = np.ascontiguousarray(x, np.float32)
        if getattr(self.cp, "apply_pca", True):
            from .transforms import PCAMatrix

            pca = PCAMatrix(self.d, self.d)
            pca.train(x)
            x = pca.apply(x)
            self._pca = pca
        else:
            self._pca = None
        steps = self.cp.progressive_dim_steps
        centroids = None
        obj = np.inf
        for s in range(1, steps + 1):
            dprefix = max(1, int(round(self.d ** (s / steps))))
            dprefix = min(dprefix, self.d)
            cp = ClusteringParameters(niter=self.cp.niter // steps + 2,
                                      seed=self.cp.seed)
            clus = Clustering(dprefix, self.k, cp)
            if centroids is not None:
                clus.centroids = centroids[:, :dprefix].copy()
            obj = clus.train(x[:, :dprefix])
            grown = np.zeros((self.k, self.d), np.float32)
            grown[:, :dprefix] = clus.centroids
            if dprefix < self.d:
                # init remaining dims at the global mean (refined next step)
                grown[:, dprefix:] = x[:, dprefix:].mean(0)[None]
            centroids = grown
        if self._pca is not None:
            centroids = self._pca.reverse_transform(centroids)
        self.centroids = centroids
        return obj
