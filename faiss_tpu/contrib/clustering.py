"""Distributed-style clustering building blocks
(analogue of contrib/clustering.py: DatasetAssign + python kmeans)."""

from __future__ import annotations

import numpy as np

from ..extra import knn as knn_fn


class DatasetAssign:
    """Wraps a dataset for kmeans: get_subset / assign_to
    (reference: contrib/clustering.py DatasetAssign)."""

    def __init__(self, x):
        self.x = np.ascontiguousarray(x, np.float32)

    def count(self):
        return len(self.x)

    def dim(self):
        return self.x.shape[1]

    def get_subset(self, indices):
        return self.x[indices]

    def perform_search(self, centroids):
        return knn_fn(self.x, centroids, 1)

    def assign_to(self, centroids, weights=None):
        D, I = self.perform_search(centroids)
        I = I.ravel()
        n, d = self.x.shape
        k = len(centroids)
        sums = np.zeros((k, d), np.float32)
        if weights is None:
            np.add.at(sums, I, self.x)
            counts = np.bincount(I, minlength=k).astype(np.float32)
        else:
            np.add.at(sums, I, self.x * weights[:, None])
            counts = np.bincount(I, weights=weights, minlength=k).astype(np.float32)
        return I, D.ravel(), sums, counts


def kmeans(k, data: DatasetAssign, niter=25, seed=1234, verbose=False):
    """Pure-python Lloyd driver over a DatasetAssign
    (reference: contrib/clustering.py kmeans) — the building block the
    distributed recipe shards over workers."""
    rs = np.random.RandomState(seed)
    n = data.count()
    centroids = data.get_subset(rs.permutation(n)[:k]).copy()
    for it in range(niter):
        _, dis, sums, counts = data.assign_to(centroids)
        nz = counts > 0
        centroids[nz] = sums[nz] / counts[nz, None]
        # restart empty centroids on random points
        nempty = int((~nz).sum())
        if nempty:
            centroids[~nz] = data.get_subset(rs.permutation(n)[:nempty])
        if verbose:
            print(f"iter {it}: obj {dis.sum():.3f}, {nempty} empty")
    return centroids


def two_level_clustering(xt, nc1, nc2, rebalance=True, **kwargs):
    """Cluster to nc1 groups then nc2 total via per-group clustering
    (reference: contrib/clustering.py two_level_clustering) — the standard
    recipe for very large nlist."""
    from ..clustering import Clustering, ClusteringParameters

    cp = ClusteringParameters(niter=kwargs.get("niter", 25))
    clus1 = Clustering(xt.shape[1], nc1, cp)
    clus1.train(xt)
    _, assign = DatasetAssign(xt).perform_search(clus1.centroids)
    assign = assign.ravel()
    # share nc2 among groups proportionally to their size
    sizes = np.bincount(assign, minlength=nc1)
    if rebalance:
        quota = np.maximum(1, np.round(sizes / sizes.sum() * nc2).astype(int))
    else:
        quota = np.full(nc1, -(-nc2 // nc1))
    out = []
    for g in range(nc1):
        pts = xt[assign == g]
        kg = int(min(quota[g], max(1, len(pts))))
        if len(pts) == 0:
            continue
        if len(pts) <= kg:
            out.append(pts)
            continue
        cg = Clustering(xt.shape[1], kg, cp)
        cg.train(pts)
        out.append(cg.centroids)
    return np.concatenate(out)[:nc2]
