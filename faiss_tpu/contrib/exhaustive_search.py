"""Streaming exact ground truth / big-db brute force
(analogue of contrib/exhaustive_search.py)."""

from __future__ import annotations

import numpy as np

from ..extra import ResultHeap, knn as knn_fn
from ..metric import MetricType


def knn_ground_truth(xq, db_iterator, k: int, metric=MetricType.L2):
    """Exact k-NN of xq against a database streamed in blocks
    (reference: contrib/exhaustive_search.py:15 knn_ground_truth).

    db_iterator yields [n_i, d] blocks; memory stays bounded by the block
    size (the DatasetAssign streaming pattern for >HBM databases).
    """
    xq = np.ascontiguousarray(xq, np.float32)
    keep_max = metric == MetricType.INNER_PRODUCT
    rh = ResultHeap(len(xq), k, keep_max=keep_max)
    i0 = 0
    for xbi in db_iterator:
        ni = len(xbi)
        Di, Ii = knn_fn(xq, xbi, min(k, ni), metric=metric)
        rh.add_result(Di, Ii + i0)
        i0 += ni
    rh.finalize()
    return rh.D, rh.I


def range_search_max_results(index, x, radius, max_results=1e9, min_results=0):
    """Range search with radius auto-adjustment
    (contrib/exhaustive_search.py:277) — shrinks the radius until the result
    count is below max_results."""
    while True:
        res = index.range_search(x, radius)
        nres = int(res.lims[-1])
        if nres <= max_results or nres <= min_results:
            return radius, res.lims, res.distances, res.labels
        radius *= 0.8 if index.metric_type == MetricType.L2 else 1.25
