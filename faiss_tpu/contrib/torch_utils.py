"""Torch interop (analogue of contrib/torch_utils.py).

The reference monkey-patches every Index method for torch tensors via
DLPack. Here a single conversion shim suffices: ``torch_to_numpy`` /
``numpy_to_torch`` plus ``torch_knn`` convenience; all faiss_tpu entry
points accept anything ``np.asarray`` handles, and torch CPU tensors
convert zero-copy via numpy().
"""

from __future__ import annotations

import numpy as np


def torch_to_numpy(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def numpy_to_torch(a):
    import torch

    return torch.from_numpy(np.ascontiguousarray(a))


def search_with_torch(index, xq, k: int):
    D, I = index.search(torch_to_numpy(xq), k)
    return numpy_to_torch(D), numpy_to_torch(I)


def add_with_torch(index, xb):
    index.add(torch_to_numpy(xb))


def torch_knn(xq, xb, k: int, metric=None):
    from ..extra import knn as knn_fn
    from ..metric import MetricType

    D, I = knn_fn(
        torch_to_numpy(xq),
        torch_to_numpy(xb),
        k,
        metric=metric if metric is not None else MetricType.L2,
    )
    return numpy_to_torch(D), numpy_to_torch(I)
