"""Torch interop — analogue of contrib/torch_utils.py.

The reference monkey-patches every Index method so torch tensors work
transparently (contrib/torch_utils.py:149-846, using DLPack pointers).
Importing THIS module installs the same contract on faiss_tpu indexes:

    import faiss_tpu.contrib.torch_utils   # patches Index methods
    index.add(torch_tensor)                # accepted
    D, I = index.search(torch_queries, k)  # returns torch tensors

Torch CPU tensors convert zero-copy through numpy; outputs are converted
back to torch (matching the device of the query tensor) whenever any input
was a torch tensor. ``torch_to_jax`` uses DLPack for copy-free handoff into
jax where the backend allows it. Standalone helpers (torch_knn,
torch_pairwise_distances, torch Kmeans wrappers) mirror the reference's
contrib/torch/{clustering,quantization}.py surface.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

from ..base import Index


def _torch():
    import torch

    return torch


def is_torch(x) -> bool:
    return type(x).__module__.startswith("torch")


def torch_to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach()
        if t.device.type != "cpu":
            t = t.cpu()
        return t.numpy()
    return np.asarray(t)


def numpy_to_torch(a, like=None):
    torch = _torch()
    t = torch.from_numpy(np.ascontiguousarray(a))
    if like is not None and is_torch(like) and like.device.type != "cpu":
        t = t.to(like.device)
    return t


def torch_to_jax(t):
    """Copy-free torch->jax handoff via DLPack where supported."""
    import jax

    try:
        return jax.dlpack.from_dlpack(t)
    except Exception:
        return __import__("jax.numpy", fromlist=["asarray"]).asarray(
            torch_to_numpy(t)
        )


def jax_to_torch(a):
    torch = _torch()
    try:
        return torch.utils.dlpack.from_dlpack(a)
    except Exception:
        return torch.from_numpy(np.asarray(a))


# ---------------------------------------------------------------------------
# method patching (handle_torch_Index, reference torch_utils.py:149)
# ---------------------------------------------------------------------------


def _wrap_inputs_outputs(fn, output_arrays=True):
    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        any_torch = any(is_torch(a) for a in args) or any(
            is_torch(v) for v in kwargs.values()
        )
        ref = None
        if any_torch:
            ref = next(
                (a for a in list(args) + list(kwargs.values()) if is_torch(a)),
                None,
            )
            args = tuple(
                torch_to_numpy(a) if is_torch(a) else a for a in args
            )
            kwargs = {
                k: torch_to_numpy(v) if is_torch(v) else v
                for k, v in kwargs.items()
            }
        out = fn(self, *args, **kwargs)
        if any_torch and output_arrays:
            if isinstance(out, tuple):
                return tuple(
                    numpy_to_torch(o, ref)
                    if isinstance(o, np.ndarray)
                    else o
                    for o in out
                )
            if isinstance(out, np.ndarray):
                return numpy_to_torch(out, ref)
        return out

    wrapper._torch_wrapped = True
    return wrapper


_PATCHED_METHODS = (
    "train",
    "add",
    "add_with_ids",
    "search",
    "search_and_reconstruct",
    "assign",
    "reconstruct",
    "reconstruct_n",
    "reconstruct_batch",
    "sa_encode",
    "sa_decode",
)


def handle_torch_Index(cls=Index) -> None:
    """Monkey-patch Index methods to accept/return torch tensors
    (reference: handle_torch_Index, contrib/torch_utils.py). Every subclass
    override gets wrapped too (the reference has one SWIG class; here the
    hierarchy is Python, so the walk covers it)."""

    def patch_tree(c):
        for name in _PATCHED_METHODS:
            fn = c.__dict__.get(name)
            if fn is None or getattr(fn, "_torch_wrapped", False):
                continue
            setattr(c, name, _wrap_inputs_outputs(fn))
        for sub in c.__subclasses__():
            patch_tree(sub)

    patch_tree(cls)


# install on import, like the reference module
handle_torch_Index(Index)


# ---------------------------------------------------------------------------
# standalone wrappers (contrib/torch/{clustering,quantization}.py surface)
# ---------------------------------------------------------------------------


def torch_knn(xq, xb, k: int, metric=None):
    from ..extra import knn as knn_fn
    from ..metric import MetricType

    D, I = knn_fn(
        torch_to_numpy(xq),
        torch_to_numpy(xb),
        k,
        metric=metric if metric is not None else MetricType.L2,
    )
    return numpy_to_torch(D, xq), numpy_to_torch(I, xq)


def torch_pairwise_distances(xq, xb, metric=None):
    from ..extra import pairwise_distances
    from ..metric import MetricType

    D = pairwise_distances(
        torch_to_numpy(xq),
        torch_to_numpy(xb),
        metric=metric if metric is not None else MetricType.L2,
    )
    return numpy_to_torch(D, xq)


def torch_kmeans(x, k: int, niter: int = 25, **kwargs):
    """Torch-facing Kmeans (contrib/torch/clustering.py analogue):
    returns (centroids, assignment) as torch tensors."""
    from ..clustering import Kmeans

    km = Kmeans(x.shape[1], k, niter=niter, **kwargs)
    xn = torch_to_numpy(x)
    km.train(xn)
    _, I = km.assign(xn)
    return numpy_to_torch(km.centroids, x), numpy_to_torch(
        np.asarray(I).ravel(), x
    )


# back-compat helpers (round-1 API)
def search_with_torch(index, xq, k: int):
    D, I = index.search(torch_to_numpy(xq), k)
    return numpy_to_torch(D), numpy_to_torch(I)


def add_with_torch(index, xb):
    index.add(torch_to_numpy(xb))
