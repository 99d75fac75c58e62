"""k-selection primitives — the TPU replacement for the reference's heaps.

The reference implements k-select as binary heaps on CPU (faiss/utils/Heap.h:84)
and register-resident warp selects on GPU (faiss/gpu/utils/WarpSelectKernel.cuh).
Neither maps to TPU. Here k-select is expressed through XLA's sort /
PartialReduce machinery:

  - ``jax.lax.approx_min_k`` / ``approx_max_k`` lower to the TPU PartialReduce
    op (the "TPU-KNN at peak FLOP/s" approach) — with ``recall_target=1.0``
    they perform *exact* k-selection far faster than a full sort.
  - On CPU (tests) they fall back to exact variants automatically.

``topk`` below is the single entry point used by every index; streaming
(k-way-merge) variants live in :func:`merge_topk` and are used to combine
per-shard / per-chunk results (replacing HeapArray merges, Heap.h:478).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def topk(
    scores: jax.Array,
    k: int,
    *,
    largest: bool,
    exact: bool = True,
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """Top/bottom-k along the last axis.

    Returns (values, indices), values ordered best-first. ``exact=False``
    allows the TPU PartialReduce approximate path at the given recall target
    (useful as a first-pass pruner; final user-facing results use exact).
    """
    n = scores.shape[-1]
    k = min(k, n)
    rt = 1.0 if exact else recall_target
    if largest:
        return jax.lax.approx_max_k(scores, k, recall_target=rt)
    return jax.lax.approx_min_k(scores, k, recall_target=rt)


def merge_topk(
    vals_a: jax.Array,
    ids_a: jax.Array,
    vals_b: jax.Array,
    ids_b: jax.Array,
    k: int,
    *,
    largest: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Merge two top-k result sets (best-first not required on input).

    The streaming analogue of the reference's heap_addn + reorder
    (faiss/utils/Heap.h:373,427): concatenate candidate sets along the last
    axis, reselect k. Used for chunked brute-force scans and shard merges.
    """
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    ids = jnp.concatenate([ids_a, ids_b], axis=-1)
    v, pos = topk(vals, k, largest=largest)
    return v, jnp.take_along_axis(ids, pos, axis=-1)


def merge_topk_many(
    vals: jax.Array,
    ids: jax.Array,
    k: int,
    *,
    largest: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Merge results from S sources: vals/ids have shape [..., S, k'].

    The analogue of IndexShards::merge_tables (faiss/IndexShards.h:84) /
    merge_knn_results (python/extra_wrappers.py:294), as one reselect over
    the flattened candidate axis.
    """
    flat_vals = vals.reshape(*vals.shape[:-2], -1)
    flat_ids = ids.reshape(*ids.shape[:-2], -1)
    v, pos = topk(flat_vals, k, largest=largest)
    return v, jnp.take_along_axis(flat_ids, pos, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "largest"))
def sort_topk_results(vals, ids, k: int, largest: bool):
    """Exact final reorder of an (unordered) candidate set to best-first."""
    return merge_topk_many(vals[..., None, :], ids[..., None, :], k, largest=largest)
