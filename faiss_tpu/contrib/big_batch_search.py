"""Invlist-major batched IVF search
(analogue of contrib/big_batch_search.py:23 big_batch_search).

The reference reorders computation invlist-major for huge query batches.
On TPU the same effect comes from scoring each list once against all queries
that probe it; this implementation processes lists in order, computing
distances for the probing queries only, with optional checkpointing.
"""

from __future__ import annotations

import numpy as np


def big_batch_search(index_ivf, xq, k: int, verbose: int = 0,
                     checkpoint_path=None, checkpoint_every: int = 64):
    """List-major search: returns (D, I) identical to index.search up to
    tie order."""
    from ..metric import MetricType

    xq = np.ascontiguousarray(xq, np.float32)
    nq = len(xq)
    nprobe = index_ivf.nprobe
    _, probes = index_ivf.quantizer.search(xq, nprobe)

    D = np.full((nq, k), np.inf, np.float32)
    I = np.full((nq, k), -1, np.int64)
    listnos = index_ivf._listnos_host
    start_list = 0

    if checkpoint_path is not None:
        import os

        if os.path.exists(checkpoint_path):
            with np.load(checkpoint_path) as z:
                D, I, start_list = z["D"], z["I"], int(z["next_list"])
            if verbose:
                print(f"resuming at list {start_list}")

    for ln in range(start_list, index_ivf.nlist):
        qsel = np.nonzero((probes == ln).any(axis=1))[0]
        slots = np.nonzero(listnos == ln)[0]
        if len(qsel) == 0 or len(slots) == 0:
            continue
        recon = index_ivf.decode_vectors(
            index_ivf._codes_host[slots], index_ivf._listnos_host[slots]
        )
        if index_ivf.metric_type == MetricType.L2:
            d = (
                ((xq[qsel][:, None, :] - recon[None]) ** 2).sum(-1)
            )
        else:
            d = -(xq[qsel] @ recon.T)
        ids = index_ivf._ids_host[slots]
        for row, q in enumerate(qsel):
            dc = np.concatenate([D[q], d[row]])
            ic = np.concatenate([I[q], ids])
            order = np.argsort(dc, kind="stable")[:k]
            D[q] = dc[order]
            I[q] = ic[order]
        if checkpoint_path is not None and (ln + 1) % checkpoint_every == 0:
            np.savez(checkpoint_path, D=D, I=I, next_list=ln + 1)
            if verbose:
                print(f"checkpointed at list {ln + 1}")
    if index_ivf.metric_type != MetricType.L2:
        D = -D
    return D, I
