"""Invlist-major batched IVF search
(analogue of contrib/big_batch_search.py:23 big_batch_search).

The reference reorders computation invlist-major for huge query batches.
On TPU the same effect comes from scoring each list once against all queries
that probe it. The (query, probe) pairs are sorted by list ONCE up front
(CSR over the probe matrix — the reference's own trick), as are the stored
codes, so the per-list work is two O(1) slice lookups instead of an
O(nq * nprobe + ntotal) rescan per list.
"""

from __future__ import annotations

import numpy as np


def _csr_by_value(values: np.ndarray, n_bins: int):
    """Sort ``values`` ascending and return (order, starts) so that
    ``order[starts[v]:starts[v+1]]`` lists the positions holding ``v``."""
    order = np.argsort(values, kind="stable")
    starts = np.searchsorted(values[order], np.arange(n_bins + 1))
    return order, starts


def big_batch_search(index_ivf, xq, k: int, verbose: int = 0,
                     checkpoint_path=None, checkpoint_every: int = 64):
    """List-major search: returns (D, I) identical to index.search up to
    tie order."""
    from ..metric import MetricType

    xq = np.ascontiguousarray(xq, np.float32)
    nq = len(xq)
    nprobe = index_ivf.nprobe
    _, probes = index_ivf.quantizer.search(xq, nprobe)
    is_l2 = index_ivf.metric_type == MetricType.L2
    qn = (xq**2).sum(1) if is_l2 else None

    D = np.full((nq, k), np.inf, np.float32)
    I = np.full((nq, k), -1, np.int64)

    # ONE sort of the (query, probe) pairs by list id + ONE sort of the
    # stored codes by list id; every list then reads its probing queries
    # and its codes as contiguous slices.
    listnos = index_ivf._listnos_host
    pair_order, pair_starts = _csr_by_value(
        probes.ravel().astype(np.int64), index_ivf.nlist
    )
    pair_q = (pair_order // nprobe).astype(np.int64)
    slot_order, slot_starts = _csr_by_value(
        listnos.astype(np.int64), index_ivf.nlist
    )

    start_list = 0
    if checkpoint_path is not None:
        import os

        if os.path.exists(checkpoint_path):
            with np.load(checkpoint_path) as z:
                D, I, start_list = z["D"], z["I"], int(z["next_list"])
            if verbose:
                print(f"resuming at list {start_list}")

    from ..callbacks import InterruptCallback

    for ln in range(start_list, index_ivf.nlist):
        InterruptCallback.check()
        qsel = pair_q[pair_starts[ln] : pair_starts[ln + 1]]
        slots = slot_order[slot_starts[ln] : slot_starts[ln + 1]]
        if len(qsel) == 0 or len(slots) == 0:
            continue
        recon = index_ivf.decode_vectors(
            index_ivf._codes_host[slots], listnos[slots]
        )
        xs = xq[qsel]
        if is_l2:
            d = (
                qn[qsel][:, None]
                + (recon**2).sum(1)[None, :]
                - 2.0 * (xs @ recon.T)
            ).astype(np.float32)
        else:
            d = -(xs @ recon.T)
        ids = index_ivf._ids_host[slots]
        # row-wise merge of the incumbent top-k with this list's scores
        dc = np.concatenate([D[qsel], d], axis=1)
        ic = np.concatenate(
            [I[qsel], np.broadcast_to(ids, (len(qsel), len(ids)))], axis=1
        )
        if dc.shape[1] > k:
            part = np.argpartition(dc, k - 1, axis=1)[:, :k]
            dc = np.take_along_axis(dc, part, axis=1)
            ic = np.take_along_axis(ic, part, axis=1)
        order = np.argsort(dc, axis=1, kind="stable")
        D[qsel] = np.take_along_axis(dc, order, axis=1)
        I[qsel] = np.take_along_axis(ic, order, axis=1)
        if checkpoint_path is not None and (ln + 1) % checkpoint_every == 0:
            np.savez(checkpoint_path, D=D, I=I, next_list=ln + 1)
            if verbose:
                print(f"checkpointed at list {ln + 1}")
    if not is_l2:
        D = -D
    return D, I
