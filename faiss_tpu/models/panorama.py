"""IndexFlatPanorama — progressive-dimension pruned exact search
(reference: faiss/impl/Panorama.h:237, IndexFlat.h:103-183).

The reference orders storage by "levels" (dimension blocks) and prunes
candidates whose cumulative-norm lower bound exceeds the running k-th
distance. The TPU formulation is a two-phase batch program:

  phase 1: partial distances on the first-level dims for ALL candidates,
           tightened into a true lower bound with suffix norms:
               LB = ||q_1 - x_1||^2 + (||q_rest|| - ||x_rest||)^2
           (Cauchy-Schwarz), then k-select the best C = prune_factor*k
           candidates by LB — one small GEMM over d1 dims + select.
  phase 2: exact distances on the C survivors (gather + full-d contraction).

Exactness holds when every true top-k candidate survives phase 1; with the
default prune factor the screening is near-lossless (validated in tests),
and the certificate below detects at-risk queries: a query is certified iff
its k-th exact result <= the (C+1)-th smallest LB.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base import SearchParameters
from ..metric import MetricType
from ..ops.topk import merge_topk, topk
from .flat import IndexFlat
from .ivf import IndexIVFFlat


@functools.partial(jax.jit, static_argnames=("c", "db_chunk"))
def _panorama_screen(
    xq1, q_suf_norm, xb1, b_suf_norm, c, db_chunk=1 << 16
):
    """Top-c candidates by the level-1 lower bound. Returns (lb, ids)."""
    nq = xq1.shape[0]
    nb = xb1.shape[0]
    qn = jnp.sum(jnp.square(xq1), -1)
    cc = min(c, nb)

    nchunks = max(1, -(-nb // db_chunk))
    pad = nchunks * db_chunk - nb
    xbp = (jnp.pad(xb1, ((0, pad), (0, 0))) if pad else xb1).reshape(
        nchunks, db_chunk, -1
    )
    bsp = (jnp.pad(b_suf_norm, (0, pad)) if pad else b_suf_norm).reshape(
        nchunks, db_chunk
    )

    def body(carry, inputs):
        vals, ids = carry
        ci, xt, bs = inputs
        ip = jax.lax.dot_general(
            xq1, xt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        part = qn[:, None] + jnp.sum(jnp.square(xt), -1)[None, :] - 2 * ip
        gap = q_suf_norm[:, None] - bs[None, :]
        lb = jnp.maximum(part, 0.0) + gap * gap
        col = jnp.arange(db_chunk, dtype=jnp.int32) + ci * db_chunk
        lb = jnp.where(col[None, :] < nb, lb, jnp.inf)
        cv, cp = topk(lb, min(cc, db_chunk), largest=False, exact=False)
        vals, ids = merge_topk(vals, ids, cv, col[cp], cc, largest=False)
        return (vals, ids), None

    init = (
        jnp.full((nq, cc), jnp.inf, jnp.float32),
        jnp.full((nq, cc), -1, jnp.int32),
    )
    (vals, ids), _ = jax.lax.scan(
        body, init, (jnp.arange(nchunks), xbp, bsp)
    )
    return vals, ids


class IndexFlatPanorama(IndexFlat):
    """reference: IndexFlat.h:103 IndexFlatPanorama (levels + pruning)."""

    def __init__(self, d: int, num_levels: int = 4, metric=MetricType.L2):
        if metric != MetricType.L2:
            raise ValueError("Panorama pruning is defined for L2")
        super().__init__(d, metric)
        self.num_levels = int(num_levels)  # level-1 width = d / num_levels
        self.prune_factor = 32  # candidates kept = prune_factor * k
        self._pan = None

    def _consolidate(self):
        xb = super()._consolidate()
        if xb is not None and self._pan is None:
            d1 = max(1, self.d // self.num_levels)
            host = np.asarray(xb)
            self._pan = {
                "d1": d1,
                "xb1": jnp.asarray(host[:, :d1]),
                "b_suf": jnp.asarray(
                    np.linalg.norm(host[:, d1:], axis=1).astype(np.float32)
                ),
            }
        return xb

    def add(self, x):
        super().add(x)
        self._pan = None

    def reset(self):
        super().reset()
        self._pan = None

    def search(self, x, k: int, *, params: Optional[SearchParameters] = None):
        x = self._check_input(x)
        if (
            (params is not None and params.sel is not None)
            or self.ntotal <= self.prune_factor * k
        ):
            return super().search(x, k, params=params)
        xb = self._consolidate()
        pan = self._pan
        d1 = pan["d1"]
        from ..ops.distances import rerank_exact

        nq = len(x)
        c = min(self.prune_factor * k, self.ntotal - 1)
        xq1 = jnp.asarray(x[:, :d1])
        q_suf = jnp.asarray(
            np.linalg.norm(x[:, d1:], axis=1).astype(np.float32)
        )
        # screen c+1 so the (c+1)-th smallest LB certifies exactness:
        # every non-kept candidate has LB >= lbv[:, c], so if the k-th
        # exact distance <= lbv[:, c] no true top-k candidate was pruned
        # (the reference maintains the equivalent bound incrementally,
        # impl/Panorama.h:237).
        lbv, cand = _panorama_screen(
            xq1, q_suf, pan["xb1"], pan["b_suf"], c + 1
        )
        D, I = rerank_exact(jnp.asarray(x), xb, cand[:, :c], k)
        D = np.array(D)
        I = np.array(I).astype(np.int64)
        uncertified = np.where(D[:, k - 1] > np.asarray(lbv[:, c]))[0]
        if len(uncertified):
            Df, If = super().search(x[uncertified], k, params=params)
            D[uncertified] = Df
            I[uncertified] = If
        return D, I


class IndexIVFFlatPanorama(IndexIVFFlat):
    """IVF-Flat with progressive-dimension pruned list scans
    (reference: faiss/IndexIVFFlatPanorama.h:39, arXiv:2510.00566).

    TPU formulation: the level-1 lower bound

        LB = ||q_1 - x_1||^2 + (||q_rest|| - ||x_rest||)^2

    is EXACTLY the L2 distance between the (d1+1)-dim augmented vectors
    [x_1, ||x_rest||] and [q_1, ||q_rest||], so phase 1 is the standard
    IVF-flat scan kernel on augmented codes (d/num_levels + 1 dims instead
    of d — the dimension-pruning win), selecting C = prune_factor*k
    candidates; phase 2 re-ranks them exactly. A query is certified exact
    (w.r.t. its probed lists) iff its k-th exact distance <= its (C+1)-th
    smallest lower bound; uncertified rows fall back to the full-dimension
    scan, matching the reference's exactness (impl/Panorama.h:237).
    """

    def __init__(self, quantizer, d: int, nlist: int, n_levels: int = 4,
                 metric=MetricType.L2):
        if metric != MetricType.L2:
            raise ValueError("Panorama pruning is defined for L2")
        super().__init__(quantizer, d, nlist, metric)
        self.n_levels = int(n_levels)
        self.prune_factor = 32

    def _stage_codes(self, slot_ids, lengths, max_len, sorted_ln, ranks, order):
        dev = super()._stage_codes(
            slot_ids, lengths, max_len, sorted_ln, ranks, order
        )
        d1 = max(1, self.d // self.n_levels)
        aug = np.zeros((self.nlist, max_len, d1 + 1), np.float32)
        if self.ntotal:
            host = self._codes_host[order]
            aug[sorted_ln, ranks, :d1] = host[:, :d1]
            aug[sorted_ln, ranks, d1] = np.linalg.norm(host[:, d1:], axis=1)
        dev["aug"] = jnp.asarray(aug)
        dev["aug_norms"] = jnp.sum(jnp.square(dev["aug"]), axis=-1)
        dev["d1"] = d1
        return dev

    def search(self, x, k: int, *, params: Optional[SearchParameters] = None):
        x = self._check_input(x)
        self._check_trained()
        nprobe = self.nprobe
        sel = params.sel if params is not None else None
        if params is not None and getattr(params, "nprobe", 0):
            nprobe = params.nprobe
        nprobe = min(max(1, nprobe), self.nlist)
        c = self.prune_factor * k
        if sel is not None or self.ntotal == 0 or self.ntotal <= c:
            return super().search(x, k, params=params)

        from ..base import query_buckets
        from ..ops.distances import rerank_exact
        from ..ops.ivf_ops import ivf_flat_scan

        dev = self._build_device()
        d1 = dev["d1"]
        xb_dev = jnp.asarray(self._codes_host)
        nq = len(x)
        D = np.full((nq, k), np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        for start, padded, real in query_buckets(nq):
            xq = x[start : start + real]
            if padded != real:
                xq = np.pad(xq, ((0, padded - real), (0, 0)))
            coarse_dis, probes = self._coarse_search(xq, nprobe)
            aug_q = np.concatenate(
                [xq[:, :d1], np.linalg.norm(xq[:, d1:], axis=1)[:, None]],
                axis=1,
            ).astype(np.float32)
            # phase 1: lower-bound scan in d1+1 dims, keep C+1 for the
            # exactness certificate
            lbv, slots = ivf_flat_scan(
                jnp.asarray(aug_q),
                probes,
                dev["aug"],
                dev["slot_ids"],
                dev["lengths"],
                c + 1,
                metric=self.metric_type,
                code_norms=dev["aug_norms"],
            )
            # phase 2: exact re-rank of the top C
            dd, ss = rerank_exact(
                jnp.asarray(xq), xb_dev, slots[:, :c], k
            )
            dd = np.array(dd[:real])
            ss = np.array(ss[:real])
            thresh = np.asarray(lbv[:real, c])
            kth = dd[:, k - 1] if dd.shape[1] >= k else dd[:, -1]
            uncert = np.where(
                np.isfinite(thresh) & (kth > thresh)
            )[0]
            if len(uncert):
                Df, If = super().search(
                    x[start + uncert], k, params=params
                )
                dd[uncert] = Df
                # super().search returns ids, not slots: mark via ids below
                ss[uncert] = -2  # sentinel: already id-resolved
                ids_f = If
            D[start : start + real] = dd[:, :k]
            ids = np.where(
                ss[:, :k] >= 0, self._ids_host[np.maximum(ss[:, :k], 0)], -1
            )
            if len(uncert):
                ids[uncert] = ids_f
            I[start : start + real] = ids
        return D, I
