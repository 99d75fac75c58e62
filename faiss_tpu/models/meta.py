"""Composition / meta indexes — analogue of the reference's L3 layer:
IndexPreTransform.h, IndexIDMap.h, IndexRefine.h, IndexShards.h,
IndexReplicas.h, MetaIndexes.h.

On TPU the *performance* path for sharding/replication is mesh sharding
(parallel/sharded.py); these wrappers exist for API parity and for
host-composed indexes (e.g. sharding across independently built indexes),
merging results with the same k-select used everywhere else.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..base import Index
from ..metric import is_similarity_metric


def _merge_result_tables(D_list, I_list, k, largest):
    """Heap-merge of per-shard result tables
    (reference: IndexShards.h:84 merge_tables / extra_wrappers.merge_knn_results).

    argpartition to the k survivors first, then sort only those — O(n + k
    log k) per row instead of a full O(n log n) argsort over all shards'
    results."""
    D = np.concatenate(D_list, axis=1)
    I = np.concatenate(I_list, axis=1)
    key = -D if largest else D
    n = key.shape[1]
    if k < n:
        part = np.argpartition(key, k - 1, axis=1)[:, :k]
        key = np.take_along_axis(key, part, axis=1)
        D = np.take_along_axis(D, part, axis=1)
        I = np.take_along_axis(I, part, axis=1)
    order = np.argsort(key, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(D, order, axis=1), np.take_along_axis(I, order, axis=1)


class IndexPreTransform(Index):
    """Chain of VectorTransforms before an index (IndexPreTransform.h:25)."""

    def __init__(self, *args):
        # ctor forms: (index), (vt, index)
        if len(args) == 1:
            index = args[0]
            chain = []
        elif len(args) == 2:
            chain = [args[0]]
            index = args[1]
        else:
            raise TypeError("IndexPreTransform(vt?, index)")
        super().__init__(chain[0].d_in if chain else index.d, index.metric_type)
        self.index = index
        self.chain = chain
        self.own_fields = False
        self.is_trained = index.is_trained and all(t.is_trained for t in chain)

    def prepend_transform(self, vt) -> None:
        if vt.d_out != self.d:
            raise ValueError("transform d_out must match index input d")
        self.chain.insert(0, vt)
        self.d = vt.d_in
        self.is_trained = self.is_trained and vt.is_trained

    def apply_chain(self, x) -> np.ndarray:
        for vt in self.chain:
            x = vt.apply(x)
        return x

    def reverse_chain(self, x) -> np.ndarray:
        for vt in reversed(self.chain):
            x = vt.reverse_transform(x)
        return x

    def train(self, x) -> None:
        x = self._check_input(x)
        for vt in self.chain:
            if not vt.is_trained:
                vt.train(x)
            x = vt.apply(x)
        self.index.train(x)
        self.is_trained = True

    def add(self, x) -> None:
        from ..base import add_page_rows

        x = self._check_input(x)
        # page through the transform chain so neither the transform GEMM
        # nor the downstream add ever sees an unbounded batch
        page = add_page_rows(self.d)
        for s in range(0, len(x), page):
            self.index.add(self.apply_chain(x[s:s + page]))
        self.ntotal = self.index.ntotal

    def add_with_ids(self, x, ids) -> None:
        from ..base import add_page_rows

        x = self._check_input(x)
        ids = np.asarray(ids)
        page = add_page_rows(self.d)
        for s in range(0, len(x), page):
            self.index.add_with_ids(
                self.apply_chain(x[s:s + page]), ids[s:s + page]
            )
        self.ntotal = self.index.ntotal

    def search(self, x, k, *, params=None):
        return self.index.search(self.apply_chain(self._check_input(x)), k, params=params)

    def search_submit(self, x, k, *, params=None):
        # apply the transform chain on host, delegate the streaming handle
        return self.index.search_submit(
            self.apply_chain(self._check_input(x)), k, params=params
        )

    def search_collect(self, handle):
        return self.index.search_collect(handle)

    def range_search(self, x, radius, *, params=None):
        return self.index.range_search(
            self.apply_chain(self._check_input(x)), radius, params=params
        )

    def reset(self) -> None:
        self.index.reset()
        self.ntotal = 0

    def remove_ids(self, sel) -> int:
        n = self.index.remove_ids(sel)
        self.ntotal = self.index.ntotal
        return n

    def reconstruct(self, key):
        return self.reverse_chain(self.index.reconstruct(key)[None])[0]

    def reconstruct_n(self, n0, ni):
        return self.reverse_chain(self.index.reconstruct_n(n0, ni))

    def sa_code_size(self):
        return self.index.sa_code_size()

    def sa_encode(self, x):
        return self.index.sa_encode(self.apply_chain(self._check_input(x)))

    def sa_decode(self, codes):
        return self.reverse_chain(self.index.sa_decode(codes))

    def __getattr__(self, name):
        # forward runtime knobs (nprobe etc) to the wrapped index
        if name.startswith("_") or name in ("index", "chain"):
            raise AttributeError(name)
        return getattr(self.__dict__["index"], name)


class IndexIDMap(Index):
    """Arbitrary-id wrapper (reference: IndexIDMap.h:21)."""

    def __init__(self, index: Index):
        super().__init__(index.d, index.metric_type)
        self.index = index
        self.id_map = np.empty(0, np.int64)
        self.is_trained = index.is_trained
        self.own_fields = False

    def train(self, x) -> None:
        self.index.train(x)
        self.is_trained = True

    def add(self, x) -> None:
        raise RuntimeError("add_with_ids required for IndexIDMap")

    def add_with_ids(self, x, ids) -> None:
        ids = np.asarray(ids, np.int64).ravel()
        self.index.add(x)
        self.id_map = np.concatenate([self.id_map, ids])
        self.ntotal = self.index.ntotal

    def search(self, x, k, *, params=None):
        if params is not None and params.sel is not None:
            params = _TranslatedParams(params, self.id_map)
        D, I = self.index.search(x, k, params=params)
        I = np.where(I >= 0, self.id_map[np.maximum(I, 0)], -1)
        return D, I

    def range_search(self, x, radius, *, params=None):
        if params is not None and params.sel is not None:
            params = _TranslatedParams(params, self.id_map)
        res = self.index.range_search(x, radius, params=params)
        res.labels = np.where(res.labels >= 0, self.id_map[res.labels], -1)
        return res

    def reset(self) -> None:
        self.index.reset()
        self.id_map = np.empty(0, np.int64)
        self.ntotal = 0

    def remove_ids(self, sel) -> int:
        keep = ~sel.mask_for_ids(self.id_map)
        from ..base import IDSelectorArray

        removed = self.index.remove_ids(
            IDSelectorArray(np.nonzero(~keep)[0].astype(np.int64))
        )
        self.id_map = self.id_map[keep]
        self.ntotal = self.index.ntotal
        return removed


class _TranslatedParams:
    """Wrap SearchParameters so the selector sees external ids
    (reference: IDSelectorTranslated, IndexIDMap.cpp)."""

    def __init__(self, params, id_map):
        self.__dict__.update(vars(params))
        self.sel = _TranslatedSelector(params.sel, id_map)


class _TranslatedSelector:
    def __init__(self, sel, id_map):
        self.sel = sel
        self.id_map = id_map

    def mask_for_ids(self, ids):
        ids = np.asarray(ids, np.int64)
        ext = np.where(
            (ids >= 0) & (ids < len(self.id_map)),
            self.id_map[np.clip(ids, 0, max(len(self.id_map) - 1, 0))],
            -1,
        )
        return self.sel.mask_for_ids(ext)


class IndexIDMap2(IndexIDMap):
    """IDMap + reverse map for reconstruct (IndexIDMap.h:78)."""

    def reconstruct(self, key):
        pos = np.nonzero(self.id_map == key)[0]
        if len(pos) == 0:
            raise KeyError(f"id {key} not found")
        return self.index.reconstruct(int(pos[0]))

    def construct_rev_map(self):
        pass  # computed on the fly


class IndexRefine(Index):
    """Re-rank base-index candidates with a refinement index
    (reference: IndexRefine.h:24)."""

    def __init__(self, base_index: Index, refine_index: Index):
        super().__init__(base_index.d, base_index.metric_type)
        self.base_index = base_index
        self.refine_index = refine_index
        self.k_factor = 1.0
        self.is_trained = base_index.is_trained and refine_index.is_trained

    def train(self, x) -> None:
        self.base_index.train(x)
        self.refine_index.train(x)
        self.is_trained = True

    def add(self, x) -> None:
        import jax

        from ..base import add_page_rows, device_staging

        x = self._check_input(x)
        page = add_page_rows(self.d)
        if len(x) > page:  # bound the shared staging (kAddPageSize analogue)
            for s in range(0, len(x), page):
                self.add(x[s:s + page])
            return
        if len(x) >= 4096 and jax.default_backend() not in ("cpu",):
            # one H2D upload shared by the base add AND the refine storage;
            # with store_float16 the upload itself is fp16 (half the tunnel
            # bytes — encode-side effect is a 2^-11 rounding of the inputs)
            dt = (
                np.float16 if getattr(self, "store_float16", False) else None
            )
            with device_staging(x, dtype=dt):
                self.base_index.add(x)
                self.refine_index.add(x)
        else:
            self.base_index.add(x)
            self.refine_index.add(x)
        self.ntotal = self.base_index.ntotal

    def reset(self) -> None:
        self.base_index.reset()
        self.refine_index.reset()
        self.ntotal = 0

    def _fused_refined_nprobe(self, x, k, kc, params):
        """nprobe for the single-dispatch fused search+re-rank path, or
        None when that path is not engaged for this call."""
        from .flat import IndexFlat
        from .ivf_pq import IndexIVFPQ

        if not (
            isinstance(self.refine_index, IndexFlat)
            and isinstance(self.base_index, IndexIVFPQ)
            and self.base_index.big_batch_threshold
            and len(x) >= self.base_index.big_batch_threshold
            and self.base_index.by_residual
            and self.base_index.metric_type.name == "L2"
            and kc <= 128
            and (params is None or params.sel is None)
            and self.refine_index.ntotal
        ):
            return None
        import jax

        if jax.default_backend() in ("cpu",) and not getattr(
            self.base_index, "fused_interpret", False
        ):
            return None
        nprobe = self.base_index.nprobe
        if params is not None and getattr(params, "nprobe", 0):
            nprobe = params.nprobe
        return min(nprobe, self.base_index.nlist)

    def search_submit(self, x, k, *, params=None):
        """Non-blocking search dispatch (see Index.search_submit). When the
        fused big-batch path is engaged, every sub-batch program is enqueued
        and the handle's collect does the single packed read."""
        x = self._check_input(x)
        kc = max(k, int(round(k * self.k_factor)))
        nprobe = self._fused_refined_nprobe(x, k, kc, params)
        if nprobe is None:
            return ("eager", self.search(x, k, params=params))
        xb = self.refine_index._consolidate()
        return (
            "fused",
            self.base_index._sbbr_submit(
                x, k, kc, xb, nprobe,
                self.refine_index._norms,
                refine_sq=self._refine_sq(),
            ),
        )

    def _refine_sq(self):
        """(scale, off) device arrays when the refine store is SQ8 codes
        (decode = row * scale + off), else None."""
        fn = getattr(self.refine_index, "_sq_params", None)
        return fn() if fn is not None else None

    def search_collect(self, handle):
        tag, st = handle
        if tag == "eager":
            return st
        return self.base_index._sbbr_collect(st)

    def search(self, x, k, *, params=None):
        x = self._check_input(x)
        kc = max(k, int(round(k * self.k_factor)))
        largest = is_similarity_metric(self.metric_type)
        nq = len(x)

        from .flat import IndexFlat

        nprobe = self._fused_refined_nprobe(x, k, kc, params)
        if nprobe is not None:
            # single-dispatch fused search + re-rank (the base search
            # happens INSIDE this program — do not search twice)
            xb = self.refine_index._consolidate()
            return self.base_index._search_big_batch_refined(
                x, k, kc, xb, nprobe,
                self.refine_index._norms,
                refine_sq=self._refine_sq(),
            )

        _, Ic = self.base_index.search(x, kc, params=params)

        if isinstance(self.refine_index, IndexFlat) and self.refine_index.ntotal:
            # vectorized device re-rank (one gather + batched contraction)
            import jax.numpy as jnp

            from ..ops.distances import rerank_exact

            xb = self.refine_index._consolidate()
            sq = self._refine_sq()
            D, I = rerank_exact(
                jnp.asarray(x),
                xb,
                jnp.asarray(Ic.astype(np.int32)),
                k,
                metric=self.metric_type,
                sq_scale=None if sq is None else sq[0],
                sq_off=None if sq is None else sq[1],
            )
            D = np.asarray(D)
            I = np.asarray(I).astype(np.int64)
            if D.shape[1] < k:  # pad if kc < k (tiny indexes)
                pad = k - D.shape[1]
                fill = -np.inf if largest else np.inf
                D = np.pad(D, ((0, 0), (0, pad)), constant_values=fill)
                I = np.pad(I, ((0, 0), (0, pad)), constant_values=-1)
            return D, I

        D = np.full((nq, k), -np.inf if largest else np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        for q in range(nq):
            cands = Ic[q][Ic[q] >= 0]
            if len(cands) == 0:
                continue
            recon = np.stack(
                [self.refine_index.reconstruct(int(c)) for c in cands]
            )
            if largest:
                d = recon @ x[q]
                order = np.argsort(-d, kind="stable")[:k]
            else:
                d = ((recon - x[q]) ** 2).sum(1)
                order = np.argsort(d, kind="stable")[:k]
            D[q, : len(order)] = d[order]
            I[q, : len(order)] = cands[order]
        return D, I

    def reconstruct(self, key):
        return self.refine_index.reconstruct(key)


class IndexRefineFlat(IndexRefine):
    """Refine against exact vectors (IndexRefine.h:82).

    ``store_float16`` keeps the refine store (and its one-time upload) in
    fp16 — the GpuIndexFlatConfig.useFloat16 analogue (gpu/GpuIndexFlat.h):
    half the HBM and half the tunnel bytes at ~2^-11 rounding, immaterial
    for re-ranking a candidate set."""

    def __init__(
        self,
        base_index: Index,
        xb=None,
        store_float16: bool = False,
        store: str = "f32",
    ):
        from .flat import IndexFlat, IndexFlatSQ8

        if store_float16:
            store = "f16"
        if store == "sq8":
            # trained per-dim SQ8 store: 1 byte/dim — the only refine
            # layout that fits 100M x 96 on a 16 GB chip (Refine(SQ8))
            refine = IndexFlatSQ8(base_index.d, base_index.metric_type)
        elif store in ("f16", "f32"):
            refine = IndexFlat(base_index.d, base_index.metric_type)
            if store == "f16":
                refine.storage_dtype = np.float16
        else:
            raise ValueError(f"unknown refine store {store!r}")
        if xb is not None:
            refine.add(xb)
        super().__init__(base_index, refine)
        self.k_factor = 1.0
        self.store_float16 = store == "f16"
        self.store = store


class IndexShards(Index):
    """Vector-split sharding (reference: IndexShards.h:20).

    Queries fan out to all shards; results heap-merge. ``successive_ids``
    translates shard-local sequential ids into global ones at add time.
    """

    def __init__(self, d: int, threaded: bool = False, successive_ids: bool = True):
        # metric fixed on first add_shard
        self.shards: List[Index] = []
        self.threaded = threaded  # accepted for parity; fan-out is serial here
        self.successive_ids = successive_ids
        self._d = int(d)
        self._initialized = False
        self.own_indices = False

    def _init_from(self, index: Index):
        if not self._initialized:
            Index.__init__(self, self._d, index.metric_type)
            self._initialized = True

    def add_shard(self, index: Index) -> None:
        if index.d != self._d:
            raise ValueError("shard dimension mismatch")
        self._init_from(index)
        self.shards.append(index)
        self.ntotal = sum(s.ntotal for s in self.shards)
        self.is_trained = all(s.is_trained for s in self.shards)

    remove_shard = None  # reference has removeIndex; omitted (rarely used)

    def count(self) -> int:
        return len(self.shards)

    def at(self, i: int) -> Index:
        return self.shards[i]

    def train(self, x) -> None:
        for s in self.shards:
            s.train(x)
        self.is_trained = True

    def add(self, x) -> None:
        """Split batch evenly across shards (IndexShards::add_with_ids)."""
        x = self._check_input(x)
        n = len(x)
        ns = len(self.shards)
        at = 0
        for i, s in enumerate(self.shards):
            cnt = n // ns + (1 if i < n % ns else 0)
            if cnt == 0:
                continue
            s.add(x[at : at + cnt])
            at += cnt
        self.ntotal += n

    def search(self, x, k, *, params=None):
        x = self._check_input(x)
        largest = is_similarity_metric(self.metric_type)
        offsets = np.cumsum([0] + [s.ntotal for s in self.shards])[:-1]

        def one(i_s):
            i, s = i_s
            D, I = s.search(x, k, params=params)
            if self.successive_ids:
                I = np.where(I >= 0, I + offsets[i], -1)
            return D, I

        if self.threaded and len(self.shards) > 1:
            # fan out like the reference's threaded mode (IndexShards.h:29):
            # shard searches release the GIL in their device dispatches
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(len(self.shards)) as ex:
                results = list(ex.map(one, enumerate(self.shards)))
        else:
            results = [one(p) for p in enumerate(self.shards)]
        Ds = [r[0] for r in results]
        Is = [r[1] for r in results]
        return _merge_result_tables(Ds, Is, k, largest)

    def reset(self) -> None:
        for s in self.shards:
            s.reset()
        self.ntotal = 0


class IndexReplicas(Index):
    """Full replicas; queries partitioned across them (IndexReplicas.h:42)."""

    def __init__(self, d: int):
        self.replicas: List[Index] = []
        self._d = int(d)
        self._initialized = False

    def add_replica(self, index: Index) -> None:
        if not self._initialized:
            Index.__init__(self, self._d, index.metric_type)
            self._initialized = True
        self.replicas.append(index)
        self.ntotal = index.ntotal
        self.is_trained = index.is_trained

    def count(self) -> int:
        return len(self.replicas)

    def at(self, i: int) -> Index:
        return self.replicas[i]

    def train(self, x) -> None:
        for r in self.replicas:
            r.train(x)
        self.is_trained = True

    def add(self, x) -> None:
        for r in self.replicas:
            r.add(x)
        self.ntotal = self.replicas[0].ntotal if self.replicas else 0

    def search(self, x, k, *, params=None):
        x = self._check_input(x)
        nq = len(x)
        nr = len(self.replicas)
        largest = is_similarity_metric(self.metric_type)
        D = np.full((nq, k), -np.inf if largest else np.inf, np.float32)
        I = np.full((nq, k), -1, np.int64)
        at = 0
        for i, r in enumerate(self.replicas):
            cnt = nq // nr + (1 if i < nq % nr else 0)
            if cnt == 0:
                continue
            D[at : at + cnt], I[at : at + cnt] = r.search(
                x[at : at + cnt], k, params=params
            )
            at += cnt
        return D, I

    def reset(self) -> None:
        for r in self.replicas:
            r.reset()
        self.ntotal = 0


class IndexSplitVectors(Index):
    """Dimension-sliced composition, IP only (reference: MetaIndexes.h:24)."""

    def __init__(self, d: int, threaded: bool = False):
        from ..metric import MetricType

        super().__init__(d, MetricType.INNER_PRODUCT)
        self.threaded = threaded
        self.sub_indexes: List[Index] = []
        self.sum_d = 0

    def add_sub_index(self, index: Index) -> None:
        self.sub_indexes.append(index)
        self.sum_d += index.d
        self.ntotal = index.ntotal
        self.is_trained = all(s.is_trained for s in self.sub_indexes)

    def search(self, x, k, *, params=None):
        if self.sum_d != self.d:
            raise RuntimeError("sub-index dims must sum to d")
        x = self._check_input(x)
        nq = len(x)
        # exhaustive sum over sub-index scores requires k=ntotal partials;
        # reference uses k-NN on each split then sums via hash — here we
        # sum full distance tables (exact) since splits are IP-additive.
        total = np.zeros((nq, self.ntotal), np.float32)
        d0 = 0
        for s in self.sub_indexes:
            Dk, Ik = s.search(x[:, d0 : d0 + s.d], self.ntotal)
            part = np.zeros_like(total)
            np.put_along_axis(part, Ik.astype(np.int64), Dk, axis=1)
            total += part
            d0 += s.d
        order = np.argsort(-total, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(total, order, axis=1), order.astype(np.int64)


class IndexRandom(Index):
    """Deterministic random-result dummy index (MetaIndexes.h:55) — used in
    tests as a placeholder graph storage."""

    def __init__(self, d: int, ntotal: int = 0, seed: int = 1234):
        from ..metric import MetricType

        super().__init__(d, MetricType.L2)
        self.ntotal = int(ntotal)
        self.seed = seed

    def add(self, x) -> None:
        self.ntotal += len(x)

    def search(self, x, k, *, params=None):
        nq = len(np.atleast_2d(x))
        rs = np.random.RandomState(self.seed)
        I = rs.randint(0, max(self.ntotal, 1), size=(nq, k)).astype(np.int64)
        D = np.arange(k, dtype=np.float32)[None].repeat(nq, 0)
        return D, I

    def reconstruct(self, key):
        rs = np.random.RandomState(self.seed + int(key))
        return rs.rand(self.d).astype(np.float32)


class IndexShardsIVF(IndexShards):
    """IVF shards sharing ONE coarse quantizer (reference:
    IndexShardsIVF.h:19): coarse assignment is computed once and
    search_preassigned dispatches to the shards holding the lists.

    The mesh-native form is parallel/sharded.ShardedIVF; this host-composed
    variant covers heterogeneous or separately-built shards.
    """

    def __init__(self, quantizer, d: int, nlist: int, nprobe: int = 1):
        super().__init__(d)
        self.quantizer = quantizer
        self.nlist = int(nlist)
        self.nprobe = nprobe

    def add_shard(self, index) -> None:
        from .ivf import IndexIVF

        if not isinstance(index, IndexIVF):
            raise TypeError("IndexShardsIVF shards must be IndexIVF")
        if index.nlist != self.nlist:
            raise ValueError("shard nlist mismatch")
        super().add_shard(index)

    def search(self, x, k, *, params=None):
        x = self._check_input(x)
        nprobe = self.nprobe
        if params is not None and getattr(params, "nprobe", 0):
            nprobe = params.nprobe
        coarse_dis, assign = self.quantizer.search(x, nprobe)
        largest = is_similarity_metric(self.metric_type)
        Ds, Is = [], []
        for s in self.shards:
            D, I = s.search_preassigned(x, k, assign, coarse_dis, params=params)
            Ds.append(D)
            Is.append(I)
        return _merge_result_tables(Ds, Is, k, largest)
