"""Multi-chip distribution — the TPU-native replacement for the reference's
IndexShards / IndexReplicas / IndexShardsIVF composition (IndexShards.h:20,
IndexShardsIVF.h:19, gpu/GpuCloner.cpp multi-GPU sharding).

Instead of meta-index wrappers over device handles, distribution is a mesh
axis: the database (or the invlists) is sharded over ``Mesh("shard")``,
queries and coarse centroids are replicated, each chip runs the same local
scan kernel, and per-chip top-k candidates merge with
``jax.lax.all_gather`` + k-select over ICI (SURVEY.md §7). Multi-host runs
the identical program over DCN.

Chip-local compute reuses exactly the single-chip kernels
(ops/distances.knn, ops/ivf_ops.*), so sharded == unsharded up to tie order
(validated in tests on a virtual CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..metric import MetricType, is_similarity_metric
from ..ops import distances as dops
from ..ops import ivf_ops
from ..ops.topk import merge_topk_many


def make_mesh(n_devices: Optional[int] = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devs), (axis,))


def _shard_pad(x: np.ndarray, n_shards: int, fill=0) -> Tuple[np.ndarray, int]:
    """Pad axis 0 to a multiple of n_shards; returns (padded, per_shard)."""
    n = len(x)
    per = -(-n // n_shards)
    pad = per * n_shards - n
    if pad:
        pad_block = np.full((pad,) + x.shape[1:], fill, x.dtype)
        x = np.concatenate([x, pad_block])
    return x, per


class ShardedFlat:
    """Brute-force index sharded across a device mesh.

    The vector-split strategy of IndexShards (each chip owns a disjoint row
    range), with the heap-merge replaced by allgather + k-select.
    """

    def __init__(self, d: int, mesh: Mesh, metric=MetricType.L2):
        self.d = int(d)
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.metric_type = MetricType(metric)
        self.ntotal = 0
        self._xb = None  # device array sharded over rows
        self._host_parts = []

    @property
    def n_shards(self) -> int:
        return self.mesh.devices.size

    def add(self, x) -> None:
        x = np.ascontiguousarray(x, np.float32)
        self._host_parts.append(x)
        self.ntotal += len(x)
        self._xb = None

    def _consolidate(self):
        if self._xb is None:
            host = (
                np.concatenate(self._host_parts)
                if len(self._host_parts) > 1
                else self._host_parts[0]
            )
            padded, self._per_shard = _shard_pad(host, self.n_shards)
            sharding = jax.sharding.NamedSharding(self.mesh, P(self.axis, None))
            self._xb = jax.device_put(padded, sharding)
        return self._xb

    def search(self, x, k: int) -> Tuple[np.ndarray, np.ndarray]:
        x = np.ascontiguousarray(x, np.float32)
        xb = self._consolidate()
        D, I = _sharded_flat_search(
            self.mesh,
            jnp.asarray(x),
            xb,
            k,
            self.metric_type,
            self._per_shard,
            self.ntotal,
        )
        return np.asarray(D), np.asarray(I).astype(np.int64)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "metric", "per_shard", "ntotal"),
)
def _sharded_flat_search(mesh, xq, xb, k, metric, per_shard, ntotal):
    axis = mesh.axis_names[0]
    largest = is_similarity_metric(metric)

    def local(xq, xb_local):
        d, i = dops.knn(xq, xb_local, k, metric=metric)
        shard = jax.lax.axis_index(axis)
        gid = jnp.where(i >= 0, i + shard.astype(jnp.int32) * per_shard, -1)
        valid = jnp.logical_and(gid >= 0, gid < ntotal)
        d = jnp.where(valid, d, -jnp.inf if largest else jnp.inf)
        gid = jnp.where(valid, gid, -1)
        # [n_shards, nq, k] on every chip, then a replicated k-select merge
        dd = jax.lax.all_gather(d, axis)
        ii = jax.lax.all_gather(gid, axis)
        dd = jnp.moveaxis(dd, 0, 1)  # [nq, S, k]
        ii = jnp.moveaxis(ii, 0, 1)
        return merge_topk_many(dd, ii, k, largest=largest)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )(xq, xb)


class ShardedIVF:
    """IVF index with invlists sharded across chips — the IndexShardsIVF
    semantics (one shared coarse quantizer, lists partitioned;
    IndexShardsIVF.h:19) as mesh sharding.

    Built from a trained single-chip IndexIVF: the padded invlist arrays
    partition along the nlist axis; centroids replicate. Search: replicated
    coarse quantization, per-chip scan of locally-owned probed lists, then
    allgather + k-select.
    """

    def __init__(self, index, mesh: Mesh):
        from ..models.ivf import IndexIVF

        if not isinstance(index, IndexIVF):
            raise TypeError("ShardedIVF wraps a trained IndexIVF")
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.index = index
        self.metric_type = index.metric_type
        self.nprobe = index.nprobe
        n_shards = mesh.devices.size
        if index.nlist % n_shards:
            raise ValueError("nlist must be divisible by the shard count")
        self.lists_per_shard = index.nlist // n_shards

        dev = index._build_device()
        codes = np.asarray(dev["codes"])
        if codes.ndim != 3 or codes.dtype != np.float32:
            raise TypeError(
                "ShardedIVF requires a float-staged codec (IVFFlat / IVF-SQ /"
                " IVF-AQ decode to [nlist, max_len, d] floats); use"
                " ShardedIVFPQ for PQ codes"
            )
        shard_rows = jax.sharding.NamedSharding(mesh, P(self.axis, None, None))
        shard_rows2 = jax.sharding.NamedSharding(mesh, P(self.axis, None))
        shard_rows1 = jax.sharding.NamedSharding(mesh, P(self.axis))
        repl = jax.sharding.NamedSharding(mesh, P())
        self.codes = jax.device_put(np.asarray(dev["codes"]), shard_rows)
        self.slot_ids = jax.device_put(np.asarray(dev["slot_ids"]), shard_rows2)
        self.lengths = jax.device_put(np.asarray(dev["lengths"]), shard_rows1)
        cn = dev["code_norms"]
        if cn is None:  # IP metric: norms unused; keep a replicated dummy
            self.code_norms = jax.device_put(np.zeros((1, 1), np.float32), repl)
            self._has_norms = False
        else:
            self.code_norms = jax.device_put(np.asarray(cn), shard_rows2)
            self._has_norms = True
        self.centroids = jax.device_put(
            index.quantizer.vectors(), repl
        )
        self._ids_host = index._ids_host

    def search(self, x, k: int, nprobe: Optional[int] = None):
        x = np.ascontiguousarray(x, np.float32)
        nprobe = int(nprobe or self.nprobe)
        D, slots = _sharded_ivf_search(
            self.mesh,
            jnp.asarray(x),
            self.centroids,
            self.codes,
            self.slot_ids,
            self.lengths,
            self.code_norms,
            k,
            nprobe,
            self.metric_type,
            self.lists_per_shard,
            self._has_norms,
        )
        D = np.asarray(D)
        slots = np.asarray(slots)
        I = np.where(slots >= 0, self._ids_host[np.maximum(slots, 0)], -1)
        return D, I


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "k", "nprobe", "metric", "lists_per_shard", "has_norms",
    ),
)
def _sharded_ivf_search(
    mesh, xq, centroids, codes, slot_ids, lengths, code_norms, k, nprobe,
    metric, lists_per_shard, has_norms,
):
    axis = mesh.axis_names[0]
    largest = is_similarity_metric(metric)

    def local(xq, centroids, codes, slot_ids, lengths, code_norms):
        # replicated coarse quantization (the shared Level1Quantizer)
        _, probes = dops.knn(xq, centroids, nprobe, metric=metric)
        probes = probes.astype(jnp.int32)
        # keep only locally-owned lists, renumber to local ids
        shard = jax.lax.axis_index(axis).astype(jnp.int32)
        lo = shard * lists_per_shard
        local_probe = probes - lo
        owned = jnp.logical_and(local_probe >= 0, local_probe < lists_per_shard)
        local_probe = jnp.where(owned, local_probe, -1)
        d, slots = ivf_ops.ivf_flat_scan(
            xq,
            local_probe,
            codes,
            slot_ids,
            lengths,
            k,
            metric=metric,
            code_norms=code_norms if has_norms else None,
        )
        dd = jax.lax.all_gather(d, axis)
        ss = jax.lax.all_gather(slots, axis)
        dd = jnp.moveaxis(dd, 0, 1)
        ss = jnp.moveaxis(ss, 0, 1)
        return merge_topk_many(dd, ss, k, largest=largest)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),
            P(),
            P(axis, None, None),
            P(axis, None),
            P(axis),
            P(axis, None) if has_norms else P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(xq, centroids, codes, slot_ids, lengths, code_norms)


# ---------------------------------------------------------------------------
# data-parallel k-means (the distributed_kmeans recipe,
# benchs/distributed_ondisk/distributed_kmeans.py, as a mesh program)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("mesh",))
def sharded_kmeans_iter(mesh, x, centroids):
    """One Lloyd iteration with points sharded over the mesh.

    Each chip assigns its slice and computes partial (sums, counts, obj);
    ``psum`` over ICI reduces them — replacing the reference's
    client-side centroid reduction (contrib/clustering.py DatasetAssign).
    Returns replicated (sums [k,d], counts [k], obj).
    """
    from ..ops.kmeans_ops import kmeans_assign_update

    axis = mesh.axis_names[0]

    def local(x_local, centroids):
        sums, counts, obj, _ = kmeans_assign_update(x_local, centroids)
        sums = jax.lax.psum(sums, axis)
        counts = jax.lax.psum(counts, axis)
        obj = jax.lax.psum(obj, axis)
        return sums, counts, obj

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(x, centroids)


class ShardedIVFPQ:
    """IVF-PQ with invlists sharded across chips (the Deep100M-on-v5e-8
    north-star config): coarse centroids + query LUTs replicated, padded
    code arrays and term-2 tables sharded by list range, per-chip ADC scan,
    allgather + k-select merge.
    """

    def __init__(self, index, mesh: Mesh):
        from ..models.ivf_pq import IndexIVFPQ

        if not isinstance(index, IndexIVFPQ):
            raise TypeError("ShardedIVFPQ wraps a trained IndexIVFPQ")
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.index = index
        self.nprobe = index.nprobe
        self.metric_type = index.metric_type
        self.by_residual = bool(index.by_residual)
        n_shards = mesh.devices.size
        if index.nlist % n_shards:
            raise ValueError("nlist must be divisible by the shard count")
        self.lists_per_shard = index.nlist // n_shards

        dev = index._build_device()
        term2 = index._maybe_term2()  # None unless L2 by-residual
        rows3 = jax.sharding.NamedSharding(mesh, P(self.axis, None, None))
        rows2 = jax.sharding.NamedSharding(mesh, P(self.axis, None))
        rows1 = jax.sharding.NamedSharding(mesh, P(self.axis))
        repl = jax.sharding.NamedSharding(mesh, P())
        self.codes = jax.device_put(np.asarray(dev["codes"]), rows3)
        self.slot_ids = jax.device_put(np.asarray(dev["slot_ids"]), rows2)
        self.lengths = jax.device_put(np.asarray(dev["lengths"]), rows1)
        self._has_term2 = term2 is not None
        self.term2 = jax.device_put(
            np.asarray(term2)
            if self._has_term2
            else np.zeros((1, 1, 1), np.float32),
            rows3 if self._has_term2 else repl,
        )
        self.centroids = jax.device_put(index.quantizer.vectors(), repl)
        self.pq_codebooks = jax.device_put(index.pq.centroids, repl)
        self._ids_host = index._ids_host

    def search(self, x, k: int, nprobe: Optional[int] = None):
        x = np.ascontiguousarray(x, np.float32)
        nprobe = int(nprobe or self.nprobe)
        D, slots = _sharded_ivfpq_search(
            self.mesh,
            jnp.asarray(x),
            self.centroids,
            self.pq_codebooks,
            self.codes,
            self.slot_ids,
            self.lengths,
            self.term2,
            k,
            nprobe,
            self.lists_per_shard,
            self.metric_type,
            self.by_residual,
            self._has_term2,
        )
        D = np.asarray(D)
        slots = np.asarray(slots)
        I = np.where(slots >= 0, self._ids_host[np.maximum(slots, 0)], -1)
        return D, I


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "k", "nprobe", "lists_per_shard", "metric", "by_residual",
        "has_term2",
    ),
)
def _sharded_ivfpq_search(
    mesh, xq, centroids, pq_cb, codes, slot_ids, lengths, term2, k, nprobe,
    lists_per_shard, metric=MetricType.L2, by_residual=True, has_term2=True,
):
    """All four metric/residual combinations, mirroring the single-chip
    IndexIVFPQ._scan decomposition (models/ivf_pq.py):

      L2 residual:   bias = ||q - c||^2, term2 tables, luts = -2 q.y
      L2 flat:       full distance LUTs, zero bias
      IP (both):     luts = q.y, bias = q.c for residual else 0, max-select
    """
    from ..ops import pq_ops

    axis = mesh.axis_names[0]
    largest = is_similarity_metric(metric)

    def local(xq, centroids, pq_cb, codes, slot_ids, lengths, term2):
        coarse_dis, probes = dops.knn(xq, centroids, nprobe, metric=metric)
        probes = probes.astype(jnp.int32)
        shard = jax.lax.axis_index(axis).astype(jnp.int32)
        lo = shard * lists_per_shard
        local_probe = probes - lo
        owned = jnp.logical_and(local_probe >= 0, local_probe < lists_per_shard)
        local_probe = jnp.where(owned, local_probe, -1)
        if metric == MetricType.L2 and by_residual:
            luts = -2.0 * pq_ops.pq_ip_tables(xq, pq_cb)
            bias = coarse_dis
        elif metric == MetricType.L2:
            luts = pq_ops.pq_distance_tables(xq, pq_cb)
            bias = jnp.zeros_like(coarse_dis)
        else:  # inner product
            luts = pq_ops.pq_ip_tables(xq, pq_cb)
            bias = (
                coarse_dis if by_residual else jnp.zeros_like(coarse_dis)
            )
        d, slots = ivf_ops.ivf_pq_scan(
            luts, local_probe, bias, codes, slot_ids, lengths, k,
            largest=largest, term2=term2 if has_term2 else None,
        )
        dd = jnp.moveaxis(jax.lax.all_gather(d, axis), 0, 1)
        ss = jnp.moveaxis(jax.lax.all_gather(slots, axis), 0, 1)
        return merge_topk_many(dd, ss, k, largest=largest)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),
            P(axis, None, None), P(axis, None), P(axis),
            P(axis, None, None) if has_term2 else P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(xq, centroids, pq_cb, codes, slot_ids, lengths, term2)


# ---------------------------------------------------------------------------
# sharded BUILD path — trains and populates a ShardedIVFPQ without ever
# materializing the whole index on one host pass (the Deep100M shape).
# Reference: gpu/GpuCloner.h:45-66 copy_ivf_shard / clone_Index_to_shards,
# IVFlib.h:171 shard_ivf_index_centroids feeding per-shard adds.
# ---------------------------------------------------------------------------


class ShardedIVFPQBuilder:
    """Build an IVF-PQ index directly into mesh-sharded storage.

    - ``train``: coarse k-means runs DATA-PARALLEL over the mesh
      (``sharded_kmeans_iter`` psum reductions over ICI); the PQ codebook
      trains on a residual subsample.
    - ``add``: each chunk is coarse-assigned + PQ-encoded on device, then
      rows route to the OWNING shard's host-side CSR bucket (list range
      [s*lists_per_shard, (s+1)*lists_per_shard)) — no single global padded
      array is ever built.
    - ``finalize``: per-shard padded arrays are placed on their own device
      and assembled with ``jax.make_array_from_single_device_arrays`` into
      the ShardedIVFPQ search layout (term2 computed per shard).

    On a multi-host deployment each host would run the same routine over
    its slice; the assembly call is the standard JAX cross-host pattern.
    """

    def __init__(self, d, nlist, M, nbits, mesh: Mesh,
                 metric=MetricType.L2, by_residual=True):
        from ..codecs.pq import ProductQuantizer

        self.d, self.nlist, self.mesh = int(d), int(nlist), mesh
        self.axis = mesh.axis_names[0]
        self.metric_type = MetricType(metric)
        self.by_residual = bool(by_residual)
        n_shards = mesh.devices.size
        if nlist % n_shards:
            raise ValueError("nlist must be divisible by the shard count")
        self.lists_per_shard = nlist // n_shards
        self.n_shards = n_shards
        self.pq = ProductQuantizer(d, M, nbits)
        self.centroids: Optional[np.ndarray] = None
        self.ntotal = 0
        self._codes = [[] for _ in range(n_shards)]
        self._listnos = [[] for _ in range(n_shards)]
        self._gids = [[] for _ in range(n_shards)]
        self._ids_parts = []
        self.is_trained = False

    # -- training ----------------------------------------------------------
    def train(self, xt, niter=20, seed=1234, pq_sample=65536):
        from ..clustering import Clustering

        xt = np.ascontiguousarray(xt, np.float32)
        rs = np.random.RandomState(seed)
        centroids = xt[rs.permutation(len(xt))[: self.nlist]].copy()
        xp, _ = _shard_pad(xt, self.n_shards)
        x_sh = jax.device_put(
            xp, jax.sharding.NamedSharding(self.mesh, P(self.axis, None))
        )
        # pad rows are zero vectors: give them their own throwaway weight by
        # masking nothing — they converge into whichever cluster owns 0;
        # with n >> pad the effect is below split noise. (The exact-masked
        # variant would thread a weight vector through the psum.)
        for _ in range(niter):
            sums, counts, _ = sharded_kmeans_iter(
                self.mesh, x_sh, jnp.asarray(centroids)
            )
            sums = np.asarray(sums)
            counts = np.asarray(counts)
            nz = counts > 0
            new_c = centroids.copy()
            new_c[nz] = sums[nz] / counts[nz, None]
            Clustering._split_clusters(new_c, counts.astype(np.int64), rs)
            centroids = new_c
        self.centroids = centroids
        sub = xt[rs.permutation(len(xt))[:pq_sample]]
        if self.by_residual:
            _, a = dops.assign_flat(
                jnp.asarray(sub), jnp.asarray(centroids),
                metric=self.metric_type,
            )
            sub = sub - centroids[np.asarray(a)]
        self.pq.train(sub)
        self.is_trained = True

    # -- population --------------------------------------------------------
    def add(self, x, ids=None, chunk=1 << 20):
        if not self.is_trained:
            raise RuntimeError("train before add")
        x = np.ascontiguousarray(x, np.float32)
        n = len(x)
        ids = (
            np.arange(self.ntotal, self.ntotal + n, dtype=np.int64)
            if ids is None
            else np.asarray(ids, np.int64).ravel()
        )
        cdev = jnp.asarray(self.centroids)
        for c0 in range(0, n, chunk):
            xc = x[c0 : c0 + chunk]
            _, a = dops.assign_flat(
                jnp.asarray(xc), cdev, metric=self.metric_type
            )
            self.add_preassigned(xc, np.asarray(a), ids[c0 : c0 + chunk])

    def add_preassigned(self, x, assign, ids=None):
        """Add with a precomputed coarse assignment (the sharded analogue
        of contrib/ivf_tools.py add_preassigned): rows are PQ-encoded and
        routed to their owning shard's CSR bucket; the assignment GEMM —
        the expensive part of add at scale — is the caller's."""
        if not self.is_trained:
            raise RuntimeError("train before add")
        x = np.ascontiguousarray(x, np.float32)
        n = len(x)
        a = np.asarray(assign, np.int64).ravel()
        if len(a) != n:
            raise ValueError("assign length mismatch")
        ids = (
            np.arange(self.ntotal, self.ntotal + n, dtype=np.int64)
            if ids is None
            else np.asarray(ids, np.int64).ravel()
        )
        gid0 = sum(len(p) for p in self._ids_parts)
        self._ids_parts.append(ids)
        resid = x - self.centroids[a] if self.by_residual else x
        codes = self.pq.compute_codes_int(resid).astype(np.uint8)
        gids = np.arange(gid0, gid0 + n, dtype=np.int64)
        owner = a // self.lists_per_shard
        for s in range(self.n_shards):
            m = owner == s
            if m.any():
                self._codes[s].append(codes[m])
                self._listnos[s].append(a[m].astype(np.int32))
                self._gids[s].append(gids[m])
        self.ntotal += n

    # -- assembly ----------------------------------------------------------
    def finalize(self) -> "ShardedIVFPQ":
        M, ksub, dsub = self.pq.M, self.pq.ksub, self.pq.dsub
        lps = self.lists_per_shard
        devices = list(self.mesh.devices.flat)
        lengths_s, max_len = [], 1
        for s in range(self.n_shards):
            ln = (
                np.concatenate(self._listnos[s])
                if self._listnos[s]
                else np.empty(0, np.int32)
            )
            lengths = np.bincount(ln - s * lps, minlength=lps).astype(
                np.int32
            )
            lengths_s.append(lengths)
            if len(ln):
                max_len = max(max_len, int(lengths.max()))
        max_len = max(128, -(-max_len // 128) * 128)

        def put(parts, spec):
            shape = (self.n_shards * parts[0].shape[0],) + parts[0].shape[1:]
            sh = jax.sharding.NamedSharding(self.mesh, spec)
            bufs = [
                jax.device_put(p, d) for p, d in zip(parts, devices)
            ]
            return jax.make_array_from_single_device_arrays(shape, sh, bufs)

        codes_parts, slots_parts, t2_parts = [], [], []
        cb = self.pq.centroids  # [M, ksub, dsub]
        y_norms = np.sum(cb**2, axis=-1)  # [M, ksub]
        for s in range(self.n_shards):
            if self._listnos[s]:
                ln = np.concatenate(self._listnos[s]) - s * lps
                cd = np.concatenate(self._codes[s])
                gd = np.concatenate(self._gids[s])
            else:
                ln = np.empty(0, np.int32)
                cd = np.empty((0, M), np.uint8)
                gd = np.empty(0, np.int64)
            order = np.argsort(ln, kind="stable")
            sln = ln[order]
            offs = np.zeros(lps, np.int64)
            np.cumsum(lengths_s[s][:-1], out=offs[1:])
            ranks = np.arange(len(ln), dtype=np.int64) - offs[sln]
            pad_codes = np.zeros((lps, max_len, M), np.uint8)
            slot_ids = np.full((lps, max_len), -1, np.int32)
            if len(ln):
                pad_codes[sln, ranks] = cd[order]
                slot_ids[sln, ranks] = gd[order].astype(np.int32)
            codes_parts.append(pad_codes)
            slots_parts.append(slot_ids)
            if self.by_residual and self.metric_type == MetricType.L2:
                cent_s = self.centroids[s * lps : (s + 1) * lps].reshape(
                    lps, M, dsub
                )
                t2_parts.append(
                    (
                        y_norms[None]
                        + 2.0 * np.einsum("cmd,mkd->cmk", cent_s, cb)
                    ).astype(np.float32)
                )

        out = ShardedIVFPQ.__new__(ShardedIVFPQ)
        out.mesh = self.mesh
        out.axis = self.axis
        out.index = None
        out.nprobe = 1
        out.metric_type = self.metric_type
        out.by_residual = self.by_residual
        out.lists_per_shard = lps
        repl = jax.sharding.NamedSharding(self.mesh, P())
        out.codes = put(codes_parts, P(self.axis, None, None))
        out.slot_ids = put(slots_parts, P(self.axis, None))
        out.lengths = put(
            [le for le in lengths_s], P(self.axis)
        )
        out._has_term2 = bool(t2_parts)
        out.term2 = (
            put(t2_parts, P(self.axis, None, None))
            if t2_parts
            else jax.device_put(np.zeros((1, 1, 1), np.float32), repl)
        )
        out.centroids = jax.device_put(self.centroids, repl)
        out.pq_codebooks = jax.device_put(self.pq.centroids, repl)
        out._ids_host = (
            np.concatenate(self._ids_parts)
            if self._ids_parts
            else np.empty(0, np.int64)
        )
        return out


class ShardedRefinedIVFPQ:
    """The full north-star serving composite, mesh-sharded: pretransform
    (OPQ rotation, replicated) -> invlist-sharded IVF-PQ candidate scan
    (any nbits incl. the 4-bit fs family) -> LOCAL exact re-rank against
    the shard's padded refine store -> allgather + k-select merge.

    The refine store holds the TRANSFORMED vectors in the same
    [lists_per_shard, max_len, d] padded layout as the codes, so every
    candidate's raw vector lives on the shard that scored it: the exact
    re-rank is collective-free and only [k] rows/query ride the
    allgather. This is the TPU layout of the reference's sharded
    GpuIndexIVFPQ + IndexRefineFlat serving stack
    (gpu/GpuCloner.h:45-66 shard mode + IndexRefine.h:22; the reference
    re-ranks AFTER its shard merge and must re-touch all shards'
    storage — local-refine-then-merge is strictly less traffic).

    ``vt``: optional VectorTransform applied to queries (and already
    applied to the stored vectors); ``xb_t`` are the transformed
    database vectors in ADD ORDER (matching ``index._ids_host``).
    """

    def __init__(self, index, mesh: Mesh, xb_t, vt=None,
                 store_float16=True, k_factor=4):
        self.sharded = ShardedIVFPQ(index, mesh)
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.vt = vt
        self.k_factor = k_factor
        s = self.sharded
        xb_t = np.ascontiguousarray(xb_t, np.float32)
        if len(xb_t) != index.ntotal:
            raise ValueError("xb_t must hold every stored vector")
        # per-shard padded refine parts from the same slot layout as the
        # codes (slot values index the add-order arrays). Host assembly
        # here mirrors ShardedIVFPQBuilder.finalize; a multi-host build
        # would produce its own shard's part only.
        slot_ids = np.asarray(index._build_device()["slot_ids"])
        nlist, max_len = slot_ids.shape
        lps = s.lists_per_shard
        dt = np.float16 if store_float16 else np.float32
        devices = list(mesh.devices.flat)
        parts = []
        for sh in range(mesh.devices.size):
            sl = slot_ids[sh * lps : (sh + 1) * lps]
            part = np.zeros((lps, max_len, xb_t.shape[1]), dt)
            m = sl >= 0
            part[m] = xb_t[sl[m]].astype(dt)
            parts.append(part)
        sh3 = jax.sharding.NamedSharding(mesh, P(self.axis, None, None))
        bufs = [jax.device_put(p, dv) for p, dv in zip(parts, devices)]
        self.refine = jax.make_array_from_single_device_arrays(
            (nlist, max_len, xb_t.shape[1]), sh3, bufs
        )
        # local flat positions ride through the scan so the re-rank can
        # gather from the shard's own padded store without a collective
        pos = np.arange(nlist * max_len, dtype=np.int32).reshape(
            nlist, max_len
        )
        pos = pos - (np.arange(nlist)[:, None] // lps) * (lps * max_len)
        pos = np.where(slot_ids >= 0, pos, -1).astype(np.int32)
        sh2 = jax.sharding.NamedSharding(mesh, P(self.axis, None))
        self.pos_ids = jax.device_put(pos, sh2)

    def search(self, x, k: int, nprobe: Optional[int] = None):
        x = np.ascontiguousarray(x, np.float32)
        if self.vt is not None:
            x = self.vt.apply(x)
        s = self.sharded
        nprobe = int(nprobe or s.nprobe)
        kc = min(int(round(k * self.k_factor)), self.pos_ids.shape[1] * 8)
        D, slots = _sharded_refined_search(
            self.mesh, jnp.asarray(x), s.centroids, s.pq_codebooks,
            s.codes, s.slot_ids, self.pos_ids, s.lengths, s.term2,
            self.refine, k, kc, nprobe, s.lists_per_shard, s.metric_type,
            s.by_residual, s._has_term2,
        )
        D = np.asarray(D)
        slots = np.asarray(slots)
        I = np.where(slots >= 0, s._ids_host[np.maximum(slots, 0)], -1)
        return D, I


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "k", "kc", "nprobe", "lists_per_shard", "metric",
        "by_residual", "has_term2",
    ),
)
def _sharded_refined_search(
    mesh, xq, centroids, pq_cb, codes, slot_ids, pos_ids, lengths, term2,
    refine, k, kc, nprobe, lists_per_shard, metric=MetricType.L2,
    by_residual=True, has_term2=True,
):
    """Per-shard: ADC candidate scan (top-kc) -> exact f32 re-rank from
    the local padded refine store -> top-k; merge across shards."""
    from ..ops import pq_ops

    axis = mesh.axis_names[0]
    largest = is_similarity_metric(metric)

    def local(xq, centroids, pq_cb, codes, slot_ids, pos_ids, lengths,
              term2, refine):
        coarse_dis, probes = dops.knn(xq, centroids, nprobe, metric=metric)
        probes = probes.astype(jnp.int32)
        shard = jax.lax.axis_index(axis).astype(jnp.int32)
        lo = shard * lists_per_shard
        local_probe = probes - lo
        owned = jnp.logical_and(
            local_probe >= 0, local_probe < lists_per_shard
        )
        local_probe = jnp.where(owned, local_probe, -1)
        if metric == MetricType.L2 and by_residual:
            luts = -2.0 * pq_ops.pq_ip_tables(xq, pq_cb)
            bias = coarse_dis
        elif metric == MetricType.L2:
            luts = pq_ops.pq_distance_tables(xq, pq_cb)
            bias = jnp.zeros_like(coarse_dis)
        else:
            luts = pq_ops.pq_ip_tables(xq, pq_cb)
            bias = (
                coarse_dis if by_residual else jnp.zeros_like(coarse_dis)
            )
        _, pos = ivf_ops.ivf_pq_scan(
            luts, local_probe, bias, codes, pos_ids, lengths, kc,
            largest=largest, term2=term2 if has_term2 else None,
        )
        # exact re-rank of the local top-kc against the local store
        valid = pos >= 0
        safe = jnp.maximum(pos, 0)
        flat = refine.reshape(-1, refine.shape[-1])
        cand = flat[safe].astype(jnp.float32)  # [nq, kc, d]
        if largest:
            dd = jnp.einsum("qd,qcd->qc", xq, cand,
                            preferred_element_type=jnp.float32)
            dd = jnp.where(valid, dd, -jnp.inf)
            dloc, sel = jax.lax.top_k(dd, k)
        else:
            diff = xq[:, None, :] - cand
            dd = jnp.sum(diff * diff, axis=-1)  # exact f32 (kc is small)
            dd = jnp.where(valid, dd, jnp.inf)
            nv, sel = jax.lax.top_k(-dd, k)
            dloc = -nv
        pos_k = jnp.take_along_axis(pos, sel, axis=1)
        # local padded position -> global slot id (add-order row)
        gflat = slot_ids.reshape(-1)
        slots_k = jnp.where(
            pos_k >= 0, gflat[jnp.maximum(pos_k, 0)], -1
        )
        dloc = jnp.where(
            pos_k >= 0, dloc, jnp.inf if not largest else -jnp.inf
        )
        ddm = jnp.moveaxis(jax.lax.all_gather(dloc, axis), 0, 1)
        ssm = jnp.moveaxis(jax.lax.all_gather(slots_k, axis), 0, 1)
        return merge_topk_many(ddm, ssm, k, largest=largest)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),
            P(axis, None, None), P(axis, None), P(axis, None), P(axis),
            P(axis, None, None) if has_term2 else P(),
            P(axis, None, None),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(xq, centroids, pq_cb, codes, slot_ids, pos_ids, lengths, term2,
      refine)
