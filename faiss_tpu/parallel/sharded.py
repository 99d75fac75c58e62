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
        from ..models.ivf import IndexIVFFlat

        if not isinstance(index, IndexIVFFlat):
            raise TypeError("ShardedIVF round-1 supports IndexIVFFlat")
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
        if index.metric_type != MetricType.L2 or not index.by_residual:
            raise NotImplementedError("sharded IVFPQ: L2 by-residual only")
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.index = index
        self.nprobe = index.nprobe
        n_shards = mesh.devices.size
        if index.nlist % n_shards:
            raise ValueError("nlist must be divisible by the shard count")
        self.lists_per_shard = index.nlist // n_shards

        dev = index._build_device()
        term2 = index._maybe_term2()
        rows3 = jax.sharding.NamedSharding(mesh, P(self.axis, None, None))
        rows2 = jax.sharding.NamedSharding(mesh, P(self.axis, None))
        rows1 = jax.sharding.NamedSharding(mesh, P(self.axis))
        repl = jax.sharding.NamedSharding(mesh, P())
        self.codes = jax.device_put(np.asarray(dev["codes"]), rows3)
        self.slot_ids = jax.device_put(np.asarray(dev["slot_ids"]), rows2)
        self.lengths = jax.device_put(np.asarray(dev["lengths"]), rows1)
        self.term2 = jax.device_put(np.asarray(term2), rows3)
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
        )
        D = np.asarray(D)
        slots = np.asarray(slots)
        I = np.where(slots >= 0, self._ids_host[np.maximum(slots, 0)], -1)
        return D, I


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "nprobe", "lists_per_shard"),
)
def _sharded_ivfpq_search(
    mesh, xq, centroids, pq_cb, codes, slot_ids, lengths, term2, k, nprobe,
    lists_per_shard,
):
    from ..ops import pq_ops

    axis = mesh.axis_names[0]

    def local(xq, centroids, pq_cb, codes, slot_ids, lengths, term2):
        coarse_dis, probes = dops.knn(xq, centroids, nprobe)
        probes = probes.astype(jnp.int32)
        shard = jax.lax.axis_index(axis).astype(jnp.int32)
        lo = shard * lists_per_shard
        local_probe = probes - lo
        owned = jnp.logical_and(local_probe >= 0, local_probe < lists_per_shard)
        local_probe = jnp.where(owned, local_probe, -1)
        luts = -2.0 * pq_ops.pq_ip_tables(xq, pq_cb)
        d, slots = ivf_ops.ivf_pq_scan(
            luts, local_probe, coarse_dis, codes, slot_ids, lengths, k,
            largest=False, term2=term2,
        )
        dd = jnp.moveaxis(jax.lax.all_gather(d, axis), 0, 1)
        ss = jnp.moveaxis(jax.lax.all_gather(slots, axis), 0, 1)
        return merge_topk_many(dd, ss, k, largest=False)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),
            P(axis, None, None), P(axis, None), P(axis), P(axis, None, None),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(xq, centroids, pq_cb, codes, slot_ids, lengths, term2)
