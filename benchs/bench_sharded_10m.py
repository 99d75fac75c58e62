"""Sharded build at 10M scale on the virtual 8-device mesh (VERDICT r3 #4).

Pushes ShardedIVFPQBuilder through 10M x 96 CLUSTERED vectors (the
bench_deep10m.py distribution) on an 8-device virtual CPU mesh:
data-parallel k-means over the mesh, chunked preassigned adds, per-shard
finalize — then asserts sharded search recall == a single-host IndexIVFPQ
built from the SAME trained parameters and SAME assignments, on a query
sample. Also prints the Deep100M v5e-8 per-chip HBM capacity plan.

Reference analogues: gpu/GpuCloner.h:45-66 (shard copies),
IVFlib.h:171-205 (shard_ivf_index_centroids feeding per-shard adds).

Usage (CPU, no TPU contention):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python benchs/bench_sharded_10m.py [n_millions]
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import faiss_tpu as ft  # noqa: E402
from faiss_tpu.ops import distances as dops  # noqa: E402
from faiss_tpu.parallel.sharded import (  # noqa: E402
    ShardedIVFPQBuilder,
    make_mesh,
)
from faiss_tpu.utils.evaluation import recall_at_k  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_deep10m import D, load_or_gen_data  # noqa: E402


def log(m):
    print(f"[sharded10m {time.strftime('%H:%M:%S')}] {m}",
          file=sys.stderr, flush=True)


def capacity_plan():
    """Deep100M on v5e-8 per-chip HBM budget (the config-5 arithmetic)."""
    n, d, nlist, M, chips = 100_000_000, 96, 65536, 32, 8
    per_chip_rows = n / chips
    codes = per_chip_rows * M  # uint8 nibbles packed 2/byte for 4-bit: M/2
    codes_4bit = per_chip_rows * M / 2
    ids = per_chip_rows * 4  # int32 slot ids
    lists_per_chip = nlist / chips
    # padded-array overhead at 1.3x skew (measured on clustered 10M)
    pad = 1.3
    term2 = lists_per_chip * M * 16 * 4  # [lists, M, ksub=16] f32
    cent = nlist * d * 4  # replicated coarse centroids
    rows = {
        "codes_4bit_GB": codes_4bit * pad / 1e9,
        "codes_8bit_GB": codes * pad / 1e9,
        "slot_ids_GB": ids * pad / 1e9,
        "term2_GB": term2 / 1e9,
        "centroids_replicated_GB": cent / 1e9,
    }
    rows["total_4bit_GB"] = (
        rows["codes_4bit_GB"] + rows["slot_ids_GB"] + rows["term2_GB"]
        + rows["centroids_replicated_GB"]
    )
    return rows


def main():
    nmil = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    NB, NT, NQ, NLIST, M = nmil * 1_000_000, 200_000, 1024, 8192, 16

    # slice the shared Deep10M cache: gen_deep draws in whole-1M blocks, so
    # a prefix of the 10M xb is bit-identical to gen_deep(NB, 1) for NB a
    # multiple of 1M; xt/xq subsets are statistically equivalent samples
    xb_full, xt_full, xq_full = load_or_gen_data(log)
    xb = xb_full[:NB]
    xt = np.ascontiguousarray(xt_full[:NT])
    xq = np.ascontiguousarray(xq_full[:NQ])

    mesh = make_mesh(8)
    b = ShardedIVFPQBuilder(D, NLIST, M, 8, mesh)
    log(f"sharded k-means train (nlist={NLIST}, psum over 8-device mesh)")
    t0 = time.time()
    b.train(xt, niter=10)
    t_train = time.time() - t0
    log(f"train {t_train:.0f}s")

    # ONE 10M coarse assignment, shared by the sharded builder AND the
    # single-host twin (both sides then only pay the cheap PQ encode)
    log("coarse-assigning + adding in 1M chunks")
    t0 = time.time()
    cdev = jnp.asarray(b.centroids)
    assigns = []
    CHUNK = 1_000_000
    for c0 in range(0, NB, CHUNK):
        xc = xb[c0 : c0 + CHUNK]
        _, a = dops.assign_flat(jnp.asarray(xc), cdev)
        a = np.asarray(a)
        assigns.append(a)
        b.add_preassigned(xc, a)
        log(f"  {c0 + len(xc):,} added ({time.time()-t0:.0f}s)")
    t_add = time.time() - t0
    log(f"assign+add {t_add:.0f}s")

    t0 = time.time()
    sp = b.finalize()
    t_fin = time.time() - t0
    lengths = np.asarray(sp.lengths)
    log(f"finalize {t_fin:.0f}s; list lengths: mean {lengths.mean():.0f} "
        f"max {lengths.max()} empty {(lengths == 0).sum()} "
        f"padded store {np.asarray(sp.codes).nbytes/1e9:.2f} GB")

    log("sharded search (1024 q, nprobe=16, k=10)")
    t0 = time.time()
    D_s, I_s = sp.search(xq, 10, nprobe=16)
    log(f"sharded search {time.time()-t0:.0f}s (incl compile)")

    # single-host twin: same centroids, same PQ, same assignments
    log("building single-host twin from the same assignments")
    quant = ft.IndexFlatL2(D)
    quant.add(b.centroids)
    ref = ft.IndexIVFPQ(quant, D, NLIST, M, 8)
    ref.pq.centroids = b.pq.centroids
    ref.is_trained = True
    ref.big_batch_threshold = 0  # per-probe scan path on CPU
    t0 = time.time()
    for c0 in range(0, NB, CHUNK):
        ref.add_core(xb[c0 : c0 + CHUNK], None, assigns[c0 // CHUNK])
    log(f"twin add {time.time()-t0:.0f}s")
    ref.nprobe = 16
    t0 = time.time()
    D_r, I_r = ref.search(xq, 10)
    log(f"twin search {time.time()-t0:.0f}s")

    # exact GT on a 256-query subsample for absolute recall context
    # (the sharded==single assert below needs no GT)
    log("exact GT on a 256-query subsample")
    t0 = time.time()
    NGT = 256
    gt = np.empty((NGT, 10), np.int64)
    bq = 64
    xb_n2 = (xb.astype(np.float32) ** 2).sum(1)
    for q0 in range(0, NGT, bq):
        qs = xq[q0 : q0 + bq]
        dist = xb_n2[None, :] - 2.0 * (qs @ xb.T)
        part = np.argpartition(dist, 10, axis=1)[:, :10]
        dp = np.take_along_axis(dist, part, axis=1)
        gt[q0 : q0 + bq] = np.take_along_axis(
            part, np.argsort(dp, 1), axis=1
        )
    log(f"gt in {time.time()-t0:.0f}s")

    r_shard = recall_at_k(I_s[:NGT], gt, 10)
    r_single = recall_at_k(I_r[:NGT], gt, 10)
    log(f"recall@10 sharded={r_shard:.4f} single-host={r_single:.4f}")
    # identical trained params + assignments -> identical candidate sets;
    # only tie order may differ
    assert abs(r_shard - r_single) < 0.002, (r_shard, r_single)
    inter = np.mean([
        len(np.intersect1d(I_s[i], I_r[i])) for i in range(NQ)
    ]) / 10.0
    log(f"sharded vs single-host intersection@10 = {inter:.4f}")

    out = dict(
        nb=NB, d=D, nlist=NLIST, M=M, mesh_devices=8,
        train_s=round(t_train, 1), assign_add_s=round(t_add, 1),
        finalize_s=round(t_fin, 1),
        recall10_sharded=round(float(r_shard), 4),
        recall10_single=round(float(r_single), 4),
        inter10_sharded_vs_single=round(float(inter), 4),
        list_len_mean=float(lengths.mean()), list_len_max=int(lengths.max()),
        capacity_plan_deep100m_v5e8=capacity_plan(),
    )
    path = "/root/repo/benchs/results/sharded_10m.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
