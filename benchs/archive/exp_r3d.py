"""Round-3 experiment session D (TPU): two-phase select.

Measures:
  1. recon kernel with cheap_after in {16, 32}: time + eviction profile
  2. full program (sort_rot, fmax=48, cheap_after): time + recall
  3. e2e bench config with the tuned knobs (pb=4096)
  4. dyn-chunk recon kernel at nprobe=8: worklist size + time (per-chunk
     cost vs the sequential stream)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchs/exp_r3d.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[exp] {m}", file=sys.stderr, flush=True)


def sync(a):
    return np.asarray(a).ravel()[0]


def main():
    import jax
    import jax.numpy as jnp

    import faiss_tpu as ft
    from faiss_tpu.utils.evaluation import recall_at_k

    rs = np.random.RandomState(42)
    d, nb, nq = 128, 1_000_000, 8192
    ncent = 2048
    cent = rs.rand(ncent, d).astype(np.float32)
    scales = (1.0 / (np.arange(d) + 1.0)).astype(np.float32) * 0.4

    def gen(n, seed):
        r = np.random.RandomState(seed)
        a = r.randint(ncent, size=n)
        return (cent[a] + r.randn(n, d).astype(np.float32) * scales).astype(
            np.float32
        )

    xq = gen(nq, 3)
    with np.load("/root/repo/bench_gt_cache.npz") as z:
        gt = z["gt"]

    log("loading cached index")
    index = ft.read_index("/root/repo/.profile_index.npz")
    base = index.base_index
    base.nprobe = 4096
    t0 = time.time()
    br = base._build_brute()
    refine_xb = index.refine_index._consolidate()
    sync(br["yT"][0, :1])
    log(f"staged in {time.time()-t0:.1f}s")

    from faiss_tpu.models.ivf_pq import (
        _fused_search_rerank_recon,
        _fused_search_rerank_recon_dyn,
        _stage_queries,
        _unpack_results,
    )

    xq_staged = _stage_queries(xq)
    nrep = 3
    qt, ct = 256, base.FUSED_CT

    # ---- 1+2. program with two-phase select ----------------------------
    for ca in (16, 32):
        t0 = time.time()
        packed = _fused_search_rerank_recon(
            xq_staged, br["centroids_g"], br["cn2g"], br["yT"], br["n2s"],
            br["lid"], br["slot_map_dev"], refine_xb, 10, 120, qt, ct, 0,
            qdepth=2, fmax=48, sort_rot=True, cheap_after=ca,
        )
        sync(packed[0, :1])
        log(f"program cheap_after={ca} compile+run: {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(nrep):
            packed = _fused_search_rerank_recon(
                xq_staged, br["centroids_g"], br["cn2g"], br["yT"],
                br["n2s"], br["lid"], br["slot_map_dev"], refine_xb, 10,
                120, qt, ct, 0, qdepth=2, fmax=48, sort_rot=True,
                cheap_after=ca,
            )
        ph = np.asarray(packed)
        dt = (time.time() - t0) / nrep
        D, Iu, lz, _ = _unpack_results(ph, 10)
        ids = np.where(Iu >= 0, base._ids_host[np.maximum(Iu, 0)], -1)
        r = recall_at_k(ids, gt, 10)
        log(f"program cheap_after={ca} warm: {dt*1000:.1f} ms "
            f"recall={r:.4f} lossy={int(lz.sum())}")

    # ---- 3. e2e with tuned knobs ---------------------------------------
    base.pipeline_batch = 4096
    base.fused_fmax = 48
    base.fused_sort_rot = True
    base.fused_cheap_after = 32
    t0 = time.time()
    D, I = index.search(xq, 10)
    log(f"e2e tuned first: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(5):
        D, I = index.search(xq, 10)
    dt = (time.time() - t0) / 5
    r = recall_at_k(I, gt, 10)
    log(f"e2e tuned (pb=4096, ca=32): {dt*1000:.1f} ms -> {nq/dt:.0f} QPS "
        f"recall={r:.4f}")

    # ---- 4. dyn-chunk recon at nprobe=8 --------------------------------
    nprobe = 8
    msteps = base._dyn_bucket_for(xq_staged, br, nprobe, qt)
    log(f"dyn nprobe={nprobe}: worklist bucket={msteps} of "
        f"{br['nchunks']} chunks")
    t0 = time.time()
    packed = _fused_search_rerank_recon_dyn(
        xq_staged, br["centroids_g"], br["cn2g"], br["yT"], br["n2s"],
        br["lid"], br["slot_map_dev"], refine_xb,
        br["chunk_first"], br["chunk_last"], br["cgroup"],
        10, 120, qt, ct, nprobe, msteps, br["max_span"], qdepth=2,
    )
    sync(packed[0, :1])
    log(f"dyn program compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(nrep):
        packed = _fused_search_rerank_recon_dyn(
            xq_staged, br["centroids_g"], br["cn2g"], br["yT"], br["n2s"],
            br["lid"], br["slot_map_dev"], refine_xb,
            br["chunk_first"], br["chunk_last"], br["cgroup"],
            10, 120, qt, ct, nprobe, msteps, br["max_span"], qdepth=2,
        )
    ph = np.asarray(packed)
    dt = (time.time() - t0) / nrep
    D, Iu, lz, nd = _unpack_results(ph, 10)
    ids = np.where(Iu >= 0, base._ids_host[np.maximum(Iu, 0)], -1)
    r = recall_at_k(ids, gt, 10)
    log(f"dyn program warm: {dt*1000:.1f} ms recall={r:.4f} "
        f"dropped={nd}")


if __name__ == "__main__":
    main()
