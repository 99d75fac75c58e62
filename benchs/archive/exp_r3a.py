"""Round-3 experiment session A (TPU): flush-schedule cap, sort_rot,
4x2048 pipelining, fused k-means.

Measures, in ONE process (remote compiles amortized):
  1. recon kernel: baseline fmax=16 vs fmax=48 (flush cost share)
  2. full recon program with fmax=48 + sort_rot (time + recall + lossy)
  3. e2e index.search at pipeline_batch 4096 vs 2048, with tuned knobs
  4. kmeans_fused_loop 500k x 128 -> 4096 x 20 iters (compile + warm)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchs/exp_r3a.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[exp] {msg}", file=sys.stderr, flush=True)


def sync(a):
    return np.asarray(a).ravel()[0]


def main():
    import jax
    import jax.numpy as jnp

    import faiss_tpu as ft

    cache = "/root/repo/.profile_index.npz"
    rs = np.random.RandomState(42)
    d, nb, nq, nt = 128, 1_000_000, 8192, 200_000
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
    from faiss_tpu.utils.evaluation import recall_at_k

    log("loading cached index")
    index = ft.read_index(cache)
    base = index.base_index
    base.nprobe = 4096
    t0 = time.time()
    br = base._build_brute()
    refine_xb = index.refine_index._consolidate()
    sync(br["yT"][0, :1])
    log(f"staged in {time.time()-t0:.1f}s")

    from faiss_tpu.models.ivf_pq import (
        _fused_search_rerank_recon,
        _stage_queries,
        _unpack_results,
    )
    from faiss_tpu.ops.pallas_knn import ivf_recon_fused_pallas

    xq_dev = jnp.asarray(xq)
    nrep = 3

    # ---- 1. kernel-only flush cap sweep --------------------------------
    for fmax in (16, 48):
        t0 = time.time()
        v, s, ev = ivf_recon_fused_pallas(
            xq_dev, br["yT"], br["n2s"], br["lid"], None,
            qt=256, ct=base.FUSED_CT, qdepth=2, fmax=fmax,
        )
        sync(v[0, :1])
        log(f"kernel fmax={fmax} compile+run: {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(nrep):
            v, s, ev = ivf_recon_fused_pallas(
                xq_dev, br["yT"], br["n2s"], br["lid"], None,
                qt=256, ct=base.FUSED_CT, qdepth=2, fmax=fmax,
            )
        sync(v[0, :1])
        lossy = np.asarray(jnp.min(ev, -1) < v[:, 119])
        log(f"kernel fmax={fmax} warm: {(time.time()-t0)/nrep*1000:.1f} ms "
            f"(lossy@120 {int(lossy.sum())}/{nq})")

    # ---- 2. full program: fmax=48 + sort_rot ---------------------------
    xq_staged = _stage_queries(xq)
    for fmax, srot in ((48, True), (64, True)):
        t0 = time.time()
        packed = _fused_search_rerank_recon(
            xq_staged, br["centroids_g"], br["cn2g"], br["yT"], br["n2s"],
            br["lid"], br["slot_map_dev"], refine_xb, 10, 120, 256,
            base.FUSED_CT, 0, qdepth=2, fmax=fmax, sort_rot=srot,
        )
        sync(packed[0, :1])
        log(f"program fmax={fmax} rot={srot} compile+run: {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(nrep):
            packed = _fused_search_rerank_recon(
                xq_staged, br["centroids_g"], br["cn2g"], br["yT"],
                br["n2s"], br["lid"], br["slot_map_dev"], refine_xb, 10,
                120, 256, base.FUSED_CT, 0, qdepth=2, fmax=fmax,
                sort_rot=srot,
            )
        ph = np.asarray(packed)
        dt = (time.time() - t0) / nrep
        D, Iu, lz, _ = _unpack_results(ph, 10)
        ids = np.where(Iu >= 0, base._ids_host[np.maximum(Iu, 0)], -1)
        r = recall_at_k(ids, gt, 10)
        log(f"program fmax={fmax} rot={srot} warm: {dt*1000:.1f} ms  "
            f"recall@10={r:.4f} lossy={int(lz.sum())}")

    # ---- 3. e2e with tuned knobs + pipeline sweep ----------------------
    for pb, fmax, srot in ((4096, 48, True), (2048, 48, True)):
        base.pipeline_batch = pb
        base.fused_fmax = fmax
        base.fused_sort_rot = srot
        t0 = time.time()
        D, I = index.search(xq, 10)
        log(f"e2e pb={pb} first (incl compile): {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(nrep):
            D, I = index.search(xq, 10)
        dt = (time.time() - t0) / nrep
        r = recall_at_k(I, gt, 10)
        log(f"e2e pb={pb} fmax={fmax} rot={srot}: {dt*1000:.1f} ms -> "
            f"{nq/dt:.0f} QPS  recall@10={r:.4f}")

    # ---- 4. fused k-means ---------------------------------------------
    from faiss_tpu.ops.kmeans_ops import kmeans_fused_loop

    xk = gen(500_000, 9)
    init = xk[np.random.RandomState(0).permutation(500_000)[:4096]].copy()
    xk_dev = jnp.asarray(xk)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    c, objs, _, _, nsp, _ = kmeans_fused_loop(
        xk_dev, jnp.asarray(init), key, niter=20, chunk=1 << 17
    )
    sync(c[0, :1])
    log(f"kmeans 500k->4096x20 compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    c, objs, _, _, nsp, _ = kmeans_fused_loop(
        xk_dev, jnp.asarray(init), key, niter=20, chunk=1 << 17
    )
    sync(c[0, :1])
    objs = np.asarray(objs)
    log(f"kmeans warm: {time.time()-t0:.1f}s  obj[0]={objs[0]:.3e} "
        f"obj[-1]={objs[-1]:.3e} nsplit_total={int(np.asarray(nsp).sum())}")


if __name__ == "__main__":
    main()
