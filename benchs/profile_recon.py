"""Profile the recon-GEMM fused IVFPQ path (ivf_recon_fused_pallas) on TPU.

Times the kernel alone and the full _fused_search_rerank_recon program at
the bench operating point, and cross-checks recall@10 against the cached
ground truth. Timing via a host read (block_until_ready does not sync under
the axon tunnel).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchs/profile_recon.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[profile] {msg}", file=sys.stderr, flush=True)


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

    if os.path.exists(cache):
        log("loading cached index")
        index = ft.read_index(cache)
    else:
        xb, xt = gen(nb, 1), gen(nt, 2)
        log("building index (train+add)")
        t0 = time.time()
        base = ft.IndexIVFPQFastScan(None, d, 4096, 32, 4)
        base.cp.niter = 20
        base.nprobe = 4096
        index = ft.IndexRefineFlat(base)
        index.k_factor = 12
        index.train(xt)
        index.add(xb)
        log(f"built in {time.time()-t0:.1f}s; saving")
        ft.write_index(index, cache)
    base = index.base_index
    base.nprobe = 4096

    log("staging (_build_brute incl. decoded store + refine consolidate)")
    t0 = time.time()
    br = base._build_brute()
    refine_xb = index.refine_index._consolidate()
    sync(br["yT"][0, :1])
    log(f"staged in {time.time()-t0:.1f}s; yT {br['yT'].shape} "
        f"({br['yT'].size*2/1e6:.0f} MB)")

    from faiss_tpu.models.ivf_pq import (
        _fused_search_rerank_recon,
        _stage_queries,
        _unpack_results,
    )
    from faiss_tpu.ops.pallas_knn import ivf_recon_fused_pallas

    xq_dev = jnp.asarray(xq)
    nrep = 3

    for qt in (256,):
        t0 = time.time()
        v, s, ev = ivf_recon_fused_pallas(
            xq_dev, br["yT"], br["n2s"], br["lid"], None,
            qt=qt, ct=base.FUSED_CT, qdepth=2,
        )
        sync(v[0, :1])
        log(f"recon kernel qt={qt} compile+run: {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(nrep):
            v, s, ev = ivf_recon_fused_pallas(
                xq_dev, br["yT"], br["n2s"], br["lid"], None,
                qt=qt, ct=base.FUSED_CT, qdepth=2,
            )
        sync(v[0, :1])
        log(f"recon kernel qt={qt} warm: {(time.time()-t0)/nrep*1000:.1f} ms")
        lossy = np.asarray(jnp.min(ev, -1) < v[:, 119])
        log(f"  lossy rows at kc=120: {int(lossy.sum())} / {nq}")

    qt = 256
    xq_staged = _stage_queries(xq)
    t0 = time.time()
    packed = _fused_search_rerank_recon(
        xq_staged, br["centroids_g"], br["cn2g"], br["yT"], br["n2s"],
        br["lid"], br["slot_map_dev"], refine_xb, 10, 120, qt,
        base.FUSED_CT, 0, qdepth=2,
    )
    sync(packed[0, :1])
    log(f"full recon program compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(nrep):
        packed = _fused_search_rerank_recon(
            xq_staged, br["centroids_g"], br["cn2g"], br["yT"], br["n2s"],
            br["lid"], br["slot_map_dev"], refine_xb, 10, 120, qt,
            base.FUSED_CT, 0, qdepth=2,
        )
    sync(packed[0, :1])
    log(f"full recon program warm: {(time.time()-t0)/nrep*1000:.1f} ms")

    # end-to-end through the public API (includes H2D + D2H + python)
    t0 = time.time()
    D, I = index.search(xq, 10)
    log(f"index.search first: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(nrep):
        D, I = index.search(xq, 10)
    dt = (time.time() - t0) / nrep
    log(f"index.search warm: {dt*1000:.1f} ms -> {nq/dt:.0f} QPS")

    # --- overhead anatomy: stage/upload, D2H, host unpack
    t0 = time.time()
    for _ in range(nrep):
        lo = xq.min(1, keepdims=True)
        step = np.maximum(xq.max(1, keepdims=True) - lo, 1e-20) / 255.0
        u8 = np.round((xq - lo) / step).astype(np.uint8)
        meta = np.concatenate([lo, step], 1).astype(np.float32)
        buf = np.concatenate([u8, meta.view(np.uint8)], axis=1)
    log(f"query int8 quantize (host): {(time.time()-t0)/nrep*1000:.1f} ms")
    t0 = time.time()
    for _ in range(nrep):
        xs = jnp.asarray(buf)
        sync(xs[0, :1])
    log(f"query upload+sync: {(time.time()-t0)/nrep*1000:.1f} ms")
    t0 = time.time()
    for _ in range(nrep):
        ph = np.asarray(packed)
    log(f"result D2H [8192x22]: {(time.time()-t0)/nrep*1000:.1f} ms")
    t0 = time.time()
    for _ in range(nrep):
        D, Iu, lz, _ = _unpack_results(ph, 10)
        ids = np.where(Iu >= 0, base._ids_host[np.maximum(Iu, 0)], -1)
    log(f"host unpack+id-translate: {(time.time()-t0)/nrep*1000:.1f} ms")

    gtf = "/root/repo/bench_gt_cache.npz"
    if os.path.exists(gtf):
        with np.load(gtf) as z:
            gt = z["gt"]
        from faiss_tpu.utils.evaluation import recall_at_k

        _, If, _, _ = _unpack_results(np.asarray(packed), 10)
        sm_ids = base._ids_host
        If = np.where(If >= 0, sm_ids[np.maximum(If, 0)], -1)
        log(f"program recall@10 = {recall_at_k(If, gt, 10):.4f}")
        log(f"e2e recall@10 = {recall_at_k(I, gt, 10):.4f}")


if __name__ == "__main__":
    main()
