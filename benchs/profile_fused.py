"""Stage-by-stage profile of the fused big-batch IVFPQ search path on TPU.

Builds (or reloads from .profile_index.npz) the bench index, then times:
  1. XLA prologue only (LUTs + grouped coarse bias GEMM)
  2. fused ADC kernel dispatch only
  3. full _fused_search_rerank program
  4. end-to-end index.search

Timing uses a host read of one output element (block_until_ready does not
sync under the axon tunnel — NOTES.md). Run alone: host/tunnel contention
skews everything.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchs/profile_fused.py
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

    log("staging (_build_brute + refine consolidate)")
    t0 = time.time()
    br = base._build_brute()
    refine_xb = index.refine_index._consolidate()
    sync(br["n2s"][0, :1])
    log(f"staged in {time.time()-t0:.1f}s; "
        f"S={br['codesT'].shape[1]} chunks={br['codesT'].shape[1]//base.FUSED_CT}")

    from faiss_tpu.models.ivf_pq import _fused_search_rerank, _unpack_results
    from faiss_tpu.ops import pq_ops
    from faiss_tpu.ops.pallas_knn import ivfpq_fused_pallas

    xq_dev = jnp.asarray(xq)
    cb = base.pq._dev()

    # --- stage 1: prologue (LUTs via block-diag GEMM + bias GEMM)
    @jax.jit
    def prologue(xq_dev):
        luts = -2.0 * (xq_dev @ br["cbt"])
        cm2 = -2.0 * jax.lax.dot_general(
            xq_dev, br["centroids_g"], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return luts.astype(jnp.bfloat16), cm2

    t0 = time.time()
    luts, cm2 = prologue(xq_dev)
    sync(luts[0, :1])
    log(f"prologue compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(3):
        luts, cm2 = prologue(xq_dev)
    sync(luts[0, :1]); sync(cm2[0, :1])
    log(f"prologue warm: {(time.time()-t0)/3*1000:.1f} ms")

    # --- stage 2: kernel only
    t0 = time.time()
    v, s, ev = ivfpq_fused_pallas(
        cm2, luts, br["codesT"], br["n2s"], br["lid"],
        qt=256, ct=base.FUSED_CT,
    )
    sync(v[0, :1])
    log(f"kernel compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    nrep = 3
    for _ in range(nrep):
        v, s, ev = ivfpq_fused_pallas(
            cm2, luts, br["codesT"], br["n2s"], br["lid"],
            qt=256, ct=base.FUSED_CT,
        )
    sync(v[0, :1])
    log(f"kernel warm: {(time.time()-t0)/nrep*1000:.1f} ms")
    lossy = np.asarray(jnp.min(ev, -1) < v[:, 119])
    log(f"lossy rows at kc=120: {int(lossy.sum())} / {nq}")

    # --- stage 3: full fused program
    t0 = time.time()
    packed = _fused_search_rerank(
        xq_dev, br["centroids_g"], br["cn2g"], br["cbt"], br["codesT"],
        br["n2s"], br["lid"], br["slot_map_dev"], refine_xb, 10, 120, 256,
        base.FUSED_CT, 0,
    )
    sync(packed[0, :1])
    log(f"fused program compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(nrep):
        packed = _fused_search_rerank(
            xq_dev, br["centroids_g"], br["cn2g"], br["cbt"], br["codesT"],
            br["n2s"], br["lid"], br["slot_map_dev"], refine_xb, 10, 120,
            256, base.FUSED_CT, 0,
        )
    sync(packed[0, :1])
    D, I, lz, _ = _unpack_results(packed, 10)
    log(f"fused program warm: {(time.time()-t0)/nrep*1000:.1f} ms")
    log(f"fused lossy flags: {int(np.asarray(lz).sum())}")

    # --- stage 4: end-to-end + recall
    t0 = time.time()
    D, I = index.search(xq, 10)
    log(f"index.search first: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(nrep):
        D, I = index.search(xq, 10)
    log(f"index.search warm: {(time.time()-t0)/nrep*1000:.1f} ms "
        f"-> {nq*nrep/(time.time()-t0):.0f} QPS")
    gtf = "/root/repo/bench_gt_cache.npz"
    if os.path.exists(gtf):
        with np.load(gtf) as z:
            gt = z["gt"]
        from faiss_tpu.utils.evaluation import recall_at_k

        log(f"recall@10 = {recall_at_k(I, gt, 10):.4f}")
        flags = np.asarray(lz)
        if flags.any() and not flags.all():
            log(f"  flagged rows ({int(flags.sum())}): "
                f"recall {recall_at_k(I[flags], gt[flags], 10):.4f}")
            log(f"  clean rows: "
                f"recall {recall_at_k(I[~flags], gt[~flags], 10):.4f}")

    # --- exact numpy ADC cross-check of kernel slot indices (4 rows)
    codes_h = np.asarray(base._codes_host, np.int64)
    ln_h = base._listnos_host.astype(np.int64)
    cb_h = base.pq.centroids
    cent_h = base._centroids_host()
    luts_h = -2.0 * np.einsum(
        "qmd,mkd->qmk", xq[:4].reshape(4, 32, 4), cb_h
    ).reshape(4, -1)
    cb2 = (cb_h**2).sum(-1)
    cmk = cent_h.reshape(base.nlist, 32, 4)
    t2 = cb2[None] + 2.0 * np.einsum("cmd,mkd->cmk", cmk, cb_h)
    t2sum = np.zeros(len(codes_h), np.float64)
    for m in range(32):
        t2sum += t2[:, m, :][ln_h, codes_h[:, m]]
    n2_h = (cent_h**2).sum(1)[ln_h] + t2sum
    offs = np.arange(32) * 16
    v4, s4, _ = ivfpq_fused_pallas(
        cm2[:256], luts[:256], br["codesT"], br["n2s"], br["lid"],
        qt=256, ct=base.FUSED_CT,
    )
    cm2_h = -2.0 * (xq[:4] @ cent_h.T)
    for q in range(4):
        ipq = luts_h[q][(codes_h + offs)].sum(-1)
        key = n2_h + cm2_h[q, ln_h] + ipq
        ref_sorted = np.sort(key)[:128]
        got_slots = np.asarray(s4)[q]
        got_slots = br["slot_map"][got_slots[got_slots >= 0]]
        got = np.sort(key[got_slots])
        miss = np.abs(got[:100] - ref_sorted[:100]) > 1e-2 * np.abs(
            ref_sorted[:100]
        )
        log(f"  q{q}: kernel top-100 vs exact ADC mismatches: {miss.sum()}")


if __name__ == "__main__":
    main()
