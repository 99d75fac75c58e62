"""TPU kernel exactness smoke test — gates the two flagship Pallas kernels
against reference computations ON HARDWARE (the CPU test suite covers them
only in interpret mode). Runs in ~1-2 min warm; each kernel shape pays its
remote compile on first use in a fresh process.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchs/smoke_tpu.py
Exit code 0 = all checks passed.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(f"[smoke] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        log("no accelerator — nothing to smoke-test")
        return

    rs = np.random.RandomState(7)

    # ---- 1. fused brute-force kNN vs numpy exact ------------------------
    from faiss_tpu.ops.pallas_knn import knn_fused_pallas

    d, nb, nq = 128, 1 << 15, 512
    xb = rs.rand(nb, d).astype(np.float32)
    xq = rs.rand(nq, d).astype(np.float32)
    yT = np.ascontiguousarray(xb.T)
    t0 = time.time()
    v, i, ev = knn_fused_pallas(
        jnp.asarray(xq), jnp.asarray(yT), np.int32(nb), qt=512, ct=1024
    )
    v, i, ev = np.asarray(v), np.asarray(i), np.asarray(ev)
    log(f"flat kernel ran in {time.time()-t0:.1f}s (incl compile)")

    dist = (
        (xq**2).sum(1)[:, None] + (xb**2).sum(1)[None, :] - 2 * xq @ xb.T
    )
    ref = np.sort(dist, 1)[:, :128]
    lossy = ev.min(1) < v[:, 127]
    clean = ~lossy
    err = np.abs(np.maximum(ref[clean], 0) - v[clean]) / np.maximum(
        ref[clean], 1e-6
    )
    assert (err < 1e-4).all(), f"flat kernel mismatch: max rel {err.max()}"
    assert lossy.mean() < 0.05, f"flat kernel lossy rate {lossy.mean()}"
    log(f"flat kernel exact on {clean.sum()}/{nq} rows "
        f"({int(lossy.sum())} flagged lossy -> caller repairs)")

    # ---- 2. fused ADC+select vs numpy exact ADC --------------------------
    from faiss_tpu.models.ivf_pq import pack_invlists_grouped
    from faiss_tpu.ops.pallas_knn import ivfpq_fused_pallas

    M, ksub, nlist, n, ct, nq2 = 32, 16, 256, 1 << 16, 1024, 256
    codes = rs.randint(ksub, size=(n, M)).astype(np.uint8)
    listnos = rs.randint(nlist, size=n).astype(np.int32)
    n2v = rs.rand(n).astype(np.float32) * 4
    luts = rs.randn(nq2, M * ksub).astype(np.float32)
    cm2 = (rs.randn(nq2, nlist) * 10).astype(np.float32)

    g = pack_invlists_grouped(listnos, nlist, ct)
    pos, order = g["pos"], g["order"]
    codesT = np.zeros((M, g["S"]), np.uint8)
    codesT[:, pos] = codes[order].T
    n2s = np.full((1, g["S"]), np.inf, np.float32)
    n2s[0, pos] = n2v[order]
    lp = g["list_perm"]
    biasg = np.zeros((nq2, len(lp)), np.float32)
    biasg[:, lp >= 0] = cm2[:, lp[lp >= 0]]

    t0 = time.time()
    v, s, ev = ivfpq_fused_pallas(
        jnp.asarray(biasg),
        jnp.asarray(luts, jnp.bfloat16),
        jnp.asarray(codesT),
        jnp.asarray(n2s),
        jnp.asarray(g["lid"][None, :]),
        qt=256,
        ct=ct,
    )
    v, s, ev = np.asarray(v), np.asarray(s), np.asarray(ev)
    log(f"ADC kernel ran in {time.time()-t0:.1f}s (incl compile)")

    # reference ADC with the same bf16 LUT rounding
    luts_rounded = np.asarray(
        jnp.asarray(luts, jnp.bfloat16).astype(jnp.float32)
    )
    offs = np.arange(M) * ksub
    ipq = np.stack(
        [luts_rounded[q][(codes.astype(np.int64) + offs)].sum(-1)
         for q in range(0, nq2, 8)]
    )
    sub = np.arange(0, nq2, 8)
    full = n2v[None] + cm2[sub][:, listnos] + ipq
    ref = np.sort(full, 1)[:, :128]
    lossy = ev[sub].min(1) < v[sub, 127]
    got = v[sub]
    clean = ~lossy
    err = np.abs(got[clean] - ref[clean]) / np.maximum(np.abs(ref[clean]), 1)
    assert (err < 2e-3).all(), f"ADC kernel mismatch: max rel {err.max()}"
    assert lossy.mean() < 0.2, f"ADC lossy rate {lossy.mean()}"
    # slots must reproduce their own keys
    smap = g["slot_map"]
    for q in range(0, len(sub), 8):
        qq = sub[q]
        sl = smap[s[qq][s[qq] >= 0]]
        keys = n2v[sl] + cm2[qq, listnos[sl]] + luts_rounded[qq][
            (codes[sl].astype(np.int64) + offs)
        ].sum(-1)
        err = np.abs(np.sort(keys) - np.sort(v[qq][s[qq] >= 0]))
        assert (err < 1e-2 * np.maximum(np.abs(keys), 1)).all()
    log(f"ADC kernel exact on {clean.sum()}/{len(sub)} sampled rows "
        f"({int(lossy.sum())} flagged)")

    # ---- 3. k=1024 chained-rank-buffer cascade vs numpy ------------------
    t0 = time.time()
    v, i, ev = knn_fused_pallas(
        jnp.asarray(xq[:256]), jnp.asarray(yT), np.int32(nb),
        qt=256, ct=1024, k_lanes=1024,
    )
    v, i, ev = np.asarray(v), np.asarray(i), np.asarray(ev)
    log(f"k=1024 cascade ran in {time.time()-t0:.1f}s (incl compile)")
    ref = np.sort(dist[:256], 1)[:, :1024]
    lossy = ev.min(1) < v[:, 1023]
    clean = ~lossy
    err = np.abs(np.maximum(ref[clean], 0) - v[clean]) / np.maximum(
        ref[clean], 1e-6
    )
    assert (err < 1e-4).all(), f"cascade mismatch: max rel {err.max()}"
    assert lossy.mean() < 0.10, f"cascade lossy rate {lossy.mean()}"
    log(f"k=1024 cascade exact on {clean.sum()}/256 rows")

    # ---- 4+5. recon-GEMM + dyn-chunk kernels through the index API ------
    # (the serving-path kernels: exhaustive recon scan, then the
    # scalar-prefetch dynamic-chunk scan with a selective nprobe)
    import faiss_tpu as ft
    from faiss_tpu.models.ivf_pq import ivf_fast_scan_stats

    d2, nb2, nq3, nlist2 = 64, 1 << 16, 256, 256
    xb2 = rs.rand(nb2, d2).astype(np.float32)
    xq3 = rs.rand(nq3, d2).astype(np.float32)
    base = ft.IndexIVFPQFastScan(None, d2, nlist2, 16, 4)
    base.FUSED_CT = 1024
    base.big_batch_threshold = 1
    base.cp.niter = 4
    index = ft.IndexRefineFlat(base)
    index.k_factor = 8
    index.train(xb2[: 1 << 14])
    index.add(xb2)
    d_exact = (
        (xq3**2).sum(1)[:, None] + (xb2**2).sum(1)[None, :]
        - 2 * xq3 @ xb2.T
    )
    gt10 = np.argsort(d_exact, 1)[:, :10]

    def check(tag, nprobe, strict, min_recall):
        base.nprobe = nprobe
        base.strict_probe = strict
        t0 = time.time()
        D, I = index.search(xq3, 10)
        log(f"{tag} ran in {time.time()-t0:.1f}s (incl compile)")
        # re-rank contract: D must be the EXACT distance of each result
        got = d_exact[np.arange(nq3)[:, None], I]
        err = np.abs(np.maximum(got, 0) - D) / np.maximum(got, 1e-5)
        assert (err < 1e-3).all(), f"{tag} rerank mismatch {err.max()}"
        rec = np.mean(
            [len(set(I[q]) & set(gt10[q])) / 10.0 for q in range(nq3)]
        )
        assert rec >= min_recall, f"{tag} recall {rec:.4f} < {min_recall}"
        log(f"{tag}: recall@10 {rec:.4f}, rerank exact")

    check("recon-GEMM kernel (exhaustive)", nlist2, True, 0.85)
    ivf_fast_scan_stats.reset()
    check("dyn-chunk kernel (soft nprobe=2)", 2, False, 0.55)
    assert ivf_fast_scan_stats.chunks_skipped > 0, "dyn path not engaged"
    log(f"dyn-chunk: {ivf_fast_scan_stats.chunks_scanned} scanned / "
        f"{ivf_fast_scan_stats.chunks_skipped} skipped chunks")
    log("ALL SMOKE CHECKS PASSED")


if __name__ == "__main__":
    main()
