"""IVF-Flat nprobe sweep (BASELINE.md driver config #3; reference analogue:
benchs/bench_gpu_sift1m.py IVF16384,Flat row — 0.068 s / 10k q at nprobe=32
on a Titan X). SIFT1M-scale synthetic, nlist=4096."""

import sys
import time

import numpy as np


def log(m):
    print(f"[ivfflat] {m}", flush=True)


def main(nb=1_000_000, nq=8192, d=128, nlist=4096):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    sys.path.insert(0, "/root/repo")
    import faiss_tpu as ft

    rs = np.random.RandomState(42)
    ncent = 2048
    cent = rs.rand(ncent, d).astype(np.float32)
    scales = (1.0 / (np.arange(d) + 1.0)).astype(np.float32) * 0.4

    def gen(n, seed):
        r = np.random.RandomState(seed)
        a = r.randint(ncent, size=n)
        return (cent[a] + r.randn(n, d).astype(np.float32) * scales).astype(
            np.float32
        )

    xb, xt, xq = gen(nb, 1), gen(200_000, 2), gen(nq, 3)
    gtf = "/root/repo/bench_gt_cache.npz"
    import os

    if os.path.exists(gtf):
        with np.load(gtf) as z:
            gt = z["gt"]
    else:
        flat = ft.IndexFlatL2(d)
        flat.add(xb)
        _, gt = flat.search(xq, 10)

    from faiss_tpu.utils.evaluation import recall_at_k

    index = ft.IndexIVFFlat(None, d, nlist)
    index.cp.niter = 20
    t0 = time.time()
    index.train(xt)
    log(f"train: {time.time()-t0:.1f}s")
    t0 = time.time()
    index.add(xb)
    index._build_brute()  # fused big-batch staging (the serving path);
    # the padded per-probe layout (_build_device) stays lazy — it only
    # backs small batches and lossy-row repairs
    log(f"add+stage: {time.time()-t0:.1f}s")

    for nprobe in (1, 8, 32, 64):
        index.nprobe = nprobe
        t0 = time.time()
        D, I = index.search(xq, 10)
        first = time.time() - t0
        t0 = time.time()
        D, I = index.search(xq, 10)
        dt = time.time() - t0
        r = recall_at_k(I, gt, 10)
        log(
            f"nprobe={nprobe}: {dt*1000:.1f} ms / {nq} q "
            f"({nq/dt:.0f} QPS) recall@10={r:.4f} "
            f"(first incl compile {first:.1f}s)"
        )


if __name__ == "__main__":
    main()
