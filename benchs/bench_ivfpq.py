"""IVF-PQ QPS/recall sweep (analogue of benchs/bench_gpu_sift1m.py IVFPQ
phase). Smaller than bench.py; useful for iterating on kernels."""

import time

import numpy as np


def main(nb=200_000, nq=4096, d=64, nlist=1024, M=16):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import faiss_tpu as ft
    from faiss_tpu.utils.evaluation import recall_at_k

    rs = np.random.RandomState(0)
    xb = rs.rand(nb, d).astype(np.float32)
    xq = rs.rand(nq, d).astype(np.float32)
    xt = rs.rand(100_000, d).astype(np.float32)

    flat = ft.IndexFlatL2(d)
    flat.add(xb)
    _, gt = flat.search(xq, 10)

    base = ft.IndexIVFPQFastScan(None, d, nlist, M, 4)
    index = ft.IndexRefineFlat(base)
    index.k_factor = 8
    index.train(xt)
    index.add(xb)
    index.search(xq[:128], 10)  # warm
    t0 = time.time()
    _, I = index.search(xq, 10)
    dt = time.time() - t0
    print(f"IVF{nlist},PQ{M}x4fs,RFlat: {dt*1000:.1f} ms / {nq} q "
          f"({nq/dt:.0f} QPS), recall@10 {recall_at_k(I, gt, 10):.4f}")


if __name__ == "__main__":
    main()
