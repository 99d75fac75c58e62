"""Brute-force kNN micro-bench (analogue of the reference's
benchs/bench_gpu_sift1m.py exact-search phase). Prints ms/batch and QPS for
the fused Pallas kernel and the XLA fallback paths."""

import time

import numpy as np


def main(nb=1_000_000, nq=8192, d=128, k=100):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import faiss_tpu as ft

    rs = np.random.RandomState(0)
    xb = rs.rand(nb, d).astype(np.float32)
    xq = rs.rand(nq, d).astype(np.float32)
    index = ft.IndexFlatL2(d)
    index.add(xb)
    t0 = time.time()
    index.search(xq[:128], k)
    print(f"warmup/compile: {time.time()-t0:.1f}s")
    for _ in range(2):
        t0 = time.time()
        D, I = index.search(xq, k)
        dt = time.time() - t0
        print(f"search {nq} x {nb} x {d} k={k}: {dt*1000:.1f} ms "
              f"({nq/dt:.0f} QPS)")


if __name__ == "__main__":
    main()
