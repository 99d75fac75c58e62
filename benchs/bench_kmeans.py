"""k-means training micro-bench (analogue of benchs/kmeans_mnist.py /
BASELINE.md row 12)."""

import time

import numpy as np


def main(n=500_000, d=128, k=4096, niter=20):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import faiss_tpu as ft

    rs = np.random.RandomState(0)
    x = rs.rand(n, d).astype(np.float32)
    km = ft.Kmeans(d, k, niter=niter, max_points_per_centroid=10**9)
    t0 = time.time()
    km.train(x)
    dt = time.time() - t0
    print(f"kmeans {n}x{d} -> {k} centroids, {niter} iters: {dt:.1f}s "
          f"(obj {km.obj[-1]:.4g})")


if __name__ == "__main__":
    main()
