"""Brute-force kNN micro-bench (analogue of the reference's
benchs/bench_gpu_sift1m.py exact-search phase). Prints ms/batch and QPS for
the fused Pallas kernel and the XLA fallback paths."""

import sys
import time

import numpy as np


def main(nb=1_000_000, nq=8192, d=128, ks=(100,), check=True):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import faiss_tpu as ft

    rs = np.random.RandomState(0)
    xb = rs.rand(nb, d).astype(np.float32)
    xq = rs.rand(nq, d).astype(np.float32)
    index = ft.IndexFlatL2(d)
    index.add(xb)
    for k in ks:
        t0 = time.time()
        D, I = index.search(xq, k)
        print(f"k={k} first (incl compile): {time.time()-t0:.1f}s",
              flush=True)
        if check:
            # exactness spot check vs numpy on 16 rows
            sub = xq[:: max(1, nq // 16)][:16]
            dist = (
                (sub**2).sum(1)[:, None]
                + (xb**2).sum(1)[None, :]
                - 2 * sub @ xb.T
            )
            ref = np.sort(dist, 1)[:, :k]
            got = D[:: max(1, nq // 16)][:16]
            err = np.abs(np.maximum(ref, 0) - got) / np.maximum(ref, 1e-6)
            print(f"k={k} exactness vs numpy (16 rows): "
                  f"max rel err {err.max():.2e}", flush=True)
        for _ in range(2):
            t0 = time.time()
            D, I = index.search(xq, k)
            dt = time.time() - t0
            print(f"search {nq} x {nb} x {d} k={k}: {dt*1000:.1f} ms "
                  f"({nq/dt:.0f} QPS)", flush=True)


if __name__ == "__main__":
    ks = tuple(int(a) for a in sys.argv[1:]) or (100,)
    main(ks=ks)
