# BASELINE.md row 12: k-means 8.1M x 784 -> 256 centroids, 20 iters.
# Reference: 140.6 s total on one 2015 GPU (benchs/README.md:253-257,
# kmeans_mnist.py on MNIST8m). MNIST8m is uint8 pixel data, so the
# TPU-native path keeps the points uint8 in HBM (6.35 GB — fits the
# single v5e; f32 would be 25.4 GB and would not) and decodes each scan
# chunk to an EXACT bf16 plane on the fly (every value in [0,255] is
# exact in bf16).
#
# Reported separately (VERDICT r4 #6):
#   device_s  — the 20-iteration Lloyd loop, data already resident
#   upload_s  — the one-time 6.35 GB H2D over the ~45 MB/s tunnel
#   e2e_s     — Kmeans.train() wall-clock (upload + compile + loop)
#
# Run: PYTHONPATH=/root/repo:/root/.axon_site python \
#   benchs/jobs/job_kmeans_row12.py
import json
import os
import sys
import time

import numpy as np

N, D, K, NITER = 8_100_000, 784, 256, 20
DATA = "/root/repo/.mnist8m_u8.npy"
OUT = "/root/repo/benchs/results/kmeans_row12.json"


def log(m):
    print(f"[row12] {m}", file=sys.stderr, flush=True)


def load_or_gen():
    """MNIST8m-shaped synthetic pixels: 256 digit-prototype images +
    per-image jitter, clipped to [0, 255] uint8 (the real set is uint8
    pixels; generation is deterministic and disk-cached)."""
    if os.path.exists(DATA):
        log("loading cached uint8 data")
        return np.load(DATA, mmap_mode="r")
    rs = np.random.RandomState(42)
    protos = (rs.rand(512, D) ** 2 * 255).astype(np.int16)
    t0 = time.time()
    x = np.lib.format.open_memmap(
        DATA + ".tmp", mode="w+", dtype=np.uint8, shape=(N, D)
    )
    bs = 500_000
    for s in range(0, N, bs):
        m = min(bs, N - s)
        pi = rs.randint(512, size=m)
        jit = rs.randint(-24, 25, size=(m, D), dtype=np.int16)
        np.clip(protos[pi] + jit, 0, 255, out=jit)
        x[s : s + m] = jit.astype(np.uint8)
    x.flush()
    os.rename(DATA + ".tmp", DATA)
    log(f"generated in {time.time()-t0:.0f}s")
    return np.load(DATA, mmap_mode="r")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    import faiss_tpu as ft
    from faiss_tpu.ops import kmeans_ops as ko

    x = load_or_gen()
    x = np.ascontiguousarray(x)  # host RAM (125 GB) holds it fine
    results = {}

    # ---- e2e through the public API (includes upload + compile) -------
    km = ft.Kmeans(D, K, niter=NITER, seed=1234,
                   max_points_per_centroid=10**9)
    t0 = time.time()
    obj = km.train(x)
    e2e = time.time() - t0
    log(f"e2e train {e2e:.1f}s obj {obj:.6g}")

    # ---- phase-separated: upload, then the resident 20-iter loop ------
    t0 = time.time()
    xd = jnp.asarray(x)
    np.asarray(xd[0, 0])  # host read = real sync under the axon tunnel
    t_up = time.time() - t0
    log(f"upload {t_up:.1f}s ({x.nbytes/1e9:.2f} GB)")

    rs = np.random.RandomState(1234)
    init = x[rs.permutation(N)[:K]].astype(np.float32)
    key = jax.random.PRNGKey(1234)

    def run_loop():
        cdev = jnp.asarray(init)
        kk = key
        per = []
        for _ in range(NITER):
            kk, sub = jax.random.split(kk)
            cdev, obj_d, ss, tt, ns, cnt = ko.kmeans_fused_iter(
                xd, cdev, sub, None, chunk=1 << 17
            )
            per.append(obj_d)
        objs = jax.device_get(per)  # syncs the whole chain
        return cdev, [float(o) for o in objs]

    t0 = time.time()
    cdev, objs_warmup = run_loop()  # compile + run
    t_first = time.time() - t0
    t0 = time.time()
    cdev, objs = run_loop()
    t_dev = time.time() - t0
    log(f"device loop: first {t_first:.1f}s (incl compile), "
        f"warm {t_dev:.1f}s for {NITER} iters")

    # ---- objective verification on a host subsample -------------------
    cen = np.asarray(cdev)
    sub = x[:: N // 200_000][:200_000].astype(np.float32)
    cn = (cen**2).sum(1)
    best = np.full(len(sub), np.inf, np.float32)
    for s in range(0, len(sub), 20_000):
        blk = sub[s : s + 20_000]
        d2 = (blk**2).sum(1)[:, None] + cn[None] - 2.0 * blk @ cen.T
        best[s : s + 20_000] = np.maximum(d2.min(1), 0)
    # device objective per point vs host f32 per point (same centroids)
    host_obj_pp = float(best.mean())
    dev_obj_pp = objs[-1] / N
    log(f"obj/pt: device {dev_obj_pp:.6g} vs host-f32 subsample "
        f"{host_obj_pp:.6g}")

    results = dict(
        n=N, d=D, k=K, niter=NITER,
        e2e_s=round(e2e, 1),
        upload_s=round(t_up, 1),
        device_s=round(t_dev, 1),
        device_first_s=round(t_first, 1),
        baseline_total_s=140.6,
        vs_baseline_device=round(140.6 / t_dev, 2),
        obj_final=objs[-1],
        obj_per_point_device=dev_obj_pp,
        obj_per_point_host_f32_subsample=host_obj_pp,
        objs_monotone=bool(np.all(np.diff(objs) <= 1e-4 * objs[0])),
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
