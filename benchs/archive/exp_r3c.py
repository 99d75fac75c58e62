"""Round-3 experiment session C (TPU): kernel cost bisection + nprobe.

Measures (clean machine — nothing else running):
  1. MXU-only floor: score GEMM + per-step min write, NO select machinery
  2. full recon program, qdepth=1 vs 2 at fmax=48+rot
  3. masked program at nprobe in {8,16,32}: recall + time (does masking
     cost, and how much recall headroom nprobe leaves)
  4. ct=4096 kernel variant
  5. clean e2e at pb=8192 (single dispatch) vs 4096, tuned knobs

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchs/exp_r3c.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[exp] {m}", file=sys.stderr, flush=True)


def sync(a):
    return np.asarray(a).ravel()[0]


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import faiss_tpu as ft
    from faiss_tpu.utils.evaluation import recall_at_k

    rs = np.random.RandomState(42)
    d, nb, nq = 128, 1_000_000, 8192
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

    log("loading cached index")
    index = ft.read_index("/root/repo/.profile_index.npz")
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
    qt, ct = 256, base.FUSED_CT
    S = br["yT"].shape[1]

    # ---- 1. MXU-only floor ---------------------------------------------
    def noselect_kernel(q_ref, yT_ref, n2_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            out_ref[:] = jnp.full(out_ref.shape, jnp.inf, jnp.float32)

        q = q_ref[:]
        q_hi = q.astype(jnp.bfloat16)
        q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        y = yT_ref[:]
        ip = jax.lax.dot_general(
            q_hi, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            q_lo, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        skey = n2_ref[:] - 2.0 * ip
        m = skey[:, :128]
        for t in range(1, ct // 128):
            m = jnp.minimum(m, skey[:, t * 128 : (t + 1) * 128])
        out_ref[:] = jnp.minimum(out_ref[:], m)

    @functools.partial(jax.jit, static_argnames=())
    def floor_call(xq_dev, yT, n2):
        return pl.pallas_call(
            noselect_kernel,
            grid=(nq // qt, S // ct),
            in_specs=[
                pl.BlockSpec((qt, d), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, ct), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ct), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((qt, 128), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nq, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(xq_dev, yT, n2)

    t0 = time.time()
    out = floor_call(xq_dev, br["yT"], br["n2s"])
    sync(out[0, :1])
    log(f"MXU-only floor compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(nrep):
        out = floor_call(xq_dev, br["yT"], br["n2s"])
    sync(out[0, :1])
    log(f"MXU-only floor warm: {(time.time()-t0)/nrep*1000:.1f} ms")

    # ---- 2. qdepth sweep at fmax=48 ------------------------------------
    xq_staged = _stage_queries(xq)
    for qdepth in (1, 2):
        t0 = time.time()
        packed = _fused_search_rerank_recon(
            xq_staged, br["centroids_g"], br["cn2g"], br["yT"], br["n2s"],
            br["lid"], br["slot_map_dev"], refine_xb, 10, 120, qt, ct, 0,
            qdepth=qdepth, fmax=48, sort_rot=True,
        )
        sync(packed[0, :1])
        log(f"program qdepth={qdepth} compile+run: {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(nrep):
            packed = _fused_search_rerank_recon(
                xq_staged, br["centroids_g"], br["cn2g"], br["yT"],
                br["n2s"], br["lid"], br["slot_map_dev"], refine_xb, 10,
                120, qt, ct, 0, qdepth=qdepth, fmax=48, sort_rot=True,
            )
        ph = np.asarray(packed)
        dt = (time.time() - t0) / nrep
        D, Iu, lz, _ = _unpack_results(ph, 10)
        ids = np.where(Iu >= 0, base._ids_host[np.maximum(Iu, 0)], -1)
        r = recall_at_k(ids, gt, 10)
        log(f"program qdepth={qdepth} fmax=48 rot warm: {dt*1000:.1f} ms "
            f"recall={r:.4f} lossy={int(lz.sum())}")

    # ---- 3. masked program: recall + cost per nprobe -------------------
    for nprobe in (8, 16, 32):
        t0 = time.time()
        packed = _fused_search_rerank_recon(
            xq_staged, br["centroids_g"], br["cn2g"], br["yT"], br["n2s"],
            br["lid"], br["slot_map_dev"], refine_xb, 10, 120, qt, ct,
            nprobe, qdepth=2, fmax=48, sort_rot=True,
        )
        sync(packed[0, :1])
        log(f"masked nprobe={nprobe} compile+run: {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(nrep):
            packed = _fused_search_rerank_recon(
                xq_staged, br["centroids_g"], br["cn2g"], br["yT"],
                br["n2s"], br["lid"], br["slot_map_dev"], refine_xb, 10,
                120, qt, ct, nprobe, qdepth=2, fmax=48, sort_rot=True,
            )
        ph = np.asarray(packed)
        dt = (time.time() - t0) / nrep
        D, Iu, lz, _ = _unpack_results(ph, 10)
        ids = np.where(Iu >= 0, base._ids_host[np.maximum(Iu, 0)], -1)
        r = recall_at_k(ids, gt, 10)
        log(f"masked nprobe={nprobe} warm: {dt*1000:.1f} ms "
            f"recall={r:.4f}")

    # ---- 4. ct=4096 ----------------------------------------------------
    if S % 4096 == 0:
        t0 = time.time()
        v, s, ev = ivf_recon_fused_pallas(
            xq_dev, br["yT"], br["n2s"], br["lid"], None,
            qt=qt, ct=4096, qdepth=2, fmax=48,
        )
        sync(v[0, :1])
        log(f"kernel ct=4096 compile+run: {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(nrep):
            v, s, ev = ivf_recon_fused_pallas(
                xq_dev, br["yT"], br["n2s"], br["lid"], None,
                qt=qt, ct=4096, qdepth=2, fmax=48,
            )
        sync(v[0, :1])
        log(f"kernel ct=4096 warm: {(time.time()-t0)/nrep*1000:.1f} ms")
    else:
        log(f"S={S} not divisible by 4096, skip ct=4096")

    # ---- 5. clean e2e ---------------------------------------------------
    for pb in (8192, 4096):
        base.pipeline_batch = pb
        base.fused_fmax = 48
        base.fused_sort_rot = True
        t0 = time.time()
        D, I = index.search(xq, 10)
        log(f"e2e pb={pb} first: {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(5):
            D, I = index.search(xq, 10)
        dt = (time.time() - t0) / 5
        r = recall_at_k(I, gt, 10)
        log(f"e2e pb={pb}: {dt*1000:.1f} ms -> {nq/dt:.0f} QPS "
            f"recall={r:.4f}")


if __name__ == "__main__":
    main()
