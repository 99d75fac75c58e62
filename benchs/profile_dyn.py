"""Profile the dynamic-chunk fused IVFPQ search (implem_12 analogue) on TPU.

Prints per-tile probed-chunk union stats for an nprobe sweep (the skip
factor), then times the dyn program at chosen nprobes and reports recall
vs the cached ground truth.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchs/profile_dyn.py [nprobes]
(default "32,64,128"; stats are printed for all of 16,32,64,128,256)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[dyn] {msg}", file=sys.stderr, flush=True)


def sync(a):
    return np.asarray(a).ravel()[0]


def main():
    nprobes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "32,64,128").split(",")]
    import jax
    import jax.numpy as jnp

    import faiss_tpu as ft
    from faiss_tpu.models.ivf_pq import (
        _dyn_probe_counts,
        _fused_search_rerank,
        _fused_search_rerank_dyn,
        _unpack_results,
    )

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
        base = ft.IndexIVFPQFastScan(None, d, 4096, 32, 4)
        base.cp.niter = 20
        index = ft.IndexRefineFlat(base)
        index.k_factor = 12
        index.train(xt)
        index.add(xb)
        ft.write_index(index, cache)
    base = index.base_index

    log("staging (_build_brute with proximity packing + refine consolidate)")
    t0 = time.time()
    br = base._build_brute()
    refine_xb = index.refine_index._consolidate()
    sync(br["n2s"][0, :1])
    log(f"staged in {time.time()-t0:.1f}s; nchunks={br['nchunks']} "
        f"cpg={br['cpg']} max_span={br['max_span']}")

    xq_dev = jnp.asarray(xq.astype(np.float16))
    qt = 256

    # --- probe-union stats: the skip factor per nprobe
    for np_ in (16, 32, 64, 128, 256):
        t0 = time.time()
        cnt = np.asarray(_dyn_probe_counts(
            xq_dev, br["centroids_g"], br["cn2g"], br["chunk_first"],
            br["chunk_last"], np_, qt, br["max_span"], br["nchunks"],
        ))
        log(f"nprobe={np_}: tile chunk-union max={cnt.max()} "
            f"mean={cnt.mean():.0f} of {br['nchunks']} "
            f"(skip {br['nchunks']/max(cnt.mean(),1):.1f}x) "
            f"[{time.time()-t0:.1f}s]")

    gtf = "/root/repo/bench_gt_cache.npz"
    gt = None
    if os.path.exists(gtf):
        with np.load(gtf) as z:
            gt = z["gt"]
    from faiss_tpu.utils.evaluation import recall_at_k

    args = (
        xq_dev, br["centroids_g"], br["cn2g"], br["cbt"], br["codesT"],
        br["n2s"], br["lid"], br["slot_map_dev"], refine_xb,
    )
    k, kc = 10, 120
    for np_ in nprobes:
        cnt = np.asarray(_dyn_probe_counts(
            xq_dev, br["centroids_g"], br["cn2g"], br["chunk_first"],
            br["chunk_last"], np_, qt, br["max_span"], br["nchunks"],
        ))
        msteps = min(br["nchunks"], -(-int(cnt.max()) // 64) * 64)
        t0 = time.time()
        packed = _fused_search_rerank_dyn(
            *args, br["chunk_first"], br["chunk_last"], br["cgroup"],
            k, kc, qt, base.FUSED_CT, np_, msteps, br["max_span"],
        )
        sync(packed[0, :1])
        log(f"nprobe={np_} msteps={msteps}: compile+run {time.time()-t0:.1f}s")
        t0 = time.time()
        nrep = 3
        for _ in range(nrep):
            packed = _fused_search_rerank_dyn(
                *args, br["chunk_first"], br["chunk_last"], br["cgroup"],
                k, kc, qt, base.FUSED_CT, np_, msteps, br["max_span"],
            )
        sync(packed[0, :1])
        ms = (time.time() - t0) / nrep * 1000
        D, I, lossy, nd = _unpack_results(packed, k)
        slots = I
        ids = np.where(slots >= 0, base._ids_host[np.maximum(slots, 0)], -1)
        msg = (f"nprobe={np_} msteps={msteps}: warm {ms:.1f} ms -> "
               f"{nq/ms*1000:.0f} QPS program-only, dropped={int(nd)}")
        if gt is not None:
            msg += f", recall@10={recall_at_k(ids, gt, 10):.4f}"
        log(msg)


if __name__ == "__main__":
    main()
