"""Profile the v3 fused ADC kernel (precomputed one-hot) vs v2 on TPU.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchs/profile_v3.py [variants]

variants: comma list from {v2, bf16, int8, int8q2, bf16c2048, int8c2048}
(default "bf16,int8"). Each new kernel shape costs a remote Mosaic compile
(1-10 min) — pick variants deliberately.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[v3] {msg}", file=sys.stderr, flush=True)


def sync(a):
    return np.asarray(a).ravel()[0]


def main():
    variants = (sys.argv[1] if len(sys.argv) > 1 else "bf16,int8").split(",")
    import jax
    import jax.numpy as jnp

    import faiss_tpu as ft
    from faiss_tpu.ops import pq_ops
    from faiss_tpu.ops.pallas_knn import ivfpq_fused_pallas, ivfpq_fused_pallas_v3
    from faiss_tpu.ops.quantize_lut import expand_onehot, quantize_luts_int8

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

    log("staging _build_brute")
    t0 = time.time()
    br = base._build_brute()
    sync(br["n2s"][0, :1])
    S = br["codesT"].shape[1]
    log(f"staged in {time.time()-t0:.1f}s; S={S} chunks={S//base.FUSED_CT}")

    xq_dev = jnp.asarray(xq)

    @jax.jit
    def prologue(xq_dev):
        luts = -2.0 * (xq_dev @ br["cbt"])
        cm2 = -2.0 * jax.lax.dot_general(
            xq_dev, br["centroids_g"], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return luts, cm2

    luts_f32, cm2 = prologue(xq_dev)
    luts_bf16 = luts_f32.astype(jnp.bfloat16)
    sync(luts_bf16[0, :1])

    M, ksub = base.pq.M, base.pq.ksub
    luts3 = luts_f32.reshape(nq, M, ksub)
    q8, meta = quantize_luts_int8(luts3)
    sync(q8[0, :1])
    zero_meta = jnp.zeros((nq, 256), jnp.float32)

    def timeit(fn, nrep=3):
        out = fn()
        sync(out[0][0, :1])  # compile+run
        t0 = time.time()
        for _ in range(nrep):
            out = fn()
        sync(out[0][0, :1])
        return out, (time.time() - t0) / nrep * 1000.0

    results = {}
    oh_cache = {}

    def get_oh(int8):
        key = "int8" if int8 else "bf16"
        if key not in oh_cache:
            t0 = time.time()
            oh = expand_onehot(br["codesT"], br["lid"], ksub, int8)
            sync(oh[0, :1])
            log(f"ohT[{key}] staged {oh.shape} in {time.time()-t0:.1f}s")
            oh_cache[key] = oh
        return oh_cache[key]

    for var in variants:
        log(f"=== variant {var} ===")
        t0 = time.time()
        if var.startswith("v2"):
            qd = 2 if "q2" in var else 3
            fn = lambda qd=qd: ivfpq_fused_pallas(
                cm2, luts_bf16, br["codesT"], br["n2s"], br["lid"],
                qt=256, ct=base.FUSED_CT, qdepth=qd,
            )
        elif var.startswith("bf16"):
            ct = 2048 if var.endswith("2048") else base.FUSED_CT
            qd = 2 if "q2" in var else 3
            oh = get_oh(False)
            fn = lambda ct=ct, qd=qd, oh=oh: ivfpq_fused_pallas_v3(
                cm2, luts_bf16, zero_meta, oh, br["n2s"], qt=256, ct=ct,
                qdepth=qd,
            )
        elif var.startswith("int8"):
            ct = 2048 if var.endswith("2048") else base.FUSED_CT
            qd = 2 if "q2" in var else 3
            oh = get_oh(True)
            fn = lambda ct=ct, qd=qd, oh=oh: ivfpq_fused_pallas_v3(
                cm2, q8, meta, oh, br["n2s"], qt=256, ct=ct, qdepth=qd,
            )
        else:
            log(f"unknown variant {var}")
            continue
        (v, s, ev), ms = timeit(fn)
        log(f"{var}: compile+3 reps in {time.time()-t0:.1f}s; warm {ms:.1f} ms "
            f"-> {nq/ms*1000:.0f} QPS kernel-only")
        lossy = np.asarray(jnp.min(ev, -1) < v[:, 119])
        log(f"{var}: lossy rows at kc=120: {int(lossy.sum())}/{nq}")
        results[var] = (np.asarray(v), np.asarray(s), ms)

    # exact numpy ADC cross-check on 4 queries
    codes_h = np.asarray(base._codes_host, np.int64)
    ln_h = base._listnos_host.astype(np.int64)
    cb_h = base.pq.centroids
    cent_h = base._centroids_host()
    luts_h = -2.0 * np.einsum(
        "qmd,mkd->qmk", xq[:4].reshape(4, M, d // M), cb_h
    ).reshape(4, -1)
    cb2 = (cb_h**2).sum(-1)
    cmk = cent_h.reshape(base.nlist, M, d // M)
    t2 = cb2[None] + 2.0 * np.einsum("cmd,mkd->cmk", cmk, cb_h)
    t2sum = np.zeros(len(codes_h), np.float64)
    for m in range(M):
        t2sum += t2[:, m, :][ln_h, codes_h[:, m]]
    n2_h = (cent_h**2).sum(1)[ln_h] + t2sum
    cm2_h = -2.0 * (xq[:4] @ cent_h.T)
    offs = np.arange(M) * ksub
    smap = br["slot_map"]
    for var, (v, s, ms) in results.items():
        for q in range(4):
            ipq = luts_h[q][(codes_h + offs)].sum(-1)
            key = n2_h + cm2_h[q, ln_h] + ipq
            ref100 = np.sort(key)[:100]
            got_slots = s[q]
            got_slots = smap[got_slots[got_slots >= 0]]
            got = np.sort(key[got_slots])[:100]
            miss = int((np.abs(got - ref100) > 1e-2 * np.abs(ref100) + 1e-3).sum())
            if miss:
                log(f"{var} q{q}: top-100 mismatches vs exact ADC: {miss}")
        log(f"{var}: cross-check done")

    # candidate-set recall vs cached GT (post exact-rerank proxy: does the
    # top-120 candidate set contain the true top-10?)
    gtf = "/root/repo/bench_gt_cache.npz"
    if os.path.exists(gtf):
        with np.load(gtf) as z:
            gt = z["gt"]
        ids_h = base._ids_host
        for var, (v, s, ms) in results.items():
            cand = np.where(s >= 0, smap[np.maximum(s, 0)], -1)[:, :120]
            cand_ids = np.where(cand >= 0, ids_h[np.maximum(cand, 0)], -1)
            inter = np.array([
                len(np.intersect1d(cand_ids[i], gt[i, :10]))
                for i in range(nq)
            ])
            log(f"{var}: candidate recall@10 (top-120 contains GT10): "
                f"{inter.mean()/10:.4f}")


if __name__ == "__main__":
    main()
