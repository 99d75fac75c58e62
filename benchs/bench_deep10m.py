"""Deep10M-scale realistic-data benchmark (BASELINE.json config 4 analogue).

Generates a strongly-CLUSTERED 10M x 96 dataset shaped like Deep1B's
descriptors (row-normalized CNN embeddings, hierarchical cluster
structure — contrib/datasets.py:155 DatasetDeep1B is the loader the
reference uses; no network egress here, so the distribution is synthetic:
a two-level mixture with anisotropic within-cluster scales, rows
L2-normalized like the real set).

Configs measured (committed to NOTES.md):
  1. OPQ32,IVF8192,PQ32x4fs,RFlat  (the Deep10M OPQ32 m=32 FastScan row)
  2. IVF8192,Flat soft-probe big batch
  3. Flat exact k=1024 on the 10M set

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchs/bench_deep10m.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[deep10m] {m}", file=sys.stderr, flush=True)


D, NB, NQ, NT = 96, 10_000_000, 8192, 500_000
NCOARSE, NSUB = 1024, 64  # two-level mixture: 65536 effective modes

# on-disk data cache: generation is ~45 min on this 1-core host, so every
# resume/sibling run (operating-point sweep, bench_sharded_10m) loads it
DATA_XB = "/root/repo/.deep10m_xb.npy"
DATA_XT = "/root/repo/.deep10m_xt.npy"
DATA_XQ = "/root/repo/.deep10m_xq.npy"


def gen_deep(n, seed, coarse, subdirs, scales, out=None):
    """Rows from the two-level mixture, L2-normalized (Deep1B-style)."""
    r = np.random.RandomState(seed)
    if out is None:
        out = np.empty((n, D), np.float32)
    bs = 1_000_000
    for s in range(0, n, bs):
        m = min(bs, n - s)
        ci = r.randint(NCOARSE, size=m)
        si = r.randint(NSUB, size=m)
        x = (
            coarse[ci]
            + 0.25 * subdirs[ci, si]
            + r.randn(m, D).astype(np.float32) * scales[None, :] * 0.05
        )
        x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-9
        out[s : s + m] = x
    return out


def load_or_gen_data(log=log):
    """Cached (xb, xt, xq); xb is memory-mapped (3.8 GB)."""
    if os.path.exists(DATA_XB):
        log("loading Deep10M data from .npy cache")
        return (
            np.load(DATA_XB, mmap_mode="r"),
            np.load(DATA_XT),
            np.load(DATA_XQ),
        )
    rs = np.random.RandomState(7)
    coarse = rs.randn(NCOARSE, D).astype(np.float32)
    coarse /= np.linalg.norm(coarse, axis=1, keepdims=True)
    subdirs = rs.randn(NCOARSE, NSUB, D).astype(np.float32) * 0.3
    scales = (1.0 / np.sqrt(np.arange(D) + 1.0)).astype(np.float32)

    log("generating Deep10M-like data (10M x 96, two-level mixture)")
    t0 = time.time()
    # xb streams straight into the cache memmap (gen is ~45 min/10M on
    # this 1-core host; a crash must not lose it)
    xb = np.lib.format.open_memmap(
        DATA_XB + ".tmp", mode="w+", dtype=np.float32, shape=(NB, D)
    )
    gen_deep(NB, 1, coarse, subdirs, scales, out=xb)
    xb.flush()
    os.rename(DATA_XB + ".tmp", DATA_XB)
    xt = gen_deep(NT, 2, coarse, subdirs, scales)
    xq = gen_deep(NQ, 3, coarse, subdirs, scales)
    log(f"data in {time.time()-t0:.0f}s")
    np.save(DATA_XT, xt)
    np.save(DATA_XQ, xq)
    return np.load(DATA_XB, mmap_mode="r"), xt, xq


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import faiss_tpu as ft
    from faiss_tpu.utils.evaluation import recall_at_k

    xb, xt, xq = load_or_gen_data()

    gt_cache = "/root/repo/.deep10m_gt.npz"
    flat = None
    if os.path.exists(gt_cache):
        with np.load(gt_cache) as z:
            gt = z["gt"]
        log("gt loaded from cache")
    else:
        log("exact GT via IndexFlatL2 on TPU (one compile + 3.8GB upload)")
        t0 = time.time()
        flat = ft.IndexFlatL2(D)
        flat.add(xb)
        _, gt = flat.search(xq, 100)
        log(f"gt in {time.time()-t0:.0f}s")
        np.savez_compressed(gt_cache, gt=gt)

    results = {}
    out_path = "/root/repo/benchs/results/deep10m.json"
    if os.path.exists(out_path):
        with open(out_path) as f:
            results.update(json.load(f))
        log(f"resuming with {list(results)} already measured")

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    import threading

    def timed_stream(idx, xq, k, nrep=5, depth=3):
        """Median per-call latency + threaded-collector steady-state
        throughput (bench.py's serving pipeline: collect of batch i rides
        under submit of batch i+1 on a concurrent tunnel RPC)."""
        times = []
        for _ in range(nrep):
            t0 = time.time()
            _, I = idx.search(xq, k)
            times.append(time.time() - t0)
        times.sort()
        nstream = max(nrep, 6)
        outs = [None] * nstream
        hq = []
        cv = threading.Condition()
        slots = threading.Semaphore(depth)
        collect_err = []

        def collector():
            try:
                for i in range(nstream):
                    with cv:
                        while len(hq) <= i:
                            cv.wait()
                        h = hq[i]
                    if h is None:
                        return
                    outs[i] = idx.search_collect(h)
                    slots.release()
            except BaseException as e:
                collect_err.append(e)

        th = threading.Thread(target=collector, daemon=True)
        t0 = time.time()
        th.start()
        try:
            for i in range(nstream):
                slots.acquire()
                h = idx.search_submit(xq, k)
                with cv:
                    hq.append(h)
                    cv.notify()
        except BaseException:
            with cv:
                hq.extend([None] * (nstream - len(hq)))
                cv.notify_all()
            raise
        th.join()
        if collect_err:
            raise collect_err[0]
        dt_stream = (time.time() - t0) / nstream
        return times[len(times) // 2], dt_stream, outs[-1][1]

    import gc

    # ---- config 1: OPQ32,IVF8192,PQ32x4fs,RFlat ------------------------
    run1 = "deep10m_opq_ivfpq_fs" not in results
    # operating-point re-sweep on the CLUSTERED data (VERDICT r3 #1:
    # nprobe-soft x k_factor, the SIFT1M-tuned point must re-earn itself)
    run_sweep = "deep10m_opq_sweep" not in results
    if not (run1 or run_sweep):
        log("config 1 + sweep cached — skipping")
    else:
        ckpt1 = "/root/repo/.deep10m_idx1.bin"
        if os.path.exists(ckpt1):
            log("loading OPQ32,IVF8192,PQ32x4fs,RFlat from checkpoint")
            index = ft.read_index(ckpt1)
            refine = index.index
            base = refine.base_index
            b = results.get("_build1", {})
            t_train, t_add = b.get("train_s", -1), b.get("add_s", -1)
            t0 = time.time()
            base._build_brute()
            log(f"restage {time.time()-t0:.0f}s")
        else:
            log("building OPQ32,IVF8192,PQ32x4fs,RFlat")
            t0 = time.time()
            base = ft.IndexIVFPQFastScan(None, D, 8192, 32, 4)
            base.cp.niter = 20
            refine = ft.IndexRefineFlat(base, store_float16=True)
            opq = ft.OPQMatrix(D, 32)
            index = ft.IndexPreTransform(opq, refine)
            index.train(xt)
            t_train = time.time() - t0
            t0 = time.time()
            index.add(xb)
            t_add = time.time() - t0
            # checkpoint BEFORE staging: a staging OOM must not lose the
            # ~15 min train+add
            ft.write_index(index, ckpt1)
            log(f"train {t_train:.0f}s add {t_add:.0f}s — checkpoint written")
            t0 = time.time()
            base._build_brute()
            t_stage = time.time() - t0
            t_add += t_stage
            log(f"stage {t_stage:.0f}s (add+stage {t_add:.0f}s)")
            results["_build1"] = dict(
                train_s=round(t_train, 1), add_s=round(t_add, 1),
                stage_s=round(t_stage, 1),
            )
            dump()
        base.nprobe = 8
        base.strict_probe = False
        refine.k_factor = 12
        if run1:
            _, I = index.search(xq, 10)  # compile
            ft.ivf_fast_scan_stats.reset()
            dt, dt_stream, I = timed_stream(index, xq, 10)
            s = ft.ivf_fast_scan_stats
            r = recall_at_k(I, gt[:, :10], 10)
            results["deep10m_opq_ivfpq_fs"] = dict(
                qps=round(NQ / dt), qps_stream=round(NQ / dt_stream),
                ms=round(dt * 1000, 1),
                recall10=round(float(r), 4), train_s=round(t_train, 1),
                add_s=round(t_add, 1), nprobe=base.nprobe,
                lossy_row_frac=round(s.lossy_rows / max(1, s.nq), 5),
                chunk_scan_frac=round(
                    s.chunks_scanned
                    / max(1, s.chunks_scanned + s.chunks_skipped), 4),
            )
            dump()
            log("OPQ-IVFPQ-fs: "
                + json.dumps(results["deep10m_opq_ivfpq_fs"]))
        if run_sweep:
            rows = []
            for npb, kf in ((4, 8), (4, 12), (8, 8), (8, 12), (16, 12)):
                base.nprobe = npb
                refine.k_factor = kf
                t0 = time.time()
                _, I = index.search(xq, 10)  # warm/compile this shape
                warm_s = time.time() - t0
                r = recall_at_k(I, gt[:, :10], 10)
                ft.ivf_fast_scan_stats.reset()
                dt, dt_stream, _ = timed_stream(index, xq, 10, nrep=3)
                s = ft.ivf_fast_scan_stats
                row = dict(
                    nprobe=npb, k_factor=kf,
                    recall10=round(float(r), 4),
                    qps=round(NQ / dt), qps_stream=round(NQ / dt_stream),
                    ms=round(dt * 1000, 1), warm_first_s=round(warm_s, 1),
                    chunk_scan_frac=round(
                        s.chunks_scanned
                        / max(1, s.chunks_scanned + s.chunks_skipped), 4),
                )
                rows.append(row)
                log(f"sweep point {json.dumps(row)}")
            results["deep10m_opq_sweep"] = rows
            dump()

        # free the PQ index's device stores before the next config
        del index, base, refine
        gc.collect()

    # ---- config 2: IVF8192,Flat soft-probe -----------------------------
    if "deep10m_ivf_flat" in results:
        log("config 2 cached — skipping")
        run2 = False
    else:
        run2 = True
    if run2:
        ckpt2 = "/root/repo/.deep10m_idx2.bin"
        if os.path.exists(ckpt2):
            log("loading IVF8192,Flat from checkpoint")
            ivf = ft.read_index(ckpt2)
        else:
            log("building IVF8192,Flat")
            t0 = time.time()
            ivf = ft.IndexIVFFlat(None, D, 8192)
            ivf.cp.niter = 20
            ivf.train(xt)
            ivf.add(xb)
            log(f"ivf-flat build {time.time()-t0:.0f}s")
            ft.write_index(ivf, ckpt2)
            log("checkpoint written")
        ivf.nprobe = 8
        ivf.strict_probe = False
        # clustered data concentrates bf16 distances: run the selection
        # queue at the kernel cap so eviction-floor flags (each an exact
        # replay) stay rare; the re-rank is exact either way
        ivf.big_batch_kc = 128
        # brute_hilo (default): hi+lo bf16 planes = 2 x 2.6 GB + the
        # 3.8 GB f32 store for exact re-rank. Single-plane measured 219
        # QPS here: 89.8% of rows flagged the eviction floor into the
        # exact replay; f32-faithful keys make flags rare
        ivf.recon_scan_max_bytes = 12 << 30
        ivf.pipeline_batch = 2048
        t0 = time.time()
        ivf._build_brute()
        log(f"ivf-flat stage {time.time()-t0:.0f}s")
        _, I = ivf.search(xq, 10)
        ft.ivf_fast_scan_stats.reset()
        dt, dt_stream, I = timed_stream(ivf, xq, 10)
        s = ft.ivf_fast_scan_stats
        r = recall_at_k(I, gt[:, :10], 10)
        results["deep10m_ivf_flat"] = dict(
            qps=round(NQ / dt), qps_stream=round(NQ / dt_stream),
            ms=round(dt * 1000, 1),
            recall10=round(float(r), 4), nprobe=ivf.nprobe,
            kc=ivf.big_batch_kc, hilo=bool(ivf.brute_hilo),
            # bf16 selection-margin flag rate on CLUSTERED data (round-3
            # verdict weak #5: distance concentration is worst here)
            lossy_row_frac=round(s.lossy_rows / max(1, s.nq), 5),
            chunk_scan_frac=round(
                s.chunks_scanned
                / max(1, s.chunks_scanned + s.chunks_skipped), 4),
        )
        dump()
        log(f"IVF-Flat: {json.dumps(results['deep10m_ivf_flat'])}")
        del ivf
        gc.collect()

    # ---- config 3: flat exact k=1024 -----------------------------------
    if "deep10m_flat_k1024" in results:
        log("config 3 cached — skipping")
        print(json.dumps(results))
        return
    log("flat exact k=1024")
    if flat is None:
        flat = ft.IndexFlatL2(D)
        flat.add(xb)
    _, I = flat.search(xq[:2048], 1024)
    t0 = time.time()
    _, I = flat.search(xq[:2048], 1024)
    dt = time.time() - t0
    results["deep10m_flat_k1024"] = dict(
        s_per_2048q=round(dt, 2), qps=round(2048 / dt)
    )
    dump()
    log(f"flat k=1024: {json.dumps(results['deep10m_flat_k1024'])}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
