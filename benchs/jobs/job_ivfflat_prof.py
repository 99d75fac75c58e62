# IVFFLAT-PROF: find where the 235 ms/8192q at nprobe=2 goes (BASELINE
# config 3; target >=50k QPS @ R@10 >=0.99, current 34.7k). Knob sweep:
# FUSED_CT (fewer kernel steps at same HBM bytes), pipeline_batch,
# big_batch_kc (smaller exact re-rank), rt_econ (one staged upload).
# Each (ct, msteps-bucket) pair is a fresh remote kernel compile — keep
# the matrix small and interleave reps.
import collections
import threading

xb = gen(1_000_000, 1)
xt = gen(200_000, 2)
ivf = ft.IndexIVFFlat(None, 128, 4096)
ivf.cp.niter = 10
ivf.strict_probe = False
ivf.query_h2d_dtype = "float16"
ivf.recon_scan_max_bytes = 6 << 30
t0 = time.time()
ivf.train(xt)
log(f"IVFFLAT-PROF train {time.time()-t0:.1f}s")
t0 = time.time()
ivf.add(xb)
log(f"IVFFLAT-PROF add {time.time()-t0:.1f}s")
ivf.nprobe = 2

NSTREAM = 6


def stream_threaded(idx, depth=2):
    outs = [None] * NSTREAM
    hq = []
    cv = threading.Condition()
    slots = threading.Semaphore(depth)
    collect_err = []

    def collector():
        try:
            for i in range(NSTREAM):
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
        for i in range(NSTREAM):
            slots.acquire()
            h = idx.search_submit(xq, 10)
            with cv:
                hq.append(h)
                cv.notify()
    except BaseException:
        with cv:
            hq.extend([None] * (NSTREAM - len(hq)))
            cv.notify_all()
        raise
    th.join()
    if collect_err:
        raise collect_err[0]
    return (time.time() - t0) / NSTREAM, outs


CONFIGS = [
    # (label, ct, pb, kc, rt_econ, hilo)
    ("r3-base ct=1024 single-plane", 1024, 4096, 0, False, False),
    ("hilo ct=1024 (new default)", 1024, 4096, 0, False, True),
    ("hilo ct=2048", 2048, 4096, 0, False, True),
    ("hilo ct=2048 kc=32", 2048, 4096, 32, False, True),
    ("hilo ct=2048 pb=2048", 2048, 2048, 0, False, True),
    ("hilo ct=2048 rt_econ", 2048, 4096, 0, True, True),
]

brutes = {}  # staged store + dyn-bucket cache per (ct, hilo)


def set_cfg(ct, pb, kc, econ, hilo):
    key = (ct, hilo)
    if ivf.FUSED_CT != ct or ivf.brute_hilo != hilo or ivf._brute is None:
        ivf.FUSED_CT = ct
        ivf.brute_hilo = hilo
        if key in brutes:
            ivf._brute, ivf._dyn_bucket = brutes[key]
        else:
            ivf._brute = None
            ivf._build_brute()
            brutes[key] = (ivf._brute, ivf._dyn_bucket)
    ivf.pipeline_batch = pb
    ivf.big_batch_kc = kc
    ivf.rt_econ = econ


res = collections.defaultdict(list)
recs = {}
for label, ct, pb, kc, econ, hilo in CONFIGS:
    set_cfg(ct, pb, kc, econ, hilo)
    t0 = time.time()
    _, I = ivf.search(xq, 10)
    brutes[(ct, hilo)] = (ivf._brute, ivf._dyn_bucket)
    recs[label] = recall_at_k(I, gt, 10)
    msteps = dict(ivf._dyn_bucket or {})
    log(f"IVFFLAT-PROF warm [{label}]: {time.time()-t0:.1f}s "
        f"recall@10={recs[label]:.4f} msteps={msteps} "
        f"nchunks={ivf._brute['nchunks']}")
for rep in range(3):  # interleave so tunnel weather hits all configs
    for label, ct, pb, kc, econ, hilo in CONFIGS:
        set_cfg(ct, pb, kc, econ, hilo)
        dt, _ = stream_threaded(ivf)
        res[label].append(dt)
for label, *_ in CONFIGS:
    v = sorted(res[label])
    med = v[len(v) // 2]
    log(f"IVFFLAT-PROF [{label}]: med {med*1000:.1f} ms/batch "
        f"({8192/med:.0f} QPS), best {8192/v[0]:.0f} QPS, "
        f"recall@10={recs[label]:.4f}")
