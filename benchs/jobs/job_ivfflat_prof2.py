# IVFFLAT-PROF2: follow-up to job_ivfflat_prof (hilo default measured:
# ct=1024 660 ms, ct=2048 418 ms @ 0.9993). Missing controls: single-plane
# at ct=2048/4096 (r3 baseline was ct=1024 @ 236 ms), hilo at ct=4096, and
# a shallower insert queue for the hilo scan. Each config gets its own
# staged store + dyn bucket so adaptive widening cannot confound rows.
import collections
import threading

xb = gen(1_000_000, 1)
xt = gen(200_000, 2)
ivf = ft.IndexIVFFlat(None, 128, 4096)
ivf.cp.niter = 10
ivf.strict_probe = False
ivf.query_h2d_dtype = "float16"
ivf.recon_scan_max_bytes = 8 << 30
t0 = time.time()
ivf.train(xt)
ivf.add(xb)
log(f"IVFFLAT-PROF2 train+add {time.time()-t0:.1f}s")
ivf.nprobe = 2
ivf.pipeline_batch = 4096

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
    # (label, ct, hilo, qdepth)
    ("sp ct=2048", 2048, False, 3),
    ("sp ct=4096", 4096, False, 3),
    ("hilo ct=4096", 4096, True, 3),
    ("hilo ct=2048 qdepth=2", 2048, True, 2),
]

brutes = {}


def set_cfg(ct, hilo, qd):
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
    ivf.refined_qdepth = qd


res = collections.defaultdict(list)
recs = {}
for label, ct, hilo, qd in CONFIGS:
    set_cfg(ct, hilo, qd)
    t0 = time.time()
    _, I = ivf.search(xq, 10)
    brutes[(ct, hilo)] = (ivf._brute, ivf._dyn_bucket)
    recs[label] = recall_at_k(I, gt, 10)
    log(f"IVFFLAT-PROF2 warm [{label}]: {time.time()-t0:.1f}s "
        f"recall@10={recs[label]:.4f} msteps={dict(ivf._dyn_bucket or {})} "
        f"nchunks={ivf._brute['nchunks']}")
for rep in range(3):
    for label, ct, hilo, qd in CONFIGS:
        set_cfg(ct, hilo, qd)
        dt, _ = stream_threaded(ivf)
        res[label].append(dt)
for label, *_ in CONFIGS:
    v = sorted(res[label])
    med = v[len(v) // 2]
    log(f"IVFFLAT-PROF2 [{label}]: med {med*1000:.1f} ms/batch "
        f"({8192/med:.0f} QPS), best {8192/v[0]:.0f} QPS, "
        f"recall@10={recs[label]:.4f}")
