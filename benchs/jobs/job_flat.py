# FLAT: exact-search e2e re-measurement post round-3 plumbing (VERDICT r3
# #5: single-read result chain + streaming submit/collect). Targets:
# k=100 <= 350 ms / 8192 q, k=1024 <= 3 s. BASELINE rows 8-9
# (reference benchs/README.md:194-204).
import threading

xb = gen(1_000_000, 1)
flat = ft.IndexFlatL2(128)
flat.add(xb)

NSTREAM = 6


def stream_threaded(idx, k, depth=2):
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
            h = idx.search_submit(xq, k)
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


for k in (100, 1024):
    t0 = time.time()
    D, I = flat.search(xq, k)
    log(f"FLAT k={k} first (incl compile): {time.time()-t0:.1f}s")
    if k == 100:
        r = recall_at_k(I[:, :10], gt, 10)
        log(f"FLAT k=100 top-10 vs gt: {r:.4f} (must be 1.0)")
    times = []
    for _ in range(5):
        t0 = time.time()
        D, I = flat.search(xq, k)
        times.append(time.time() - t0)
    times.sort()
    med = times[len(times) // 2]
    log(f"FLAT k={k} single-call: med {med*1000:.0f} ms / 8192 q "
        f"({8192/med:.0f} QPS), best {times[0]*1000:.0f} ms")
    try:
        dt, outs = stream_threaded(flat, k)
        log(f"FLAT k={k} threaded stream: {dt*1000:.0f} ms/batch "
            f"({8192/dt:.0f} QPS)")
    except Exception as e:
        log(f"FLAT k={k} stream failed: {e!r}")

from faiss_tpu.models.flat import striped_stats

log(f"FLAT striped stats: {striped_stats} "
    f"(flag rate {striped_stats['flagged']/max(1, striped_stats['nq']):.5f})")

# hardware exactness gate for the striped path: striped vs the cascade
# (both exact contracts) must agree on ids and f32 distances
nchk = 512
D_s, I_s = flat.search(xq[:nchk], 1024)
flat.flat_striped = False
t0 = time.time()
D_c, I_c = flat.search(xq[:nchk], 1024)
log(f"FLAT k=1024 cascade ref on {nchk} q: {time.time()-t0:.1f}s")
flat.flat_striped = True
agree = (I_s == I_c).mean()
# ties may swap adjacent ranks between accumulation orders — distances
# must match EXACTLY at every rank regardless
import numpy as _np

_np.testing.assert_allclose(_np.sort(D_s, 1), _np.sort(D_c, 1), rtol=1e-6,
                            atol=1e-5)
log(f"FLAT k=1024 striped-vs-cascade: id agreement {agree:.5f}, "
    f"rank-distance allclose OK")
