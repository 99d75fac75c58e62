# exp_server job: anatomy of the streamed serving path + threaded pipeline.
# Globals: jax, jnp, np, ft, index, base, br, refine_xb, xq, xq_staged, gt,
# recall_at_k, sync, log, time, ivf_pq, gen.
import threading

# quiet-host guard: wait for any background pytest to finish (one core —
# concurrent CPU work doubles every e2e number, NOTES.md)
import os
for _ in range(240):
    try:
        pid = int(open("/tmp/pytest.pid").read().strip())
        os.kill(pid, 0)  # raises when gone
        time.sleep(15)
    except Exception:
        break
log("JOB3: host quiet — starting")

k = 10
base.nprobe = 1
base.strict_probe = False
base.pipeline_batch = 2048
index.k_factor = 12

log("JOB3: warm both kf shapes")
for kf in (12, 8):
    index.k_factor = kf
    _, Iw = index.search(xq, k)
    log(f"warm kf={kf} recall={recall_at_k(Iw, gt, k):.4f}")

def stream(nstream=8, depth=2, kf=12, label=""):
    index.k_factor = kf
    ts = []
    for rep in range(3):
        t0 = time.time()
        hs, outs = [], []
        for i in range(nstream):
            hs.append(index.search_submit(xq, k))
            if i >= depth:
                outs.append(index.search_collect(hs[i - depth]))
        for h in hs[len(outs):]:
            outs.append(index.search_collect(h))
        ts.append((time.time() - t0) / nstream)
    ts.sort()
    r = recall_at_k(outs[-1][1], gt, k)
    log(f"STREAM {label} kf={kf} depth={depth}: med {ts[1]*1000:.1f} ms/b "
        f"min {ts[0]*1000:.1f} -> {8192/ts[1]:.0f} qps recall={r:.4f}")
    return ts[1]

def stream_threaded(nstream=8, kf=12):
    # submit in the main thread, collect in a worker: if the tunnel client
    # allows concurrent RPCs (GIL released on IO), upload of batch i+1
    # overlaps the packed read of batch i
    index.k_factor = kf
    ts = []
    for rep in range(3):
        results = [None] * nstream
        hq = []
        lock = threading.Condition()
        done = [0]
        def collector():
            got = 0
            while got < nstream:
                with lock:
                    while len(hq) <= got:
                        lock.wait()
                    h = hq[got]
                results[got] = index.search_collect(h)
                got += 1
        th = threading.Thread(target=collector)
        t0 = time.time()
        th.start()
        for i in range(nstream):
            h = index.search_submit(xq, k)
            with lock:
                hq.append(h)
                lock.notify()
        th.join()
        ts.append((time.time() - t0) / nstream)
    ts.sort()
    r = recall_at_k(results[-1][1], gt, k)
    log(f"THREADED kf={kf}: med {ts[1]*1000:.1f} ms/b min {ts[0]*1000:.1f} "
        f"-> {8192/ts[1]:.0f} qps recall={r:.4f}")
    return ts[1]

# interleave configs to decorrelate tunnel weather
for rep in range(2):
    stream(kf=12, depth=2, label=f"r{rep}")
    stream(kf=8, depth=2, label=f"r{rep}")
    stream(kf=12, depth=4, label=f"r{rep}")
    base.rt_econ = True
    stream(kf=12, depth=2, label=f"r{rep}-rtecon")
    base.rt_econ = False
    stream_threaded(kf=12)
    stream_threaded(kf=8)

# overlap probe: can an upload ride under a running kernel?
import jax.numpy as _j
big = np.random.RandomState(0).randn(1024, 128).astype(np.float32)
# serial: kernel read then upload
h = index.search_submit(xq, k)
index.search_collect(h)
t0 = time.time(); h = index.search_submit(xq, k)
tsub = time.time() - t0
up = jnp.asarray(big); sync(up[0, :1])
tup = time.time() - t0 - tsub
index.search_collect(h)
tcol = time.time() - t0 - tsub - tup
log(f"OVERLAP: submit {tsub*1000:.1f} upload-during-compute {tup*1000:.1f} "
    f"collect {tcol*1000:.1f} ms")
