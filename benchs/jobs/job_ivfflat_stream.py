# IVFFLAT-STREAM: IVF-Flat streaming throughput (f32-exact and f16 opt-in).
# Builds its own IVF-Flat from the bench distribution (1M x 128).
xb = gen(1_000_000, 1)
xt = gen(200_000, 2)
ivf = ft.IndexIVFFlat(None, 128, 4096)
ivf.cp.niter = 10
ivf.nprobe = 2
ivf.strict_probe = False
ivf.pipeline_batch = 4096
t0 = time.time()
ivf.train(xt)
log(f"IVFFLAT-STREAM train {time.time()-t0:.1f}s")
t0 = time.time()
ivf.add(xb)
ivf._build_brute()
log(f"IVFFLAT-STREAM add+stage {time.time()-t0:.1f}s")

def stream(idx, nstream, depth):
    t0 = time.time()
    hs, outs = [], []
    for i in range(nstream):
        hs.append(idx.search_submit(xq, 10))
        if i >= depth:
            outs.append(idx.search_collect(hs[i - depth]))
    for h in hs[len(outs):]:
        outs.append(idx.search_collect(h))
    return (time.time() - t0) / nstream, outs

for qdt in (None, "float16"):
    ivf.query_h2d_dtype = qdt
    t0 = time.time()
    D, I = ivf.search(xq, 10)
    log(f"IVFFLAT-STREAM warm q={qdt}: {time.time()-t0:.1f}s recall={recall_at_k(I, gt, 10):.4f}")
import collections
acc = collections.defaultdict(list)
for rep in range(4):
    for qdt in (None, "float16"):
        for depth in (2, 4):
            ivf.query_h2d_dtype = qdt
            dt, outs = stream(ivf, 6, depth)
            acc[(str(qdt), depth)].append(8192 / dt)
            if rep == 0:
                r = recall_at_k(outs[2][1], gt, 10)
                log(f"IVFFLAT-STREAM q={qdt} depth={depth}: {dt*1000:.0f} ms/batch, {8192/dt:.0f} QPS, recall={r:.4f}")
for key, v in sorted(acc.items()):
    v = sorted(v)
    log(f"IVFFLAT-STREAM {key}: best {v[-1]:.0f}, med {v[len(v)//2]:.0f} QPS over {len(v)}")
