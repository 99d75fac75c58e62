# exp_server job: operating-point sweep for the headline bench.
# Serve the max-QPS (nprobe, k_factor) point clearing recall@10 >= 0.955
# (contract is 0.95; 0.005 margin for data/seed drift). Each combo pays a
# one-time remote kernel compile for its new (msteps, kc) shapes, so sweep
# in decreasing-likelihood order and log compile time separately.

import json

k = 10
results = []
for nprobe, kf in [(4, 12), (2, 12), (3, 12), (2, 8), (3, 8), (2, 6)]:
    base.nprobe = nprobe
    base.strict_probe = False
    index.k_factor = kf
    t0 = time.time()
    _, I = index.search(xq, k)  # first call compiles new shapes
    t_compile = time.time() - t0
    r0 = recall_at_k(I, gt, k)
    nrep = 5
    t0 = time.time()
    for _ in range(nrep):
        _, I = index.search(xq, k)
    dt = (time.time() - t0) / nrep
    r = recall_at_k(I, gt, k)
    qps = len(xq) / dt
    line = dict(nprobe=nprobe, k_factor=kf, ms=round(dt * 1000, 1),
                qps=round(qps), recall=round(float(r), 4),
                first_s=round(t_compile, 1))
    results.append(line)
    log("OPSWEEP " + json.dumps(line))

ok = [r for r in results if r["recall"] >= 0.955]
best = max(ok, key=lambda r: r["qps"]) if ok else None
log("OPSWEEP BEST " + json.dumps(best))
