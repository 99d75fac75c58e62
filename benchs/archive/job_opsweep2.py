# Interleaved operating-point timing: round-robin the candidate configs,
# record EVERY rep, report min/median per config. The tunnel's bandwidth
# drifts on minute timescales, so sequential per-config loops alias the
# weather onto configs; interleaving + min-statistics de-aliases it.
import json

k = 10
configs = [(2, 12), (4, 12), (2, 8), (3, 8)]
times = {c: [] for c in configs}
recalls = {}
# warm all shapes once
for c in configs:
    base.nprobe, index.k_factor = c[0], c[1]
    base.strict_probe = False
    _, I = index.search(xq, k)
    recalls[c] = float(recall_at_k(I, gt, k))
for rnd in range(6):
    for c in configs:
        base.nprobe, index.k_factor = c[0], c[1]
        t0 = time.time()
        _, I = index.search(xq, k)
        times[c].append(time.time() - t0)
for c in configs:
    ts = sorted(times[c])
    ms_min, ms_med = ts[0] * 1000, ts[len(ts) // 2] * 1000
    log("OPS2 " + json.dumps(dict(
        nprobe=c[0], kf=c[1], ms_min=round(ms_min, 1),
        ms_med=round(ms_med, 1), qps_min=round(8192 / ts[0]),
        qps_med=round(8192 * 1000 / ms_med), recall=round(recalls[c], 4),
        all_ms=[round(t * 1000) for t in times[c]],
    )))
