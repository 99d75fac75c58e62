"""Persistent TPU experiment server: stage the bench index ONCE, then
exec python job snippets dropped into /tmp/exp_job.py (renamed to .running
while executing). Results append to /tmp/exp_server.log. Kills the
12-minute re-staging cost of one-shot experiment scripts.

Globals available to jobs: jax, jnp, np, ft, index, base, br, refine_xb,
xq, xq_staged, gt, recall_at_k, sync(), log(), time.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchs/exp_server.py
Stop: touch /tmp/exp_stop
"""

import faulthandler
import os
import signal
import sys
import time
import traceback

import numpy as np

# kill -USR1 <pid> dumps all thread stacks to stderr (tunnel-hang triage)
faulthandler.register(signal.SIGUSR1, all_threads=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOB = "/tmp/exp_job.py"
STOP = "/tmp/exp_stop"
LOG = "/tmp/exp_server.log"


def log(m):
    with open(LOG, "a") as f:
        f.write(f"[{time.strftime('%H:%M:%S')}] {m}\n")
    print(m, file=sys.stderr, flush=True)


def sync(a):
    return np.asarray(a).ravel()[0]


def main():
    # Probe the tunnel in a KILLABLE subprocess first: axon init inside
    # this process would hang unrecoverably when the tunnel is down, and
    # the retry wrapper can only restart us after an exit.
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            timeout=240,
            capture_output=True,
        )
        ok = r.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        log("server: TPU tunnel down (probe failed) — exiting for retry")
        sys.exit(3)

    import jax
    import jax.numpy as jnp

    import faiss_tpu as ft
    from faiss_tpu.utils.evaluation import recall_at_k

    rs = np.random.RandomState(42)
    d, nq = 128, 8192
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
    with np.load("/root/repo/bench_gt_cache.npz") as z:
        gt = z["gt"]

    log("server: loading cached index")
    index = ft.read_index("/root/repo/.profile_index.npz")
    base = index.base_index
    base.nprobe = 4096
    t0 = time.time()
    br = base._build_brute()
    refine_xb = index.refine_index._consolidate()
    sync(br["yT"][0, :1])
    log(f"server: staged in {time.time()-t0:.1f}s — ready for jobs")

    from faiss_tpu.models import ivf_pq as ivf_pq_mod

    xq_staged = ivf_pq_mod._stage_queries(xq)
    g = dict(
        jax=jax, jnp=jnp, np=np, ft=ft, index=index, base=base, br=br,
        refine_xb=refine_xb, xq=xq, xq_staged=xq_staged, gt=gt,
        recall_at_k=recall_at_k, sync=sync, log=log, time=time,
        ivf_pq=ivf_pq_mod, gen=gen,
    )
    while not os.path.exists(STOP):
        if os.path.exists(JOB):
            run = JOB + ".running"
            os.rename(JOB, run)
            code = open(run).read()
            log(f"server: job start ({len(code)} bytes)")
            try:
                exec(compile(code, run, "exec"), g)
                log("server: job done")
            except Exception:
                log("server: job FAILED\n" + traceback.format_exc())
            os.remove(run)
        time.sleep(1.0)
    log("server: stop requested")


if __name__ == "__main__":
    main()
