"""Standalone runner for benchs/jobs/*.py snippets that only need the
bench data distribution (gen/xq/gt) — no staged IVFPQ index. Skips
exp_server's .profile_index staging for jobs that build their own index.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchs/run_job.py \
           benchs/jobs/job_ivfflat_stream.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[job {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def sync(a):
    return np.asarray(a).ravel()[0]


def main():
    job_path = sys.argv[1]
    import jax

    # mirror bench.py: persistent compile cache so job runs reuse shapes
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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
    # NOTE: the gt cache is ONLY valid for xb = gen(1_000_000, 1) (the
    # bench.py database). Jobs that build a different database must
    # recompute recall themselves.
    gt_path = "/root/repo/bench_gt_cache.npz"
    if not os.path.exists(gt_path):
        sys.exit(
            "run_job: missing /root/repo/bench_gt_cache.npz — run "
            "`python bench.py` once to generate it (gt is for gen(1M, seed=1))"
        )
    with np.load(gt_path) as z:
        gt = z["gt"]

    g = dict(
        jax=jax, jnp=jnp, np=np, ft=ft, xq=xq, gt=gt,
        recall_at_k=recall_at_k, sync=sync, log=log, time=time, gen=gen,
    )
    code = open(job_path).read()
    log(f"job start: {job_path}")
    exec(compile(code, job_path, "exec"), g)
    log("job done")


if __name__ == "__main__":
    main()
