# BLOCKSEL: large-k select rework experiment (VERDICT r4 #3).
# Hypothesis: exact k=1024 select = per-block exact top-m (small m -> the
# fast regime of XLA's TopK) over a row-shuffled db + merge + certificate,
# beats both the Pallas insert cascade (7.9 s / 8192 q) and the
# approx_min_k(rt=1.0) full sort. Measures each candidate primitive at
# nq=1024 x nb=1M, then the full composite.
#
# Run standalone: PYTHONPATH=/root/repo:/root/.axon_site python
#   benchs/jobs/job_blocksel.py
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    def log(m):
        print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

    def sync(a):
        return np.asarray(a).ravel()[0]

    NQ, NB, D = 1024, 1 << 20, 128
    key = jax.random.PRNGKey(0)
    # scores staged directly (the GEMM is measured separately)
    S = jax.random.uniform(key, (NQ, NB), jnp.float32)
    sync(S)
    log(f"staged S [{NQ},{NB}] f32")

    def timeit(label, fn, *args, reps=3):
        fn_j = jax.jit(fn)
        try:
            t0 = time.time()
            out = fn_j(*args)
            sync(jax.tree.leaves(out)[0])
            first = time.time() - t0
            ts = []
            for _ in range(reps):
                t0 = time.time()
                out = fn_j(*args)
                sync(jax.tree.leaves(out)[0])
                ts.append(time.time() - t0)
            ts.sort()
            log(f"BLOCKSEL {label}: med {ts[len(ts)//2]*1000:.0f} ms "
                f"(min {ts[0]*1000:.0f}, first {first:.1f}s)")
            return ts[len(ts) // 2]
        except Exception as e:
            log(f"BLOCKSEL {label}: FAILED {type(e).__name__}: "
                f"{str(e)[:160]}")
            return None

    # --- candidate per-block top-m primitives --------------------------
    # A: lax.top_k(m) on [NQ, L, W] reshape
    for W, m in ((8192, 24), (8192, 48), (32768, 64)):
        L = NB // W
        timeit(
            f"top_k(m={m}) blocks W={W}",
            lambda s, m=m, L=L, W=W: jax.lax.top_k(
                -s.reshape(NQ, L, W), m
            ),
            S,
        )

    # B: two-level lane select: W=128 lanes, top-8 per block via sort
    timeit(
        "sort128 lanes (level-1 of two-level)",
        lambda s: jax.lax.sort(s.reshape(NQ, NB // 128, 128))[..., :8],
        S,
    )
    timeit(
        "top_k(8) on 128-lane blocks",
        lambda s: jax.lax.top_k(-s.reshape(NQ, NB // 128, 128), 8),
        S,
    )

    # C: the current exact approx_min_k (reference point; known slow)
    timeit(
        "approx_min_k k=1024 rt=1.0 (full-sort path)",
        lambda s: jax.lax.approx_min_k(
            s.reshape(NQ, 8, NB // 8)[:, 0], 1024
        ),
        S,
        reps=1,
    )

    # D: PartialReduce floor: approx_min_k rt=0.95 (what the hardware op
    # costs when allowed to be approximate)
    timeit(
        "approx_min_k k=1024 rt=0.95 (PartialReduce floor)",
        lambda s: jax.lax.approx_min_k(s, 1024, recall_target=0.95),
        S,
    )

    # E: elementwise floor: one full read of S (count below threshold)
    timeit(
        "count S<0.001 (one elementwise pass floor)",
        lambda s: jnp.sum(s < 0.001, axis=-1, dtype=jnp.int32),
        S,
    )

    # --- composite: block-select + merge + certificate ----------------
    def blocksel(s, k, W, m):
        L = s.shape[-1] // W
        r = s.reshape(s.shape[0], L, W)
        nv, bi = jax.lax.top_k(-r, m)  # [nq, L, m] best-first per block
        bv = -nv
        gid = bi.astype(jnp.int32) + (
            jnp.arange(L, dtype=jnp.int32)[None, :, None] * W
        )
        cv = bv.reshape(s.shape[0], L * m)
        ci = gid.reshape(s.shape[0], L * m)
        nv2, pos = jax.lax.top_k(-cv, k)
        vals = -nv2
        idx = jnp.take_along_axis(ci, pos, axis=-1)
        # certificate: block b MAY hide unseen candidates iff its worst
        # KEPT key beats the merged k-th key (then >m contenders landed
        # in b and the budget truncated them)
        cutoff = vals[:, k - 1 : k]
        flag = jnp.any(bv[:, :, m - 1] <= cutoff, axis=-1)
        return vals, idx, flag

    for W, m in ((8192, 24), (8192, 48)):
        t = timeit(
            f"composite blocksel k=1024 W={W} m={m}",
            lambda s, W=W, m=m: blocksel(s, 1024, W, m),
            S,
        )

    # correctness + flag rate on one run (uniform scores = worst-case
    # tie pressure is low; flag-rate check vs np argsort on 8 rows)
    v, i, f = jax.jit(lambda s: blocksel(s, 1024, 8192, 24))(S)
    v = np.asarray(v[:8])
    i = np.asarray(i[:8])
    fr = float(np.asarray(f).mean())
    Sh = np.asarray(S[:8])
    ref = np.sort(Sh, 1)[:, :1024]
    err = np.abs(ref - v).max()
    log(f"BLOCKSEL composite: flag rate {fr:.5f}, top-1024 max err vs "
        f"np.sort {err:.2e}")

    # --- GEMM floor for the full path ----------------------------------
    yT = jax.random.normal(jax.random.PRNGKey(1), (D, NB), jnp.bfloat16)
    xq = jax.random.normal(jax.random.PRNGKey(2), (NQ, D), jnp.float32)
    sync(yT)

    def gemm_hilo(x, yt):
        hi32 = jax.lax.reduce_precision(x, 8, 7)
        hi = hi32.astype(jnp.bfloat16)
        lo = (x - hi32).astype(jnp.bfloat16)
        s = jnp.dot(hi, yt, preferred_element_type=jnp.float32)
        s += jnp.dot(lo, yt, preferred_element_type=jnp.float32)
        return s

    timeit("hi/lo bf16 GEMM [1024,128]x[128,1M]", gemm_hilo, xq, yT)

    def full_path(x, yt, k, W, m):
        s = gemm_hilo(x, yt)
        return blocksel(s, k, W, m)

    timeit(
        "FULL gemm+blocksel k=1024 W=8192 m=24",
        lambda x, yt: full_path(x, yt, 1024, 8192, 24),
        xq,
        yT,
    )


if __name__ == "__main__":
    sys.exit(main())
