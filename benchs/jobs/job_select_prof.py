# SELECT-PROF v2: decompose the k=1024 exact-select cost (BASELINE row 9).
# v1 finding: approx_min_k(k=1024, recall_target=1.0) LOWERS TO A FULL
# SORT (f32+s32 [8192,131072] temps = 12+ GB -> RESOURCE_EXHAUSTED; at
# [nq,65536] it is the 14.9 s knn program). So measure: the exact-GEMM
# variants (is Precision.HIGHEST itself pathological?), PartialReduce at
# large k WITHOUT the final sort (aggregate_to_topk=False), top_k, and
# the fused kernel's k=1024 certificate flag rate.
import functools

import jax

NQ, NB, D = 8192, 1 << 16, 128
key = jax.random.PRNGKey(0)
scores = jax.random.uniform(key, (NQ, NB), jnp.float32)
q_dev = jnp.asarray(xq)
yT = jax.random.uniform(jax.random.PRNGKey(1), (D, NB), jnp.float32)
sync(scores)


def timeit(label, fn, *args, reps=4):
    fn_j = jax.jit(fn)
    try:
        t0 = time.time()
        out = fn_j(*args)
        s0 = jax.tree.leaves(out)[0]
        sync(s0)
        first = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn_j(*args)
            sync(jax.tree.leaves(out)[0])
            ts.append(time.time() - t0)
        ts.sort()
        log(f"SELECT-PROF {label}: med {ts[len(ts)//2]*1000:.0f} ms "
            f"(min {ts[0]*1000:.0f}, first {first:.1f}s)")
    except Exception as e:
        log(f"SELECT-PROF {label}: FAILED {type(e).__name__}: "
            f"{str(e)[:200]}")


# ---- GEMM variants: [8192, 128] x [128, 65536] ------------------------
dn = (((1,), (0,)), ((), ()))
timeit("GEMM HIGHEST", lambda q, y: jax.lax.dot_general(
    q, y, dn, precision=jax.lax.Precision.HIGHEST,
    preferred_element_type=jnp.float32), q_dev, yT)
timeit("GEMM HIGH", lambda q, y: jax.lax.dot_general(
    q, y, dn, precision=jax.lax.Precision.HIGH,
    preferred_element_type=jnp.float32), q_dev, yT)
timeit("GEMM DEFAULT", lambda q, y: jax.lax.dot_general(
    q, y, dn, preferred_element_type=jnp.float32), q_dev, yT)


def gemm_6pass(q, y):
    def split3(x):
        h32 = jax.lax.reduce_precision(x, 8, 7)
        r = x - h32
        m32 = jax.lax.reduce_precision(r, 8, 7)
        return (h32.astype(jnp.bfloat16), m32.astype(jnp.bfloat16),
                (r - m32).astype(jnp.bfloat16))

    qh, qm, ql = split3(q)
    yh, ym, yl = split3(y)
    d = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                          preferred_element_type=jnp.float32)
    return (d(ql, yh) + d(qm, ym) + d(qh, yl)) + (d(qm, yh) + d(qh, ym)) \
        + d(qh, yh)


timeit("GEMM 6-pass (3-way bf16 split)", gemm_6pass, q_dev, yT)

# ---- large-k select variants on [8192, 65536] --------------------------
timeit("approx_min_k k=100 exact", lambda s: jax.lax.approx_min_k(
    s, 100, recall_target=1.0), scores)
timeit("approx_min_k k=1024 exact (sort fallback)",
       lambda s: jax.lax.approx_min_k(s, 1024, recall_target=1.0), scores)
timeit("approx_min_k k=1024 recall=0.99", lambda s: jax.lax.approx_min_k(
    s, 1024, recall_target=0.99), scores)
timeit("approx_min_k k=1024 exact aggregate_to_topk=False",
       lambda s: jax.lax.approx_min_k(
           s, 1024, recall_target=1.0, aggregate_to_topk=False), scores)
timeit("top_k k=1024", lambda s: jax.lax.top_k(-s, 1024), scores)
timeit("sort row-wise (reference)", lambda s: jax.lax.sort(s, dimension=1),
       scores)

# two-phase threshold select: count-below via histogram, then compact
def thresh_count(s):
    lo = jnp.min(s, -1)
    width = (jnp.max(s, -1) - lo) / 512.0
    b = jnp.clip(((s - lo[:, None]) / width[:, None]).astype(jnp.int32),
                 0, 511)
    oh = jax.nn.one_hot(b, 512, dtype=jnp.bfloat16)
    hist = jnp.sum(oh, axis=1)  # [nq, 512]
    cum = jnp.cumsum(hist, axis=1)
    # first bin where cumulative count >= k
    t_bin = jnp.argmax(cum >= 1024.0, axis=1)
    return lo + (t_bin + 1).astype(jnp.float32) * width


timeit("two-phase: 512-bin hist threshold", thresh_count, scores)

# ---- fused-kernel k=1024 certificate flag rate on the bench mixture ----
xb = gen(1_000_000, 1)
flat = ft.IndexFlatL2(128)
flat.add(xb)
import faiss_tpu.models.flat as flat_mod
orig = flat_mod.IndexFlat._exact_knn_rows
calls = []


def spy(self, rows, k):
    calls.append(len(rows))
    return orig(self, rows, k)


flat_mod.IndexFlat._exact_knn_rows = spy
t0 = time.time()
D1, I1 = flat.search(xq, 1024)
log(f"SELECT-PROF fused k=1024 e2e {time.time()-t0:.1f}s, certificate "
    f"repair rows: {sum(calls)}/8192")
flat_mod.IndexFlat._exact_knn_rows = orig
t0 = time.time()
D1, I1 = flat.search(xq, 1024)
log(f"SELECT-PROF fused k=1024 e2e warm {time.time()-t0:.1f}s (incl repair)")
I10 = I1[:, :10].astype(np.int64)
log(f"SELECT-PROF fused k=1024 top-10 vs gt: "
    f"{recall_at_k(I10, gt, 10):.4f}")
