# FLAT1024-PROF: BASELINE row 9 (Titan X k=1024 exact = 1.424 s / 10k q).
# Hypothesis: at k=1024 the fused Pallas kernel is select-bound (8 chained
# 128-lane rank buffers -> measured 7.9 s / 8192 q), while the plain XLA
# path (6-pass f32-HIGHEST GEMM + exact PartialReduce top-k + chunk merge)
# should be MXU/HBM-bound. Measures the XLA path's program time (host read
# of one element) and e2e (full D+I readback, tunnel-wire-bound at
# 45 MB/s: 8192x1024 f32+int64 = 96 MB ~= 2.1 s of wire regardless of
# compute).
import faiss_tpu.ops.distances as dops

xb = gen(1_000_000, 1)
flat = ft.IndexFlatL2(128)
flat.add(xb)
xbd = flat._consolidate()  # device f32 store + cached norms
xq_dev = jnp.asarray(xq)
sync(xq_dev)

for db_chunk in (1 << 17, 1 << 16):
    t0 = time.time()
    dD, dI = dops.knn(xq_dev, xbd, 1024, y_norms=flat._norms,
                      db_chunk=db_chunk)
    sync(dD)
    log(f"FLAT1024 XLA db_chunk={db_chunk}: first (incl compile) "
        f"{time.time()-t0:.1f}s")
    ts = []
    for _ in range(5):
        t0 = time.time()
        dD, dI = dops.knn(xq_dev, xbd, 1024, y_norms=flat._norms,
                          db_chunk=db_chunk)
        sync(dD)
        ts.append(time.time() - t0)
    ts.sort()
    log(f"FLAT1024 XLA db_chunk={db_chunk}: program med "
        f"{ts[len(ts)//2]*1000:.0f} ms / 8192 q, min {ts[0]*1000:.0f} ms")

# correctness: top-10 of the k=1024 result must match exact GT
I10 = np.asarray(dI[:, :10])
r = recall_at_k(I10, gt, 10)
log(f"FLAT1024 XLA top-10 vs gt: {r:.4f} (must be 1.0)")

# e2e with full readback (the user-visible contract)
t0 = time.time()
dD, dI = dops.knn(xq_dev, xbd, 1024, y_norms=flat._norms)
D = np.asarray(dD)
I = np.asarray(dI)
log(f"FLAT1024 XLA e2e full D+I readback: {time.time()-t0:.2f}s "
    f"({D.nbytes + I.nbytes >> 20} MB over the tunnel)")

# k=100 on the same path for contrast with the screen path (618 ms)
t0 = time.time()
dD, dI = dops.knn(xq_dev, xbd, 100, y_norms=flat._norms)
sync(dD)
log(f"FLAT1024 XLA k=100 first (incl compile): {time.time()-t0:.1f}s")
ts = []
for _ in range(5):
    t0 = time.time()
    dD, dI = dops.knn(xq_dev, xbd, 100, y_norms=flat._norms)
    sync(dD)
    ts.append(time.time() - t0)
ts.sort()
log(f"FLAT1024 XLA k=100 program med {ts[len(ts)//2]*1000:.0f} ms")
