"""Host-side analysis: windowed-scan recall upper bound.

For the bench layout (proximity-grouped packing + home-group-sorted query
tiles + rotated chunk order), compute for each window length L the fraction
of ground-truth top-10 neighbors whose slot falls within the L chunks a
query's tile would scan. This caps the recall of a windowed kernel, and
tells us whether skipping (512 - L) chunks is viable BEFORE paying kernel
compiles.

Usage: JAX_PLATFORMS=cpu python benchs/analyze_window.py  (CPU: only needs
the staged layout metadata, not the TPU kernels)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[win] {m}", file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import faiss_tpu as ft

    rs = np.random.RandomState(42)
    d, nb, nq = 128, 1_000_000, 8192
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
        gt = z["gt"]  # [nq, 10] db row ids

    log("loading cached index (host metadata only)")
    index = ft.read_index("/root/repo/.profile_index.npz")
    base = index.base_index
    t0 = time.time()
    br = base._build_brute()
    log(f"staged in {time.time()-t0:.1f}s (CPU)")

    slot_map = np.asarray(br["slot_map"])  # [S] slot -> add-order id
    ct = base.FUSED_CT
    S = len(slot_map)
    nchunks = S // ct
    qt = 256
    ntiles = nq // qt
    rstride = nchunks // ntiles
    log(f"S={S} ct={ct} nchunks={nchunks} ntiles={ntiles} rstride={rstride}")

    # slot position of each db row (inverse of slot_map)
    pos_of = np.full(slot_map.max() + 1, -1, np.int64)
    valid = slot_map >= 0
    pos_of[slot_map[valid]] = np.nonzero(valid)[0]
    gt_chunk = pos_of[gt] // ct  # [nq, 10] chunk of each GT neighbor

    # home group per query + tile assignment after the sort
    cent_g = np.asarray(br["centroids_g"], np.float32)  # [G*128, d]
    cn2g = np.asarray(br["cn2g"], np.float32)
    keyc = cn2g[None, :] - 2.0 * (xq @ cent_g.T)
    home = np.argmin(keyc, axis=1) // 128
    perm = np.argsort(home, kind="stable")
    tile_of_sorted = np.arange(nq) // qt
    tile = np.empty(nq, np.int64)
    tile[perm] = tile_of_sorted  # tile of each ORIGINAL query

    start = tile * rstride  # first chunk scanned by that tile
    # chunk offset within the rotated order
    off = (gt_chunk - start[:, None]) % nchunks

    for L in (32, 64, 96, 128, 192, 256, 384, 512):
        # recall upper bound: GT neighbor visible iff its chunk is within
        # the first L rotated steps
        vis = (off < L).mean()
        # per-query rows losing >=1 of 10
        rows_ok = (off < L).all(axis=1).mean()
        log(f"L={L:4d}  recall-cap={vis:.4f}  rows-all-10={rows_ok:.4f}")

    # same analysis if only the top-1 neighbor matters
    log(f"top-1 caps: " + " ".join(
        f"L{L}={(off[:, 0] < L).mean():.4f}" for L in (64, 128, 256)
    ))


if __name__ == "__main__":
    main()
