"""Diversity-filtered search: top-k with at most ``max_per_group`` results
from any group (analogue of reference demos/diversity_filter/ — there a
stateful scan-time result handler, here a batched over-fetch + vectorized
group-cap pass that keeps the TPU scan a dense fused kernel)."""

import numpy as np

import faiss_tpu as ft


def brute_force_reference(xq, xb, id_to_group, k, max_per_group):
    """Per-query scalar reference: rank everything, walk in order, cap."""
    D = ((xq[:, None, :] - xb[None, :, :]) ** 2).sum(-1)
    out_I = np.full((len(xq), k), -1, np.int64)
    out_D = np.full((len(xq), k), np.inf, np.float32)
    for q in range(len(xq)):
        counts, n = {}, 0
        for i in np.argsort(D[q], kind="stable"):
            g = id_to_group[i]
            if counts.get(g, 0) >= max_per_group:
                continue
            counts[g] = counts.get(g, 0) + 1
            out_I[q, n], out_D[q, n] = i, D[q, i]
            n += 1
            if n == k:
                break
    return out_D, out_I


def main():
    rs = np.random.RandomState(123)
    d, nb, nq, ngroup = 32, 20000, 64, 500
    k, max_per_group = 10, 2

    # clustered data where groups correlate with location — the regime
    # where an uncapped top-k collapses onto a few groups
    group_centers = rs.randn(ngroup, d).astype(np.float32)
    id_to_group = rs.randint(ngroup, size=nb)
    xb = group_centers[id_to_group] + 0.3 * rs.randn(nb, d).astype(np.float32)
    xq = group_centers[rs.randint(ngroup, size=nq)] + 0.3 * rs.randn(
        nq, d
    ).astype(np.float32)

    index = ft.IndexFlatL2(d)
    index.add(xb)

    D0, I0 = index.search(xq, k)
    worst = max(
        np.bincount(id_to_group[I0[q]], minlength=ngroup).max()
        for q in range(nq)
    )
    print(f"uncapped top-{k}: worst per-group multiplicity = {worst}")

    D, I = ft.diversity_search(index, xq, k, id_to_group, max_per_group)
    worst = max(
        np.bincount(id_to_group[I[q]], minlength=ngroup).max()
        for q in range(nq)
    )
    print(f"diversity top-{k} (cap {max_per_group}): worst multiplicity = {worst}")

    Dr, Ir = brute_force_reference(xq, xb, id_to_group, k, max_per_group)
    assert np.allclose(D, Dr, rtol=1e-5, atol=1e-4), "distance mismatch"
    print("matches the scalar reference handler semantics — OK")


if __name__ == "__main__":
    main()
