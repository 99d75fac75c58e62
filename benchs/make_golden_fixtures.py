"""Generate golden recall fixtures from the REFERENCE faiss CPU build.

Runs the reference library (built out-of-tree from /root/reference into
/tmp/faiss_build, package dir /tmp/faiss_py) on the deterministic
SyntheticDataset and records, per index config, the reference's
recall@k vs exact ground truth plus its (D, I) outputs. The companion
test (tests/test_golden_vs_faiss.py) rebuilds the same configs with
faiss_tpu on the same data and asserts recall parity within 0.005
(SURVEY §4: "recall parity vs CPU faiss at identical memory budget").

Usage:  python benchs/make_golden_fixtures.py  (needs /tmp/faiss_py)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/tmp/faiss_py")

import faiss  # reference build  # noqa: E402

from faiss_tpu.utils.datasets import SyntheticDataset  # noqa: E402

# deliberately small: the pytest side retrains each config on CPU
D, NT, NB, NQ, K = 64, 25_000, 50_000, 500, 10
SEED = 1338

# (name, factory, search-time params)
CONFIGS = [
    ("ivf_pq_fs", "IVF256,PQ32x4fs", {"nprobe": 16}),
    ("ivf_sq8", "IVF256,SQ8", {"nprobe": 16}),
    ("hnsw32", "HNSW32", {"efSearch": 64}),
    ("opq_ivf_pq", "OPQ16,IVF256,PQ16", {"nprobe": 16}),
    ("ivf_flat", "IVF256,Flat", {"nprobe": 8}),
    ("pq_adc", "PQ16", {}),
    ("ivf_pqr", "IVF256,PQ16+8", {"nprobe": 16}),
    ("rabitq_ivf", "IVF256,RaBitQ", {"nprobe": 32}),
    ("nsg32", "NSG32", {}),
]

# binary configs over sign-binarized data (d bits = 2*D); reference:
# index_binary_factory (index_factory.cpp:1010), tests/test_index_binary.py
BIN_CONFIGS = [
    ("bin_flat", "BFlat", {}),
    ("bin_ivf", "BIVF64", {"nprobe": 16}),
]


def main():
    ds = SyntheticDataset(D, NT, NB, NQ, seed=SEED)
    xt, xb, xq = ds.get_train(), ds.get_database(), ds.get_queries()
    gt = ds.get_groundtruth(K)

    out = {"gt": gt.astype(np.int32)}
    meta = []
    for name, factory, params in CONFIGS:
        index = faiss.index_factory(D, factory)
        np.random.seed(123)  # faiss k-means uses numpy-independent rng; fixed anyway
        index.train(xt)
        index.add(xb)
        ps = faiss.ParameterSpace()
        for pk, pv in params.items():
            ps.set_index_parameter(index, pk, pv)
        Dref, Iref = index.search(xq, K)
        recall = float((Iref == gt[:, :1]).sum()) / NQ  # recall@K of true NN
        inter = float(
            np.mean([len(np.intersect1d(Iref[i], gt[i, :K])) for i in range(NQ)])
        ) / K
        print(f"{name:12s} {factory:22s} r1@{K}={recall:.4f} inter@{K}={inter:.4f}")
        out[f"{name}_I"] = Iref.astype(np.int32)
        out[f"{name}_D"] = Dref.astype(np.float32)
        meta.append((name, factory, repr(params), recall, inter))

    # ---- binary family (Hamming) ---------------------------------------
    # sign-binarize 2*D random projections -> 128-bit codes
    rp = np.random.RandomState(99).randn(D, 2 * D).astype(np.float32)
    def binz(x):
        bits = (x @ rp > 0).astype(np.uint8)
        return np.packbits(bits, axis=1)
    bb, bq = binz(xb), binz(xq)
    # exact Hamming GT
    ref_bf = faiss.IndexBinaryFlat(2 * D)
    ref_bf.add(bb)
    _, bgt = ref_bf.search(bq, K)
    out["bin_gt"] = bgt.astype(np.int32)
    for name, factory, params in BIN_CONFIGS:
        index = faiss.index_binary_factory(2 * D, factory)
        if not index.is_trained:
            index.train(bb)
        index.add(bb)
        for pk, pv in params.items():
            setattr(index, pk, pv)
        Dref, Iref = index.search(bq, K)
        inter = float(
            np.mean([len(np.intersect1d(Iref[i], bgt[i, :K])) for i in range(NQ)])
        ) / K
        print(f"{name:12s} {factory:22s} inter@{K}={inter:.4f} (binary)")
        out[f"{name}_I"] = Iref.astype(np.int32)
        out[f"{name}_D"] = Dref.astype(np.float32)
        meta.append((name, factory, repr(params), inter, inter))

    # ---- range_search parity (IVF256,Flat) ------------------------------
    # radius = median exact 10th-NN distance -> ~10 results/query on avg
    flat = faiss.IndexFlatL2(D)
    flat.add(xb)
    Dgt, _ = flat.search(xq, K)
    radius = float(np.median(Dgt[:, K - 1]))
    lims_gt, _, Igt_r = flat.range_search(xq, radius)
    index = faiss.index_factory(D, "IVF256,Flat")
    index.train(xt)
    index.add(xb)
    index.nprobe = 8
    lims, _, Ir = index.range_search(xq, radius)
    # reference recall of the exact range set, per query, averaged
    recs = []
    for i in range(NQ):
        g = set(Igt_r[lims_gt[i]:lims_gt[i + 1]].tolist())
        if not g:
            continue
        got = set(Ir[lims[i]:lims[i + 1]].tolist())
        recs.append(len(g & got) / len(g))
    out["range_radius"] = np.float64(radius)
    out["range_recall"] = np.float64(np.mean(recs))
    print(f"range_search IVF256,Flat r={radius:.4f} "
          f"recall={float(out['range_recall']):.4f}")

    out["meta_names"] = np.array([m[0] for m in meta])
    out["meta_factory"] = np.array([m[1] for m in meta])
    out["meta_params"] = np.array([m[2] for m in meta])
    out["meta_recall1"] = np.array([m[3] for m in meta], np.float64)
    out["meta_inter"] = np.array([m[4] for m in meta], np.float64)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "golden_faiss.npz",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print("wrote", path, f"({os.path.getsize(path)/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
