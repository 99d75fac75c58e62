"""Recall parity vs the REAL reference faiss (SURVEY §4 golden tests).

``tests/golden/golden_faiss.npz`` holds, per index config, the reference
CPU faiss build's (D, I) and recall/intersection numbers on the
deterministic SyntheticDataset (generated once by
``benchs/make_golden_fixtures.py`` from the out-of-tree build of
/root/reference). Each test rebuilds the SAME config with faiss_tpu at the
SAME search-time parameters and asserts intersection@10 parity within
0.005 (ours may be better — training RNG differs, so only a regression
below the reference is a failure)."""

import ast
import os

import numpy as np
import pytest

import faiss_tpu as ft

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_faiss.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN),
    reason="golden fixture missing (run benchs/make_golden_fixtures.py "
    "against the reference build)",
)

D_, NT, NB, NQ, K = 64, 25_000, 50_000, 500, 10
SEED = 1338
TOL = 0.005


@pytest.fixture(scope="module")
def golden():
    with np.load(GOLDEN, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="module")
def data():
    from faiss_tpu.utils.datasets import SyntheticDataset

    ds = SyntheticDataset(D_, NT, NB, NQ, seed=SEED)
    return ds.get_train(), ds.get_database(), ds.get_queries()


def _configs(golden):
    return [
        (str(n), str(f), ast.literal_eval(str(p)), float(r))
        for n, f, p, r in zip(
            golden["meta_names"], golden["meta_factory"],
            golden["meta_params"], golden["meta_inter"],
        )
    ]


def _intersection(I, gt, k):
    return float(
        np.mean([len(np.intersect1d(I[i, :k], gt[i, :k])) for i in range(len(I))])
    ) / k


@pytest.mark.parametrize(
    "name",
    ["ivf_pq_fs", "ivf_sq8", "hnsw32", "opq_ivf_pq", "ivf_flat", "pq_adc",
     "ivf_pqr", "rabitq_ivf", "nsg32"],
)
def test_golden_recall_parity(name, golden, data):
    xt, xb, xq = data
    gt = golden["gt"]
    cfgs = {c[0]: c for c in _configs(golden)}
    if name not in cfgs:
        pytest.skip(f"{name} not in fixture")
    _, factory, params, ref_inter = cfgs[name]

    index = ft.index_factory(D_, factory)
    index.train(xt)
    index.add(xb)
    ps = ft.ParameterSpace()
    for pk, pv in params.items():
        ps.set_index_parameter(index, pk, pv)
    _, I = index.search(xq, K)
    ours = _intersection(I, gt, K)
    assert ours >= ref_inter - TOL, (
        f"{name} ({factory}): ours inter@{K}={ours:.4f} vs reference "
        f"{ref_inter:.4f} (tolerance {TOL})"
    )


def _binarize(x):
    """Same 2*D-bit sign binarization as make_golden_fixtures.py."""
    rp = np.random.RandomState(99).randn(D_, 2 * D_).astype(np.float32)
    return np.packbits((x @ rp > 0).astype(np.uint8), axis=1)


@pytest.mark.parametrize("name", ["bin_flat", "bin_ivf"])
def test_golden_binary_parity(name, golden, data):
    """Hamming-family parity (reference: tests/test_index_binary.py)."""
    _, xb, xq = data
    if f"{name}_I" not in golden:
        pytest.skip(f"{name} not in fixture")
    cfgs = {c[0]: c for c in _configs(golden)}
    _, factory, params, ref_inter = cfgs[name]
    bb, bq = _binarize(xb), _binarize(xq)
    bgt = golden["bin_gt"]
    if name == "bin_flat":
        index = ft.IndexBinaryFlat(2 * D_)
    else:
        index = ft.IndexBinaryIVF(None, 2 * D_, 64)
        index.train(bb)
    index.add(bb)
    for pk, pv in params.items():
        setattr(index, pk, pv)
    Dh, I = index.search(bq, K)
    if name == "bin_flat":
        # both sides are exact Hamming scans, but 128-bit codes tie
        # massively at rank 10 (id intersection is meaningless under tie
        # order): exactness == identical sorted distance rows
        np.testing.assert_array_equal(
            np.sort(Dh, 1), np.sort(golden["bin_flat_D"], 1)
        )
    else:
        ours = _intersection(I, bgt, K)
        assert ours >= ref_inter - TOL, (
            f"{name}: ours inter@{K}={ours:.4f} vs reference {ref_inter:.4f}"
        )


def test_golden_range_search_parity(golden, data):
    """range_search recall parity vs the reference IVF256,Flat at the same
    radius (reference: contrib/evaluation.py:247 range-result comparison)."""
    if "range_radius" not in golden:
        pytest.skip("range fixture missing")
    xt, xb, xq = data
    radius = float(golden["range_radius"])
    ref_recall = float(golden["range_recall"])
    # exact range GT with our flat index
    flat = ft.IndexFlatL2(D_)
    flat.add(xb)
    res_gt = flat.range_search(xq, radius)
    index = ft.index_factory(D_, "IVF256,Flat")
    index.train(xt)
    index.add(xb)
    index.nprobe = 8
    res = index.range_search(xq, radius)
    recs = []
    for i in range(len(xq)):
        g = set(res_gt.labels[res_gt.lims[i]:res_gt.lims[i + 1]].tolist())
        if not g:
            continue
        got = set(res.labels[res.lims[i]:res.lims[i + 1]].tolist())
        recs.append(len(g & got) / len(g))
    ours = float(np.mean(recs))
    assert ours >= ref_recall - TOL, (
        f"range_search: ours recall={ours:.4f} vs reference {ref_recall:.4f}"
    )
