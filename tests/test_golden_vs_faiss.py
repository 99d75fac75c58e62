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
    ["ivf_pq_fs", "ivf_sq8", "hnsw32", "opq_ivf_pq", "ivf_flat", "pq_adc"],
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
