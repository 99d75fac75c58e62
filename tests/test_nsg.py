"""NSG tests (mirrors reference tests/test_graph_based.py)."""

import numpy as np
import pytest

from faiss_tpu.models.nsg import IndexNNDescentFlat, IndexNSGFlat
from faiss_tpu.utils.datasets import SyntheticDataset
from faiss_tpu.utils.evaluation import recall_at_k


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(32, 1000, 3000, 50)


def test_nsg_recall(ds):
    index = IndexNSGFlat(32, 16)
    index.add(ds.get_database())
    index.search_L = 64
    gt = ds.get_groundtruth(10)
    D, I = index.search(ds.get_queries(), 10)
    r = recall_at_k(I, gt, 10)
    assert r > 0.85, r
    # exact distances
    xb, xq = ds.get_database(), ds.get_queries()
    for q in range(3):
        dref = ((xq[q] - xb[I[q, 0]]) ** 2).sum()
        np.testing.assert_allclose(D[q, 0], dref, rtol=1e-4)


def test_nsg_search_L_tradeoff(ds):
    index = IndexNSGFlat(32, 16)
    index.add(ds.get_database())
    gt = ds.get_groundtruth(10)
    rs = []
    for L in [8, 64]:
        index.search_L = L
        _, I = index.search(ds.get_queries(), 10)
        rs.append(recall_at_k(I, gt, 10))
    assert rs[1] >= rs[0]


def test_nndescent_flat(ds):
    index = IndexNNDescentFlat(32, 24)
    index.add(ds.get_database())
    index.search_L = 48
    gt = ds.get_groundtruth(10)
    _, I = index.search(ds.get_queries(), 10)
    assert recall_at_k(I, gt, 10) > 0.7
