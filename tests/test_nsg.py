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


def test_nsg_pq_sq_variants():
    import faiss_tpu as ft

    """IndexNSGPQ / IndexNSGSQ (IndexNSG.h:89,98): graph over decoded
    storage; distances are the asymmetric codec distances."""
    rs = np.random.RandomState(0)
    xb = rs.randn(2000, 32).astype(np.float32)
    xq = xb[:20] + 0.01 * rs.randn(20, 32).astype(np.float32)
    for fstr, cls in [("NSG24,PQ4x8", ft.IndexNSGPQ), ("NSG24,SQ8", ft.IndexNSGSQ)]:
        index = ft.index_factory(32, fstr)
        assert isinstance(index, cls), fstr
        index.train(xb)
        index.add(xb)
        D, I = index.search(xq, 5)
        # codec-approximate graph search must still find the true neighbor
        hit = (I == np.arange(20)[:, None]).any(1).mean()
        assert hit > 0.8, (fstr, hit)
        # distances = ||q - decode(code)||^2 of the reported neighbor
        recon = np.stack([index.reconstruct(int(i)) for i in I[:, 0]])
        np.testing.assert_allclose(
            D[:, 0], ((xq - recon) ** 2).sum(1), rtol=1e-3, atol=1e-3
        )


def test_nsg_pq_sq_io_roundtrip(tmp_path):
    """write_index/read_index for the codec-storage NSG variants: codes +
    graph persist; reloaded search is identical (graph is not rebuilt)."""
    import faiss_tpu as ft

    rs = np.random.RandomState(1)
    xb = rs.randn(1500, 32).astype(np.float32)
    for fstr in ("NSG24,PQ4x8", "NSG24,SQ8"):
        index = ft.index_factory(32, fstr)
        index.train(xb)
        index.add(xb)
        p = str(tmp_path / "nsg.npz")
        ft.write_index(index, p)
        index2 = ft.read_index(p)
        assert type(index2) is type(index)
        D1, I1 = index.search(xb[:16], 5)
        D2, I2 = index2.search(xb[:16], 5)
        np.testing.assert_array_equal(I1, I2)
        np.testing.assert_allclose(D1, D2, rtol=1e-5, atol=1e-5)


def test_ivf_with_hnsw_coarse_quantizer():
    """Reference factory grammar IVFx_HNSWy (index_factory.cpp
    parse_coarse_quantizer): the coarse quantizer is a graph index; the
    IVF staging paths read its centroids via vectors()/reconstruct."""
    import faiss_tpu as ft

    rs = np.random.RandomState(2)
    xb = rs.randn(4000, 32).astype(np.float32)
    for fstr in ("IVF16_HNSW8,Flat", "IVF16_HNSW8,PQ4", "IVF16_HNSW8,SQ8"):
        index = ft.index_factory(32, fstr)
        index.train(xb)
        index.add(xb)
        index.nprobe = 4
        _, I = index.search(xb[:8], 1)
        assert (I[:, 0] == np.arange(8)).mean() >= 0.75, fstr
