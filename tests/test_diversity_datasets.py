"""Diversity-filtered search + real-dataset loader plumbing.

Reference analogues: demos/diversity_filter/diversity_result_handler.h
(group-capped top-k) and contrib/datasets.py:155-280 (SIFT1M/BigANN/Deep1B
loaders + database_iterator/check_sizes)."""

import numpy as np
import pytest

import faiss_tpu as ft
from faiss_tpu.utils import datasets as ds


def _brute_diversity(xq, xb, id_to_group, k, max_per_group):
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


def test_diversity_select_matches_scalar_handler():
    rs = np.random.RandomState(7)
    d, nb, nq, ngroup, k, cap = 16, 3000, 24, 40, 8, 2
    centers = rs.randn(ngroup, d).astype(np.float32)
    id_to_group = rs.randint(ngroup, size=nb)
    xb = centers[id_to_group] + 0.25 * rs.randn(nb, d).astype(np.float32)
    xq = centers[rs.randint(ngroup, size=nq)] + 0.25 * rs.randn(nq, d).astype(
        np.float32
    )
    index = ft.IndexFlatL2(d)
    index.add(xb)
    D, I = ft.diversity_search(index, xq, k, id_to_group, cap)
    Dr, _ = _brute_diversity(xq, xb, id_to_group, k, cap)
    assert np.allclose(D, Dr, rtol=1e-4, atol=1e-3)
    # the cap actually binds
    for q in range(nq):
        assert np.bincount(id_to_group[I[q]]).max() <= cap


def test_diversity_select_short_rows():
    # fewer than k cap-respecting candidates: unfilled slots are -1/inf
    D = np.array([[0.0, 1.0, 2.0, 3.0]], np.float32)
    I = np.array([[0, 1, 2, 3]], np.int64)
    id_to_group = np.zeros(4, np.int64)  # all one group
    Do, Io, nv = ft.diversity_select(D, I, id_to_group, k=3, max_per_group=2)
    assert nv[0] == 2
    assert Io[0].tolist() == [0, 1, -1]
    assert Do[0, 2] == np.inf


def test_diversity_search_adaptive_overfetch():
    # cap=1 with 5 groups, k=5: must over-fetch past fetch_factor*k
    rs = np.random.RandomState(3)
    d, nb = 8, 400
    id_to_group = np.arange(nb) % 5
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(6, d).astype(np.float32)
    index = ft.IndexFlatL2(d)
    index.add(xb)
    D, I = ft.diversity_search(index, xq, 5, id_to_group, 1, fetch_factor=1)
    Dr, _ = _brute_diversity(xq, xb, id_to_group, 5, 1)
    assert np.allclose(D, Dr, rtol=1e-4, atol=1e-3)


def test_dataset_sift1m_layout(tmp_path):
    rs = np.random.RandomState(0)
    base = tmp_path / "sift1M"
    base.mkdir()
    xb = rs.rand(200, 128).astype(np.float32)
    xq = rs.rand(10, 128).astype(np.float32)
    xt = rs.rand(50, 128).astype(np.float32)
    ds.fvecs_write(str(base / "sift_base.fvecs"), xb)
    ds.fvecs_write(str(base / "sift_query.fvecs"), xq)
    ds.fvecs_write(str(base / "sift_learn.fvecs"), xt)
    gt = np.argsort(
        ((xq[:, None] - xb[None]) ** 2).sum(-1), axis=1
    )[:, :100].astype(np.int32)
    ds.ivecs_write(str(base / "sift_groundtruth.ivecs"), gt)

    d1 = ds.DatasetSIFT1M(basedir=str(base) + "/")
    d1.nb, d1.nq, d1.nt = 200, 10, 50
    assert d1.check_sizes()
    np.testing.assert_array_equal(d1.get_groundtruth(k=10), gt[:, :10])
    blocks = list(d1.database_iterator(bs=64))
    assert sum(len(b) for b in blocks) == 200
    np.testing.assert_allclose(np.vstack(blocks), xb)
    # split covers disjointly
    parts = [
        np.vstack(list(d1.database_iterator(bs=64, split=(3, r))))
        for r in range(3)
    ]
    np.testing.assert_allclose(np.vstack(parts), xb)
    assert "200 vectors" in str(d1)


def test_dataset_bigann_prefix(tmp_path):
    rs = np.random.RandomState(1)
    base = tmp_path / "bigann"
    (base / "gnd").mkdir(parents=True)
    nb, d = 64, 128
    xb = rs.randint(0, 256, size=(nb, d), dtype=np.uint8)
    # bvecs: int32 dim header + uint8 payload per row
    with open(base / "bigann_base.bvecs", "wb") as f:
        for row in xb:
            np.int32(d).tofile(f)
            row.tofile(f)
    with open(base / "bigann_query.bvecs", "wb") as f:
        for row in xb[:4]:
            np.int32(d).tofile(f)
            row.tofile(f)
    dset = ds.DatasetBigANN(nb_M=1, basedir=str(base) + "/")
    dset.nb = nb  # shrink the declared prefix for the fixture
    got = np.vstack(list(dset.database_iterator(bs=17)))
    np.testing.assert_allclose(got, xb.astype(np.float32))
    assert dset.get_queries().shape == (4, d)
    with pytest.raises(AssertionError):
        ds.DatasetBigANN(nb_M=3)
