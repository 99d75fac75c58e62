"""EDEN quantizer + indexes (reference: impl/EDENQuantizer.{h,cpp},
IndexEDEN, IndexIVFEDEN; tests mirror the reference recall/equivalence
style of tests/test_rabitq*.py)."""

import numpy as np
import pytest

import faiss_tpu as ft
from faiss_tpu.codecs.eden import (
    EDENQuantizer,
    EDENScaleType,
    lloyd_max_gaussian,
)
from faiss_tpu.utils.datasets import SyntheticDataset
from faiss_tpu.utils.evaluation import recall_at_k


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(32, 2000, 8000, 100)


def test_lloyd_max_tables():
    """Lloyd-Max N(0,1) codebooks: symmetric, sorted, and matching the
    known 1-bit optimum +-sqrt(2/pi)."""
    c1, b1 = lloyd_max_gaussian(1)
    np.testing.assert_allclose(c1, [-0.7978845, 0.7978845], rtol=1e-5)
    assert b1[0] == 0.0
    for bits in (2, 3, 4, 8):
        c, b = lloyd_max_gaussian(bits)
        assert len(c) == 1 << bits and len(b) == len(c) - 1
        assert (np.diff(c) > 0).all()
        np.testing.assert_allclose(c, -c[::-1], atol=1e-6)  # symmetric
        np.testing.assert_allclose(b, 0.5 * (c[:-1] + c[1:]), atol=1e-6)


def test_eden_codec_roundtrip_and_scales():
    rs = np.random.RandomState(0)
    d, n = 64, 500
    x = rs.randn(n, d).astype(np.float32)
    prev_err = None
    for bits in (1, 2, 4, 8):
        q = EDENQuantizer(d, bits)
        codes, factors = q.encode(x)
        rec = q.decode(codes, factors)
        err = np.linalg.norm(rec - x, axis=1).mean()
        if prev_err is not None:
            assert err < prev_err  # more bits -> better reconstruction
        prev_err = err
        # pack/unpack round-trips the byte format exactly
        packed = q.pack(codes, factors)
        assert packed.shape[1] == q.code_size
        c2, f2 = q.unpack(packed)
        np.testing.assert_array_equal(c2, codes)
        np.testing.assert_array_equal(f2, factors)
    # unbiased scale: <decode, r> == ||r||^2 (the defining property)
    q = EDENQuantizer(d, 4, EDENScaleType.UNBIASED)
    codes, factors = q.encode(x)
    rec = q.decode(codes, factors)
    np.testing.assert_allclose(
        (rec * x).sum(1), (x * x).sum(1), rtol=1e-3
    )
    # biased scale minimizes ||rec - r||: better MSE than unbiased
    qb = EDENQuantizer(d, 4, EDENScaleType.BIASED)
    cb, fb = qb.encode(x)
    recb = qb.decode(cb, fb)
    assert np.linalg.norm(recb - x) <= np.linalg.norm(rec - x)


def test_eden_zero_vector():
    q = EDENQuantizer(8, 4)
    codes, factors = q.encode(np.zeros((3, 8), np.float32))
    assert (factors == 0).all()
    assert (q.decode(codes, factors) == 0).all()


def test_index_eden_recall(ds):
    xb, xq, xt = ds.get_database(), ds.get_queries(), ds.get_train()
    gt = ds.get_groundtruth(10)
    prev = 0.0
    for bits in (1, 4, 8):
        index = ft.IndexEDEN(32, ft.MetricType.L2, bits)
        index.train(xt)
        index.add(xb)
        _, I = index.search(xq, 10)
        r = recall_at_k(I, gt, 10)
        assert r >= prev - 0.05
        prev = r
    assert prev > 0.9  # 8-bit EDEN is near-exact


def test_index_eden_matches_reference_formula(ds):
    """Distances returned == the EDEN estimator
    query_base + l2 - 2*scale*<query - center, decoded_unit>
    (EDENQuantizer.cpp distance_from_code_dot)."""
    xb, xq, xt = ds.get_database(), ds.get_queries(), ds.get_train()
    index = ft.IndexEDEN(32, ft.MetricType.L2, 4)
    index.train(xt)
    index.add(xb[:500])
    D, I = index.search(xq[:8], 5)
    table = index.eden.centroids
    for qi in range(8):
        dq = xq[qi] - index.center
        qb = (dq * dq).sum()
        for j in range(5):
            i = int(I[qi, j])
            l2, scale = index._factors[i]
            dot = (dq * table[index._codes[i].astype(int)]).sum()
            ref = qb + l2 - 2.0 * scale * dot
            # the shared L2 kernel clamps at 0; the unbiased estimator can
            # dip marginally below it
            np.testing.assert_allclose(
                D[qi, j], max(ref, 0.0), rtol=1e-3, atol=1e-3
            )


def test_index_eden_ip(ds):
    xb, xq, xt = ds.get_database(), ds.get_queries(), ds.get_train()
    index = ft.IndexEDEN(32, ft.MetricType.INNER_PRODUCT, 8)
    index.train(xt)
    index.add(xb)
    _, I = index.search(xq, 10)
    flat = ft.IndexFlatIP(32)
    flat.add(xb)
    _, Iref = flat.search(xq, 10)
    from faiss_tpu.utils.evaluation import knn_intersection_measure

    assert knn_intersection_measure(I, Iref) > 0.8


def test_index_ivf_eden(ds):
    xb, xq, xt = ds.get_database(), ds.get_queries(), ds.get_train()
    gt = ds.get_groundtruth(10)
    index = ft.IndexIVFEDEN(None, 32, 16, ft.MetricType.L2, 8)
    index.train(xt)
    index.add(xb)
    index.nprobe = 16
    _, I = index.search(xq, 10)
    assert recall_at_k(I, gt, 10) > 0.85
    # reconstruct round-trips through the packed IVF code store
    rec = index.reconstruct(int(index._ids_host[0]))
    assert rec.shape == (32,)
    err = np.linalg.norm(rec - xb[int(index._ids_host[0])])
    assert err < np.linalg.norm(xb[int(index._ids_host[0])])


def test_eden_factory_and_io(ds, tmp_path):
    xb, xq, xt = ds.get_database(), ds.get_queries(), ds.get_train()
    index = ft.index_factory(32, "EDEN4BIASED")
    assert isinstance(index, ft.IndexEDEN)
    assert index.eden.nb_bits == 4
    assert index.eden.scale_type == EDENScaleType.BIASED
    index.train(xt)
    index.add(xb)
    r = ft.deserialize_index(ft.serialize_index(index))
    D1, I1 = index.search(xq, 5)
    D2, I2 = r.search(xq, 5)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, rtol=1e-5)

    ivf = ft.index_factory(32, "IVF16,EDEN2")
    assert isinstance(ivf, ft.IndexIVFEDEN)
    ivf.train(xt)
    ivf.add(xb)
    ivf.nprobe = 4
    r = ft.deserialize_index(ft.serialize_index(ivf))
    assert r.nprobe == 4 and r.eden.nb_bits == 2
    D1, I1 = ivf.search(xq, 5)
    D2, I2 = r.search(xq, 5)
    np.testing.assert_array_equal(I1, I2)
