"""RaBitQ tests (mirrors reference tests/test_rabitq*.py: estimator quality,
recall with reranking headroom)."""

import numpy as np
import pytest

import faiss_tpu as ft
from faiss_tpu.codecs.rabitq import RaBitQuantizer
from faiss_tpu.models.rabitq import IndexIVFRaBitQ, IndexRaBitQ
from faiss_tpu.utils.datasets import SyntheticDataset
from faiss_tpu.utils.evaluation import recall_at_k


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(64, 2000, 4000, 50)


def test_estimator_unbiasedness(ds):
    """The RaBitQ inner-product estimator must correlate strongly with the
    true residual inner products."""
    q = RaBitQuantizer(64)
    q.train(ds.get_train())
    xb = ds.get_database()[:500]
    bits, factors = q.encode_parts(xb)
    xq = ds.get_queries()[:10]
    qr, _ = q.rotate_queries(xq)
    ubits = np.unpackbits(bits, axis=1, bitorder="little")[:, :64]
    o_bar = (2.0 * ubits - 1.0) / np.sqrt(64)
    ip_ob = qr @ o_bar.T
    est = factors[:, 0][None, :] * ip_ob / factors[:, 1][None, :]
    true_ip = (xq - q.center) @ (xb - q.center).T
    corr = np.corrcoef(est.ravel(), true_ip.ravel())[0, 1]
    # 1-bit estimator precision scales ~1/sqrt(d); at d=64 a strong but not
    # perfect correlation is the theoretically expected behavior
    assert corr > 0.7, corr


def test_flat_rabitq_recall(ds):
    index = IndexRaBitQ(64)
    index.train(ds.get_train())
    index.add(ds.get_database())
    gt = ds.get_groundtruth(10)
    _, I = index.search(ds.get_queries(), 10)
    # 1 bit/dim: moderate recall expected; must beat random by far
    r = recall_at_k(I, gt, 10)
    assert r > 0.5, r


def test_flat_rabitq_with_refine(ds):
    base = IndexRaBitQ(64)
    base.train(ds.get_train())
    index = ft.IndexRefineFlat(base)
    index.add(ds.get_database())
    index.k_factor = 4
    gt = ds.get_groundtruth(10)
    _, I = index.search(ds.get_queries(), 10)
    assert recall_at_k(I, gt, 10) > 0.85


def test_codec_roundtrip_shapes(ds):
    q = RaBitQuantizer(64)
    q.train(ds.get_train())
    codes = q.compute_codes(ds.get_database()[:20])
    assert codes.shape == (20, q.code_size)
    recon = q.decode(codes)
    assert recon.shape == (20, 64)
    # reconstruction preserves residual norm scale
    xr = ds.get_database()[:20] - q.center
    rr = recon - q.center
    ratio = np.linalg.norm(rr, axis=1) / np.linalg.norm(xr, axis=1)
    assert (ratio > 0.2).all() and (ratio < 1.5).all()


def test_ivf_rabitq(ds):
    index = IndexIVFRaBitQ(None, 64, 16)
    index.train(ds.get_train())
    index.add(ds.get_database())
    index.nprobe = 16
    gt = ds.get_groundtruth(10)
    _, I = index.search(ds.get_queries(), 10)
    r = recall_at_k(I, gt, 10)
    # full probe 1-bit: should be close to flat rabitq quality
    assert r > 0.45, r
    # reconstruct sanity
    recon = index.reconstruct(0)
    assert recon.shape == (64,)


def test_multibit_codec(ds):
    """Multi-bit RaBitQ (RaBitQuantizerMultiBit): reconstruction improves
    with bits; pack/unpack round-trips; estimator tracks true distances."""
    from faiss_tpu.codecs.rabitq import MultiBitRaBitQ

    xb = ds.get_database()[:400]
    prev = None
    for nb in (2, 4, 7):
        q = MultiBitRaBitQ(64, nb)
        q.train(ds.get_train())
        codes, factors = q.encode_parts(xb)
        assert codes.max() < (1 << nb)
        rec = q.decode(codes, factors)
        err = np.linalg.norm(rec - xb, axis=1).mean()
        if prev is not None:
            assert err < prev
        prev = err
        c2, f2 = q.unpack(q.pack(codes, factors))
        np.testing.assert_array_equal(c2, codes)
        np.testing.assert_array_equal(f2, factors)
    # estimator: dist_est = ||q_r||^2 + f_add + f_rescale <q_r, u>
    q = MultiBitRaBitQ(64, 5)
    q.train(ds.get_train())
    codes, factors = q.encode_parts(xb)
    xq = ds.get_queries()[:20]
    qr, qn2 = q.rotate_queries(xq)
    u = q.u_values(codes)
    est = qn2[:, None] + factors[None, :, 0] + factors[None, :, 1] * (
        qr @ u.T
    )
    true = ((xq[:, None, :] - xb[None]) ** 2).sum(-1)
    rel = np.abs(est - true) / np.maximum(true, 1e-9)
    assert np.median(rel) < 0.05


def test_multibit_flat_recall_beats_1bit(ds):
    xb, xq, xt = ds.get_database(), ds.get_queries(), ds.get_train()
    gt = ds.get_groundtruth(10)
    r = {}
    for nb in (1, 4):
        index = IndexRaBitQ(64, ft.MetricType.L2, nb)
        index.train(xt)
        index.add(xb)
        _, I = index.search(xq, 10)
        r[nb] = recall_at_k(I, gt, 10)
    # easy synthetic data can saturate 1-bit recall; require no regression
    assert r[4] >= r[1]
    assert r[4] > 0.95


def test_multibit_ivf_and_io(ds, tmp_path):
    xb, xq, xt = ds.get_database(), ds.get_queries(), ds.get_train()
    gt = ds.get_groundtruth(10)
    index = ft.index_factory(64, "IVF16,RaBitQ4")
    assert isinstance(index, IndexIVFRaBitQ) and index.nb_bits == 4
    index.train(xt)
    index.add(xb)
    index.nprobe = 16
    _, I = index.search(xq, 10)
    assert recall_at_k(I, gt, 10) > 0.85
    r = ft.deserialize_index(ft.serialize_index(index))
    D1, I1 = index.search(xq, 5)
    D2, I2 = r.search(xq, 5)
    np.testing.assert_array_equal(I1, I2)
    # flat io
    flat = ft.index_factory(64, "RaBitQ4")
    flat.train(xt)
    flat.add(xb)
    r = ft.deserialize_index(ft.serialize_index(flat))
    np.testing.assert_array_equal(
        flat.search(xq, 5)[1], r.search(xq, 5)[1]
    )


def test_fastscan_flat(ds, tmp_path):
    """IndexRaBitQFastScan = qb-quantized-query operating point
    (reference IndexRaBitQFastScan.h:39): recall stays close to the exact
    -query IndexRaBitQ and IO round-trips with qb/bbs preserved."""
    from faiss_tpu.models.rabitq import IndexRaBitQFastScan

    xb, xq, xt = ds.get_database(), ds.get_queries(), ds.get_train()
    gt = ds.get_groundtruth(10)
    exact = IndexRaBitQ(64)
    exact.train(xt)
    exact.add(xb)
    fs = ft.index_factory(64, "RaBitQfs")
    assert isinstance(fs, IndexRaBitQFastScan)
    assert fs.qb == 8 and fs.bbs == 32
    fs.train(xt)
    fs.add(xb)
    r_exact = recall_at_k(exact.search(xq, 10)[1], gt, 10)
    r_fs = recall_at_k(fs.search(xq, 10)[1], gt, 10)
    assert r_fs > r_exact - 0.02  # 8-bit query SQ costs ~nothing
    # conversion constructor
    conv = IndexRaBitQFastScan.from_rabitq(exact)
    assert conv.ntotal == exact.ntotal
    np.testing.assert_array_equal(
        conv.search(xq[:8], 5)[1], fs.search(xq[:8], 5)[1]
    )
    # io round-trip keeps the class and the operating point
    r = ft.deserialize_index(ft.serialize_index(fs))
    assert isinstance(r, IndexRaBitQFastScan) and r.qb == 8
    np.testing.assert_array_equal(fs.search(xq, 5)[1], r.search(xq, 5)[1])


def test_fastscan_ivf(ds):
    from faiss_tpu.models.rabitq import IndexIVFRaBitQFastScan

    xb, xq, xt = ds.get_database(), ds.get_queries(), ds.get_train()
    gt = ds.get_groundtruth(10)
    fs = ft.index_factory(64, "IVF16,RaBitQfs4_64")
    assert isinstance(fs, IndexIVFRaBitQFastScan)
    assert fs.nb_bits == 4 and fs.bbs == 64 and fs.qb == 8
    fs.train(xt)
    fs.add(xb)
    fs.nprobe = 16
    assert recall_at_k(fs.search(xq, 10)[1], gt, 10) > 0.85
    r = ft.deserialize_index(ft.serialize_index(fs))
    assert isinstance(r, IndexIVFRaBitQFastScan) and r.bbs == 64
    np.testing.assert_array_equal(fs.search(xq, 5)[1], r.search(xq, 5)[1])
    # 1-bit IVF fastscan exercises the device-side query SQ path
    fs1 = ft.index_factory(64, "IVF16,RaBitQfs")
    fs1.train(xt)
    fs1.add(xb)
    fs1.nprobe = 16
    base = ft.index_factory(64, "IVF16,RaBitQ")
    base.train(xt)
    base.add(xb)
    base.nprobe = 16
    r_fs = recall_at_k(fs1.search(xq, 10)[1], gt, 10)
    r_b = recall_at_k(base.search(xq, 10)[1], gt, 10)
    assert r_fs > r_b - 0.02
