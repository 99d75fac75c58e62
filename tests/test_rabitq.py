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
