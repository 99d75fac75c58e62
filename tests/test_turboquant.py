"""TurboQuant SQ family + QT_0bit (reference: ScalarQuantizer.h:40-49,
scalar_quantizer/quantizers.h:153 QuantizerLloydMax / :409
QuantizerTurboQuantFull, factory tokens index_factory.cpp:167-176).

TurboQuant codes assume roughly-standardized components (Lloyd-Max
codebooks for N(0,1)), so quality tests run on gaussian data.
"""

import tempfile

import numpy as np
import pytest

import faiss_tpu as ft
from faiss_tpu.codecs.sq import QuantizerType, lloyd_max_gaussian
from faiss_tpu.utils.evaluation import recall_at_k

D = 60  # deliberately not a multiple of 8 (exercises plane padding)


@pytest.fixture(scope="module")
def gauss():
    rs = np.random.RandomState(7)
    return (
        rs.randn(4000, D).astype(np.float32),
        rs.randn(3000, D).astype(np.float32),
        rs.randn(50, D).astype(np.float32),
    )


def test_lloyd_max_optimality_constants():
    """The fixed point must be the published Lloyd-Max optimum for N(0,1)
    (e.g. 1-bit centroid = sqrt(2/pi)); reference bakes these same values
    as tables (ScalarQuantizer.cpp:30)."""
    c1, b1 = lloyd_max_gaussian(1)
    np.testing.assert_allclose(c1, [-0.797884560802865, 0.797884560802865],
                               atol=1e-6)
    np.testing.assert_allclose(b1, [0.0], atol=1e-7)
    c2, _ = lloyd_max_gaussian(2)
    np.testing.assert_allclose(
        c2, [-1.510417608, -0.452780034, 0.452780034, 1.510417608], atol=1e-6
    )
    c4, _ = lloyd_max_gaussian(4)
    np.testing.assert_allclose(c4[0], -2.732589570994957, atol=1e-5)
    # boundaries are centroid midpoints (optimality condition 2)
    c3, b3 = lloyd_max_gaussian(3)
    np.testing.assert_allclose(b3, (c3[1:] + c3[:-1]) / 2, atol=1e-7)


def test_tqmse_mse_decreases_with_bits(gauss):
    xt, xb, _ = gauss
    prev = np.inf
    for qt, nb in (
        (QuantizerType.QT_1bit_tqmse, 1),
        (QuantizerType.QT_2bit_tqmse, 2),
        (QuantizerType.QT_3bit_tqmse, 3),
        (QuantizerType.QT_4bit_tqmse, 4),
        (QuantizerType.QT_8bit_tqmse, 8),
    ):
        sq = ft.ScalarQuantizer(D, qt)
        sq.train(xt)
        codes = sq.compute_codes(xb)
        assert codes.shape == (len(xb), sq.code_size)
        assert sq.code_size == (D if nb == 8 else nb * ((D + 7) // 8))
        mse = float(((sq.decode(codes) - xb) ** 2).mean())
        assert mse < prev
        prev = mse
    # 8-bit Lloyd-Max on gaussian data: near-lossless
    assert prev < 1e-4


def test_tq_full_beats_mse_only(gauss):
    """Full TurboQuant = (nb-1)-bit MSE + 1-bit QJL sign refine + stored
    (norm, gamma): at equal MSE bits the refine must reduce MSE."""
    xt, xb, _ = gauss
    pairs = (
        (QuantizerType.QT_2bit_tq, QuantizerType.QT_1bit_tqmse),
        (QuantizerType.QT_3bit_tq, QuantizerType.QT_2bit_tqmse),
        (QuantizerType.QT_4bit_tq, QuantizerType.QT_3bit_tqmse),
        (QuantizerType.QT_5bit_tq, QuantizerType.QT_4bit_tqmse),
    )
    for qt, base in pairs:
        tq = ft.ScalarQuantizer(D, qt)
        tq.train(xt)
        nb = {15: 2, 16: 3, 17: 4, 18: 5}[int(qt)]
        assert tq.code_size == nb * ((D + 7) // 8) + 8
        mse_tq = float(((tq.decode(tq.compute_codes(xb)) - xb) ** 2).mean())
        bq = ft.ScalarQuantizer(D, base)
        bq.train(xt)
        mse_b = float(((bq.decode(bq.compute_codes(xb)) - xb) ** 2).mean())
        assert mse_tq < mse_b, (qt, mse_tq, mse_b)


def test_qt0bit_standalone_rejected():
    with pytest.raises(ValueError, match="IndexIVFScalarQuantizer"):
        ft.IndexScalarQuantizer(D, QuantizerType.QT_0bit)


def test_qt0bit_ivf_centroid_only(gauss):
    """QT_0bit: zero code bytes; reconstruction IS the list centroid and
    search ranks by query-to-centroid distance (scanners.h:162)."""
    xt, xb, xq = gauss
    index = ft.index_factory(D, "IVF16,SQ0")
    assert index.sq.qtype == QuantizerType.QT_0bit
    assert index.by_residual  # forced: codes carry nothing
    index.train(xt)
    index.add(xb)
    assert index.code_size == 0
    recon = index.reconstruct(3)
    cents = index.quantizer.vectors()
    d2 = ((cents - recon[None, :]) ** 2).sum(1)
    np.testing.assert_allclose(d2.min(), 0.0, atol=1e-10)
    index.nprobe = 16
    D_, I = index.search(xq, 5)
    # every returned distance must equal the distance to that vector's
    # centroid (NOT to the vector) — exact centroid-only semantics
    ln = index._listnos_host[np.argsort(index._ids_host)]
    q2c = ((xq[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    expect = q2c[np.arange(len(xq))[:, None], ln[I]]
    np.testing.assert_allclose(D_, expect, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize(
    "token", ["SQtqmse4", "SQtq3", "IVF16,SQtqmse2", "IVF16,SQtq4",
              "IVF16,SQ0"]
)
def test_factory_and_io_roundtrip(gauss, token):
    xt, xb, xq = gauss
    index = ft.index_factory(D, token)
    index.train(xt)
    index.add(xb)
    if hasattr(index, "nprobe"):
        index.nprobe = 16
    D1, I1 = index.search(xq, 5)
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        ft.write_index(index, f.name)
        index2 = ft.read_index(f.name)
        if hasattr(index2, "nprobe"):
            index2.nprobe = 16
        D2, I2 = index2.search(xq, 5)
    np.testing.assert_array_equal(np.asarray(I1), np.asarray(I2))
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D2), rtol=1e-5)


def test_tqmse4_search_quality(gauss):
    """4-bit Lloyd-Max on gaussian data preserves neighborhoods."""
    xt, xb, xq = gauss
    gt = np.argsort(((xq[:, None] - xb[None]) ** 2).sum(-1), 1)[:, :10]
    index = ft.index_factory(D, "SQtqmse4")
    index.train(xt)
    index.add(xb)
    _, I = index.search(xq, 10)
    assert recall_at_k(I, gt, 10) > 0.8
