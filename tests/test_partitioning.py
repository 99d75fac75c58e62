"""Device partition_fuzzy / histogram_shifted vs numpy reference.

Mirrors the reference's TestPartitioning (tests/test_partitioning.py
upstream) semantics: after partitioning, every kept element compares <=
(>= for keep_max) every tail element, q_out lands in [q_min, q_max], and
ids travel with their values.
"""

import numpy as np
import pytest

from faiss_tpu.ops.partitioning import histogram_shifted, partition_fuzzy


def _check_partition(vals, ids, q_min, q_max, keep_max=False, seed=0):
    vo, io, thresh, q_out = partition_fuzzy(
        vals, ids, q_min, q_max, keep_max=keep_max
    )
    vo, io = np.asarray(vo), np.asarray(io)
    q_out = np.asarray(q_out)
    vals = np.asarray(vals)
    for r in range(vals.shape[0]):
        q = int(q_out[r])
        assert q_min <= q <= q_max
        head, tail = vo[r, :q], vo[r, q:]
        if keep_max:
            assert head.min() >= (tail.max() if len(tail) else -np.inf)
        else:
            assert head.max() <= (tail.min() if len(tail) else np.inf)
        # values still form the same multiset and ids still pair up
        assert sorted(vo[r].tolist()) == sorted(vals[r].tolist())
        assert (vals[r, io[r]] == vo[r]).all()
        # threshold is the worst kept value
        t = float(np.asarray(thresh)[r])
        assert t == (head.max() if not keep_max else head.min())


@pytest.mark.parametrize("keep_max", [False, True])
def test_partition_fuzzy_float(keep_max):
    rs = np.random.RandomState(7)
    vals = rs.randn(5, 200).astype(np.float32) * 10
    vals[1, :50] = 3.25  # tie block straddling the boundary
    ids = np.tile(np.arange(200, dtype=np.int32), (5, 1))
    _check_partition(vals, ids, 30, 40, keep_max=keep_max)
    _check_partition(vals, ids, 64, 64, keep_max=keep_max)


def test_partition_fuzzy_negative_and_exact_q():
    rs = np.random.RandomState(3)
    vals = -np.abs(rs.randn(3, 128)).astype(np.float32)  # all negative
    ids = np.tile(np.arange(128, dtype=np.int32), (3, 1))
    _check_partition(vals, ids, 16, 16)


def test_partition_fuzzy_uint16():
    rs = np.random.RandomState(11)
    vals = rs.randint(0, 1 << 16, size=(4, 300)).astype(np.uint16)
    ids = np.tile(np.arange(300, dtype=np.int32), (4, 1))
    vo, io, thresh, q_out = partition_fuzzy(vals, ids, 100, 120)
    vo = np.asarray(vo)
    for r in range(4):
        q = int(np.asarray(q_out)[r])
        assert 100 <= q <= 120
        assert int(vo[r, :q].max()) <= int(vo[r, q:].min())


def test_partition_matches_numpy_quantile():
    # q_min == q_max == q: the kept set must be exactly the q smallest
    rs = np.random.RandomState(5)
    vals = rs.randn(6, 256).astype(np.float32)
    vo, _, _, q_out = partition_fuzzy(vals, None, 50, 50)
    vo = np.asarray(vo)
    for r in range(6):
        ref = np.sort(vals[r])[:50]
        np.testing.assert_array_equal(np.sort(vo[r, :50]), ref)
        assert int(np.asarray(q_out)[r]) == 50


def test_histogram_shifted():
    rs = np.random.RandomState(9)
    data = rs.randint(0, 4096, size=(3, 500)).astype(np.uint16)
    for nbins, shift, vmin in [(8, 9, 0), (16, 8, 0), (16, 6, 700)]:
        h = np.asarray(
            histogram_shifted(
                data, np.int32(vmin), np.int32(shift), nbins=nbins
            )
        )
        for r in range(3):
            bins = (data[r].astype(np.int64) - vmin) >> shift
            ref = np.bincount(
                bins[(bins >= 0) & (bins < nbins)], minlength=nbins
            )
            np.testing.assert_array_equal(h[r], ref)


def test_partition_fuzzy_uint16_keep_max():
    """keep_max over uint16 keys (the reference's primary CMax-over-uint16
    use, partitioning.h:25): the inversion must stay inside the 16-bit
    radix width or the descent finds nothing."""
    v = np.array([[5, 1, 9, 3, 7, 2, 8, 4]], np.uint16)
    out, _, th, q = partition_fuzzy(v, q_min=3, keep_max=True)
    assert set(np.asarray(out)[0, :3].tolist()) == {9, 8, 7}
    assert int(np.asarray(th)[0]) == 7


def test_partition_fuzzy_signed_ints():
    """Signed int16/int8 keys order via excess-K bias (negatives must not
    wrap above positives in the uint32 image)."""
    v = np.array([[-5, 1, -9, 3]], np.int16)
    out, _, th, _ = partition_fuzzy(v, q_min=2)
    assert set(np.asarray(out)[0, :2].tolist()) == {-9, -5}
    assert int(np.asarray(th)[0]) == -5
    v8 = np.array([[-5, 1, -9, 3, -1, 2]], np.int8)
    out, _, _, _ = partition_fuzzy(v8, q_min=3, keep_max=True)
    assert set(np.asarray(out)[0, :3].tolist()) == {1, 2, 3}
