"""IndexFlat correctness vs numpy brute force (mirrors tests/test_index.py
TestIndexFlat in the reference)."""

import numpy as np
import pytest

import faiss_tpu as ft


def np_knn(x, y, k, metric=ft.METRIC_L2):
    if metric == ft.METRIC_L2:
        d2 = (
            (x * x).sum(1)[:, None]
            + (y * y).sum(1)[None, :]
            - 2.0 * (x @ y.T)
        )
        d2 = np.maximum(d2, 0)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(d2, idx, axis=1), idx
    sim = x @ y.T
    idx = np.argsort(-sim, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(sim, idx, axis=1), idx


@pytest.fixture(scope="module")
def data():
    rs = np.random.RandomState(123)
    xb = rs.rand(2000, 32).astype(np.float32)
    xq = rs.rand(77, 32).astype(np.float32)
    return xb, xq


def test_flat_l2(data):
    xb, xq = data
    index = ft.IndexFlatL2(32)
    index.add(xb)
    assert index.ntotal == 2000
    D, I = index.search(xq, 10)
    Dref, Iref = np_knn(xq, xb, 10)
    np.testing.assert_allclose(D, Dref, rtol=1e-4, atol=1e-4)
    # ids may differ on ties; intersection must be ~1
    from faiss_tpu.utils.evaluation import knn_intersection_measure

    assert knn_intersection_measure(I, Iref) > 0.999


def test_flat_ip(data):
    xb, xq = data
    index = ft.IndexFlatIP(32)
    index.add(xb)
    D, I = index.search(xq, 10)
    Dref, Iref = np_knn(xq, xb, 10, ft.METRIC_INNER_PRODUCT)
    np.testing.assert_allclose(D, Dref, rtol=1e-4, atol=1e-4)
    assert (D[:, :-1] >= D[:, 1:]).all()  # best-first ordering


def test_incremental_add(data):
    xb, xq = data
    i1 = ft.IndexFlatL2(32)
    i1.add(xb)
    i2 = ft.IndexFlatL2(32)
    for c in range(0, 2000, 300):
        i2.add(xb[c : c + 300])
    D1, I1 = i1.search(xq, 5)
    D2, I2 = i2.search(xq, 5)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, rtol=1e-6)


def test_k_larger_than_ntotal():
    rs = np.random.RandomState(0)
    index = ft.IndexFlatL2(8)
    index.add(rs.rand(5, 8).astype(np.float32))
    D, I = index.search(rs.rand(3, 8).astype(np.float32), 10)
    assert I.shape == (3, 10)
    assert (I[:, 5:] == -1).all()
    assert np.isinf(D[:, 5:]).all()
    assert (I[:, :5] >= 0).all()


def test_empty_index():
    index = ft.IndexFlatL2(8)
    D, I = index.search(np.zeros((2, 8), np.float32), 4)
    assert (I == -1).all() and np.isinf(D).all()


def test_chunked_matches_single():
    # force the scan path with a small chunk size
    import jax.numpy as jnp
    from faiss_tpu.ops.distances import knn

    rs = np.random.RandomState(7)
    xb = rs.rand(1000, 16).astype(np.float32)
    xq = rs.rand(32, 16).astype(np.float32)
    D1, I1 = knn(jnp.asarray(xq), jnp.asarray(xb), 8)
    D2, I2 = knn(jnp.asarray(xq), jnp.asarray(xb), 8, db_chunk=192)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D2), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(I1), np.asarray(I2))


def test_chunked_matches_single_mask_and_ip():
    # the in-place-slice scan (no padded db copy): tail-overlap masking
    # must not duplicate or drop rows, with and without an id mask / norms
    import jax.numpy as jnp
    from faiss_tpu.metric import MetricType
    from faiss_tpu.ops.distances import knn

    rs = np.random.RandomState(11)
    xb = rs.rand(1000, 16).astype(np.float32)
    xq = rs.rand(32, 16).astype(np.float32)
    mask = rs.rand(1000) > 0.3
    for metric in (MetricType.L2, MetricType.INNER_PRODUCT):
        D1, I1 = knn(jnp.asarray(xq), jnp.asarray(xb), 8, metric=metric,
                     y_mask=jnp.asarray(mask))
        D2, I2 = knn(jnp.asarray(xq), jnp.asarray(xb), 8, metric=metric,
                     y_mask=jnp.asarray(mask), db_chunk=192)
        np.testing.assert_allclose(
            np.asarray(D1), np.asarray(D2), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(I1), np.asarray(I2))
        assert mask[np.asarray(I1).ravel()].all()


def test_selector(data):
    xb, xq = data
    index = ft.IndexFlatL2(32)
    index.add(xb)
    sel = ft.IDSelectorRange(100, 200)
    D, I = index.search(xq, 5, params=ft.SearchParameters(sel=sel))
    assert ((I >= 100) & (I < 200)).all()
    # must equal searching only that slice
    sub = ft.IndexFlatL2(32)
    sub.add(xb[100:200])
    D2, I2 = sub.search(xq, 5)
    np.testing.assert_allclose(D, D2, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(I - 100, I2)


def test_selector_combinators():
    ids = np.arange(100, dtype=np.int64)
    a = ft.IDSelectorRange(10, 50)
    b = ft.IDSelectorArray([20, 30, 60])
    assert ft.IDSelectorAnd(a, b).mask_for_ids(ids).sum() == 2
    assert ft.IDSelectorOr(a, b).mask_for_ids(ids).sum() == 41
    assert ft.IDSelectorNot(a).mask_for_ids(ids).sum() == 60
    bm = np.zeros(13, np.uint8)
    bm[0] = 0b1010
    s = ft.IDSelectorBitmap(bm)
    assert s.mask_for_ids(ids).sum() == 2  # ids 1 and 3


def test_range_search(data):
    xb, xq = data
    index = ft.IndexFlatL2(32)
    index.add(xb)
    D, _ = index.search(xq, 10)
    radius = float(np.median(D[:, 4]))
    res = index.range_search(xq, radius)
    # cross-check vs brute force
    d2 = (
        (xq * xq).sum(1)[:, None]
        + (xb * xb).sum(1)[None, :]
        - 2.0 * (xq @ xb.T)
    )
    for q in range(len(xq)):
        ref = set(np.nonzero(d2[q] < radius)[0])
        got = set(res.labels[int(res.lims[q]) : int(res.lims[q + 1])])
        # float assoc differences at the boundary: allow tiny asymmetry
        assert len(ref ^ got) <= max(2, 0.01 * max(len(ref), 1))


def test_reconstruct_remove_merge(data):
    xb, _ = data
    index = ft.IndexFlatL2(32)
    index.add(xb)
    np.testing.assert_array_equal(index.reconstruct(7), xb[7])
    np.testing.assert_array_equal(index.reconstruct_n(10, 5), xb[10:15])
    n = index.remove_ids(ft.IDSelectorRange(0, 100))
    assert n == 100 and index.ntotal == 1900
    np.testing.assert_array_equal(index.reconstruct(0), xb[100])

    other = ft.IndexFlatL2(32)
    other.add(xb[:50])
    index.merge_from(other)
    assert index.ntotal == 1950 and other.ntotal == 0


def test_sa_codec(data):
    xb, _ = data
    index = ft.IndexFlatL2(32)
    codes = index.sa_encode(xb[:10])
    assert codes.shape == (10, index.sa_code_size())
    np.testing.assert_array_equal(index.sa_decode(codes), xb[:10])


def test_extra_metrics():
    rs = np.random.RandomState(5)
    xb = rs.rand(500, 16).astype(np.float32)
    xq = rs.rand(20, 16).astype(np.float32)
    for metric, ref_fn in [
        (ft.METRIC_L1, lambda a, b: np.abs(a - b).sum(-1)),
        (ft.METRIC_Linf, lambda a, b: np.abs(a - b).max(-1)),
        (
            ft.METRIC_Canberra,
            lambda a, b: (np.abs(a - b) / (np.abs(a) + np.abs(b))).sum(-1),
        ),
    ]:
        index = ft.IndexFlat(16, metric)
        index.add(xb)
        D, I = index.search(xq, 5)
        ref = ref_fn(xq[:, None, :], xb[None, :, :])
        iref = np.argsort(ref, axis=1)[:, :5]
        dref = np.take_along_axis(ref, iref, axis=1)
        np.testing.assert_allclose(D, dref, rtol=1e-4, atol=1e-5)


def test_flat1d():
    rs = np.random.RandomState(3)
    xb = rs.rand(100, 1).astype(np.float32)
    index = ft.IndexFlat1D()
    index.add(xb)
    D, I = index.search(np.array([[0.5]], np.float32), 3)
    ref = np.argsort((xb[:, 0] - 0.5) ** 2)[:3]
    assert set(I[0]) == set(ref)


def test_fused_knn_kernel_k_lanes_interpret():
    """k>128 select: the chained rank buffers must reproduce the exact
    top-k (interpret mode; reference range: BlockSelect k<=2048)."""
    import jax.numpy as jnp

    from faiss_tpu.ops.pallas_knn import knn_fused_pallas

    rs = np.random.RandomState(5)
    d, nb, nq = 16, 4096, 128
    xb = rs.rand(nb, d).astype(np.float32)
    xq = rs.rand(nq, d).astype(np.float32)
    yT = np.ascontiguousarray(xb.T)
    dist = (
        (xq**2).sum(1)[:, None] + (xb**2).sum(1)[None, :] - 2 * xq @ xb.T
    )
    for k_lanes in (256, 512):
        v, i, ev = knn_fused_pallas(
            jnp.asarray(xq), jnp.asarray(yT), np.int32(nb),
            qt=128, ct=512, k_lanes=k_lanes, interpret=True,
        )
        v, i, ev = np.asarray(v), np.asarray(i), np.asarray(ev)
        ref = np.sort(dist, 1)[:, :k_lanes]
        clean = ev.min(1) >= v[:, k_lanes - 1]
        # k/nb selectivity here (up to 12.5%) is far above real workloads,
        # so queue pressure flags many rows; the CONTRACT under test is
        # that unflagged rows are exact
        assert clean.mean() > 0.5
        np.testing.assert_allclose(
            v[clean], np.maximum(ref[clean], 0), rtol=1e-4, atol=1e-4
        )
        # ids are consistent with values
        picked = np.take_along_axis(
            dist[clean], np.maximum(i[clean], 0), axis=1
        )
        np.testing.assert_allclose(
            np.maximum(picked, 0), v[clean], rtol=1e-4, atol=1e-4
        )


def test_flat_screen_program_interpret():
    """The bf16-screen + exact-rerank flat program must reproduce the exact
    search, and its certificate must flag (only) rows it cannot guarantee."""
    import jax.numpy as jnp

    import faiss_tpu as ft
    from faiss_tpu.models.flat import _flat_screen_program, _stage_flat_screen

    rs = np.random.RandomState(21)
    d, nb, nq, k = 24, 4096, 128, 10
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    for metric_l2 in (True, False):
        index = (
            ft.IndexFlatL2(d) if metric_l2 else ft.IndexFlatIP(d)
        )
        index.add(xb)
        D0, I0 = index.search(xq, k)  # CPU exact path
        xbdev = index._consolidate()
        d_pad, nbp = 128, -(-nb // 1024) * 1024
        yT_hi, yT_lo, n2s, ymax = _stage_flat_screen(
            xbdev, d_pad, nbp, metric_l2
        )
        packed = np.asarray(
            _flat_screen_program(
                jnp.asarray(xq), yT_hi, yT_lo, n2s, xbdev, ymax, k, 128,
                512, metric_l2, interpret=True,
            )
        )
        D1 = packed[:, :k]
        I1 = np.rint(packed[:, k : 2 * k]).astype(np.int64)
        flag = packed[:, 2 * k] != 0.0
        ok = ~flag
        # certified rows must match the exact search bit-for-bit on ids
        assert ok.any()
        assert (I0[ok] == I1[ok]).mean() > 0.999, (metric_l2, (I0[ok] != I1[ok]).sum())
        np.testing.assert_allclose(D0[ok], D1[ok], rtol=1e-4, atol=1e-4)


def test_flat_sq8_store_roundtrip_and_search():
    """IndexFlatSQ8: 1-byte/dim store — standalone search matches exact
    search up to SQ8 reconstruction error; vectors() decodes the codes."""
    import faiss_tpu as ft

    rs = np.random.RandomState(11)
    d, nb, nq = 24, 3000, 32
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    idx = ft.IndexFlatSQ8(d)
    idx.train(xb)
    idx.add(xb)
    assert idx.ntotal == nb
    rec = idx.vectors()
    # 8-bit per-dim trained range: tight reconstruction
    err = np.abs(rec - xb).max() / (xb.max() - xb.min())
    assert err < 0.01
    D, I = idx.search(xq, 10)
    ref = ft.IndexFlatL2(d)
    ref.add(xb)
    D0, I0 = ref.search(xq, 10)
    assert (I[:, 0] == I0[:, 0]).mean() > 0.9
    np.testing.assert_allclose(D, D0, rtol=0.1, atol=0.1)

    # io round-trip preserves codes bit-exactly
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "sq8.bin")
        ft.write_index(idx, p)
        idx2 = ft.read_index(p)
    assert isinstance(idx2, ft.IndexFlatSQ8)
    np.testing.assert_array_equal(
        np.asarray(idx._consolidate()), np.asarray(idx2._consolidate())
    )
    D2, I2 = idx2.search(xq, 10)
    np.testing.assert_array_equal(I, I2)
    np.testing.assert_allclose(D, D2, rtol=1e-6, atol=1e-6)


def test_flat_striped_program_interpret():
    """Striped large-k program: exact ids/distances vs the CPU path on
    certified rows, both pack formats, both metrics; pad-column
    candidates never leak in (underfull tail stripe). Shape keeps the
    per-stripe insert rate ~0.8% (the bench regime is 0.04-0.4%; narrow
    stripes put the 128-queue under eviction-loss pressure, which is why
    _striped_plan refuses W < 8192)."""
    import jax.numpy as jnp

    import faiss_tpu as ft
    from faiss_tpu.models.flat import (
        _flat_striped_program,
        _stage_flat_screen,
        _unpack_flat_lk,
    )

    rs = np.random.RandomState(33)
    d, nb, nq, k, P = 24, 31000, 32, 128, 2
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    for metric_l2, pack16 in ((True, False), (True, True)):
        index = ft.IndexFlatL2(d) if metric_l2 else ft.IndexFlatIP(d)
        index.add(xb)
        D0, I0 = index.search(xq, k)
        xbdev = index._consolidate()
        d_pad = 128
        W = -(-(-(-nb // 1024) * 1024) // (P * 1024)) * 1024
        nbp_lk = P * W  # > nb: tail stripe underfull
        yT_hi, yT_lo, n2s, ymax = _stage_flat_screen(
            xbdev, d_pad, nbp_lk, metric_l2
        )
        u = min(P * 128, k + 128)
        packed = _flat_striped_program(
            jnp.asarray(xq), yT_hi, yT_lo, n2s, xbdev, ymax, k, 32,
            1024, P, u, metric_l2, pack16=pack16, interpret=True,
        )
        D1, I1, flag = _unpack_flat_lk(packed, k, pack16)
        ok = ~flag
        assert ok.mean() > 0.5, flag.mean()
        assert (I1 >= -1).all() and (I1 < nb).all()  # no pad leakage
        assert (I0[ok] == I1[ok]).mean() > 0.999
        rtol = 2e-3 if pack16 else 1e-5
        m = I0[ok] == I1[ok]
        np.testing.assert_allclose(
            D1[ok][m], D0[ok][m], rtol=rtol, atol=1e-2 if pack16 else 1e-4
        )
