"""Tests for extra wrappers, autotune, ivflib, MatrixStats, clone_index,
IVF range search (mirrors reference test_extra_tables/test_autotune
patterns)."""

import numpy as np
import pytest

import faiss_tpu as ft
from faiss_tpu.stats import MatrixStats
from faiss_tpu.utils.datasets import SyntheticDataset
from faiss_tpu.utils.evaluation import range_PR, recall_at_k


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(32, 1500, 3000, 50)


def test_knn_fn(ds):
    xb, xq = ds.get_database(), ds.get_queries()
    D, I = ft.knn(xq, xb, 7)
    flat = ft.IndexFlatL2(32)
    flat.add(xb)
    Dref, Iref = flat.search(xq, 7)
    np.testing.assert_allclose(D, Dref, rtol=1e-4, atol=1e-5)
    from faiss_tpu.utils.evaluation import knn_intersection_measure

    assert knn_intersection_measure(I, Iref) > 0.999


def test_pairwise_and_kmin():
    rs = np.random.RandomState(0)
    a = rs.rand(10, 8).astype(np.float32)
    b = rs.rand(20, 8).astype(np.float32)
    D = ft.pairwise_distances(a, b)
    ref = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(D, ref, rtol=1e-4, atol=1e-5)
    v, i = ft.kmin(D, 3)
    np.testing.assert_allclose(v, np.sort(ref, 1)[:, :3], rtol=1e-5)
    v2, i2 = ft.kmax(D, 3)
    np.testing.assert_allclose(v2, -np.sort(-ref, 1)[:, :3], rtol=1e-5)


def test_merge_knn_results():
    rs = np.random.RandomState(1)
    D = rs.rand(3, 5, 4).astype(np.float32)
    I = rs.randint(100, size=(3, 5, 4)).astype(np.int64)
    Dm, Im = ft.merge_knn_results(D, I)
    for q in range(5):
        alld = D[:, q, :].ravel()
        alli = I[:, q, :].ravel()
        order = np.argsort(alld)[:4]
        np.testing.assert_allclose(Dm[q], alld[order], rtol=1e-6)
        np.testing.assert_array_equal(Im[q], alli[order])


def test_bucket_sort():
    tab = np.array([3, 1, 3, 0, 1, 1], np.int64)
    lims, perm = ft.bucket_sort(tab, 4)
    assert list(lims) == [0, 1, 4, 4, 6]
    np.testing.assert_array_equal(tab[perm], np.sort(tab))


def test_result_heap():
    rs = np.random.RandomState(2)
    D = rs.rand(4, 20).astype(np.float32)
    rh = ft.ResultHeap(4, 5)
    ids = np.arange(20, dtype=np.int64)
    rh.add_result(D[:, :10], np.broadcast_to(ids[:10], (4, 10)))
    rh.add_result(D[:, 10:], np.broadcast_to(ids[10:], (4, 10)))
    rh.finalize()
    ref = np.sort(D, 1)[:, :5]
    np.testing.assert_allclose(rh.D, ref, rtol=1e-6)


def test_pack_bitstrings():
    rs = np.random.RandomState(3)
    a = rs.randint(64, size=(10, 5))
    packed = ft.pack_bitstrings(a, 6)
    out = ft.unpack_bitstrings(packed, 5, 6)
    np.testing.assert_array_equal(out, a)


def test_parameter_space_and_explore(ds):
    index = ft.index_factory(32, "IVF32,Flat")
    index.train(ds.get_train())
    index.add(ds.get_database())
    ps = ft.ParameterSpace()
    ps.set_index_parameters(index, "nprobe=16")
    assert index.nprobe == 16
    ps.initialize(index)
    assert any(pr.name == "nprobe" for pr in ps.parameter_ranges)

    gt = ds.get_groundtruth(10)
    crit = ft.OneRecallAtRCriterion(ds.nq, 1)
    crit.set_groundtruth(None, gt)
    ops = ps.explore(index, ds.get_queries(), crit)
    assert len(ops.optimal_pts) >= 1
    perfs = [o.perf for o in ops.all_pts]
    assert max(perfs) > 0.9  # full probe reaches high recall


def test_parameter_space_through_wrappers(ds):
    index = ft.index_factory(32, "PCA16,IVF16,Flat")
    ps = ft.ParameterSpace()
    ps.set_index_parameter(index, "nprobe", 8)
    assert ft.extract_index_ivf(index).nprobe == 8


def test_ivflib_merge_and_shard(ds):
    xb = ds.get_database()
    a = ft.IndexIVFFlat(None, 32, 8)
    a.train(ds.get_train())
    a.add(xb[:1000])
    b = ft.clone_index(a)
    b.reset()
    b.add_with_ids(xb[1000:2000], np.arange(1000, 2000, dtype=np.int64))
    ft.merge_into(a, b)
    assert a.ntotal == 2000 and b.ntotal == 0

    shards = ft.shard_ivf_index_centroids(a, 2)
    assert sum(s.ntotal for s in shards) == 2000
    # shard union == original search results at full probe
    a.nprobe = 8
    Dref, Iref = a.search(ds.get_queries(), 5)
    Ds = [s.search(ds.get_queries(), 5, params=ft.SearchParametersIVF(nprobe=8))
          for s in shards]
    Dm, Im = ft.merge_knn_results(
        np.stack([d for d, _ in Ds]), np.stack([i for _, i in Ds])
    )
    np.testing.assert_allclose(Dref, Dm[:, :5], rtol=1e-4, atol=1e-4)


def test_replace_ivf_quantizer(ds):
    index = ft.IndexIVFFlat(None, 32, 16)
    index.train(ds.get_train())
    index.add(ds.get_database())
    index.nprobe = 16
    Dref, Iref = index.search(ds.get_queries(), 5)
    new_q = ft.IndexFlatL2(32)
    ft.replace_ivf_quantizer(index, new_q)
    D, I = index.search(ds.get_queries(), 5)
    np.testing.assert_allclose(D, Dref, rtol=1e-4)


def test_clone_index(ds):
    index = ft.index_factory(32, "IVF16,PQ4")
    index.train(ds.get_train())
    index.add(ds.get_database())
    index.nprobe = 4
    c = ft.clone_index(index)
    D1, I1 = index.search(ds.get_queries(), 5)
    D2, I2 = c.search(ds.get_queries(), 5)
    np.testing.assert_array_equal(I1, I2)
    c.reset()
    assert index.ntotal == 3000  # deep copy: original untouched


def test_ivf_range_search(ds):
    xb, xq = ds.get_database(), ds.get_queries()
    flat = ft.IndexFlatL2(32)
    flat.add(xb)
    D, _ = flat.search(xq, 10)
    radius = float(np.median(D[:, 5]))
    ref = flat.range_search(xq, radius)

    index = ft.IndexIVFFlat(None, 32, 16)
    index.train(ds.get_train())
    index.add(xb)
    index.nprobe = 16  # full probe -> exact
    res = index.range_search(xq, radius)
    precision, recall = range_PR(ref.lims, ref.labels, res.lims, res.labels)
    assert precision > 0.99 and recall > 0.99


def test_matrix_stats():
    rs = np.random.RandomState(0)
    x = rs.rand(200, 16).astype(np.float32)
    x[:, 5] = 2.0
    x[10] = x[11]
    ms = MatrixStats(x)
    assert ms.n_collapsed == 1
    assert ms.n_dup >= 1
    assert "WARN" in ms.comments


def test_invlists_views(ds):
    """InvertedLists combinators: slice/hstack/vstack views over index
    entry stores (reference: invlists/InvertedLists.h:354-440)."""
    xt, xb = ds.get_train(), ds.get_database()
    a = ft.index_factory(32, "IVF8,PQ4")
    a.train(xt)
    b = ft.clone_index(a)
    a.add_with_ids(xb[:1500], np.arange(1500, dtype=np.int64))
    b.add_with_ids(xb[1500:], np.arange(1500, len(xb), dtype=np.int64))

    ila = ft.ArrayInvertedLists.from_index(a)
    ilb = ft.ArrayInvertedLists.from_index(b)
    assert ila.compute_ntotal == 1500

    hs = ft.HStackInvertedLists([ila, ilb])
    assert hs.compute_ntotal == len(xb)
    l0 = hs.get_ids(0)
    assert len(l0) == ila.list_size(0) + ilb.list_size(0)

    sl = ft.SliceInvertedLists(ila, 2, 6)
    assert sl.nlist == 4
    np.testing.assert_array_equal(sl.get_ids(0), ila.get_ids(2))

    vs = ft.VStackInvertedLists([ila, ilb])
    assert vs.nlist == 16
    np.testing.assert_array_equal(vs.get_ids(9), ilb.get_ids(1))

    # attaching the hstack view == merging the two indexes
    merged = ft.clone_index(a)
    ft.replace_invlists(merged, hs)
    assert merged.ntotal == len(xb)
    merged.nprobe = 8
    ref = ft.clone_index(a)
    ref.merge_from(ft.clone_index(b))
    ref.nprobe = 8
    D1, I1 = merged.search(ds.get_queries(), 5)
    D2, I2 = ref.search(ds.get_queries(), 5)
    np.testing.assert_array_equal(np.sort(I1, 1), np.sort(I2, 1))


def test_ondisk_invlists(ds, tmp_path):
    """OnDiskInvertedLists: slot allocator growth, resize, compact merge,
    prefetch, crop (reference: invlists/OnDiskInvertedLists.h:34-136)."""
    from faiss_tpu.invlists import OnDiskInvertedLists

    rs = np.random.RandomState(7)
    od = OnDiskInvertedLists(8, 4, str(tmp_path / "lists.ivfdata"))

    # incremental adds grow capacities by powers of two through the slot
    # allocator
    ids0 = np.arange(5, dtype=np.int64)
    codes0 = rs.randint(0, 255, (5, 4)).astype(np.uint8)
    assert od.add_entries(0, ids0, codes0) == 5
    assert od.caps[0] == 8  # rounded up
    np.testing.assert_array_equal(od.get_ids(0), ids0)
    np.testing.assert_array_equal(od.get_codes(0), codes0)

    ids1 = np.arange(100, 103, dtype=np.int64)
    codes1 = rs.randint(0, 255, (3, 4)).astype(np.uint8)
    od.add_entries(0, ids1, codes1)  # fills capacity exactly
    assert od.list_size(0) == 8 and od.caps[0] == 8
    od.add_entries(0, ids1, codes1)  # forces a relocation to cap 16
    assert od.caps[0] == 16
    np.testing.assert_array_equal(
        od.get_codes(0), np.concatenate([codes0, codes1, codes1])
    )

    # resize down past half-capacity reallocates; freed slot is reusable
    od.resize(0, 2)
    assert od.list_size(0) == 2 and od.caps[0] == 2
    np.testing.assert_array_equal(od.get_ids(0), ids0[:2])
    od.add_entries(1, ids0, codes0)  # should reuse freed space
    np.testing.assert_array_equal(od.get_ids(1), ids0)

    # update_entries overwrites in place
    od.update_entries(1, 1, ids1[:2], codes1[:2])
    np.testing.assert_array_equal(od.get_ids(1)[1:3], ids1[:2])

    # compact merge from Array lists built off real indexes
    xt, xb = ds.get_train(), ds.get_database()
    a = ft.index_factory(32, "IVF8,PQ4")
    a.train(xt)
    b = ft.clone_index(a)
    a.add_with_ids(xb[:1500], np.arange(1500, dtype=np.int64))
    b.add_with_ids(xb[1500:], np.arange(1500, len(xb), dtype=np.int64))
    ila = ft.ArrayInvertedLists.from_index(a)
    ilb = ft.ArrayInvertedLists.from_index(b)
    od2 = OnDiskInvertedLists(8, ila.code_size, str(tmp_path / "m.ivfdata"))
    assert od2.merge_from_multiple([ila, ilb]) == len(xb)
    assert od2.is_compact
    for l in range(8):
        np.testing.assert_array_equal(
            od2.get_ids(l), np.concatenate([ila.get_ids(l), ilb.get_ids(l)])
        )

    # attaching the on-disk lists to an index == merged index results
    od2.prefetch_lists(np.arange(8))
    merged = ft.clone_index(a)
    ft.replace_invlists(merged, od2)
    merged.nprobe = 8
    ref = ft.clone_index(a)
    ref.merge_from(ft.clone_index(b))
    ref.nprobe = 8
    D1, I1 = merged.search(ds.get_queries(), 5)
    _, I2 = ref.search(ds.get_queries(), 5)
    np.testing.assert_array_equal(np.sort(I1, 1), np.sort(I2, 1))

    # crop keeps a view of lists [2, 6)
    sz = [od2.list_size(l) for l in range(2, 6)]
    od2.crop_invlists(2, 6)
    assert od2.nlist == 4
    assert [od2.list_size(l) for l in range(4)] == sz


def test_sliding_index_window(ds):
    """SlidingIndexWindow: step() appends new slices and drops the oldest
    (reference: IVFlib.h:86)."""
    xt, xb = ds.get_train(), ds.get_database()
    trained = ft.index_factory(32, "IVF8,PQ4")
    trained.train(xt)
    base = ft.clone_index(trained)
    win = ft.SlidingIndexWindow(base)

    def make_slice(lo, hi):
        s = ft.clone_index(trained)
        s.add_with_ids(xb[lo:hi], np.arange(lo, hi, dtype=np.int64))
        return s

    win.step(make_slice(0, 1000), False)
    assert base.ntotal == 1000 and win.n_slice == 1
    win.step(make_slice(1000, 2000), False)
    assert base.ntotal == 2000 and win.n_slice == 2
    win.step(make_slice(2000, 3000), True)  # drop slice [0, 1000)
    assert base.ntotal == 2000 and win.n_slice == 2
    base.nprobe = 8
    _, I = base.search(ds.get_queries(), 5)
    assert (I[I >= 0] >= 1000).all()  # oldest slice really gone
    win.step(None, True)
    win.step(None, True)
    assert base.ntotal == 0 and win.n_slice == 0
