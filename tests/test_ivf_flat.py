"""IVF-Flat correctness (mirrors reference tests/test_index.py TestIVFFlat)."""

import numpy as np
import pytest

import faiss_tpu as ft
from faiss_tpu.models.ivf import IndexIVFFlat, SearchParametersIVF
from faiss_tpu.utils.datasets import SyntheticDataset
from faiss_tpu.utils.evaluation import (
    check_knn_with_draws,
    knn_intersection_measure,
)


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(32, 2000, 8000, 100)


@pytest.fixture(scope="module")
def trained(ds):
    index = IndexIVFFlat(None, 32, 64)
    index.train(ds.get_train())
    index.add(ds.get_database())
    return index


def test_ivf_recall_increases_with_nprobe(ds, trained):
    gt = ds.get_groundtruth(10)
    recalls = []
    for nprobe in [1, 4, 16, 64]:
        trained.nprobe = nprobe
        _, I = trained.search(ds.get_queries(), 10)
        recalls.append(knn_intersection_measure(I, gt))
    assert recalls == sorted(recalls)
    assert recalls[-1] > 0.99  # nprobe = nlist == exhaustive
    assert recalls[1] > 0.5


def test_full_probe_matches_flat(ds, trained):
    """nprobe == nlist must equal brute force (equivalence test, SURVEY §4)."""
    flat = ft.IndexFlatL2(32)
    flat.add(ds.get_database())
    Dref, Iref = flat.search(ds.get_queries(), 10)
    trained.nprobe = 64
    D, I = trained.search(ds.get_queries(), 10)
    np.testing.assert_allclose(D, Dref, rtol=1e-4, atol=1e-4)
    assert knn_intersection_measure(I, Iref) >= 0.999


def test_search_params_override(ds, trained):
    trained.nprobe = 1
    _, I1 = trained.search(ds.get_queries(), 10)
    _, I64 = trained.search(
        ds.get_queries(), 10, params=SearchParametersIVF(nprobe=64)
    )
    gt = ds.get_groundtruth(10)
    assert knn_intersection_measure(I64, gt) > knn_intersection_measure(I1, gt)


def test_ivf_ip(ds):
    index = IndexIVFFlat(None, 32, 32, ft.METRIC_INNER_PRODUCT)
    index.train(ds.get_train())
    index.add(ds.get_database())
    index.nprobe = 32
    flat = ft.IndexFlatIP(32)
    flat.add(ds.get_database())
    Dref, Iref = flat.search(ds.get_queries(), 5)
    D, I = index.search(ds.get_queries(), 5)
    np.testing.assert_allclose(D, Dref, rtol=1e-4, atol=1e-4)
    assert knn_intersection_measure(I, Iref) >= 0.999


def test_add_with_ids_and_selector(ds, trained):
    xb = ds.get_database()[:500]
    index = IndexIVFFlat(None, 32, 16)
    index.train(ds.get_train())
    ids = np.arange(500, dtype=np.int64) * 10 + 3
    index.add_with_ids(xb, ids)
    index.nprobe = 16
    D, I = index.search(ds.get_queries(), 5)
    valid = I[I >= 0]
    assert ((valid % 10) == 3).all()
    # selector restricted to even original rows
    sel = ft.IDSelectorArray(ids[::2])
    D2, I2 = index.search(
        ds.get_queries(), 5, params=SearchParametersIVF(nprobe=16, sel=sel)
    )
    v2 = I2[I2 >= 0]
    assert np.isin(v2, ids[::2]).all()


def test_remove_merge_reconstruct(ds):
    xb = ds.get_database()[:400]
    a = IndexIVFFlat(None, 32, 8)
    a.train(ds.get_train())
    a.add(xb[:200])
    b = IndexIVFFlat(None, 32, 8)
    b.quantizer = a.quantizer  # shared coarse quantizer
    b.is_trained = True
    b.add_with_ids(xb[200:], np.arange(200, 400, dtype=np.int64))
    a.merge_from(b)
    assert a.ntotal == 400 and b.ntotal == 0
    np.testing.assert_allclose(a.reconstruct(333), xb[333], rtol=1e-6)
    n = a.remove_ids(ft.IDSelectorRange(0, 100))
    assert n == 100 and a.ntotal == 300


def test_search_preassigned_matches_search(ds, trained):
    trained.nprobe = 8
    xq = ds.get_queries()
    D1, I1 = trained.search(xq, 10)
    cd, assign = trained.quantizer.search(xq, 8)
    D2, I2 = trained.search_preassigned(xq, 10, assign, cd)
    np.testing.assert_allclose(D1, D2, rtol=1e-5, atol=1e-5)
    assert knn_intersection_measure(I1, I2) > 0.999


def test_empty_lists_and_small_index():
    rs = np.random.RandomState(0)
    xt = rs.rand(256, 8).astype(np.float32)
    index = IndexIVFFlat(None, 8, 16)
    index.train(xt)
    index.add(xt[:10])
    index.nprobe = 16
    D, I = index.search(xt[:5], 20)
    assert (I[:, 10:] == -1).all()
    assert (I[:, 0] == np.arange(5)).all()  # self is nearest


def test_max_codes_budget(ds, trained):
    """max_codes limits the scanned candidates
    (reference: SearchParametersIVF.max_codes)."""
    xq = ds.get_queries()
    Dfull, _ = trained.search(xq, 10, params=SearchParametersIVF(nprobe=64))
    Dlim, Ilim = trained.search(
        xq, 10, params=SearchParametersIVF(nprobe=64, max_codes=200)
    )
    # limited search sees fewer candidates: distances can only be >= full
    assert (Dlim[np.isfinite(Dlim)] >= -1e-6).all()
    assert np.nanmean(np.where(np.isfinite(Dlim), Dlim, np.nan)) >= (
        np.nanmean(np.where(np.isfinite(Dfull), Dfull, np.nan)) - 1e-6
    )
    # at least the first probe is always scanned
    assert (Ilim[:, 0] >= 0).all()


def test_pq_range_search(ds):
    from faiss_tpu.models.pq import IndexPQ

    index = IndexPQ(32, 8, 8)
    index.train(ds.get_train())
    index.add(ds.get_database())
    D, _ = index.search(ds.get_queries(), 10)
    radius = float(np.median(D[:, 5]))
    res = index.range_search(ds.get_queries(), radius)
    assert (res.distances < radius).all()
    assert res.lims[-1] > 0


def test_ivfflat_fused_big_batch_interpret():
    """The fused IVF-Flat big-batch program (recon kernel over raw bf16
    vectors + exact re-rank) must match the per-probe exact scan."""
    import jax.numpy as jnp

    import faiss_tpu as ft
    from faiss_tpu.models.ivf_pq import (
        _fused_search_rerank_recon,
        _unpack_results,
    )

    rs = np.random.RandomState(11)
    d, nb, nq, nlist = 32, 15000, 256, 64
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    idx = ft.IndexIVFFlat(None, d, nlist)
    idx.train(xb[:8000])
    idx.add(xb)
    idx.nprobe = 8
    D0, I0 = idx.search(xq, 10)  # CPU: per-probe exact path
    br = idx._build_brute()
    packed = _fused_search_rerank_recon(
        jnp.asarray(xq), br["centroids_g"], br["cn2g"], br["yT"],
        br["n2s"], br["lid"], br["slot_map_dev"], br["xb"],
        10, 52, 128, idx.FUSED_CT, 8, qdepth=3, lossy_rank=10,
        interpret=True,
    )
    d1, s1, lossy, _ = _unpack_results(packed, 10)
    I1 = np.where(s1 >= 0, idx._ids_host[np.maximum(s1, 0)], -1)
    agree = (I0 == I1).mean()
    assert agree > 0.97, agree
    same = I0 == I1
    np.testing.assert_allclose(D0[same], d1[same], rtol=1e-4, atol=1e-4)


def test_ivfflat_fused_big_batch_hilo_interpret():
    """brute_hilo=True scores candidates on hi+lo bf16 planes
    (f32-faithful keys): the fused big-batch result must match the
    per-probe exact scan at least as well as the single-plane path, on
    CLUSTERED data where single-plane bf16 selection is weakest."""
    rs = np.random.RandomState(17)
    d, nb, nq, nlist = 32, 12000, 256, 64
    cent = rs.randn(nlist, d).astype(np.float32)
    xb = (cent[rs.randint(nlist, size=nb)]
          + 0.02 * rs.randn(nb, d).astype(np.float32))
    xq = (cent[rs.randint(nlist, size=nq)]
          + 0.02 * rs.randn(nq, d).astype(np.float32))
    idx = ft.IndexIVFFlat(None, d, nlist)
    idx.train(xb[:6000])
    idx.add(xb)
    idx.nprobe = 4
    D0, I0 = idx.search(xq, 10)  # CPU: per-probe exact path
    idx.fused_interpret = True
    idx.big_batch_threshold = 64
    inters = {}
    for hilo in (False, True):
        idx.brute_hilo = hilo
        idx._brute = None
        D1, I1 = idx.search(xq, 10)
        inters[hilo] = np.mean(
            [len(set(I0[i]) & set(I1[i])) / 10 for i in range(nq)]
        )
        if hilo:
            assert idx._brute["yT_lo"] is not None
            same = I0 == I1
            np.testing.assert_allclose(
                D0[same], D1[same], rtol=1e-4, atol=1e-4
            )
    # single-plane collapses on concentrated data (~0.35); hi/lo must hold
    # the exact-within-probed contract (ties near-degenerate points aside)
    assert inters[True] > 0.995, inters
    assert inters[True] > inters[False] + 0.3, inters


def test_ivfflat_dyn_hilo_interpret():
    """The dyn-chunk recon kernel's hi/lo mode (yT_lo operand, 3-pass
    contraction) must reproduce the masked exhaustive hi/lo program at the
    same nprobe, strict and soft."""
    import jax.numpy as jnp

    from faiss_tpu.models.ivf_pq import (
        _fused_search_rerank_recon,
        _fused_search_rerank_recon_dyn,
        _unpack_results,
    )

    rs = np.random.RandomState(23)
    d, nlist, nb, nq, nprobe = 16, 256, 3000, 128, 16
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    idx = ft.IndexIVFFlat(None, d, nlist)
    idx.FUSED_CT = 256
    idx.cp.niter = 4
    idx.cp.min_points_per_centroid = 1
    idx.train(xb)
    idx.add(xb)
    assert idx.brute_hilo  # the exact-contract default
    br = idx._build_brute()
    assert br["yT_lo"] is not None
    k, kc, qt = 10, 40, 128
    # strict dyn must match the masked exhaustive program at the same
    # nprobe; soft is asserted against the EXHAUSTIVE top-k (>= strict)
    Dm, Im, _, _ = _unpack_results(_fused_search_rerank_recon(
        jnp.asarray(xq), br["centroids_g"], br["cn2g"], br["yT"],
        br["n2s"], br["lid"], br["slot_map_dev"], br["xb"],
        k, kc, qt, idx.FUSED_CT, nprobe, yT_lo=br["yT_lo"],
        interpret=True,
    ), k)
    De, Ie, _, _ = _unpack_results(_fused_search_rerank_recon(
        jnp.asarray(xq), br["centroids_g"], br["cn2g"], br["yT"],
        br["n2s"], br["lid"], br["slot_map_dev"], br["xb"],
        k, kc, qt, idx.FUSED_CT, 0, yT_lo=br["yT_lo"],
        interpret=True,
    ), k)
    out = {}
    for strict in (True, False):
        D1, I1, _, nd = _unpack_results(_fused_search_rerank_recon_dyn(
            jnp.asarray(xq), br["centroids_g"], br["cn2g"], br["yT"],
            br["n2s"], br["lid"], br["slot_map_dev"], br["xb"],
            br["chunk_first"], br["chunk_last"], br["cgroup"],
            k, kc, qt, idx.FUSED_CT, nprobe, br["nchunks"],
            br["max_span"], strict_probe=strict, yT_lo=br["yT_lo"],
            interpret=True,
        ), k)
        assert int(nd) == 0
        out[strict] = (np.asarray(I1), np.asarray(D1))
    Im, Dm, Ie = np.asarray(Im), np.asarray(Dm), np.asarray(Ie)
    agree = (Im == out[True][0]).mean()
    assert agree > 0.97, agree
    same = Im == out[True][0]
    np.testing.assert_allclose(Dm[same], out[True][1][same],
                               rtol=1e-4, atol=1e-4)
    inter_strict = np.mean([
        len(set(out[True][0][i]) & set(Ie[i])) / k for i in range(nq)
    ])
    inter_soft = np.mean([
        len(set(out[False][0][i]) & set(Ie[i])) / k for i in range(nq)
    ])
    assert inter_soft >= inter_strict - 1e-9, (inter_soft, inter_strict)
    assert inter_soft > 0.9


def test_ivfflat_search_submit_collect_equivalence():
    """IVF-Flat streaming submit/collect must match the blocking search()
    through the fused big-batch path (interpret mode) and fall back to
    eager below the big-batch threshold."""
    rs = np.random.RandomState(31)
    d, nlist, nb, nq = 16, 32, 2000, 128
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    index = ft.IndexIVFFlat(None, d, nlist)
    index.FUSED_CT = 256
    index.fused_interpret = True
    index.big_batch_threshold = 64
    index.nprobe = nlist
    index.cp.niter = 4
    index.cp.min_points_per_centroid = 1
    index.train(xb)
    index.add(xb)
    D0, I0 = index.search(xq, 10)
    h0 = index.search_submit(xq, 10)
    h1 = index.search_submit(xq, 10)  # two in flight
    assert h0[0] == "fused"
    Ds0, Is0 = index.search_collect(h0)
    Ds1, Is1 = index.search_collect(h1)
    np.testing.assert_array_equal(I0, Is0)
    np.testing.assert_array_equal(I0, Is1)
    np.testing.assert_allclose(D0, Ds0, rtol=1e-5, atol=1e-5)
    h = index.search_submit(xq[:32], 10)
    assert h[0] == "eager"
    De, Ie = index.search_collect(h)
    Dr, Ir = index.search(xq[:32], 10)
    np.testing.assert_array_equal(Ie, Ir)


def test_ivfflat_big_batch_replay_memory_bounded(monkeypatch):
    """Eviction-flagged rows replay through the memory-bounded exact
    candidate-CSR re-rank (NOT the padded per-list staging, which
    explodes under clustered skew at 10M scale): with a deliberately
    tight kc margin and shallow queue many rows flag, and every FLAGGED
    row's result must exactly match the per-probe exact scan (non-flagged
    rows keep the documented bf16-selection margin semantics)."""
    rs = np.random.RandomState(5)
    d, nb, nq, nlist = 32, 12000, 256, 64
    # clustered data: concentrated distances maximize eviction-floor flags
    cent = rs.randn(nlist, d).astype(np.float32)
    xb = (cent[rs.randint(nlist, size=nb)]
          + 0.02 * rs.randn(nb, d).astype(np.float32))
    xq = (cent[rs.randint(nlist, size=nq)]
          + 0.02 * rs.randn(nq, d).astype(np.float32))
    index = IndexIVFFlat(None, d, nlist)
    index.train(xb[:6000])
    index.add(xb)
    index.nprobe = 4
    index.fused_interpret = True
    index.big_batch_kc = 10  # zero margin -> many replays
    index.refined_qdepth = 1
    index.big_batch_threshold = 64
    index.brute_hilo = False  # single-plane: maximize eviction flags

    replayed = []
    orig = IndexIVFFlat._replay_rows_exact

    def spy(self, xq_bad, k, nprobe):
        replayed.append(np.array(xq_bad))
        return orig(self, xq_bad, k, nprobe)

    monkeypatch.setattr(IndexIVFFlat, "_replay_rows_exact", spy)
    ft.ivf_fast_scan_stats.reset()
    D1, I1 = index.search(xq, 10)
    assert ft.ivf_fast_scan_stats.lossy_rows > 0  # the replay actually ran
    assert replayed
    index.big_batch_threshold = 0  # strict per-probe exact path
    D0, I0 = index.search(xq, 10)
    # map replayed query rows back to their indices by value
    key = {xq[i].tobytes(): i for i in range(nq)}
    bad = sorted({key[r.tobytes()] for blk in replayed for r in blk})
    assert len(bad) == ft.ivf_fast_scan_stats.lossy_rows
    # tie-aware comparison (contrib/evaluation.py:247 analogue): the two
    # paths accumulate distances in different orders, so near-equal
    # neighbors may swap adjacent ranks — ids must only agree up to draws
    check_knn_with_draws(D0[bad], I0[bad], D1[bad], I1[bad],
                         rtol=1e-4, atol=1e-4)


def test_ivfflat_replay_rows_exact_direct():
    """_replay_rows_exact alone == per-probe exact search at matching
    nprobe, across row-chunk boundaries (nb > chunk C) and ragged
    candidate counts."""
    rs = np.random.RandomState(9)
    d, nb, nq, nlist = 16, 4000, 50, 32
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    index = IndexIVFFlat(None, d, nlist)
    index.train(xb[:2000])
    index.add(xb)
    index.replay_gather_bytes = 16 * 2048 * 128 * 4  # force C=16 chunking
    index._build_brute()
    Dr, Ir = index._replay_rows_exact(xq, 10, 4)
    index.nprobe = 4
    D0, I0 = index.search(xq, 10)  # per-probe exact path (CPU default)
    np.testing.assert_allclose(Dr, D0, rtol=1e-4, atol=1e-4)
    assert (Ir == I0).mean() > 0.999


def test_ivfflat_replay_rows_exact_column_chunked():
    """When even the 8-row floor would overshoot replay_gather_bytes
    (extreme list skew), the replay must column-chunk each row's
    candidates and merge — same results as the per-probe exact path,
    never a silent up-to-8x budget overshoot."""
    rs = np.random.RandomState(13)
    d, nb, nq, nlist = 16, 9000, 40, 8
    # skew: one giant list absorbs most vectors
    xb = rs.randn(nb, d).astype(np.float32)
    xb[: nb * 8 // 10] *= 0.01  # concentrated blob -> one huge list
    xq = 0.01 * rs.randn(nq, d).astype(np.float32)
    index = IndexIVFFlat(None, d, nlist)
    index.train(xb)
    index.add(xb)
    # budget so small that rows_fit < 8 -> col_chunk path engages
    index.replay_gather_bytes = 2 * 2048 * 128 * 4
    index._build_brute()
    Dr, Ir = index._replay_rows_exact(xq, 10, 2)
    index.nprobe = 2
    D0, I0 = index.search(xq, 10)  # per-probe exact path (CPU default)
    check_knn_with_draws(D0, I0, Dr, Ir, rtol=1e-4, atol=1e-4)


def test_ivfflat_update_vectors_invalidates_replay_csr():
    """update_vectors moves rows between lists with ntotal unchanged —
    the list-CSR cache must be invalidated or _replay_rows_exact gathers
    candidates from stale list membership (silent contract violation)."""
    rs = np.random.RandomState(17)
    d, nb, nlist = 16, 2000, 16
    xb = rs.randn(nb, d).astype(np.float32)
    index = IndexIVFFlat(None, d, nlist)
    index.train(xb)
    index.add(xb)
    index._list_csr()  # populate the cache
    # move a handful of rows far away (guaranteed new coarse assignment)
    ids = np.arange(8, dtype=np.int64)
    xnew = 50.0 + rs.randn(8, d).astype(np.float32)
    index.update_vectors(ids, xnew)
    index._build_brute()
    Dr, Ir = index._replay_rows_exact(xnew, 5, 2)
    index.nprobe = 2
    D0, I0 = index.search(xnew, 5)
    # tolerances cover f32 cancellation in the norms-decomposition at the
    # +50 offset (||q||^2 ~ 4e4 cancelling to distances ~20); a stale CSR
    # fails by candidates from the wrong lists, not by rounding
    check_knn_with_draws(D0, I0, Dr, Ir, rtol=1e-3, atol=0.05)
    # the updated rows themselves must be found at distance ~0
    assert (Ir[:, 0] == ids).all()


def test_ivfflat_big_batch_rt_econ_equivalence():
    """rt_econ=True (one staged upload, device-sliced sub-batches) must
    return bit-identical results to per-bucket staging, across multiple
    pipeline_batch buckets and both query staging dtypes."""
    rs = np.random.RandomState(11)
    d, nb, nq, nlist = 32, 20000, 700, 64
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    index = IndexIVFFlat(None, d, nlist)
    index.train(xb[:8000])
    index.add(xb)
    index.nprobe = 4
    index.big_batch_threshold = 64
    index.pipeline_batch = 256  # force several buckets
    for dt in (None, "float16"):
        if dt:
            index.query_h2d_dtype = dt
        index.rt_econ = False
        D0, I0 = index.search(xq, 10)
        index.rt_econ = True
        D1, I1 = index.search(xq, 10)
        np.testing.assert_array_equal(I0, I1)
        np.testing.assert_array_equal(D0, D1)
