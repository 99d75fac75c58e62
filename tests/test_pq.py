"""PQ codec + IndexPQ + IVFPQ tests (mirrors reference tests/test_index.py
TestPQ / test_fast_scan*.py equivalence patterns)."""

import numpy as np
import pytest

import faiss_tpu as ft
from faiss_tpu.codecs.pq import ProductQuantizer
from faiss_tpu.models.ivf_pq import IndexIVFPQ, IndexIVFPQFastScan, IndexIVFPQR
from faiss_tpu.models.pq import IndexPQ, IndexPQFastScan
from faiss_tpu.utils.datasets import SyntheticDataset
from faiss_tpu.utils.evaluation import knn_intersection_measure, recall_at_k


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(32, 2000, 5000, 100)


def test_pq_codec_roundtrip(ds):
    pq = ProductQuantizer(32, 4, 8)
    pq.train(ds.get_train())
    x = ds.get_database()[:100]
    codes = pq.compute_codes_int(x)
    assert codes.shape == (100, 4) and codes.dtype == np.uint8
    recon = pq.decode_int(codes)
    # quantization error must be far below data norm
    err = ((x - recon) ** 2).sum() / (x**2).sum()
    assert err < 0.05
    # codes must be the argmin assignment per subspace
    xs = x.reshape(100, 4, 8)
    for m in range(4):
        d2 = ((xs[:, m, None, :] - pq.centroids[m][None]) ** 2).sum(-1)
        np.testing.assert_array_equal(codes[:, m], d2.argmin(1))


def test_pq_packing():
    for nbits, M in [(4, 8), (8, 4), (6, 4), (12, 4), (16, 2)]:
        pq = ProductQuantizer(32, M, nbits)
        rs = np.random.RandomState(0)
        codes_int = rs.randint(1 << nbits, size=(20, M)).astype(
            np.uint16 if nbits > 8 else np.uint8
        )
        packed = pq.pack_codes(codes_int)
        assert packed.shape == (20, pq.code_size)
        unpacked = pq.unpack_codes(packed)
        np.testing.assert_array_equal(unpacked.astype(np.uint32), codes_int)


def test_distance_tables_match_bruteforce(ds):
    pq = ProductQuantizer(32, 4, 6)
    pq.train(ds.get_train())
    xq = ds.get_queries()[:10]
    tabs = pq.compute_distance_tables(xq)
    xs = xq.reshape(10, 4, 8)
    ref = (
        (xs[:, :, None, :] - pq.centroids[None]) ** 2
    ).sum(-1)
    np.testing.assert_allclose(tabs, ref, rtol=1e-3, atol=1e-4)


def test_adc_equals_table_sum(ds):
    """ADC search distance == sum of table entries == exact dist to recon."""
    pq = ProductQuantizer(32, 8, 8)
    pq.train(ds.get_train())
    xb = ds.get_database()[:500]
    xq = ds.get_queries()[:20]
    codes = pq.compute_codes_int(xb)
    D, I = pq.search(xq, codes, 5)
    recon = pq.decode_int(codes)
    dref = ((xq[:, None, :] - recon[None]) ** 2).sum(-1)
    iref = np.argsort(dref, axis=1, kind="stable")[:, :5]
    np.testing.assert_allclose(
        D, np.take_along_axis(dref, I.astype(np.int64), 1), rtol=1e-3, atol=1e-3
    )
    assert knn_intersection_measure(I, iref) >= 0.97


def test_index_pq_recall(ds):
    index = IndexPQ(32, 8, 8)
    index.train(ds.get_train())
    index.add(ds.get_database())
    gt = ds.get_groundtruth(10)
    _, I = index.search(ds.get_queries(), 10)
    assert recall_at_k(I, gt, 10) > 0.7


def test_index_pq_fastscan_equivalence(ds):
    """FastScan (4-bit one-hot GEMM) == plain 4-bit PQ ADC on the same codes
    (the reference's test_fast_scan.py equivalence)."""
    plain = IndexPQ(32, 8, 4)
    plain.train(ds.get_train())
    plain.add(ds.get_database())
    fs = IndexPQFastScan(32, 8)
    fs.pq = plain.pq
    fs.is_trained = True
    fs.add(ds.get_database())
    D1, I1 = plain.search(ds.get_queries(), 10)
    D2, I2 = fs.search(ds.get_queries(), 10)
    # same codes, same tables -> near-identical (bf16 one-hot matmul rounding)
    np.testing.assert_allclose(D1, D2, rtol=2e-2, atol=2e-2)
    assert knn_intersection_measure(I1, I2) > 0.95


def test_ivfpq_recall_and_fullprobe(ds):
    index = IndexIVFPQ(None, 32, 32, 8, 8)
    index.train(ds.get_train())
    index.add(ds.get_database())
    gt = ds.get_groundtruth(10)
    index.nprobe = 4
    _, I4 = index.search(ds.get_queries(), 10)
    index.nprobe = 32
    _, I32 = index.search(ds.get_queries(), 10)
    r4 = recall_at_k(I4, gt, 10)
    r32 = recall_at_k(I32, gt, 10)
    assert r32 >= r4
    assert r32 > 0.6

    # full probe must match flat PQ on residual-free comparison:
    # check distances equal exact distance to the reconstruction
    D, I = index.search(ds.get_queries()[:5], 3)
    for q in range(5):
        for j in range(3):
            if I[q, j] < 0:
                continue
            recon = index.reconstruct(int(I[q, j]))
            dref = ((ds.get_queries()[q] - recon) ** 2).sum()
            np.testing.assert_allclose(D[q, j], dref, rtol=1e-2, atol=1e-2)


def test_ivfpq_big_batch_respects_nprobe(ds):
    """The big-batch implem must honor nprobe (VERDICT r1: it silently
    scanned everything) — results match the standard per-probe path."""
    index = IndexIVFPQ(None, 32, 16, 4, 8)
    index.train(ds.get_train())
    index.add(ds.get_database())
    xq = ds.get_queries()
    index.nprobe = 2
    index.big_batch_threshold = 0
    Dref, Iref = index.search(xq, 5)
    index.big_batch_threshold = 1  # force the big-batch implem
    D, I = index.search(xq, 5)
    # same distances modulo bf16-LUT rounding + tie order (the XLA
    # big-batch path scores with bf16 tables; PQ code collisions make many
    # exact ties, so ids are compared by probed-list membership below)
    np.testing.assert_allclose(np.sort(D, 1), np.sort(Dref, 1), rtol=0.05,
                               atol=0.05)
    # every returned id must belong to one of the query's 2 probed lists
    _, probes = index.quantizer.search(xq, 2)
    id_to_list = np.full(index.ntotal, -1, np.int64)
    id_to_list[index._ids_host] = index._listnos_host
    for q in range(len(xq)):
        got = I[q][I[q] >= 0]
        assert np.isin(id_to_list[got], probes[q]).all()
    # sanity: nprobe=2 big-batch differs from exhaustive
    index.nprobe = index.nlist
    Dall, _ = index.search(xq, 5)
    assert not np.allclose(Dall, D)


def test_ivfpq_no_residual_matches_pq(ds):
    """by_residual=False + nprobe=nlist == IndexPQ (equivalence, SURVEY §4)."""
    ivf = IndexIVFPQ(None, 32, 8, 8, 8)
    ivf.by_residual = False
    ivf.train(ds.get_train())
    ivf.add(ds.get_database())
    ivf.nprobe = 8

    flat = IndexPQ(32, 8, 8)
    flat.pq = ivf.pq
    flat.is_trained = True
    flat.add(ds.get_database())

    Dq, Iq = ivf.search(ds.get_queries(), 5)
    Df, If = flat.search(ds.get_queries(), 5)
    np.testing.assert_allclose(Dq, Df, rtol=1e-3, atol=1e-3)
    # ids may differ freely on tied distances (duplicate PQ codes);
    # tie-aware check: every returned id's true ADC distance must equal the
    # reported one
    recon = ivf.pq.decode_int(flat._codes_host)
    xq = ds.get_queries()
    dtrue = ((xq[:, None, :] - recon[Iq]) ** 2).sum(-1)
    np.testing.assert_allclose(Dq, dtrue, rtol=1e-3, atol=1e-3)


def test_ivfpq_fastscan(ds):
    index = IndexIVFPQFastScan(None, 32, 16, 8)
    index.train(ds.get_train())
    index.add(ds.get_database())
    index.nprobe = 8
    gt = ds.get_groundtruth(10)
    _, I = index.search(ds.get_queries(), 10)
    assert recall_at_k(I, gt, 10) > 0.4


def test_ivfpq_ip(ds):
    index = IndexIVFPQ(None, 32, 8, 8, 8, ft.METRIC_INNER_PRODUCT)
    index.train(ds.get_train())
    index.add(ds.get_database())
    index.nprobe = 8
    flat = ft.IndexFlatIP(32)
    flat.add(ds.get_database())
    _, Iref = flat.search(ds.get_queries(), 10)
    _, I = index.search(ds.get_queries(), 10)
    assert knn_intersection_measure(I, Iref) > 0.5


def test_ivfpqr(ds):
    base = IndexIVFPQ(None, 32, 16, 4, 8)
    base.train(ds.get_train())
    base.add(ds.get_database())
    base.nprobe = 8
    pqr = IndexIVFPQR(None, 32, 16, 4, 8, 8, 8)
    pqr.train(ds.get_train())
    pqr.add(ds.get_database())
    pqr.nprobe = 8
    gt = ds.get_groundtruth(10)
    _, Ib = base.search(ds.get_queries(), 10)
    _, Ir = pqr.search(ds.get_queries(), 10)
    # refinement must improve recall
    assert recall_at_k(Ir, gt, 10) >= recall_at_k(Ib, gt, 10)


def test_polysemous(ds):
    """Polysemous filter: large ht == plain ADC; small ht prunes but keeps
    decent recall after reordering (reference tests/test_polysemous pattern)."""
    index = IndexPQ(32, 8, 8)
    index.do_polysemous_training = True
    index.train(ds.get_train())
    index.add(ds.get_database())

    plain = IndexPQ(32, 8, 8)
    plain.pq = index.pq
    plain.is_trained = True
    plain.add(ds.get_database())
    Dref, Iref = plain.search(ds.get_queries(), 10)

    index.search_type = IndexPQ.ST_polysemous
    index.polysemous_ht = 64  # full code length: no filtering
    D, I = index.search(ds.get_queries(), 10)
    np.testing.assert_allclose(D, Dref, rtol=1e-4, atol=1e-4)

    gt = ds.get_groundtruth(10)
    r_full = recall_at_k(Iref, gt, 10)
    index.polysemous_ht = 30
    _, I30 = index.search(ds.get_queries(), 10)
    r_30 = recall_at_k(I30, gt, 10)
    assert r_30 > 0.25  # pruned but useful (reordering keeps near codes close)
    # very aggressive threshold must actually prune (fewer/nulled results)
    index.polysemous_ht = 5
    D5, I5 = index.search(ds.get_queries(), 10)
    assert (I5 == -1).sum() > (I30 == -1).sum()
    del r_full


def test_pq_sdc_search(ds):
    """ST_SDC: symmetric distances == sum of SDC table entries; recall in
    the ballpark of (below) ADC (reference: IndexPQ.h:78, test_index.py
    SDC coverage)."""
    index = ft.IndexPQ(32, 4, 8)
    index.train(ds.get_train())
    index.add(ds.get_database())
    gt = ds.get_groundtruth(10)
    _, I_adc = index.search(ds.get_queries(), 10)
    index.search_type = index.ST_SDC
    D, I = index.search(ds.get_queries(), 10)
    r_sdc = recall_at_k(I, gt, 10)
    r_adc = recall_at_k(I_adc, gt, 10)
    assert r_sdc > 0.3 and r_sdc <= r_adc + 0.05
    # distances match the SDC table sum exactly
    sdc = index.pq.compute_sdc_table()
    qc = index.pq.compute_codes_int(ds.get_queries()[:5]).astype(np.int64)
    for q in range(5):
        for j in range(3):
            i = int(I[q, j])
            if i < 0:
                continue
            dc = index._codes_host[i].astype(np.int64)
            ref = sum(sdc[m, qc[q, m], dc[m]] for m in range(4))
            np.testing.assert_allclose(D[q, j], ref, rtol=1e-3, atol=1e-3)


def test_ivfpq_polysemous_ht(ds):
    """polysemous_ht inside IVF lists (IndexIVFPQ.h:47): tighter thresholds
    filter more candidates; generous thresholds keep recall."""
    index = ft.IndexIVFPQ(None, 32, 8, 4, 8)
    index.do_polysemous_training = True
    index.big_batch_threshold = 0
    index.train(ds.get_train())
    index.add(ds.get_database())
    index.nprobe = 8
    gt = ds.get_groundtruth(10)
    _, I0 = index.search(ds.get_queries(), 10)
    r0 = recall_at_k(I0, gt, 10)
    index.polysemous_ht = 4 * 8  # generous: no filtering effect
    _, I = index.search(ds.get_queries(), 10)
    assert recall_at_k(I, gt, 10) >= r0 - 0.02
    index.polysemous_ht = 8  # tight: filters most candidates
    _, I8 = index.search(ds.get_queries(), 10)
    assert (I8 == -1).sum() > (I == -1).sum()


def test_fused_adc_kernel_interpret(ds):
    """The fused ADC+select Pallas kernel (interpret mode) must reproduce
    brute-force ADC scores exactly (modulo bf16 LUT rounding)."""
    import jax.numpy as jnp

    from faiss_tpu.ops.pallas_knn import ivfpq_fused_pallas

    from faiss_tpu.models.ivf_pq import pack_invlists_grouped

    rs = np.random.RandomState(0)
    nq, M, ksub, nlist, ct, nb = 128, 4, 16, 8, 512, 1500
    codes = rs.randint(ksub, size=(nb, M)).astype(np.uint8)
    listnos = rs.randint(nlist, size=nb).astype(np.int32)
    luts = rs.randn(nq, M, ksub).astype(np.float32)
    cm2 = rs.randn(nq, nlist).astype(np.float32)
    n2v = rs.rand(nb).astype(np.float32) * 2

    g = pack_invlists_grouped(listnos, nlist, ct)
    pos, order = g["pos"], g["order"]
    codesT = np.zeros((M, g["S"]), np.uint8)
    codesT[:, pos] = codes[order].T
    n2s = np.full((1, g["S"]), np.inf, np.float32)
    n2s[0, pos] = n2v[order]
    sm = g["slot_map"]
    lp = g["list_perm"]
    biasg = np.zeros((nq, len(lp)), np.float32)
    biasg[:, lp >= 0] = cm2[:, lp[lp >= 0]]

    v, i, ev = ivfpq_fused_pallas(
        jnp.asarray(biasg),
        jnp.asarray(luts.reshape(nq, -1), jnp.bfloat16),
        jnp.asarray(codesT),
        jnp.asarray(n2s),
        jnp.asarray(g["lid"][None, :]),
        qt=128,
        ct=ct,
        interpret=True,
    )
    v = np.asarray(v)
    lutflat = luts.reshape(nq, -1)
    offs = np.arange(M) * ksub
    ipq = lutflat[:, (codes.astype(np.int64) + offs)].sum(-1)
    ref = np.sort(n2v[None] + cm2[:, listnos] + ipq, 1)[:, :128]
    # every returned value must be a genuine ADC score of that query
    full = n2v[None] + cm2[:, listnos] + ipq  # [nq, nb]
    full_sorted = np.sort(full, 1)
    pos = np.clip(
        np.searchsorted(full_sorted[0], v[0]), 0, nb - 1
    )  # spot-check machinery below vectorizes per row
    for q in range(0, nq, 16):
        fs = full_sorted[q]
        p_ = np.clip(np.searchsorted(fs, v[q]), 1, nb - 1)
        nearest = np.minimum(np.abs(fs[p_] - v[q]), np.abs(fs[p_ - 1] - v[q]))
        assert (nearest < 2e-2).all()
    # pair-reduction may drop entries (collision rate ~128^2/2S at this tiny
    # scale); coverage of the true top-128 stays high (tolerance-based match:
    # the kernel uses bf16 LUTs)
    covers = []
    for q in range(nq):
        vq = np.sort(v[q][np.isfinite(v[q])])
        p_ = np.clip(np.searchsorted(vq, ref[q]), 1, len(vq) - 1)
        near = np.minimum(
            np.abs(vq[p_] - ref[q]), np.abs(vq[p_ - 1] - ref[q])
        )
        covers.append((near < 2e-2).mean())
    cover = np.mean(covers)
    assert cover > 0.9, cover


def test_dyn_fused_search_interpret():
    """The dynamic-chunk fused program (_fused_search_rerank_dyn — TPU
    implem_12, IndexIVFFastScan.cpp:1166) must reproduce the masked
    exhaustive fused program at the same nprobe: scanning only the probed
    chunks is semantically a no-op."""
    import jax.numpy as jnp

    import faiss_tpu as ft
    from faiss_tpu.models.ivf_pq import (
        _fused_search_rerank,
        _fused_search_rerank_dyn,
        _unpack_results,
    )

    rs = np.random.RandomState(3)
    d, nlist, nb, nq, nprobe = 16, 256, 3000, 128, 16
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    index = ft.IndexIVFPQFastScan(None, d, nlist, 4, 4)
    index.FUSED_CT = 256
    index.cp.niter = 4
    index.cp.min_points_per_centroid = 1
    index.train(xb)
    index.add(xb)
    br = index._build_brute()
    assert br["nchunks"] >= 4 and br["max_span"] >= 1
    refine_xb = jnp.asarray(xb)
    args = (
        jnp.asarray(xq), br["centroids_g"], br["cn2g"], br["cbt"],
        br["codesT"], br["n2s"], br["lid"], br["slot_map_dev"], refine_xb,
    )
    k, kc, qt = 10, 40, 128
    D0, I0, _, _ = _unpack_results(_fused_search_rerank(
        *args, k, kc, qt, index.FUSED_CT, nprobe, interpret=True
    ), k)
    D1, I1, _, nd = _unpack_results(_fused_search_rerank_dyn(
        *args, br["chunk_first"], br["chunk_last"], br["cgroup"],
        k, kc, qt, index.FUSED_CT, nprobe, br["nchunks"], br["max_span"],
        interpret=True,
    ), k)
    assert int(nd) == 0  # full-size worklist drops nothing
    D0, I0, D1, I1 = map(np.asarray, (D0, I0, D1, I1))
    # both rerank the kernel's top-kc exactly; candidate sets agree modulo
    # rare queue-eviction ordering differences
    agree = (I0 == I1).mean()
    assert agree > 0.97, agree
    same = I0 == I1
    np.testing.assert_allclose(D0[same], D1[same], rtol=1e-4, atol=1e-4)

    # a SMALL worklist must report drops (and still return valid results)
    D2, I2, _, nd2 = _unpack_results(_fused_search_rerank_dyn(
        *args, br["chunk_first"], br["chunk_last"], br["cgroup"],
        k, kc, qt, index.FUSED_CT, nprobe, 2, br["max_span"],
        interpret=True,
    ), k)
    assert int(nd2) > 0
    assert (np.asarray(I2) >= -1).all()


def test_recon_fused_search_interpret():
    """The recon-GEMM fused program (_fused_search_rerank_recon — ADC as a
    direct MXU contraction against decoded reconstructions) must reproduce
    the one-hot fused program: the decoded-store score IS the ADC score.

    Runs in a CHILD pytest process: this is the largest interpret-mode
    compile in the suite, and XLA:CPU segfaults inside
    backend_compile_and_load when it runs after ~200 earlier tests'
    accumulated JIT state (reproduced 3x at this exact test in full-suite
    order; passes in any smaller combination, incl. this file alone and
    c_api+nsg+pq). The child isolates that XLA bug from the suite without
    dropping the coverage."""
    import os
    import subprocess
    import sys

    if os.environ.get("FAISS_TPU_INTERPRET_CHILD") != "1":
        env = dict(os.environ, FAISS_TPU_INTERPRET_CHILD="1")
        res = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q",
             f"{__file__}::test_recon_fused_search_interpret"],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        assert res.returncode == 0, (
            f"child run failed:\n{res.stdout[-2000:]}\n{res.stderr[-2000:]}"
        )
        return
    import jax.numpy as jnp

    import faiss_tpu as ft
    from faiss_tpu.models.ivf_pq import (
        _fused_search_rerank,
        _fused_search_rerank_recon,
        _unpack_results,
    )

    rs = np.random.RandomState(5)
    d, nlist, nb, nq = 16, 256, 3000, 128
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    index = ft.IndexIVFPQFastScan(None, d, nlist, 4, 4)
    index.FUSED_CT = 256
    index.cp.niter = 4
    index.cp.min_points_per_centroid = 1
    index.train(xb)
    index.add(xb)
    br = index._build_brute()
    assert br["yT"] is not None  # tiny index: decoded store must fit
    assert br["yT"].shape[0] == 128  # d padded to the lane multiple
    refine_xb = jnp.asarray(xb)
    k, kc, qt = 10, 40, 128
    for nprobe in (0, 16):
        D0, I0, _, _ = _unpack_results(_fused_search_rerank(
            jnp.asarray(xq), br["centroids_g"], br["cn2g"], br["cbt"],
            br["codesT"], br["n2s"], br["lid"], br["slot_map_dev"],
            refine_xb, k, kc, qt, index.FUSED_CT, nprobe, interpret=True,
        ), k)
        D1, I1, _, _ = _unpack_results(_fused_search_rerank_recon(
            jnp.asarray(xq), br["centroids_g"], br["cn2g"], br["yT"],
            br["n2s"], br["lid"], br["slot_map_dev"], refine_xb,
            k, kc, qt, index.FUSED_CT, nprobe, interpret=True,
        ), k)
        D0, I0, D1, I1 = map(np.asarray, (D0, I0, D1, I1))
        # both rerank their top-kc exactly; candidate sets agree modulo
        # bf16 rounding differences in the two score producers
        agree = (I0 == I1).mean()
        assert agree > 0.95, (nprobe, agree)
        same = I0 == I1
        np.testing.assert_allclose(D0[same], D1[same], rtol=1e-4, atol=1e-4)


def test_recon_store_decodes_exactly():
    """The staged bf16 decoded store must equal reconstruct() up to bf16."""
    import faiss_tpu as ft

    rs = np.random.RandomState(6)
    d, nlist, nb = 24, 32, 800
    xb = rs.randn(nb, d).astype(np.float32)
    index = ft.IndexIVFPQ(None, d, nlist, 4, 4)
    index.cp.niter = 4
    index.cp.min_points_per_centroid = 1
    index.train(xb)
    index.add(xb)
    br = index._build_brute()
    yT = np.asarray(br["yT"]).astype(np.float32)
    sm = br["slot_map"]
    # reconstruct a sample of slots through the codec and compare
    take = np.where(sm >= 0)[0][::37]
    want = index.decode_vectors(
        index._codes_host[sm[take]], index._listnos_host[sm[take]]
    )
    got = yT[:d, take].T
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # padded dims and pad slots are zero
    assert (yT[d:, :] == 0).all()
    assert (yT[:, np.where(sm < 0)[0]] == 0).all()


def test_recon_dyn_fused_search_interpret():
    """The dyn-chunk recon program (_fused_search_rerank_recon_dyn) must
    reproduce the masked exhaustive recon program at the same nprobe."""
    import jax.numpy as jnp

    import faiss_tpu as ft
    from faiss_tpu.models.ivf_pq import (
        _fused_search_rerank_recon,
        _fused_search_rerank_recon_dyn,
        _unpack_results,
    )

    rs = np.random.RandomState(7)
    d, nlist, nb, nq, nprobe = 16, 256, 3000, 128, 16
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    index = ft.IndexIVFPQFastScan(None, d, nlist, 4, 4)
    index.FUSED_CT = 256
    index.cp.niter = 4
    index.cp.min_points_per_centroid = 1
    index.train(xb)
    index.add(xb)
    br = index._build_brute()
    assert br["yT"] is not None
    refine_xb = jnp.asarray(xb)
    k, kc, qt = 10, 40, 128
    D0, I0, _, _ = _unpack_results(_fused_search_rerank_recon(
        jnp.asarray(xq), br["centroids_g"], br["cn2g"], br["yT"],
        br["n2s"], br["lid"], br["slot_map_dev"], refine_xb,
        k, kc, qt, index.FUSED_CT, nprobe, interpret=True,
    ), k)
    D1, I1, _, nd = _unpack_results(_fused_search_rerank_recon_dyn(
        jnp.asarray(xq), br["centroids_g"], br["cn2g"], br["yT"],
        br["n2s"], br["lid"], br["slot_map_dev"], refine_xb,
        br["chunk_first"], br["chunk_last"], br["cgroup"],
        k, kc, qt, index.FUSED_CT, nprobe, br["nchunks"], br["max_span"],
        interpret=True,
    ), k)
    assert int(nd) == 0
    D0, I0, D1, I1 = map(np.asarray, (D0, I0, D1, I1))
    agree = (I0 == I1).mean()
    assert agree > 0.97, agree
    same = I0 == I1
    np.testing.assert_allclose(D0[same], D1[same], rtol=1e-4, atol=1e-4)


def test_refined_big_batch_int8_staging_selective_nprobe():
    """Regression (ADVICE r2 high): _dyn_bucket_for must dequantize the
    int8-staged query buffer before sizing the worklist — the staged buffer
    is [nq, d+8] uint8 and a plain astype crashed the coarse dot_general.
    Runs the FULL _search_big_batch_refined path (staging, dyn bucket,
    fused kernels in interpret mode) with a selective nprobe on CPU."""
    import jax.numpy as jnp

    rs = np.random.RandomState(11)
    d, nlist, nb, nq, nprobe = 16, 64, 2000, 128, 8
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    index = ft.IndexIVFPQFastScan(None, d, nlist, 4, 4)
    index.FUSED_CT = 256
    index.fused_interpret = True
    index.query_h2d_dtype = "int8"  # force staging even on CPU
    index.cp.niter = 4
    index.cp.min_points_per_centroid = 1
    index.train(xb)
    index.add(xb)
    D, I = index._search_big_batch_refined(xq, 10, 40, jnp.asarray(xb), nprobe)
    assert index._dyn_bucket and nprobe in index._dyn_bucket
    # results must match a straight IVF search at the same nprobe closely
    index2 = ft.IndexIVFPQFastScan(None, d, nlist, 4, 4)
    index2.cp.niter = 4
    index2.cp.min_points_per_centroid = 1
    index2.quantizer.add(index.quantizer.reconstruct_n(0, nlist))
    index2.pq.centroids = index.pq.centroids
    index2.is_trained = True
    index2.add(xb)
    index2.nprobe = nprobe
    _, Iref = index2.search(xq, 40)
    inter = np.mean([
        len(set(I[i]) & set(Iref[i][:40])) / 10.0 for i in range(nq)
    ])
    assert inter > 0.9, inter


def test_refined_big_batch_xla_fallback_maps_ids():
    """Regression (ADVICE r2 medium): the ksub>16 XLA fallback in
    _search_big_batch_refined must translate packed slot positions to the
    stored user ids (add_with_ids)."""
    import jax.numpy as jnp

    rs = np.random.RandomState(12)
    d, nlist, nb, nq = 16, 32, 1500, 64
    xb = rs.randn(nb, d).astype(np.float32)
    xq = xb[:nq] + 0.01 * rs.randn(nq, d).astype(np.float32)
    index = ft.IndexIVFPQ(None, d, nlist, 4, 8)  # ksub=256 > 16
    index.recon_scan_max_bytes = 0  # forbid the decoded store -> XLA path
    index.cp.niter = 4
    index.cp.min_points_per_centroid = 1
    index.train(xb)
    ids = np.arange(nb, dtype=np.int64) * 10 + 7
    index.add_with_ids(xb, ids)
    D, I = index._search_big_batch_refined(xq, 5, 32, jnp.asarray(xb), 0)
    # every returned label must be one of the user ids, and the top hit
    # must be the (noisy) query's own vector for most rows
    valid = I[I >= 0]
    assert ((valid % 10) == 7).all()
    top_ok = (I[:, 0] == ids[:nq]).mean()
    assert top_ok > 0.9, top_ok


def test_recon_sort_rot_sparse_flush_interpret():
    """sort_rot (home-group query sort + per-tile rotated chunk order) and
    a sparser flush cap must reproduce the baseline recon program's results
    (same exact re-rank; candidate sets agree up to queue-eviction order)."""
    import jax.numpy as jnp

    import faiss_tpu as ft
    from faiss_tpu.models.ivf_pq import (
        _fused_search_rerank_recon,
        _unpack_results,
    )

    rs = np.random.RandomState(7)
    d, nlist, nb, nq = 16, 256, 3000, 256
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    index = ft.IndexIVFPQFastScan(None, d, nlist, 4, 4)
    index.FUSED_CT = 256
    index.cp.niter = 4
    index.cp.min_points_per_centroid = 1
    index.train(xb)
    index.add(xb)
    br = index._build_brute()
    refine_xb = jnp.asarray(xb)
    k, kc, qt = 10, 40, 128
    for nprobe in (0, 16):
        base_args = (
            jnp.asarray(xq), br["centroids_g"], br["cn2g"], br["yT"],
            br["n2s"], br["lid"], br["slot_map_dev"], refine_xb,
            k, kc, qt, index.FUSED_CT, nprobe,
        )
        D0, I0, _, _ = _unpack_results(
            _fused_search_rerank_recon(*base_args, interpret=True), k
        )
        D1, I1, _, _ = _unpack_results(
            _fused_search_rerank_recon(
                *base_args, fmax=48, sort_rot=True, interpret=True
            ),
            k,
        )
        agree = (np.asarray(I0) == np.asarray(I1)).mean()
        assert agree > 0.95, (nprobe, agree)
        same = np.asarray(I0) == np.asarray(I1)
        np.testing.assert_allclose(
            np.asarray(D0)[same], np.asarray(D1)[same], rtol=1e-4, atol=1e-4
        )


def test_recon_two_phase_select_interpret():
    """cheap_after (two-phase select: careful home-region steps + min2-fold
    tail) must match the baseline recon program's results under sort_rot."""
    import jax.numpy as jnp

    import faiss_tpu as ft
    from faiss_tpu.models.ivf_pq import (
        _fused_search_rerank_recon,
        _unpack_results,
    )

    rs = np.random.RandomState(17)
    d, nlist, nb, nq = 16, 256, 3000, 256
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    index = ft.IndexIVFPQFastScan(None, d, nlist, 4, 4)
    index.FUSED_CT = 256
    index.cp.niter = 4
    index.cp.min_points_per_centroid = 1
    index.train(xb)
    index.add(xb)
    br = index._build_brute()
    refine_xb = jnp.asarray(xb)
    k, kc, qt = 10, 40, 128
    base_args = (
        jnp.asarray(xq), br["centroids_g"], br["cn2g"], br["yT"],
        br["n2s"], br["lid"], br["slot_map_dev"], refine_xb,
        k, kc, qt, index.FUSED_CT, 0,
    )
    D0, I0, _, _ = _unpack_results(
        _fused_search_rerank_recon(
            *base_args, fmax=48, sort_rot=True, interpret=True
        ),
        k,
    )
    D1, I1, _, _ = _unpack_results(
        _fused_search_rerank_recon(
            *base_args, fmax=48, sort_rot=True, cheap_after=3,
            interpret=True,
        ),
        k,
    )
    agree = (np.asarray(I0) == np.asarray(I1)).mean()
    assert agree > 0.9, agree
    # top-1 must be essentially identical (the cheap tail only risks
    # runner-up candidates, absorbed by the exact re-rank margin)
    assert (np.asarray(I0)[:, 0] == np.asarray(I1)[:, 0]).mean() > 0.97


def test_dyn_soft_probe_interpret():
    """strict_probe=False (soft probing — no {0,1e9} penalty) must be at
    least as good as the penalized dyn scan: same worklist chunks, every
    slot competes on its true key."""
    import jax.numpy as jnp

    import faiss_tpu as ft
    from faiss_tpu.models.ivf_pq import (
        _fused_search_rerank_recon,
        _fused_search_rerank_recon_dyn,
        _unpack_results,
    )

    rs = np.random.RandomState(23)
    d, nlist, nb, nq, nprobe = 16, 256, 3000, 128, 16
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    index = ft.IndexIVFPQFastScan(None, d, nlist, 4, 4)
    index.FUSED_CT = 256
    index.cp.niter = 4
    index.cp.min_points_per_centroid = 1
    index.train(xb)
    index.add(xb)
    br = index._build_brute()
    refine_xb = jnp.asarray(xb)
    k, kc, qt = 10, 40, 128
    # exhaustive reference
    D0, I0, _, _ = _unpack_results(_fused_search_rerank_recon(
        jnp.asarray(xq), br["centroids_g"], br["cn2g"], br["yT"],
        br["n2s"], br["lid"], br["slot_map_dev"], refine_xb,
        k, kc, qt, index.FUSED_CT, 0, interpret=True,
    ), k)
    out = {}
    for strict in (True, False):
        D1, I1, _, nd = _unpack_results(_fused_search_rerank_recon_dyn(
            jnp.asarray(xq), br["centroids_g"], br["cn2g"], br["yT"],
            br["n2s"], br["lid"], br["slot_map_dev"], refine_xb,
            br["chunk_first"], br["chunk_last"], br["cgroup"],
            k, kc, qt, index.FUSED_CT, nprobe, br["nchunks"],
            br["max_span"], qdepth=2, strict_probe=strict, interpret=True,
        ), k)
        assert int(nd) == 0
        out[strict] = (np.asarray(I1), np.asarray(D1))
    # intersection with the exhaustive top-k: soft >= strict
    I0 = np.asarray(I0)
    inter_strict = np.mean([
        len(set(out[True][0][i]) & set(I0[i])) / k for i in range(nq)
    ])
    inter_soft = np.mean([
        len(set(out[False][0][i]) & set(I0[i])) / k for i in range(nq)
    ])
    assert inter_soft >= inter_strict - 1e-9, (inter_soft, inter_strict)
    assert inter_soft > 0.9


def test_search_submit_collect_streaming_equivalence():
    """search_submit/search_collect (the cross-batch streaming API) must
    return exactly what a blocking search() returns, both through the
    fused refined path (interpret mode) and the eager fallback, including
    two in-flight handles at once (serving-loop double buffering)."""
    import jax.numpy as jnp  # noqa: F401

    rs = np.random.RandomState(21)
    d, nlist, nb, nq = 16, 32, 2000, 128
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(2 * nq, d).astype(np.float32)
    base = ft.IndexIVFPQFastScan(None, d, nlist, 4, 4)
    base.FUSED_CT = 256
    base.fused_interpret = True
    base.big_batch_threshold = 64
    base.nprobe = nlist
    base.cp.niter = 4
    base.cp.min_points_per_centroid = 1
    index = ft.IndexRefineFlat(base)
    index.k_factor = 4
    index.train(xb)
    index.add(xb)
    D0, I0 = index.search(xq[:nq], 10)
    D1, I1 = index.search(xq[nq:], 10)
    # two handles in flight, collected in submit order
    h0 = index.search_submit(xq[:nq], 10)
    h1 = index.search_submit(xq[nq:], 10)
    assert h0[0] == "fused"
    Ds0, Is0 = index.search_collect(h0)
    Ds1, Is1 = index.search_collect(h1)
    np.testing.assert_array_equal(I0, Is0)
    np.testing.assert_array_equal(I1, Is1)
    np.testing.assert_allclose(D0, Ds0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(D1, Ds1, rtol=1e-5, atol=1e-5)
    # eager fallback (small nq under the big-batch threshold) matches too
    h = index.search_submit(xq[:32], 10)
    assert h[0] == "eager"
    De, Ie = index.search_collect(h)
    Dr, Ir = index.search(xq[:32], 10)
    np.testing.assert_array_equal(Ie, Ir)
    # base Index default submit/collect (no fused path at all)
    flat = ft.IndexFlatL2(d)
    flat.add(xb)
    Df, If = flat.search_collect(flat.search_submit(xq[:64], 5))
    Dg, Ig = flat.search(xq[:64], 5)
    np.testing.assert_array_equal(If, Ig)


def test_pretransform_search_submit_collect():
    """IndexPreTransform forwards the streaming API through its chain."""
    import faiss_tpu as ft

    rs = np.random.RandomState(22)
    d, nb, nq = 16, 1500, 128
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    base = ft.IndexIVFPQFastScan(None, d, 32, 4, 4)
    base.FUSED_CT = 256
    base.fused_interpret = True
    base.big_batch_threshold = 64
    base.nprobe = 32
    base.cp.niter = 4
    base.cp.min_points_per_centroid = 1
    idx = ft.IndexRefineFlat(base)
    idx.k_factor = 4
    pre = ft.IndexPreTransform(ft.OPQMatrix(d, 4), idx)
    pre.train(xb)
    pre.add(xb)
    h = pre.search_submit(xq, 10)
    assert h[0] == "fused"
    Ds, Is = pre.search_collect(h)
    Dr, Ir = pre.search(xq, 10)
    np.testing.assert_array_equal(Is, Ir)
    np.testing.assert_allclose(Ds, Dr, rtol=1e-5, atol=1e-5)


def test_pack_d2h_f16_equivalence():
    """pack_d2h="f16" (int32 ids + f16 distance pairs on the wire) must
    return IDENTICAL ids to the f32 packing and distances within f16
    rounding, through both the fused refined path and the IVF-Flat fused
    path (interpret mode), including odd k (pair padding)."""
    rs = np.random.RandomState(23)
    d, nlist, nb, nq = 16, 32, 2000, 128
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    base = ft.IndexIVFPQFastScan(None, d, nlist, 4, 4)
    base.FUSED_CT = 256
    base.fused_interpret = True
    base.big_batch_threshold = 64
    base.nprobe = nlist
    base.cp.niter = 4
    base.cp.min_points_per_centroid = 1
    index = ft.IndexRefineFlat(base)
    index.k_factor = 4
    index.train(xb)
    index.add(xb)
    for k in (10, 7):  # even + odd (odd exercises the pad lane)
        D0, I0 = index.search(xq, k)
        base.pack_d2h = "f16"
        D1, I1 = index.search(xq, k)
        base.pack_d2h = None
        np.testing.assert_array_equal(I0, I1)
        np.testing.assert_allclose(D0, D1, rtol=2**-10, atol=1e-4)

    from faiss_tpu.models.ivf import IndexIVFFlat

    fl = IndexIVFFlat(None, d, nlist)
    fl.train(xb)
    fl.add(xb)
    fl.nprobe = 4
    fl.fused_interpret = True
    fl.big_batch_threshold = 64
    D0, I0 = fl.search(xq, 10)
    fl.pack_d2h = "f16"
    D1, I1 = fl.search(xq, 10)
    np.testing.assert_array_equal(I0, I1)
    np.testing.assert_allclose(D0, D1, rtol=2**-10, atol=1e-4)


def test_refine_sq8_fused_path():
    """Refine(SQ8): the fused big-batch path re-ranks against uint8 codes
    dequantized after the gather. Must agree with the f32 RFlat twin on
    ids up to SQ8 reconstruction swaps and stay close on distances; the
    factory token Refine(SQ8) builds the same composite."""
    rs = np.random.RandomState(29)
    d, nlist, nb, nq = 16, 32, 3000, 128
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)

    def build(store):
        base = ft.IndexIVFPQFastScan(None, d, nlist, 4, 4)
        base.FUSED_CT = 256
        base.fused_interpret = True
        base.big_batch_threshold = 64
        base.nprobe = 8
        base.cp.niter = 4
        base.cp.min_points_per_centroid = 1
        idx = ft.IndexRefineFlat(base, store=store)
        idx.k_factor = 4
        idx.train(xb)
        idx.add(xb)
        return idx

    f32 = build("f32")
    sq8 = build("sq8")
    D0, I0 = f32.search(xq, 10)
    D1, I1 = sq8.search(xq, 10)
    # same candidates from the identical base scan; the SQ8 re-rank may
    # swap near-ties (gaussian d=16 distances concentrate, so ~10% of
    # adjacent ranks sit within the 8-bit rounding) — the contract is
    # recall parity below, not rank-exactness
    assert (I0 == I1).mean() > 0.85
    m = I0 == I1
    np.testing.assert_allclose(D1[m], D0[m], rtol=0.05, atol=0.05)

    # gt recall must not degrade materially vs the f32 refine
    gt_d = ((xq[:, None, :] - xb[None]) ** 2).sum(-1)
    gtI = np.argsort(gt_d, 1)[:, :10]
    r0 = np.mean([len(np.intersect1d(I0[i], gtI[i])) / 10 for i in range(nq)])
    r1 = np.mean([len(np.intersect1d(I1[i], gtI[i])) / 10 for i in range(nq)])
    assert r1 >= r0 - 0.01

    # factory spelling
    fac = ft.index_factory(d, "IVF32,PQ4x4fs,Refine(SQ8)")
    from faiss_tpu.models.flat import IndexFlatSQ8

    assert isinstance(fac.refine_index, IndexFlatSQ8)

    # io round-trip of the whole composite
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "rsq8.bin")
        ft.write_index(sq8, p)
        back = ft.read_index(p)
    assert back.store == "sq8"
    back.base_index.FUSED_CT = 256  # match the build (tiling reorders ties)
    back.base_index.fused_interpret = True
    back.base_index.big_batch_threshold = 64
    back.base_index.nprobe = 8
    back.k_factor = 4
    D2, I2 = back.search(xq, 10)
    np.testing.assert_array_equal(I1, I2)
