"""Tests for SQ, binary, LSH, HNSW, meta wrappers, transforms, factory, io —
mirroring the reference's test_index_composite.py / test_io.py /
test_binary_*.py patterns."""

import io

import numpy as np
import pytest

import faiss_tpu as ft
from faiss_tpu.utils.datasets import SyntheticDataset
from faiss_tpu.utils.evaluation import knn_intersection_measure, recall_at_k


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(32, 1500, 3000, 50)


# ---------------- ScalarQuantizer ----------------


@pytest.mark.parametrize(
    "qtype",
    [
        ft.QuantizerType.QT_8bit,
        ft.QuantizerType.QT_4bit,
        ft.QuantizerType.QT_6bit,
        ft.QuantizerType.QT_8bit_uniform,
        ft.QuantizerType.QT_fp16,
        ft.QuantizerType.QT_bf16,
    ],
)
def test_sq_codec_roundtrip(ds, qtype):
    sq = ft.ScalarQuantizer(32, qtype)
    sq.train(ds.get_train())
    x = ds.get_database()[:50]
    codes = sq.compute_codes(x)
    assert codes.shape == (50, sq.code_size)
    recon = sq.decode(codes)
    err = np.abs(recon - x).max()
    bits = {0: 8, 1: 4, 6: 6, 2: 8}.get(int(qtype), 8)
    xt = ds.get_train()
    spread = float((xt.max(0) - xt.min(0)).max())
    if qtype == ft.QuantizerType.QT_fp16:
        assert err < 1e-2
    elif qtype == ft.QuantizerType.QT_bf16:
        assert err < 0.05
    else:
        # within the trained range, error is at most one bucket width;
        # out-of-range values clip (same as the reference codec)
        if "uniform" in qtype.name:
            xt_min = np.full(32, xt.min())
            xt_max = np.full(32, xt.max())
        else:
            xt_min, xt_max = xt.min(0), xt.max(0)
        xc = np.clip(x, xt_min[None], xt_max[None])
        err_in = np.abs(recon - xc).max()
        assert err_in <= spread / (1 << bits) + 1e-4, err_in


def test_index_sq(ds):
    index = ft.IndexScalarQuantizer(32, ft.QuantizerType.QT_8bit)
    index.train(ds.get_train())
    index.add(ds.get_database())
    gt = ds.get_groundtruth(10)
    _, I = index.search(ds.get_queries(), 10)
    assert recall_at_k(I, gt, 10) > 0.9


def test_index_ivf_sq(ds):
    index = ft.IndexIVFScalarQuantizer(None, 32, 16, ft.QuantizerType.QT_8bit)
    index.train(ds.get_train())
    index.add(ds.get_database())
    index.nprobe = 16
    gt = ds.get_groundtruth(10)
    _, I = index.search(ds.get_queries(), 10)
    assert recall_at_k(I, gt, 10) > 0.85


# ---------------- binary / LSH ----------------


def test_binary_flat():
    rs = np.random.RandomState(7)
    xb = rs.randint(256, size=(500, 8)).astype(np.uint8)
    xq = xb[:10].copy()
    index = ft.IndexBinaryFlat(64)
    index.add(xb)
    D, I = index.search(xq, 3)
    assert (I[:, 0] == np.arange(10)).all()
    assert (D[:, 0] == 0).all()
    # cross-check vs numpy popcount
    q = np.unpackbits(xq, axis=1)
    b = np.unpackbits(xb, axis=1)
    dref = (q[:, None, :] != b[None]).sum(-1)
    np.testing.assert_array_equal(
        np.sort(D, 1), np.sort(np.take_along_axis(dref, I.astype(int), 1), 1)
    )


def test_binary_ivf():
    rs = np.random.RandomState(8)
    xb = rs.randint(256, size=(2000, 8)).astype(np.uint8)
    index = ft.IndexBinaryIVF(None, 64, 8)
    index.train(xb)
    index.add(xb)
    index.nprobe = 8
    D, I = index.search(xb[:20], 1)
    assert (D[:, 0] == 0).all()


def test_binary_hash():
    rs = np.random.RandomState(9)
    xb = rs.randint(256, size=(500, 8)).astype(np.uint8)
    index = ft.IndexBinaryHash(64, 10)
    index.add(xb)
    index.nflip = 1
    D, I = index.search(xb[:10], 1)
    assert (D[:, 0] == 0).all() and (I[:, 0] == np.arange(10)).all()


def test_lsh(ds):
    index = ft.IndexLSH(32, 128)
    index.train(ds.get_train())
    index.add(ds.get_database())
    gt = ds.get_groundtruth(10)
    _, I = index.search(ds.get_queries(), 10)
    assert recall_at_k(I, gt, 10) > 0.3  # LSH is coarse


# ---------------- HNSW ----------------


def test_hnsw_flat(ds):
    index = ft.IndexHNSWFlat(32, 16)
    index.hnsw.efConstruction = 60
    index.add(ds.get_database())
    index.hnsw.efSearch = 64
    gt = ds.get_groundtruth(10)
    D, I = index.search(ds.get_queries(), 10)
    r = recall_at_k(I, gt, 10)
    assert r > 0.9, r
    # distances are true L2
    xb, xq = ds.get_database(), ds.get_queries()
    for q in range(5):
        for j in range(3):
            dref = ((xq[q] - xb[I[q, j]]) ** 2).sum()
            np.testing.assert_allclose(D[q, j], dref, rtol=1e-4)


def test_hnsw_flat_panorama(ds):
    """Panorama progressive pruning (reference: IndexHNSW.h:171): recall
    close to vanilla HNSW, exact distances on survivors, io round-trip,
    factory token."""
    rs = np.random.RandomState(5)
    # energy concentrated in early dims (post-PCA-like) — the regime the
    # Cauchy-Schwarz suffix bound is built for
    scale = (1.0 / (1.0 + np.arange(32))).astype(np.float32)
    xb = rs.randn(3000, 32).astype(np.float32) * scale
    xq = rs.randn(100, 32).astype(np.float32) * scale
    d2 = ((xq[:, None, :] - xb[None]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :10]

    index = ft.IndexHNSWFlatPanorama(32, 16, 8)
    index.hnsw.efConstruction = 60
    index.add(xb)
    index.hnsw.efSearch = 64
    D, I = index.search(xq, 10)
    r = recall_at_k(I, gt, 10)
    assert r > 0.85, r
    # survivors carry their exact L2
    for q in range(5):
        dref = ((xq[q] - xb[I[q, 0]]) ** 2).sum()
        np.testing.assert_allclose(D[q, 0], dref, rtol=1e-4)

    # io round-trip preserves the graph and the panorama levels
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        ft.write_index(index, f.name)
        back = ft.read_index(f.name)
    assert isinstance(back, ft.IndexHNSWFlatPanorama)
    assert back.num_panorama_levels == 8
    D2, I2 = back.search(xq, 10)
    r2 = recall_at_k(I2, gt, 10)
    assert r2 > 0.85, r2

    idx = ft.index_factory(32, "HNSW16,FlatPanorama4")
    assert isinstance(idx, ft.IndexHNSWFlatPanorama)
    assert idx.num_panorama_levels == 4


def test_hnsw_params(ds):
    index = ft.IndexHNSWFlat(32, 16)
    index.add(ds.get_database())
    gt = ds.get_groundtruth(10)
    rs = []
    for ef in [4, 16, 64]:
        _, I = index.search(
            ds.get_queries(), 10, params=ft.SearchParametersHNSW(efSearch=ef)
        )
        rs.append(recall_at_k(I, gt, 10))
    assert rs[0] <= rs[-1]


# ---------------- meta wrappers ----------------


def test_idmap(ds):
    index = ft.IndexIDMap(ft.IndexFlatL2(32))
    ids = np.arange(3000, dtype=np.int64) * 7 + 1
    index.add_with_ids(ds.get_database(), ids)
    _, I = index.search(ds.get_queries(), 5)
    assert (((I - 1) % 7) == 0).all()
    # IDMap2 reconstruct
    index2 = ft.IndexIDMap2(ft.IndexFlatL2(32))
    index2.add_with_ids(ds.get_database(), ids)
    np.testing.assert_array_equal(
        index2.reconstruct(ids[42]), ds.get_database()[42]
    )


def test_refine_flat(ds):
    base = ft.IndexPQ(32, 8, 4)
    base.train(ds.get_train())
    index = ft.IndexRefineFlat(base)
    index.add(ds.get_database())
    index.k_factor = 4
    gt = ds.get_groundtruth(10)
    _, Ib = base.search(ds.get_queries(), 1)
    Dr, Ir = index.search(ds.get_queries(), 1)
    assert recall_at_k(Ir, gt, 1) >= recall_at_k(Ib, gt, 1)
    # refined distances are exact L2 to the true vectors
    xb, xq = ds.get_database(), ds.get_queries()
    for q in range(10):
        dref = ((xq[q] - xb[Ir[q, 0]]) ** 2).sum()
        np.testing.assert_allclose(Dr[q, 0], dref, rtol=1e-3, atol=1e-5)


def test_pretransform_pca(ds):
    pca = ft.PCAMatrix(32, 16)
    index = ft.IndexPreTransform(pca, ft.IndexFlatL2(16))
    index.train(ds.get_train())
    index.add(ds.get_database())
    gt = ds.get_groundtruth(10)
    _, I = index.search(ds.get_queries(), 10)
    assert recall_at_k(I, gt, 10) > 0.6


def test_shards_equals_full(ds):
    xb = ds.get_database()
    full = ft.IndexFlatL2(32)
    full.add(xb)
    shards = ft.IndexShards(32)
    for _ in range(3):
        shards.add_shard(ft.IndexFlatL2(32))
    shards.add(xb)
    Df, If = full.search(ds.get_queries(), 10)
    Ds, Is = shards.search(ds.get_queries(), 10)
    np.testing.assert_allclose(Df, Ds, rtol=1e-5, atol=1e-5)
    assert knn_intersection_measure(If, Is) > 0.99


def test_replicas(ds):
    xb = ds.get_database()
    reps = ft.IndexReplicas(32)
    for _ in range(2):
        reps.add_replica(ft.IndexFlatL2(32))
    reps.add(xb)
    full = ft.IndexFlatL2(32)
    full.add(xb)
    Df, If = full.search(ds.get_queries(), 5)
    Dr, Ir = reps.search(ds.get_queries(), 5)
    np.testing.assert_allclose(Df, Dr, rtol=1e-5)
    np.testing.assert_array_equal(If, Ir)


# ---------------- transforms ----------------


def test_pca_reduces_error(ds):
    pca = ft.PCAMatrix(32, 8)
    pca.train(ds.get_train())
    x = ds.get_database()[:100]
    y = pca.apply(x)
    assert y.shape == (100, 8)
    # eigenvalues sorted descending
    ev = pca.eigenvalues
    assert (np.diff(ev) <= 1e-5).all()
    # centered reconstruction error ratio ~ discarded eigenvalue mass
    xc = x - pca.mean
    proj = (xc @ pca.A.T) @ pca.A
    err = ((xc - proj) ** 2).sum() / (xc**2).sum()
    kept = ev[:8].sum() / max(ev.sum(), 1e-9)
    assert err < (1 - kept) + 0.1
    # full-dim PCA is invertible through reverse_transform
    pfull = ft.PCAMatrix(32, 32)
    pfull.train(ds.get_train())
    np.testing.assert_allclose(
        pfull.reverse_transform(pfull.apply(x)), x, atol=1e-3
    )


def test_opq_improves_pq(ds):
    plain = ft.IndexPQ(32, 4, 4)
    plain.train(ds.get_train())
    plain.add(ds.get_database())
    opq = ft.OPQMatrix(32, 4)
    opq.niter = 10
    wrapped = ft.IndexPreTransform(opq, ft.IndexPQ(32, 4, 4))
    wrapped.train(ds.get_train())
    wrapped.add(ds.get_database())
    gt = ds.get_groundtruth(10)
    _, Ip = plain.search(ds.get_queries(), 10)
    _, Io = wrapped.search(ds.get_queries(), 10)
    # OPQ should not be (much) worse; usually better
    assert recall_at_k(Io, gt, 10) >= recall_at_k(Ip, gt, 10) - 0.05


def test_normalization_centering():
    rs = np.random.RandomState(0)
    x = rs.rand(50, 8).astype(np.float32) + 1
    nt = ft.NormalizationTransform(8)
    np.testing.assert_allclose(
        np.linalg.norm(nt.apply(x), axis=1), 1.0, rtol=1e-5
    )
    ct = ft.CenteringTransform(8)
    ct.train(x)
    np.testing.assert_allclose(ct.apply(x).mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(ct.reverse_transform(ct.apply(x)), x, rtol=1e-5)


def test_remap_dimensions():
    rt = ft.RemapDimensionsTransform(4, 6, False)
    x = np.arange(8, dtype=np.float32).reshape(2, 4)
    y = rt.apply(x)
    assert y.shape == (2, 6)
    np.testing.assert_array_equal(y[:, :4], x)
    np.testing.assert_array_equal(rt.reverse_transform(y), x)


# ---------------- factory ----------------


@pytest.mark.parametrize(
    "desc,cls",
    [
        ("Flat", ft.IndexFlat),
        ("PQ8", ft.IndexPQ),
        ("PQ8x4fs", ft.IndexPQFastScan),
        ("SQ8", ft.IndexScalarQuantizer),
        ("IVF16,Flat", ft.IndexIVFFlat),
        ("IVF16,PQ8", ft.IndexIVFPQ),
        ("IVF16,PQ8x4fs", ft.IndexIVFPQFastScan),
        ("IVF16,SQ8", ft.IndexIVFScalarQuantizer),
        ("HNSW16", ft.IndexHNSWFlat),
        ("LSH", ft.IndexLSH),
        ("PCA16,Flat", ft.IndexPreTransform),
        ("OPQ4_16,IVF16,PQ4", ft.IndexPreTransform),
        ("IDMap,Flat", ft.IndexIDMap),
        ("IVF16,Flat", ft.IndexIVFFlat),
    ],
)
def test_factory_classes(desc, cls):
    index = ft.index_factory(32, desc)
    assert isinstance(index, cls), (desc, type(index))
    assert index.d == 32


def test_factory_end_to_end(ds):
    index = ft.index_factory(32, "OPQ4_16,IVF16,PQ4")
    index.train(ds.get_train())
    index.add(ds.get_database())
    index.index.nprobe = 8
    gt = ds.get_groundtruth(10)
    _, I = index.search(ds.get_queries(), 10)
    assert recall_at_k(I, gt, 10) > 0.3


def test_factory_refine(ds):
    index = ft.index_factory(32, "PQ4,RFlat")
    assert isinstance(index, ft.IndexRefineFlat)


# ---------------- io ----------------


def _roundtrip(index):
    data = ft.serialize_index(index)
    return ft.deserialize_index(data)


def test_io_flat(ds):
    index = ft.IndexFlatL2(32)
    index.add(ds.get_database())
    r = _roundtrip(index)
    D1, I1 = index.search(ds.get_queries(), 5)
    D2, I2 = r.search(ds.get_queries(), 5)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, rtol=1e-6)


def test_io_ivfpq(ds):
    index = ft.IndexIVFPQ(None, 32, 16, 4, 8)
    index.train(ds.get_train())
    index.add(ds.get_database())
    index.nprobe = 4
    r = _roundtrip(index)
    assert r.nprobe == 4
    D1, I1 = index.search(ds.get_queries(), 5)
    D2, I2 = r.search(ds.get_queries(), 5)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, rtol=1e-5)


def test_io_pretransform_and_file(tmp_path, ds):
    index = ft.index_factory(32, "PCA16,IVF16,SQ8")
    index.train(ds.get_train())
    index.add(ds.get_database())
    fname = str(tmp_path / "index.npz")
    ft.write_index(index, fname)
    r = ft.read_index(fname)
    D1, I1 = index.search(ds.get_queries(), 5)
    D2, I2 = r.search(ds.get_queries(), 5)
    np.testing.assert_array_equal(I1, I2)


def test_io_hnsw(ds):
    index = ft.IndexHNSWFlat(32, 16)
    index.add(ds.get_database())
    r = _roundtrip(index)
    D1, I1 = index.search(ds.get_queries(), 5)
    D2, I2 = r.search(ds.get_queries(), 5)
    np.testing.assert_array_equal(I1, I2)


def test_io_idmap_binary(ds):
    index = ft.IndexIDMap(ft.IndexFlatL2(32))
    ids = np.arange(3000, dtype=np.int64) + 100
    index.add_with_ids(ds.get_database(), ids)
    r = _roundtrip(index)
    _, I1 = index.search(ds.get_queries(), 3)
    _, I2 = r.search(ds.get_queries(), 3)
    np.testing.assert_array_equal(I1, I2)

    rs = np.random.RandomState(3)
    xb = rs.randint(256, size=(100, 8)).astype(np.uint8)
    b = ft.IndexBinaryFlat(64)
    b.add(xb)
    rb = _roundtrip(b)
    np.testing.assert_array_equal(rb.xb, xb)


def test_io_new_families(ds):
    # RQ
    rq = ft.IndexResidualQuantizer(32, 3, 6)
    rq.train(ds.get_train())
    rq.add(ds.get_database()[:500])
    r = _roundtrip(rq)
    D1, I1 = rq.search(ds.get_queries(), 3)
    D2, I2 = r.search(ds.get_queries(), 3)
    np.testing.assert_array_equal(I1, I2)
    # RaBitQ
    rb = ft.IndexRaBitQ(32)
    rb.train(ds.get_train())
    rb.add(ds.get_database()[:500])
    r = _roundtrip(rb)
    D1, I1 = rb.search(ds.get_queries(), 3)
    D2, I2 = r.search(ds.get_queries(), 3)
    np.testing.assert_array_equal(I1, I2)
    # NSG
    nsg = ft.IndexNSGFlat(32, 8)
    nsg.add(ds.get_database()[:500])
    r = _roundtrip(nsg)
    D1, I1 = nsg.search(ds.get_queries(), 3)
    D2, I2 = r.search(ds.get_queries(), 3)
    np.testing.assert_array_equal(I1, I2)


def test_qinco_roundtrip():
    """QINCo with random (untrained) weights must still round-trip its own
    codes deterministically: encode -> decode -> encode is a fixpoint."""
    from faiss_tpu.models.neuralnet_codec import IndexQINCo

    rs = np.random.RandomState(0)
    idx = IndexQINCo(8, 3, 4, L=1, h=16)
    # random-init weights
    q = idx.qinco
    q.codebook0.weight = rs.randn(16, 8).astype(np.float32)
    for step in q.steps:
        step.codebook.weight = rs.randn(16, 8).astype(np.float32) * 0.3
        step.MLPconcat.weight = rs.randn(8, 16).astype(np.float32) * 0.1
        for blk in step.residual_blocks:
            blk.linear1.weight = rs.randn(16, 8).astype(np.float32) * 0.1
            blk.linear2.weight = rs.randn(8, 16).astype(np.float32) * 0.1
    idx.is_trained = True

    x = rs.randn(50, 8).astype(np.float32)
    codes = q.encode(x)
    recon = q.decode(codes)
    codes2 = q.encode(recon)
    # reconstruction must be closer than the raw codebook0 quantizer alone
    err_full = ((x - recon) ** 2).sum()
    err_cb0 = ((x - q.codebook0.weight[codes[:, 0]]) ** 2).sum()
    assert err_full < err_cb0
    # index API
    idx.add(x)
    D, I = idx.search(x[:5], 1)
    assert (I[:, 0] >= 0).all()
    packed = idx.sa_encode(x[:5])
    assert packed.shape == (5, idx.sa_code_size())
    np.testing.assert_allclose(
        idx.sa_decode(packed), q.decode(codes[:5]), rtol=1e-5
    )


def test_multi_index_quantizer(ds):
    """IMI assignment == brute force over the virtual centroid product
    (reference MultiIndexQuantizer semantics)."""
    from faiss_tpu.models.imi import MultiIndexQuantizer

    imi = MultiIndexQuantizer(32, 2, 5)  # 1024 virtual centroids
    imi.train(ds.get_train())
    assert imi.ntotal == 1024
    xq = ds.get_queries()[:20]
    D, I = imi.search(xq, 4)
    cent = imi.vectors()
    dref = ((xq[:, None] - cent[None]) ** 2).sum(-1)
    iref = np.argsort(dref, 1)[:, :4]
    np.testing.assert_allclose(
        D, np.take_along_axis(dref, I.astype(np.int64), 1), rtol=1e-3, atol=1e-3
    )
    assert knn_intersection_measure(I, iref) > 0.99


def test_multi_index_quantizer_generic_m(ds):
    """Generic-M IMI (M=4): iterated merge == brute force over the full
    ksub^M product lattice, and id digits follow the reference's
    low-bits-first numbering (IndexPQ.cpp:872)."""
    from faiss_tpu.models.imi import MultiIndexQuantizer

    imi = MultiIndexQuantizer(32, 4, 4)  # 16^4 = 65536 virtual centroids
    imi.train(ds.get_train())
    assert imi.ntotal == 65536
    xq = ds.get_queries()[:10]
    D, I = imi.search(xq, 8)
    cent = imi.vectors()
    dref = ((xq[:, None] - cent[None]) ** 2).sum(-1)
    iref = np.argsort(dref, 1, kind="stable")[:, :8]
    np.testing.assert_allclose(
        np.take_along_axis(dref, iref, 1),
        np.take_along_axis(dref, I.astype(np.int64), 1),
        rtol=1e-3, atol=1e-3,
    )
    # reconstruct agrees with the materialized table for the top hit
    for q in range(3):
        np.testing.assert_allclose(
            imi.reconstruct(int(I[q, 0])), cent[I[q, 0]], rtol=1e-6
        )


def test_multi_index_quantizer2(ds):
    """MIQ2 with exact Flat assign sub-indexes == plain MIQ; HNSW-assigned
    variant reaches near-identical cells (IndexPQ.h:170)."""
    from faiss_tpu.models.imi import MultiIndexQuantizer, MultiIndexQuantizer2

    xt = ds.get_train()
    xq = ds.get_queries()[:20]
    imi = MultiIndexQuantizer(32, 2, 5)
    imi.train(xt)

    m2 = MultiIndexQuantizer2(
        32, 5, ft.IndexFlatL2(16), ft.IndexFlatL2(16)
    )
    m2.pq = imi.pq  # share codebooks so results must match exactly
    m2.is_trained = True
    m2.ntotal = imi.ntotal
    dsub = 16
    for m, sub in enumerate(m2.assign_indexes):
        sub.reset()
        sub.add(imi.pq.centroids[m].reshape(-1, dsub))
    D1, I1 = imi.search(xq, 4)
    D2, I2 = m2.search(xq, 4)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, rtol=1e-5, atol=1e-5)

    # io round-trip (Flat assign indexes serialized recursively)
    r = ft.deserialize_index(ft.serialize_index(m2))
    D3, I3 = r.search(xq, 4)
    np.testing.assert_array_equal(I2, I3)

    # approximate assignment path: fresh MIQ2 trained end-to-end
    m3 = MultiIndexQuantizer2(
        32, 5, ft.IndexHNSWFlat(16, 16), ft.IndexHNSWFlat(16, 16)
    )
    m3.train(xt)
    _, I4 = m3.search(xq, 4)
    agree = (I4[:, 0] == I1[:, 0]).mean()
    assert agree > 0.9, agree


def test_imi_ivf_end_to_end(ds):
    """IMI2x4,Flat (256 lists) through the factory."""
    index = ft.index_factory(32, "IMI2x4,Flat")
    index.train(ds.get_train())
    index.add(ds.get_database())
    index.nprobe = 64
    gt = ds.get_groundtruth(10)
    _, I = index.search(ds.get_queries(), 10)
    assert recall_at_k(I, gt, 10) > 0.7


def test_panorama_matches_flat():
    """Panorama screened search == exact flat search
    (cumulative-norm bound screening is near-lossless)."""
    from faiss_tpu.models.panorama import IndexFlatPanorama

    ds2 = SyntheticDataset(64, 1000, 20000, 50)
    xb, xq = ds2.get_database(), ds2.get_queries()
    flat = ft.IndexFlatL2(64)
    flat.add(xb)
    Dref, Iref = flat.search(xq, 10)

    pan = IndexFlatPanorama(64, num_levels=4)
    pan.add(xb)
    D, I = pan.search(xq, 10)
    # exact: the certificate falls back to the flat path for any query whose
    # k-th exact distance beats the (C+1)-th smallest lower bound
    np.testing.assert_allclose(D, Dref, rtol=1e-4, atol=1e-4)
    assert knn_intersection_measure(I, Iref) > 0.999


def test_panorama_exact_when_level1_uninformative():
    """Adversarial case: the first d/num_levels dims are constant, so the
    level-1 partial distance carries no signal — the certificate must route
    every query through the exact fallback (reference index is exact,
    impl/Panorama.h:237)."""
    from faiss_tpu.models.panorama import IndexFlatPanorama

    rs = np.random.RandomState(7)
    d, nb, nq = 64, 20000, 30
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)
    xb[:, : d // 4] = 1.0
    xq[:, : d // 4] = 1.0
    flat = ft.IndexFlatL2(d)
    flat.add(xb)
    Dref, Iref = flat.search(xq, 10)
    pan = IndexFlatPanorama(d, num_levels=4)
    pan.add(xb)
    D, I = pan.search(xq, 10)
    np.testing.assert_allclose(D, Dref, rtol=1e-4, atol=1e-4)
    assert knn_intersection_measure(I, Iref) > 0.999


def test_ivf_flat_panorama(ds):
    """IVF Panorama == plain IVF-Flat results (pruned scan is certified
    exact w.r.t. the probed lists), and io round-trips."""
    from faiss_tpu.models.panorama import IndexIVFFlatPanorama

    ref = ft.IndexIVFFlat(None, 32, 16)
    ref.train(ds.get_train())
    ref.add(ds.get_database())
    ref.nprobe = 4
    Dref, Iref = ref.search(ds.get_queries(), 10)

    pan = ft.index_factory(32, "IVF16,FlatPanorama4")
    assert isinstance(pan, IndexIVFFlatPanorama)
    pan.cp.seed = ref.cp.seed
    pan.train(ds.get_train())
    pan.add(ds.get_database())
    pan.nprobe = 4
    D, I = pan.search(ds.get_queries(), 10)
    np.testing.assert_allclose(np.sort(D, 1), np.sort(Dref, 1), rtol=1e-4,
                               atol=1e-4)
    assert knn_intersection_measure(I, Iref) > 0.999

    r = ft.deserialize_index(ft.serialize_index(pan))
    assert r.n_levels == 4
    D2, I2 = r.search(ds.get_queries(), 10)
    np.testing.assert_array_equal(I, I2)


def test_io_mmap(tmp_path, ds):
    """IO_FLAG_MMAP: array payloads come back as lazy np.memmap views
    (reference: index_io.h:67 IO_FLAG_MMAP, impl/mapped_io.h:35)."""
    index = ft.IndexIVFPQ(None, 32, 16, 4, 8)
    index.train(ds.get_train())
    index.add(ds.get_database())
    index.nprobe = 4
    fname = str(tmp_path / "idx.npz")
    ft.write_index(index, fname)
    r = ft.read_index(fname, ft.IO_FLAG_MMAP)
    assert isinstance(r._codes_host, np.memmap)
    assert isinstance(r._ids_host, np.memmap)
    D1, I1 = index.search(ds.get_queries(), 5)
    D2, I2 = r.search(ds.get_queries(), 5)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, rtol=1e-5)
    # flat xb too
    flat = ft.IndexFlatL2(32)
    flat.add(ds.get_database())
    ft.write_index(flat, fname)
    r = ft.read_index(fname, ft.IO_FLAG_MMAP)
    np.testing.assert_array_equal(
        flat.search(ds.get_queries(), 5)[1], r.search(ds.get_queries(), 5)[1]
    )


def test_merge_ondisk_streaming(tmp_path, ds):
    """Streamed on-disk merge == in-RAM merge; merged arrays are memmaps
    (reference: contrib/ondisk.py merge_ondisk + OnDiskInvertedLists)."""
    from faiss_tpu.contrib.ondisk import merge_ondisk

    xt = ds.get_train()
    xb = ds.get_database()
    trained = ft.index_factory(32, "IVF16,PQ4")
    trained.train(xt)
    shards = []
    for s in range(3):
        shard = ft.clone_index(trained)
        part = xb[s * 1000 : (s + 1) * 1000]
        shard.add_with_ids(
            part, np.arange(s * 1000, s * 1000 + len(part), dtype=np.int64)
        )
        fname = str(tmp_path / f"shard{s}.npz")
        ft.write_index(shard, fname)
        shards.append(fname)

    ram = ft.clone_index(trained)
    merge_ondisk(ram, shards)

    disk = ft.clone_index(trained)
    merge_ondisk(disk, shards, str(tmp_path / "merged.ivfdata.npz"),
                 chunk_rows=256)
    assert isinstance(disk._codes_host, np.memmap)
    assert disk.ntotal == ram.ntotal == 3000
    ram.nprobe = disk.nprobe = 4
    D1, I1 = ram.search(ds.get_queries(), 5)
    D2, I2 = disk.search(ds.get_queries(), 5)
    np.testing.assert_array_equal(I1, I2)


def test_io_panorama_and_imi(ds):
    from faiss_tpu.models.imi import MultiIndexQuantizer
    from faiss_tpu.models.panorama import IndexFlatPanorama

    pan = IndexFlatPanorama(32, num_levels=4)
    pan.add(ds.get_database())
    r = ft.deserialize_index(ft.serialize_index(pan))
    assert r.num_levels == 4 and r.prune_factor == pan.prune_factor
    D1, I1 = pan.search(ds.get_queries(), 5)
    D2, I2 = r.search(ds.get_queries(), 5)
    np.testing.assert_array_equal(I1, I2)

    imi = MultiIndexQuantizer(32, 2, 4)
    imi.train(ds.get_train())
    r = ft.deserialize_index(ft.serialize_index(imi))
    assert r.ntotal == imi.ntotal
    D1, I1 = imi.search(ds.get_queries(), 5)
    D2, I2 = r.search(ds.get_queries(), 5)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, rtol=1e-6)


def test_io_ivfpqr_trained_empty(ds):
    """Trained-but-empty IVFPQR must round-trip (refine codes are None)."""
    index = ft.IndexIVFPQR(None, 32, 16, 4, 8, 4, 8)
    index.train(ds.get_train())
    r = ft.deserialize_index(ft.serialize_index(index))
    assert r.is_trained and r.ntotal == 0
    r.add(ds.get_database())
    index.add(ds.get_database())
    D1, I1 = index.search(ds.get_queries(), 5)
    D2, I2 = r.search(ds.get_queries(), 5)
    np.testing.assert_array_equal(I1, I2)


def test_idselector_array_empty(ds):
    """Empty IDSelectorArray matches nothing (reference IDSelectorArray n=0)."""
    from faiss_tpu.base import IDSelectorArray, SearchParameters

    index = ft.IndexFlatL2(32)
    index.add(ds.get_database())
    sel = IDSelectorArray([])
    assert not sel.is_member(3)
    D, I = index.search(
        ds.get_queries()[:4], 5, params=SearchParameters(sel=sel)
    )
    assert (I == -1).all()


def test_qinco_training():
    """QINCo trained with the jax/optax loop must beat its own untrained
    init and round-trip encode/decode consistently (reference ships only
    inference — utils/NeuralNet.h:23-129)."""
    from faiss_tpu.utils.neuralnet import QINCo, train_qinco

    rs = np.random.RandomState(0)
    n, d = 3000, 16
    x = rs.randn(n, d).astype(np.float32)
    model = train_qinco(x, K=16, M=3, L=1, h=32, epochs=50, batch=512,
                        lr=3e-3)
    codes = model.encode(x[:512])
    rec = model.decode(codes)
    err = np.linalg.norm(rec - x[:512], axis=1).mean()
    base = np.linalg.norm(x[:512], axis=1).mean()
    assert err < 0.75 * base  # 3 steps of 4 bits must compress something
    # decode(encode(.)) is deterministic and matches step-wise decode
    codes2 = model.encode(x[:512])
    np.testing.assert_array_equal(codes, codes2)
    # better than a single k-means level (codebook0 alone)
    cb0 = model.codebook0.weight
    d2 = ((x[:512, None, :] - cb0[None]) ** 2).sum(-1)
    err0 = np.sqrt(d2.min(1)).mean()
    assert err < err0


def test_adsampling_and_pdx():
    """ADSampling threshold math + PDX layout (reference:
    impl/AdSampling.h, impl/PdxLayout.h)."""
    from faiss_tpu.ops.adsampling import (
        assign_adsampling,
        chi2_quantile_wh,
        compute_partial_norms,
        de_pdxify,
        normal_quantile,
        pdxify,
        precompute_ad_thresholds,
    )

    # normal quantile: exact round-trip through the CDF
    from statistics import NormalDist

    for p in (0.01, 0.5, 0.975):
        np.testing.assert_allclose(
            NormalDist().cdf(normal_quantile(p)), p, atol=1e-9
        )
    # chi2 quantile vs simulation (2% tolerance for p >= 16, like the
    # reference's documented accuracy window)
    rs = np.random.RandomState(0)
    for p in (16, 64):
        samples = (rs.randn(200_000, p) ** 2).sum(1)
        emp = np.quantile(samples, 0.999)
        approx = chi2_quantile_wh(p, 0.999)
        assert abs(approx - emp) / emp < 0.02
    coeff = precompute_ad_thresholds(64, 1e-3)
    assert coeff[0] == 0 and (np.diff(coeff[16:]) > 0).all()

    # PDX round-trip is bit-identical
    Y = rs.rand(13, 37).astype(np.float32)
    for bs in (8, 16, 37):
        np.testing.assert_array_equal(
            de_pdxify(pdxify(Y, bs), 13, 37, bs), Y
        )
    np.testing.assert_allclose(
        compute_partial_norms(Y, 5), (Y[:, :5] ** 2).sum(1), rtol=1e-5
    )

    # progressive assignment == exact argmin on mixture data (the
    # realistic k-means case; pure isotropic noise concentrates distances
    # and needs a larger keep)
    c = rs.randn(256, 64).astype(np.float32)
    x = (c[rs.randint(256, size=2000)]
         + 0.4 * rs.randn(2000, 64)).astype(np.float32)
    dist, assign = assign_adsampling(x, c, d_prime=32, epsilon=1e-3)
    full = (
        (x**2).sum(1)[:, None] + (c**2).sum(1)[None, :] - 2 * x @ c.T
    )
    exact = full.argmin(1)
    agree = (assign == exact).mean()
    assert agree > 0.97, agree
    np.testing.assert_allclose(
        dist[assign == exact],
        np.maximum(full.min(1)[assign == exact], 0),
        rtol=1e-3, atol=1e-3,
    )


def test_refine_flat_store_float16():
    """store_float16 keeps the refine store in fp16 (GpuIndexFlatConfig
    .useFloat16 analogue): results stay near-identical to the f32 store and
    the dtype survives serialization."""
    import faiss_tpu as ft

    rs = np.random.RandomState(5)
    d, nb, nq = 24, 3000, 64
    xb = rs.randn(nb, d).astype(np.float32)
    xq = rs.randn(nq, d).astype(np.float32)

    def build(fp16):
        base = ft.IndexIVFPQ(None, d, 16, 4, 8)
        idx = ft.IndexRefineFlat(base, store_float16=fp16)
        idx.k_factor = 8
        base.nprobe = 16
        idx.train(xb)
        idx.add(xb)
        return idx

    a = build(False)
    b = build(True)
    assert b.refine_index.storage_dtype == np.float16
    Da, Ia = a.search(xq, 10)
    Db, Ib = b.search(xq, 10)
    # fp16 rounding may swap near-ties; overwhelming agreement required
    assert (Ia == Ib).mean() > 0.97
    np.testing.assert_allclose(Da, Db, rtol=2e-3, atol=2e-3)
    r = ft.deserialize_index(ft.serialize_index(b))
    assert r.refine_index.storage_dtype == np.float16
    assert r.store_float16
    _, Ir = r.search(xq, 10)
    assert (Ir == Ib).mean() > 0.97


def test_hnsw_2level():
    """IndexHNSW2Level (IndexHNSW.h:221): graph over 2-level codes,
    factory grammar HNSWm,ncent+PQm; flip_to_ivf preserves codes."""
    rs = np.random.RandomState(1)
    xb = rs.randn(3000, 32).astype(np.float32)
    xq = xb[:20] + 0.01 * rs.randn(20, 32).astype(np.float32)
    index = ft.index_factory(32, "HNSW16,16+PQ4")
    assert isinstance(index, ft.IndexHNSW2Level)
    index.train(xb[:2000])
    index.add(xb)
    D, I = index.search(xq, 5)
    hit = (I == np.arange(20)[:, None]).any(1).mean()
    assert hit > 0.8, hit
    ivf = index.flip_to_ivf()
    ivf.nprobe = 16
    D2, I2 = ivf.search(xq, 5)
    hit2 = (I2 == np.arange(20)[:, None]).any(1).mean()
    assert hit2 > 0.8, hit2


def test_ivf_update_vectors():
    """IndexIVF.update_vectors (IndexIVF.h:375): ids keep their identity,
    vectors are re-assigned + re-encoded in place."""
    rs = np.random.RandomState(2)
    xb = rs.randn(2000, 16).astype(np.float32)
    index = ft.IndexIVFFlat(None, 16, 8)
    index.big_batch_threshold = 0
    index.cp.niter = 4
    index.train(xb)
    ids = np.arange(2000, dtype=np.int64) + 100
    index.add_with_ids(xb, ids)
    index.nprobe = 8
    # move the first 50 vectors somewhere else entirely
    newv = 5.0 + rs.randn(50, 16).astype(np.float32)
    index.update_vectors(ids[:50], newv)
    assert index.ntotal == 2000
    D, I = index.search(newv, 1)
    np.testing.assert_array_equal(I.ravel(), ids[:50])
    np.testing.assert_allclose(D.ravel(), 0.0, atol=1e-4)
    # reconstruct returns the new vector
    np.testing.assert_allclose(index.reconstruct(int(ids[0])), newv[0],
                               rtol=1e-5, atol=1e-5)
    # unknown id raises
    import pytest

    with pytest.raises(ValueError):
        index.update_vectors(np.array([99999], np.int64), newv[:1])


def test_graph_stats_and_cancellation():
    """hnsw_stats / nsg_stats counters (HNSW.h:260 analogues) and
    InterruptCallback-driven cancellation of native graph builds."""
    import faiss_tpu as ft
    from faiss_tpu.callbacks import (
        InterruptCallback,
        InterruptedException,
        PythonInterruptCallback,
    )

    rs = np.random.RandomState(3)
    xb = rs.randn(1500, 16).astype(np.float32)
    ft.hnsw_stats.reset()
    index = ft.IndexHNSWFlat(16, 16)
    index.add(xb)
    D, I = index.search(xb[:32], 5)
    s = ft.hnsw_stats.sync()
    assert s.n1 >= 32 and s.ndis > 0 and s.nhops > 0
    # cancellation: an immediately-interrupting callback stops the add
    InterruptCallback.instance = PythonInterruptCallback(lambda: True)
    try:
        big = rs.randn(60000, 16).astype(np.float32)
        idx2 = ft.IndexHNSWFlat(16, 16)
        import pytest

        with pytest.raises(InterruptedException):
            idx2.add(big)
        assert idx2.ntotal < 60000  # partial, consistent prefix
        # graph still searchable on the prefix
        if idx2.ntotal > 10:
            idx2.search(xb[:4], 3)
    finally:
        InterruptCallback.clear_instance()

    ft.nsg_stats.reset()
    nsg = ft.IndexNSGFlat(16, 16)
    nsg.add(xb[:800])
    assert ft.nsg_stats.sync().ndis > 0


def test_ivf_fast_scan_stats():
    """ivf_fast_scan_stats (IndexIVFFastScan.h:409 analogue) counts the
    fused big-batch scan economy."""
    import jax.numpy as jnp

    import faiss_tpu as ft

    rs = np.random.RandomState(5)
    xb = rs.randn(2000, 16).astype(np.float32)
    xq = rs.randn(128, 16).astype(np.float32)
    index = ft.IndexIVFPQFastScan(None, 16, 32, 4, 4)
    index.FUSED_CT = 256
    index.fused_interpret = True
    index.cp.niter = 4
    index.cp.min_points_per_centroid = 1
    index.train(xb)
    index.add(xb)
    ft.ivf_fast_scan_stats.reset()
    index._search_big_batch_refined(xq, 5, 20, jnp.asarray(xb), 0)
    s = ft.ivf_fast_scan_stats
    assert s.nq == 128 and s.ndis > 0 and s.chunks_scanned > 0


def test_paged_add_matches_unpaged():
    """Bulk adds are paged (gpu/GpuIndex.cu:474 kAddPageSize analogue):
    forcing a tiny page must give identical results to one-shot add
    through IVF, PreTransform, and Refine wrappers."""
    import faiss_tpu as ft
    from faiss_tpu import base as ftb

    rs = np.random.RandomState(11)
    xb = rs.randn(3000, 32).astype(np.float32)
    xq = rs.randn(64, 32).astype(np.float32)

    def build(paged):
        old = ftb.ADD_PAGE_BYTES
        ftb.ADD_PAGE_BYTES = (700 * 32 * 4) if paged else old
        try:
            ivf = ft.IndexIVFPQ(None, 32, 16, 4, 8)
            ivf.cp.niter = 4
            ivf.cp.min_points_per_centroid = 1
            ivf.nprobe = 16
            refine = ft.IndexRefineFlat(ivf)
            refine.k_factor = 4
            pca = ft.PCAMatrix(32, 32)
            index = ft.IndexPreTransform(pca, refine)
            index.train(xb)
            index.add(xb)
            return index
        finally:
            ftb.ADD_PAGE_BYTES = old

    a, b = build(False), build(True)
    assert a.ntotal == b.ntotal == 3000
    Da, Ia = a.search(xq, 5)
    Db, Ib = b.search(xq, 5)
    np.testing.assert_array_equal(Ia, Ib)
    np.testing.assert_allclose(Da, Db, rtol=1e-5)
    # ids survive paging with explicit ids too
    ivf2 = ft.IndexIVFFlat(None, 32, 8)
    ivf2.cp.niter = 4
    ivf2.cp.min_points_per_centroid = 1
    ivf2.train(xb)
    old = ftb.ADD_PAGE_BYTES
    ftb.ADD_PAGE_BYTES = 700 * 32 * 4
    try:
        ivf2.add_with_ids(xb, np.arange(3000)[::-1].copy())
    finally:
        ftb.ADD_PAGE_BYTES = old
    _, I2 = ivf2.search(xb[:8], 1)
    np.testing.assert_array_equal(I2.ravel(), 2999 - np.arange(8))
