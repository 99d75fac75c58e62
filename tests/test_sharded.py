"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(the reference tests multi-GPU Shards/Replicas on available devices,
gpu/test/test_multi_gpu.py; here: sharded == unsharded equivalence)."""

import jax
import numpy as np
import pytest

import faiss_tpu as ft
from faiss_tpu.parallel.sharded import ShardedFlat, ShardedIVF, make_mesh
from faiss_tpu.utils.datasets import SyntheticDataset
from faiss_tpu.utils.evaluation import knn_intersection_measure


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(32, 2000, 6000, 64)


def test_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_flat_matches_single(ds):
    mesh = make_mesh(8)
    xb, xq = ds.get_database(), ds.get_queries()
    sf = ShardedFlat(32, mesh)
    sf.add(xb)
    D, I = sf.search(xq, 10)
    ref = ft.IndexFlatL2(32)
    ref.add(xb)
    Dref, Iref = ref.search(xq, 10)
    np.testing.assert_allclose(D, Dref, rtol=1e-4, atol=1e-4)
    assert knn_intersection_measure(I, Iref) > 0.999


def test_sharded_flat_ip(ds):
    mesh = make_mesh(4)
    xb, xq = ds.get_database(), ds.get_queries()
    sf = ShardedFlat(32, mesh, ft.METRIC_INNER_PRODUCT)
    sf.add(xb)
    D, I = sf.search(xq, 5)
    ref = ft.IndexFlatIP(32)
    ref.add(xb)
    Dref, Iref = ref.search(xq, 5)
    np.testing.assert_allclose(D, Dref, rtol=1e-4, atol=1e-4)


def test_sharded_ivf_matches_single(ds):
    xb, xq = ds.get_database(), ds.get_queries()
    index = ft.IndexIVFFlat(None, 32, 32)
    index.train(ds.get_train())
    index.add(xb)
    index.nprobe = 8
    Dref, Iref = index.search(xq, 10)

    mesh = make_mesh(8)
    sivf = ShardedIVF(index, mesh)
    D, I = sivf.search(xq, 10, nprobe=8)
    np.testing.assert_allclose(D, Dref, rtol=1e-4, atol=1e-4)
    assert knn_intersection_measure(I, Iref) > 0.999


def test_sharded_ivf_full_probe_exact(ds):
    xb, xq = ds.get_database(), ds.get_queries()
    index = ft.IndexIVFFlat(None, 32, 16)
    index.train(ds.get_train())
    index.add(xb)
    mesh = make_mesh(4)
    sivf = ShardedIVF(index, mesh)
    D, I = sivf.search(xq, 10, nprobe=16)
    flat = ft.IndexFlatL2(32)
    flat.add(xb)
    Dref, Iref = flat.search(xq, 10)
    np.testing.assert_allclose(D, Dref, rtol=1e-4, atol=1e-4)


def test_sharded_ivfpq_matches_single(ds):
    from faiss_tpu.parallel.sharded import ShardedIVFPQ

    xb, xq = ds.get_database(), ds.get_queries()
    index = ft.IndexIVFPQ(None, 32, 16, 4, 8)
    index.big_batch_threshold = 0  # force the per-probe scan path
    index.train(ds.get_train())
    index.add(xb)
    index.nprobe = 8
    Dref, Iref = index.search(xq, 10)

    mesh = make_mesh(8)
    s = ShardedIVFPQ(index, mesh)
    D, I = s.search(xq, 10, nprobe=8)
    # distances must match; ids may differ on tied (duplicate PQ code)
    # candidates, so the id check is intersection-based
    np.testing.assert_allclose(D, Dref, rtol=1e-3, atol=1e-3)
    assert knn_intersection_measure(I, Iref) > 0.9


def test_host_shards_ivf_matches_single(ds):
    """Host-composed IndexShardsIVF == one IVF index (SURVEY §4 sharded ==
    unsharded equivalence; reference tests/test_ivf_sharding.cpp)."""
    from faiss_tpu.models.meta import IndexShardsIVF

    xb = ds.get_database()
    full = ft.IndexIVFFlat(None, 32, 16)
    full.train(ds.get_train())
    full.add(xb)
    full.nprobe = 8
    Dref, Iref = full.search(ds.get_queries(), 10)

    shards = IndexShardsIVF(full.quantizer, 32, 16, nprobe=8)
    for i in range(2):
        sh = ft.IndexIVFFlat(full.quantizer, 32, 16)
        sh.is_trained = True
        sh.add_with_ids(
            xb[i::2], np.arange(i, len(xb), 2, dtype=np.int64)
        )
        shards.add_shard(sh)
    shards.successive_ids = False  # shards carry explicit global ids
    D, I = shards.search(ds.get_queries(), 10)
    np.testing.assert_allclose(D, Dref, rtol=1e-4, atol=1e-4)
    assert knn_intersection_measure(I, Iref) > 0.999


def test_sharded_ivfpq_ip_and_nonresidual(ds):
    """ShardedIVFPQ must now cover IP and non-residual configs
    (r2 verdict: sharded.py:304 raised on anything but L2-residual)."""
    xb, xq = ds.get_database(), ds.get_queries()
    mesh = make_mesh(4)
    from faiss_tpu.parallel.sharded import ShardedIVFPQ

    for metric, by_res in [
        (ft.METRIC_INNER_PRODUCT, True),
        (ft.METRIC_INNER_PRODUCT, False),
        (ft.METRIC_L2, False),
    ]:
        index = ft.IndexIVFPQ(None, 32, 16, 4, 8, metric)
        index.by_residual = by_res
        index.cp.niter = 4
        index.train(ds.get_train())
        index.add(xb)
        index.nprobe = 8
        Dref, Iref = index.search(xq, 10)
        sp = ShardedIVFPQ(index, mesh)
        D, I = sp.search(xq, 10, nprobe=8)
        # ADC distances tie heavily on this small synthetic set, and shard
        # merge order breaks ties differently: compare the distance
        # multiset (exact) + id overlap (tie-tolerant)
        np.testing.assert_allclose(
            np.sort(D, 1), np.sort(Dref, 1), rtol=1e-3, atol=1e-3
        )
        assert knn_intersection_measure(I, Iref) > 0.85, (metric, by_res)


def test_sharded_ivf_any_codec(ds):
    """ShardedIVF accepts any float-staged codec (here IVF-SQ)."""
    xb, xq = ds.get_database(), ds.get_queries()
    mesh = make_mesh(4)
    index = ft.IndexIVFScalarQuantizer(
        None, 32, 16, ft.QuantizerType.QT_8bit
    )
    index.cp.niter = 4
    index.train(ds.get_train())
    index.add(xb)
    index.nprobe = 8
    Dref, Iref = index.search(xq, 10)
    sivf = ShardedIVF(index, mesh)
    D, I = sivf.search(xq, 10, nprobe=8)
    assert knn_intersection_measure(I, Iref) > 0.99
    same = I == Iref
    np.testing.assert_allclose(D[same], Dref[same], rtol=1e-4, atol=1e-4)


def test_sharded_build_path_matches_single(ds):
    """ShardedIVFPQBuilder (train/add/finalize entirely into sharded
    storage) must produce the same results as a single-host IndexIVFPQ
    given the same trained parameters."""
    from faiss_tpu.parallel.sharded import ShardedIVFPQBuilder

    xb, xq = ds.get_database(), ds.get_queries()
    mesh = make_mesh(8)
    b = ShardedIVFPQBuilder(32, 16, 4, 8, mesh)
    b.train(ds.get_train(), niter=6)
    # chunked adds with custom ids
    ids = np.arange(len(xb), dtype=np.int64) * 3 + 1
    b.add(xb[:4000], ids[:4000], chunk=1500)
    b.add(xb[4000:], ids[4000:], chunk=1500)
    sp = b.finalize()
    D, I = sp.search(xq, 10, nprobe=16)

    # single-host twin from the same trained parameters
    quant = ft.IndexFlatL2(32)
    quant.add(b.centroids)
    ref = ft.IndexIVFPQ(quant, 32, 16, 4, 8)
    ref.pq.centroids = b.pq.centroids
    ref.is_trained = True
    ref.add_with_ids(xb, ids)
    ref.nprobe = 16
    Dref, Iref = ref.search(xq, 10)
    # tie-tolerant equivalence (ADC distances tie on synthetic data):
    # exact distance multisets + id overlap
    np.testing.assert_allclose(
        np.sort(D, 1), np.sort(Dref, 1), rtol=1e-3, atol=1e-3
    )
    assert knn_intersection_measure(I, Iref) > 0.85
    # labels are the user-supplied ids
    assert ((I[I >= 0] - 1) % 3 == 0).all()
