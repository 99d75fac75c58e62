"""Tests for contrib modules + extra index variants + factory_tools."""

import numpy as np
import pytest

import faiss_tpu as ft
from faiss_tpu.contrib.big_batch_search import big_batch_search
from faiss_tpu.contrib.client_server import ClientIndex, SearchServer
from faiss_tpu.contrib.clustering import (
    DatasetAssign,
    kmeans,
    two_level_clustering,
)
from faiss_tpu.contrib.exhaustive_search import knn_ground_truth
from faiss_tpu.contrib.inspect_tools import get_invlist, get_invlist_sizes
from faiss_tpu.contrib.ondisk import merge_ondisk
from faiss_tpu.contrib.torch_utils import torch_knn
from faiss_tpu.factory_tools import reverse_index_factory
from faiss_tpu.models.extra_indexes import (
    Index2Layer,
    IndexIVFFlatDedup,
    IndexRowwiseMinMax,
)
from faiss_tpu.utils.datasets import SyntheticDataset
from faiss_tpu.utils.evaluation import knn_intersection_measure


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(16, 1000, 2000, 20)


def test_knn_ground_truth_streaming(ds):
    xb, xq = ds.get_database(), ds.get_queries()

    def blocks():
        for i in range(0, len(xb), 300):
            yield xb[i : i + 300]

    D, I = knn_ground_truth(xq, blocks(), 5)
    flat = ft.IndexFlatL2(16)
    flat.add(xb)
    Dref, Iref = flat.search(xq, 5)
    np.testing.assert_allclose(D, Dref, rtol=1e-4, atol=1e-5)
    assert knn_intersection_measure(I, Iref) > 0.99


def test_dataset_assign_kmeans(ds):
    da = DatasetAssign(ds.get_train())
    centroids = kmeans(8, da, niter=10)
    assert centroids.shape == (8, 16)
    _, dis, _, counts = da.assign_to(centroids)
    assert counts.sum() == da.count()


def test_two_level_clustering(ds):
    c = two_level_clustering(ds.get_train(), 4, 32, niter=5)
    assert c.shape == (32, 16)


def test_client_server(ds):
    xb = ds.get_database()
    servers = []
    ports = []
    for i in range(2):
        idx = ft.IndexFlatL2(16)
        idx.add(xb[i * 1000 : (i + 1) * 1000])
        srv = SearchServer(idx).start()
        servers.append(srv)
        ports.append(("127.0.0.1", srv.port))
    # server-local ids need shifting for a global id space: use IDMap servers
    client = ClientIndex(ports)
    assert client.ntotal == 2000
    D, I = client.search(ds.get_queries(), 5)
    assert D.shape == (20, 5)
    # distances must match a full local search
    flat = ft.IndexFlatL2(16)
    flat.add(xb)
    Dref, _ = flat.search(ds.get_queries(), 5)
    np.testing.assert_allclose(np.sort(D, 1), np.sort(Dref, 1), rtol=1e-4)
    client.close()
    for s in servers:
        s.stop()


def test_big_batch_search(ds):
    index = ft.IndexIVFFlat(None, 16, 8)
    index.train(ds.get_train())
    index.add(ds.get_database())
    index.nprobe = 4
    Dref, Iref = index.search(ds.get_queries(), 5)
    D, I = big_batch_search(index, ds.get_queries(), 5)
    np.testing.assert_allclose(np.sort(D, 1), np.sort(Dref, 1), rtol=1e-4, atol=1e-4)


def test_merge_ondisk(tmp_path, ds):
    xb = ds.get_database()
    trained = ft.IndexIVFFlat(None, 16, 8)
    trained.train(ds.get_train())
    fnames = []
    for i in range(2):
        shard = ft.clone_index(trained)
        shard.add_with_ids(
            xb[i * 1000 : (i + 1) * 1000],
            np.arange(i * 1000, (i + 1) * 1000, dtype=np.int64),
        )
        fname = str(tmp_path / f"shard{i}.npz")
        ft.write_index(shard, fname)
        fnames.append(fname)
    merge_ondisk(trained, fnames)
    assert trained.ntotal == 2000
    trained.nprobe = 8
    D, I = trained.search(ds.get_queries(), 3)
    assert (I >= 0).all()


def test_torch_utils(ds):
    torch = pytest.importorskip("torch")
    xq = torch.from_numpy(ds.get_queries())
    xb = torch.from_numpy(ds.get_database())
    D, I = torch_knn(xq, xb, 3)
    assert D.shape == (20, 3) and hasattr(D, "numpy")


def test_inspect_tools(ds):
    index = ft.IndexIVFFlat(None, 16, 8)
    index.train(ds.get_train())
    index.add(ds.get_database())
    sizes = get_invlist_sizes(index)
    assert sizes.sum() == 2000
    ids, codes = get_invlist(index, 0)
    assert len(ids) == sizes[0]


def test_index2layer(ds):
    q = ft.IndexFlatL2(16)
    index = Index2Layer(q, 8, 4)
    index.train(ds.get_train())
    index.add(ds.get_database())
    recon = index.reconstruct_n(0, 10)
    err = ((recon - ds.get_database()[:10]) ** 2).sum() / (
        ds.get_database()[:10] ** 2
    ).sum()
    assert err < 0.1


def test_ivf_flat_dedup(ds):
    xb = ds.get_database()[:500]
    xb_dup = np.concatenate([xb, xb[:100]])
    index = IndexIVFFlatDedup(None, 16, 4)
    index.train(ds.get_train())
    index.add(xb_dup)
    assert index.ntotal == 500  # duplicates folded
    assert len(index.instances) == 100


def test_rowwise_minmax(ds):
    inner = ft.IndexScalarQuantizer(16, ft.QuantizerType.QT_8bit)
    index = IndexRowwiseMinMax(inner)
    index.train(ds.get_train())
    codes = index.sa_encode(ds.get_database()[:20])
    recon = index.sa_decode(codes)
    err = np.abs(recon - ds.get_database()[:20]).max()
    assert err < 0.05


def test_reverse_index_factory(ds):
    for desc in ["Flat", "PQ4x8", "IVF16,Flat", "IVF16,PQ4x8", "SQ8",
                 "PCA8,Flat", "IDMap,Flat"]:
        index = ft.index_factory(16, desc)
        rev = reverse_index_factory(index)
        # round-trip must parse to the same class
        again = ft.index_factory(16, rev)
        assert type(again) is type(index), (desc, rev)


def test_torch_monkey_patch(ds):
    """Importing contrib.torch_utils patches Index methods for torch
    tensors (reference: contrib/torch_utils.py handle_torch_Index)."""
    torch = pytest.importorskip("torch")
    import faiss_tpu.contrib.torch_utils as tu

    xb = torch.from_numpy(ds.get_database().copy())
    xq = torch.from_numpy(ds.get_queries().copy())
    d = xb.shape[1]
    index = ft.IndexFlatL2(d)
    index.add(xb)
    D, I = index.search(xq, 5)
    assert torch.is_tensor(D) and torch.is_tensor(I)
    # numpy inputs keep numpy outputs
    Dn, In = index.search(ds.get_queries(), 5)
    assert isinstance(Dn, np.ndarray)
    np.testing.assert_array_equal(In, I.numpy())
    # IVF subclass override is patched too
    ivf = ft.index_factory(d, "IVF8,PQ4")
    ivf.train(xb)
    ivf.add(xb)
    ivf.nprobe = 8
    D2, _ = ivf.search(xq, 5)
    assert torch.is_tensor(D2)
    D3, I3 = tu.torch_knn(xq, xb, 5)
    np.testing.assert_array_equal(I3.numpy(), I.numpy())
    c, a = tu.torch_kmeans(xb, 8, niter=4)
    assert torch.is_tensor(c) and tuple(c.shape) == (8, d)


def test_offline_ivf_pipeline(tmp_path):
    """Config-driven offline IVF pipeline end to end (reference:
    demos/offline_ivf/offline_ivf.py + run.py command flow)."""
    import json

    from faiss_tpu.contrib.offline_ivf import OfflineIVF, main

    rs = np.random.RandomState(5)
    d, per_shard, nshard, nq = 16, 1500, 3, 64
    root = tmp_path / "data"
    root.mkdir()
    xb_all = []
    files = []
    for s in range(nshard):
        x = rs.randn(per_shard, d).astype(np.float32)
        np.save(root / f"xb_{s}.npy", x)
        xb_all.append(x)
        files.append(f"xb_{s}.npy")
    xb = np.concatenate(xb_all)
    xq = xb[rs.choice(len(xb), nq, replace=False)] + 0.01 * rs.randn(
        nq, d
    ).astype(np.float32)
    np.save(root / "xq.npy", xq.astype(np.float32))

    cfg = {
        "d": d,
        "output": str(tmp_path / "out"),
        "index": "IVF16,Flat",
        "nprobe": 16,
        "k": 5,
        "training_sample": 2000,
        "datasets": {
            "db": {"root": str(root), "files": files},
            "queries": {"root": str(root), "files": ["xq.npy"]},
        },
    }
    oivf = OfflineIVF(cfg)
    oivf.train_index()
    written = oivf.index_shard()
    assert len(written) == nshard
    oivf.merge_index()
    oivf.consistency_check()
    stats = oivf.index_stats()
    assert stats["ntotal"] == nshard * per_shard
    D, I = oivf.search()
    assert I.shape == (nq, 5)
    rec = oivf.evaluate(sample=nq)
    assert rec > 0.95  # nprobe=nlist: exact within quantization
    # CLI dispatch round-trip on one command
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    main([str(cfg_path), "index_stats"])


def test_kvstore_invlists(tmp_path):
    """Pluggable KV-store inverted lists (demos/demo_kvstore_ivf.py, the
    reference demos/rocksdb_ivf analogue): build into sqlite, cold-reload,
    search parity with the in-RAM twin."""
    import sys

    sys.path.insert(0, "/root/repo/demos")
    import numpy as np

    import faiss_tpu as ft
    from demo_kvstore_ivf import build, load
    from faiss_tpu.utils.datasets import SyntheticDataset

    ds = SyntheticDataset(16, 2000, 8000, 30)
    trained = ft.index_factory(16, "IVF32,SQ8")
    trained.train(ds.get_train())
    db = str(tmp_path / "kv.sqlite")
    build(ft.clone_index(trained), ds.get_database(),
          np.arange(8000, dtype=np.int64), db)
    index = load(ft.clone_index(trained), db)
    index.nprobe = 32
    _, I = index.search(ds.get_queries(), 5)
    ref = ft.clone_index(trained)
    ref.add(ds.get_database())
    ref.nprobe = 32
    _, Iref = ref.search(ds.get_queries(), 5)
    assert (np.asarray(I) == np.asarray(Iref)).mean() > 0.99
