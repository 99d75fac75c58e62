"""Driver-contract checks: entry() jit-compiles, dryrun_multichip runs on
the virtual 8-device mesh."""

import sys

import jax
import numpy as np


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    D, I = jax.jit(fn)(*args)
    assert D.shape == (128, 10) and I.shape == (128, 10)
    assert bool(jax.numpy.isfinite(D).all())


def test_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_binary_hnsw():
    import faiss_tpu as ft

    rs = np.random.RandomState(0)
    xb = rs.randint(256, size=(500, 8)).astype(np.uint8)
    index = ft.IndexBinaryHNSW(64, 16)
    index.add(xb)
    D, I = index.search(xb[:10], 1)
    assert (D[:, 0] == 0).all() and (I[:, 0] == np.arange(10)).all()


def test_ivf_spectral_hash():
    import faiss_tpu as ft
    from faiss_tpu.models.extra_indexes import IndexIVFSpectralHash

    rs = np.random.RandomState(1)
    xb = rs.rand(2000, 32).astype(np.float32)
    index = IndexIVFSpectralHash(None, 32, 8, 64)
    index.train(xb)
    index.add(xb)
    index.nprobe = 8
    D, I = index.search(xb[:10], 1)
    assert (I[:, 0] == np.arange(10)).all()  # self-match via hamming 0
