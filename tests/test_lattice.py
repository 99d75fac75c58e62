"""Zn lattice codec + IndexLattice (reference: impl/lattice_Zn.{h,cpp},
IndexLattice.{h,cpp}, tests/test_lowlevel_ivf.cpp lattice sections)."""

import numpy as np
import pytest

import faiss_tpu as ft
from faiss_tpu.codecs.lattice import (
    ZnSphereCodec,
    ZnSphereSearch,
    zn_sphere_atoms,
)
from faiss_tpu.utils.datasets import SyntheticDataset


def test_atoms_enumeration():
    atoms = zn_sphere_atoms(4, 4)
    # (2,0,0,0) and (1,1,1,1) are the only non-increasing solutions
    assert atoms.shape == (2, 4)
    assert ((atoms**2).sum(1) == 4).all()
    atoms = zn_sphere_atoms(8, 10)
    assert ((atoms**2).sum(1) == 10).all()
    assert (np.diff(atoms, axis=1) <= 0).all()  # non-increasing


def test_sphere_search_is_nearest():
    """search_multi must return the max-dot vertex among ALL sphere
    vertices (validated against explicit enumeration via the codec)."""
    rs = np.random.RandomState(0)
    codec = ZnSphereCodec(6, 6)
    all_verts = np.stack(
        [codec.decode(c) for c in range(codec.nv)]
    )  # every sphere vertex
    x = rs.randn(50, 6).astype(np.float32)
    got, dp = codec.search_multi(x)
    brute = all_verts[np.argmax(x @ all_verts.T, axis=1)]
    np.testing.assert_allclose(
        (got * x).sum(1), (brute * x).sum(1), rtol=1e-5
    )


def test_codec_id_roundtrip():
    codec = ZnSphereCodec(8, 6)
    assert codec.nv > 100
    # every id decodes to a sphere vertex and re-encodes to itself
    ids = np.linspace(0, codec.nv - 1, 200).astype(np.int64)
    for c in ids:
        v = codec.decode(int(c))
        assert (v**2).sum() == codec.r2
        assert codec.encode_vertex(v) == int(c)


def test_index_lattice():
    ds = SyntheticDataset(32, 1000, 3000, 20)
    xb, xq, xt = ds.get_database(), ds.get_queries(), ds.get_train()
    index = ft.index_factory(32, "ZnLattice4x5_10")
    assert isinstance(index, ft.IndexLattice)
    assert index.nsq == 4 and index.scale_nbit == 5
    index.train(xt)
    index.add(xb)
    # codec round-trip through the packed byte format
    codes = index.sa_encode(xb[:32])
    assert codes.shape[1] == index.sa_code_size()
    rec = index.sa_decode(codes)
    rel = np.linalg.norm(rec - xb[:32]) / np.linalg.norm(xb[:32])
    assert rel < 0.4  # lossy but sane
    np.testing.assert_allclose(
        rec, index.reconstruct_n(0, 32), rtol=1e-5, atol=1e-6
    )
    # recall sanity vs exact
    gt = ds.get_groundtruth(10)
    _, I = index.search(xq, 10)
    from faiss_tpu.utils.evaluation import recall_at_k

    assert recall_at_k(I, gt, 10) > 0.5
    # io round-trip
    r = ft.deserialize_index(ft.serialize_index(index))
    D1, I1 = index.search(xq, 5)
    D2, I2 = r.search(xq, 5)
    np.testing.assert_array_equal(I1, I2)
