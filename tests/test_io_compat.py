"""Backward compatibility: index files committed by older versions must keep
loading and returning identical results (reference:
tests/index_io_backward_compatibility pattern, SURVEY §4)."""

import glob
import os

import numpy as np

import faiss_tpu as ft

HERE = os.path.join(os.path.dirname(__file__), "io_compat")


def test_all_committed_files_load():
    files = sorted(glob.glob(os.path.join(HERE, "v0_1_0_*.npz")))
    assert len(files) >= 5
    for fname in files:
        index = ft.read_index(fname)
        assert index.ntotal == 1200, fname


def test_golden_results_stable():
    with np.load(os.path.join(HERE, "golden_ivfpq.npz")) as z:
        Dg, Ig, xq = z["D"], z["I"], z["xq"]
    index = ft.read_index(os.path.join(HERE, "v0_1_0_IVF8_PQ4.npz"))
    index.nprobe = 8
    D, I = index.search(xq, 5)
    np.testing.assert_array_equal(I, Ig)
    np.testing.assert_allclose(D, Dg, rtol=1e-5, atol=1e-6)
