"""Datasets and vector-file IO — analogue of contrib/datasets.py + vecs_io.py.

SyntheticDataset reproduces the reference's Gaussian-mixture generator
(contrib/datasets.py:84 / tests/common_faiss_tests.py get_dataset_2) so
recall thresholds tuned against the reference carry over.
"""

from __future__ import annotations

import numpy as np


class Dataset:
    """Base dataset (contrib/datasets.py:40)."""

    d: int
    nt: int
    nb: int
    nq: int

    def get_train(self, maxtrain=None) -> np.ndarray:
        raise NotImplementedError

    def get_database(self) -> np.ndarray:
        raise NotImplementedError

    def get_queries(self) -> np.ndarray:
        raise NotImplementedError

    def get_groundtruth(self, k=100) -> np.ndarray:
        from ..models.flat import IndexFlat
        from ..metric import MetricType

        index = IndexFlat(self.d, getattr(self, "metric", MetricType.L2))
        index.add(self.get_database())
        _, gt = index.search(self.get_queries(), k)
        return gt


class SyntheticDataset(Dataset):
    """Gaussian-mixture synthetic data (contrib/datasets.py:84).

    d dims, nt train / nb database / nq query points drawn from a mixture of
    1024-ish clusters with decaying per-dimension scales, seeded — matches the
    reference construction closely enough for threshold parity tests.
    """

    def __init__(self, d, nt, nb, nq, metric="L2", seed=1338):
        from ..metric import MetricType

        self.d, self.nt, self.nb, self.nq = d, nt, nb, nq
        self.metric = (
            MetricType.L2 if str(metric).upper() in ("L2", "METRICTYPE.L2") else MetricType.INNER_PRODUCT
        )
        rs = np.random.RandomState(seed)
        n = nb + nt + nq
        n_centroids = 10 * int(np.sqrt(max(nb, 1))) or 1
        centroids = rs.rand(n_centroids, d).astype(np.float32)
        scales = (1.0 / (np.arange(d) + 1.0)).astype(np.float32)
        assign = rs.randint(n_centroids, size=n)
        x = centroids[assign] + (rs.randn(n, d).astype(np.float32) * 0.03 * scales)
        self._xt = x[:nt]
        self._xb = x[nt : nt + nb]
        self._xq = x[nt + nb :]

    def get_train(self, maxtrain=None):
        if maxtrain is None:
            return self._xt
        return self._xt[:maxtrain]

    def get_database(self):
        return self._xb

    def get_queries(self):
        return self._xq


# --- fvecs/ivecs/bvecs IO (contrib/vecs_io.py) ------------------------------


def ivecs_read(fname: str) -> np.ndarray:
    a = np.fromfile(fname, dtype="int32")
    if a.size == 0:
        return np.empty((0, 0), dtype="int32")
    d = a[0]
    return a.reshape(-1, d + 1)[:, 1:].copy()


def fvecs_read(fname: str) -> np.ndarray:
    return ivecs_read(fname).view("float32")


def bvecs_mmap(fname: str) -> np.ndarray:
    x = np.memmap(fname, dtype="uint8", mode="r")
    d = x[:4].view("int32")[0]
    return x.reshape(-1, d + 4)[:, 4:]


def fvecs_mmap(fname: str) -> np.ndarray:
    x = np.memmap(fname, dtype="int32", mode="r")
    d = x[0]
    return x.reshape(-1, d + 1)[:, 1:].view("float32")


def ivecs_write(fname: str, m: np.ndarray) -> None:
    m = np.ascontiguousarray(m, dtype="int32")
    n, d = m.shape
    m1 = np.empty((n, d + 1), dtype="int32")
    m1[:, 0] = d
    m1[:, 1:] = m
    m1.tofile(fname)


def fvecs_write(fname: str, m: np.ndarray) -> None:
    ivecs_write(fname, np.ascontiguousarray(m, dtype="float32").view("int32"))
