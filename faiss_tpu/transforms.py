"""Vector transforms — analogue of faiss/VectorTransform.{h,cpp}.

Training uses host numpy/LAPACK (eigh/svd — same as the reference's syev/
gesvd calls, VectorTransform.cpp); the apply path is a device GEMM so
transforms fuse into the search pipeline. All classes keep the reference's
``train / apply / reverse_transform`` interface (VectorTransform.h:25).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class VectorTransform:
    """reference: VectorTransform.h:25."""

    def __init__(self, d_in: int, d_out: int):
        self.d_in = int(d_in)
        self.d_out = int(d_out)
        self.is_trained = True

    def train(self, x) -> None:
        del x

    def apply(self, x) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float32)
        if not self.is_trained:
            raise RuntimeError(f"{type(self).__name__} is not trained")
        return self.apply_chain(x)

    # alias used by reference python API
    def apply_py(self, x) -> np.ndarray:
        return self.apply(x)

    def apply_chain(self, x) -> np.ndarray:
        raise NotImplementedError

    def reverse_transform(self, y) -> np.ndarray:
        raise NotImplementedError(f"{type(self).__name__} is not reversible")


class LinearTransform(VectorTransform):
    """y = A x + b (reference: VectorTransform.h:71)."""

    def __init__(self, d_in: int, d_out: int, have_bias: bool = False):
        super().__init__(d_in, d_out)
        self.have_bias = have_bias
        self.A: Optional[np.ndarray] = None  # [d_out, d_in]
        self.b: Optional[np.ndarray] = None  # [d_out]
        self.is_orthonormal = False

    def apply_chain(self, x) -> np.ndarray:
        y = x @ self.A.T
        if self.have_bias and self.b is not None:
            y = y + self.b
        return y.astype(np.float32)

    def set_is_orthonormal(self) -> None:
        """Check A A^T ~= I (reference: LinearTransform::set_is_orthonormal)."""
        if self.A is None:
            return
        prod = self.A @ self.A.T
        self.is_orthonormal = bool(
            np.allclose(prod, np.eye(self.d_out), atol=1e-4)
        )

    def reverse_transform(self, y) -> np.ndarray:
        if not self.is_orthonormal:
            self.set_is_orthonormal()
        if not self.is_orthonormal:
            raise RuntimeError("reverse_transform requires orthonormal A")
        y = np.ascontiguousarray(y, np.float32)
        if self.have_bias and self.b is not None:
            y = y - self.b
        return (y @ self.A).astype(np.float32)


def _random_orthogonal(d_out: int, d_in: int, seed: int) -> np.ndarray:
    rs = np.random.RandomState(seed)
    g = rs.randn(max(d_out, d_in), d_in).astype(np.float64)
    q, _ = np.linalg.qr(g)
    return q[:d_out].astype(np.float32)


class RandomRotationMatrix(LinearTransform):
    """QR-orthogonalized Gaussian rotation (VectorTransform.h:115)."""

    def __init__(self, d_in: int, d_out: int):
        super().__init__(d_in, d_out, have_bias=False)
        self.is_trained = False

    def init(self, seed: int = 1234) -> None:
        self.A = _random_orthogonal(self.d_out, self.d_in, seed)
        self.is_orthonormal = True
        self.is_trained = True

    def train(self, x) -> None:
        del x
        if not self.is_trained:
            self.init()


class PCAMatrix(LinearTransform):
    """PCA with optional whitening / random rotation (VectorTransform.h:154).

    eigen_power: 0 = plain PCA, -0.5 = whitening. random_rotation applies a
    random orthogonal basis after PCA (for balanced PQ subspaces).
    """

    def __init__(
        self,
        d_in: int,
        d_out: int,
        eigen_power: float = 0.0,
        random_rotation: bool = False,
    ):
        super().__init__(d_in, d_out, have_bias=True)
        self.eigen_power = float(eigen_power)
        self.epsilon = 0.0
        self.random_rotation = random_rotation
        self.max_points_per_d = 1000
        self.balanced_bins = 0
        self.mean: Optional[np.ndarray] = None
        self.eigenvalues: Optional[np.ndarray] = None
        self.PCAMat: Optional[np.ndarray] = None
        self.is_trained = False

    def train(self, x) -> None:
        x = np.ascontiguousarray(x, np.float64)
        n, d = x.shape
        assert d == self.d_in
        if n > self.max_points_per_d * d:
            sub = np.random.RandomState(123).permutation(n)[: self.max_points_per_d * d]
            x = x[sub]
            n = len(x)
        self.mean = x.mean(axis=0)
        xc = x - self.mean
        if n >= d:
            cov = (xc.T @ xc) / n
            eigvals, eigvecs = np.linalg.eigh(cov)
            order = np.argsort(-eigvals)
            eigvals = np.maximum(eigvals[order], 0.0)
            eigvecs = eigvecs[:, order]
        else:
            # gram trick for n < d (reference VectorTransform.cpp PCA path)
            gram = (xc @ xc.T) / n
            gv, gu = np.linalg.eigh(gram)
            order = np.argsort(-gv)
            gv = np.maximum(gv[order], 0.0)
            gu = gu[:, order]
            eigvecs = xc.T @ gu
            norms = np.linalg.norm(eigvecs, axis=0)
            eigvecs = eigvecs / np.maximum(norms, 1e-15)
            eigvals = gv
        self.eigenvalues = eigvals.astype(np.float32)
        self.PCAMat = eigvecs.T.astype(np.float32)  # rows = components
        self.prepare_Ab()
        self.is_trained = True

    def prepare_Ab(self) -> None:
        A = self.PCAMat[: self.d_out].astype(np.float64)  # [d_out, d_in]
        if self.eigen_power != 0:
            ev = np.maximum(self.eigenvalues[: self.d_out], 0.0) + self.epsilon
            scale = ev**self.eigen_power
            A = A * scale[:, None]
        if self.random_rotation:
            rr = _random_orthogonal(self.d_out, self.d_out, 1234).astype(np.float64)
            A = rr @ A
        self.A = A.astype(np.float32)
        self.b = (-(A @ self.mean)).astype(np.float32)
        self.set_is_orthonormal()


class NormalizationTransform(VectorTransform):
    """L_norm normalization per vector (VectorTransform.h:301)."""

    def __init__(self, d: int, norm: float = 2.0):
        super().__init__(d, d)
        self.norm = float(norm)

    def apply_chain(self, x) -> np.ndarray:
        if self.norm == 2.0:
            norms = np.linalg.norm(x, axis=1, keepdims=True)
        else:
            norms = (np.abs(x) ** self.norm).sum(1, keepdims=True) ** (
                1.0 / self.norm
            )
        return (x / np.maximum(norms, 1e-20)).astype(np.float32)

    def reverse_transform(self, y) -> np.ndarray:
        return np.ascontiguousarray(y, np.float32)  # identity (h:310)


class CenteringTransform(VectorTransform):
    """Subtract the mean (VectorTransform.h:316)."""

    def __init__(self, d: int):
        super().__init__(d, d)
        self.mean: Optional[np.ndarray] = None
        self.is_trained = False

    def train(self, x) -> None:
        self.mean = np.ascontiguousarray(x, np.float32).mean(0)
        self.is_trained = True

    def apply_chain(self, x) -> np.ndarray:
        return (x - self.mean).astype(np.float32)

    def reverse_transform(self, y) -> np.ndarray:
        return (y + self.mean).astype(np.float32)


class RemapDimensionsTransform(VectorTransform):
    """Permute/pad dimensions (VectorTransform.h:278)."""

    def __init__(self, d_in: int, d_out: int, uniform_or_map=True):
        super().__init__(d_in, d_out)
        if isinstance(uniform_or_map, (list, np.ndarray)):
            self.map = np.asarray(uniform_or_map, np.int64)
        elif uniform_or_map:
            # spread input dims uniformly (reference ctor uniform=true)
            self.map = np.full(d_out, -1, np.int64)
            for i in range(min(d_in, d_out)):
                self.map[i * d_out // max(d_in, 1)] = i
        else:
            self.map = np.array(
                [i if i < d_in else -1 for i in range(d_out)], np.int64
            )

    def apply_chain(self, x) -> np.ndarray:
        out = np.zeros((len(x), self.d_out), np.float32)
        valid = self.map >= 0
        out[:, valid] = x[:, self.map[valid]]
        return out

    def reverse_transform(self, y) -> np.ndarray:
        out = np.zeros((len(y), self.d_in), np.float32)
        valid = self.map >= 0
        out[:, self.map[valid]] = y[:, valid]
        return out


class HadamardRotation(LinearTransform):
    """Normalized Hadamard rotation with sign flips (VectorTransform.h:133)."""

    def __init__(self, d: int, seed: int = 1234):
        if d & (d - 1):
            raise ValueError("HadamardRotation requires power-of-two d")
        super().__init__(d, d, have_bias=False)
        h = np.array([[1.0]])
        while h.shape[0] < d:
            h = np.block([[h, h], [h, -h]])
        signs = np.where(np.random.RandomState(seed).rand(d) < 0.5, -1.0, 1.0)
        self.A = (h * signs[None, :] / np.sqrt(d)).astype(np.float32)
        self.is_orthonormal = True


class OPQMatrix(LinearTransform):
    """OPQ rotation training (reference: VectorTransform.h:255, OPQ paper).

    Alternates PQ assignment and orthogonal Procrustes rotation updates
    (VectorTransform.cpp OPQMatrix::train). M = number of PQ subquantizers
    the rotation optimizes for.
    """

    def __init__(self, d: int, M: int, d2: int = -1):
        d2 = d if d2 <= 0 else d2
        super().__init__(d, d2, have_bias=False)
        self.M = int(M)
        self.niter = 25  # outer iterations (reference default 50, cpp)
        self.niter_pq = 4
        self.max_train_points = 256 * 256
        self.pq = None  # optionally externally-provided PQ
        self.is_trained = False
        self.verbose = False

    def train(self, x) -> None:
        from .codecs.pq import ProductQuantizer

        x = np.ascontiguousarray(x, np.float32)
        if len(x) > self.max_train_points:
            x = x[
                np.random.RandomState(123).permutation(len(x))[
                    : self.max_train_points
                ]
            ]
        n, d = x.shape
        d2 = self.d_out
        # init rotation: random orthogonal (reference uses random rotation
        # or PCA when d2 < d)
        if d2 < d:
            pca = PCAMatrix(d, d2)
            pca.train(x)
            A = pca.PCAMat[:d2].astype(np.float64)
        else:
            A = _random_orthogonal(d2, d, 1234).astype(np.float64)

        pq = self.pq or ProductQuantizer(d2, self.M, 8)
        pq.cp.niter = self.niter_pq
        xd = x.astype(np.float64)
        for it in range(self.niter):
            xt = (xd @ A.T).astype(np.float32)
            if it == 0:
                pq.train(xt)
            else:
                # warm-start codebooks: retrain with few iters
                pq.cp.niter = self.niter_pq
                pq.train(xt)
            recon = pq.decode_int(pq.compute_codes_int(xt)).astype(np.float64)
            # orthogonal Procrustes: min ||X A^T - recon|| -> A from SVD
            u, s, vt = np.linalg.svd(xd.T @ recon, full_matrices=False)
            A = (u @ vt).T  # [d2, d]
            if self.verbose:
                err = ((xd @ A.T - recon) ** 2).sum()
                print(f"OPQ iter {it}: err {err:.3f}")
        self.A = A.astype(np.float32)
        self.is_orthonormal = True
        self.is_trained = True


class ITQMatrix(LinearTransform):
    """Iterative quantization rotation (VectorTransform.h:211).

    Minimizes binarization error ||sign(XR) - XR|| by alternating sign
    assignment and Procrustes updates (ITQ, Gong & Lazebnik).
    """

    def __init__(self, d: int):
        super().__init__(d, d, have_bias=False)
        self.max_iter = 50
        self.seed = 123
        self.is_trained = False

    def train(self, x) -> None:
        x = np.ascontiguousarray(x, np.float64)
        d = self.d_in
        rot = _random_orthogonal(d, d, self.seed).astype(np.float64)
        for _ in range(self.max_iter):
            z = x @ rot.T
            b = np.sign(z)
            b[b == 0] = 1
            u, _, vt = np.linalg.svd(x.T @ b, full_matrices=False)
            rot = (u @ vt).T
        self.A = rot.astype(np.float32)
        self.is_orthonormal = True
        self.is_trained = True


class ITQTransform(VectorTransform):
    """Full ITQ pipeline: mean-center (+optional PCA) + ITQ rotation
    (VectorTransform.h:225)."""

    def __init__(self, d_in: int, d_out: int, do_pca: bool = False):
        super().__init__(d_in, d_out)
        self.do_pca = do_pca
        self.mean: Optional[np.ndarray] = None
        self.pca_then_itq: Optional[LinearTransform] = None
        self.is_trained = False

    def train(self, x) -> None:
        x = np.ascontiguousarray(x, np.float32)
        self.mean = x.mean(0)
        xc = x - self.mean
        if self.do_pca or self.d_out != self.d_in:
            pca = PCAMatrix(self.d_in, self.d_out)
            pca.train(xc)
            xp = pca.apply(xc)
            itq = ITQMatrix(self.d_out)
            itq.train(xp)
            lt = LinearTransform(self.d_in, self.d_out, False)
            lt.A = itq.A @ pca.A
            self.pca_then_itq = lt
        else:
            itq = ITQMatrix(self.d_out)
            itq.train(xc)
            self.pca_then_itq = itq
        self.is_trained = True

    def apply_chain(self, x) -> np.ndarray:
        return self.pca_then_itq.apply(x - self.mean)
