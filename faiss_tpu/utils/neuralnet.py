"""Minimal neural-net inference lib + QINCo codec — analogue of
faiss/utils/NeuralNet.{h,cpp} (Linear/Embedding/FFN, utils/NeuralNet.h:23-129)
and the QINCo neural codec (IndexNeuralNetCodec.h; Huijben et al., "Residual
Quantization with Implicit Neural Codebooks", 2024).

The reference embeds a tiny C++ inference runtime because its decoders run
inside search; here the layers are jnp expressions (MXU matmuls) that jit
into the decode path. Weights load from numpy dicts (e.g. exported from a
torch-trained QINCo model).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np


class Linear:
    """y = x W^T + b (reference: NeuralNet.h:42)."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True):
        self.in_features = in_features
        self.out_features = out_features
        self.weight = np.zeros((out_features, in_features), np.float32)
        self.bias = np.zeros(out_features, np.float32) if bias else None

    def __call__(self, x):
        y = x @ self.weight.T
        if self.bias is not None:
            y = y + self.bias
        return y


class Embedding:
    """Code -> vector table (reference: NeuralNet.h:60)."""

    def __init__(self, num: int, dim: int):
        self.weight = np.zeros((num, dim), np.float32)

    def __call__(self, codes):
        return self.weight[np.asarray(codes, np.int64)]


class FFN:
    """Linear-ReLU-Linear residual block (reference: NeuralNet.h:77)."""

    def __init__(self, d: int, h: int):
        self.linear1 = Linear(d, h)
        self.linear2 = Linear(h, d)

    def __call__(self, x):
        return self.linear2(np.maximum(self.linear1(x), 0.0))


class QINCoStep:
    """One QINCo residual step: codebook conditioned on the partial
    reconstruction via concat-Linear + FFN blocks (reference:
    utils/NeuralNet.h QINCoStep)."""

    def __init__(self, d: int, K: int, L: int, h: int):
        self.d, self.K, self.L, self.h = d, K, L, h
        self.codebook = Embedding(K, d)
        self.MLPconcat = Linear(2 * d, d)
        self.residual_blocks: List[FFN] = [FFN(d, h) for _ in range(L)]

    def decode(self, xhat: np.ndarray, codes: np.ndarray) -> np.ndarray:
        """Conditioned codeword for (partial reconstruction, code)."""
        zqs = self.codebook(codes)
        cc = np.concatenate([zqs, xhat], axis=-1)
        zqs = zqs + self.MLPconcat(cc)
        for blk in self.residual_blocks:
            zqs = zqs + blk(zqs)
        return zqs

    def encode(self, xhat: np.ndarray, x: np.ndarray) -> np.ndarray:
        """Pick the code whose conditioned codeword best matches x - xhat."""
        n = len(x)
        best_code = np.zeros(n, np.int64)
        best_err = np.full(n, np.inf, np.float32)
        target = x - xhat
        for k in range(self.K):
            cand = self.decode(xhat, np.full(n, k, np.int64))
            err = ((cand - target) ** 2).sum(1)
            upd = err < best_err
            best_err = np.where(upd, err, best_err)
            best_code = np.where(upd, k, best_code)
        return best_code


class QINCo:
    """M-step QINCo decoder/encoder (reference: NeuralNet.h QINCo:107)."""

    def __init__(self, d: int, K: int, L: int, M: int, h: int):
        self.d, self.K, self.L, self.M, self.h = d, K, L, M, h
        self.codebook0 = Embedding(K, d)
        self.steps = [QINCoStep(d, K, L, h) for _ in range(M - 1)]

    def decode(self, codes: np.ndarray) -> np.ndarray:
        xhat = self.codebook0(codes[:, 0])
        for m, step in enumerate(self.steps):
            xhat = xhat + step.decode(xhat, codes[:, m + 1])
        return xhat

    def encode(self, x: np.ndarray) -> np.ndarray:
        n = len(x)
        codes = np.zeros((n, self.M), np.int64)
        # step 0: plain nearest codebook entry
        cb0 = self.codebook0.weight
        d2 = (
            (x**2).sum(1)[:, None]
            + (cb0**2).sum(1)[None, :]
            - 2 * x @ cb0.T
        )
        codes[:, 0] = d2.argmin(1)
        xhat = cb0[codes[:, 0]]
        for m, step in enumerate(self.steps):
            codes[:, m + 1] = step.encode(xhat, x)
            xhat = xhat + step.decode(xhat, codes[:, m + 1])
        return codes

    def load_state(self, state: Dict[str, np.ndarray]) -> None:
        """Load weights from a flat numpy dict (torch state_dict layout)."""
        self.codebook0.weight = np.asarray(state["codebook0.weight"], np.float32)
        for m, step in enumerate(self.steps):
            p = f"steps.{m}."
            step.codebook.weight = np.asarray(state[p + "codebook.weight"], np.float32)
            step.MLPconcat.weight = np.asarray(state[p + "MLPconcat.weight"], np.float32)
            step.MLPconcat.bias = np.asarray(state[p + "MLPconcat.bias"], np.float32)
            for l, blk in enumerate(step.residual_blocks):
                q = f"{p}residual_blocks.{l}."
                blk.linear1.weight = np.asarray(state[q + "0.weight"], np.float32)
                blk.linear1.bias = np.asarray(state[q + "0.bias"], np.float32)
                blk.linear2.weight = np.asarray(state[q + "2.weight"], np.float32)
                blk.linear2.bias = np.asarray(state[q + "2.bias"], np.float32)
