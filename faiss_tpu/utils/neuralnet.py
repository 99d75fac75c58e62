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


# ---------------------------------------------------------------------------
# QINCo training (jax/optax) — the reference ships inference only
# (utils/NeuralNet.h:23-129); on TPU the training loop is native. The
# produced weights load straight into QINCo.load_state (same state-dict
# layout as the public torch reference implementation).
# ---------------------------------------------------------------------------


def _qinco_init(key, d, K, L, M, h, x0=None):
    import jax

    keys = jax.random.split(key, 2 + (M - 1) * (2 + 2 * L))
    ki = iter(range(len(keys)))

    def rnd(shape, scale):
        return (
            np.asarray(jax.random.normal(keys[next(ki)], shape), np.float32)
            * scale
        )

    params = {}
    if x0 is not None and len(x0) >= K:
        # k-means-style init for the level-0 codebook
        from ..clustering import Clustering, ClusteringParameters

        cp = ClusteringParameters()
        cp.niter = 10
        cp.verbose = False
        clus = Clustering(d, K, cp)
        clus.train(np.ascontiguousarray(x0[: K * 64], np.float32))
        params["codebook0.weight"] = clus.centroids.astype(np.float32)
    else:
        params["codebook0.weight"] = rnd((K, d), 0.1)
    for m in range(M - 1):
        p = f"steps.{m}."
        params[p + "codebook.weight"] = rnd((K, d), 0.01)
        params[p + "MLPconcat.weight"] = rnd((d, 2 * d), (2.0 / (2 * d)) ** 0.5)
        params[p + "MLPconcat.bias"] = np.zeros(d, np.float32)
        for l in range(L):
            q = f"{p}residual_blocks.{l}."
            params[q + "0.weight"] = rnd((h, d), (2.0 / d) ** 0.5)
            params[q + "0.bias"] = np.zeros(h, np.float32)
            params[q + "2.weight"] = rnd((d, h), (2.0 / h) ** 0.5)
            params[q + "2.bias"] = np.zeros(d, np.float32)
    return params


def train_qinco(
    x: np.ndarray,
    K: int,
    M: int,
    L: int = 2,
    h: int = 256,
    epochs: int = 4,
    batch: int = 1024,
    lr: float = 1e-3,
    seed: int = 0,
    verbose: bool = False,
) -> "QINCo":
    """Train a QINCo codec on ``x`` with jax/optax (sum of per-step MSE,
    hard code assignment — Huijben et al. 2024). Returns a loaded QINCo."""
    import jax
    import jax.numpy as jnp
    import optax

    n, d = x.shape
    x = np.ascontiguousarray(x, np.float32)
    params = _qinco_init(jax.random.PRNGKey(seed), d, K, L, M, h, x)
    params = {k: jnp.asarray(v) for k, v in params.items()}

    def step_decode_all(params, m, xhat):
        """Conditioned codewords for ALL K codes: [n, K, d]."""
        p = f"steps.{m}."
        cb = params[p + "codebook.weight"]  # [K, d]
        nq = xhat.shape[0]
        z = jnp.broadcast_to(cb[None], (nq, K, d))
        cc = jnp.concatenate(
            [z, jnp.broadcast_to(xhat[:, None, :], (nq, K, d))], axis=-1
        )
        z = z + cc @ params[p + "MLPconcat.weight"].T + params[
            p + "MLPconcat.bias"
        ]
        for l in range(L):
            q = f"{p}residual_blocks.{l}."
            hdn = jnp.maximum(
                z @ params[q + "0.weight"].T + params[q + "0.bias"], 0.0
            )
            z = z + hdn @ params[q + "2.weight"].T + params[q + "2.bias"]
        return z

    def loss_fn(params, xb):
        cb0 = params["codebook0.weight"]
        d2 = (
            jnp.sum(xb**2, 1)[:, None]
            + jnp.sum(cb0**2, 1)[None, :]
            - 2.0 * xb @ cb0.T
        )
        c0 = jnp.argmin(d2, 1)
        xhat = cb0[c0]
        loss = jnp.mean(jnp.sum((xb - xhat) ** 2, 1))
        for m in range(M - 1):
            cand = step_decode_all(params, m, xhat)  # [n, K, d]
            target = (xb - xhat)[:, None, :]
            err = jnp.sum((cand - target) ** 2, -1)  # [n, K]
            code = jnp.argmin(err, 1)
            chosen = jnp.take_along_axis(
                cand, code[:, None, None], axis=1
            )[:, 0]
            xhat = xhat + chosen
            loss = loss + jnp.mean(jnp.sum((xb - xhat) ** 2, 1))
        return loss / M

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, xb):
        loss, grads = jax.value_and_grad(loss_fn)(params, xb)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rs = np.random.RandomState(seed)
    nb = max(1, n // batch)
    for ep in range(epochs):
        perm = rs.permutation(n)
        tot = 0.0
        for b in range(nb):
            xb = jnp.asarray(x[perm[b * batch : (b + 1) * batch]])
            if xb.shape[0] < batch:
                continue
            params, opt_state, loss = train_step(params, opt_state, xb)
            tot += float(loss)
        if verbose:
            print(f"[qinco] epoch {ep}: loss {tot / max(1, nb):.4f}")

    model = QINCo(d, K, L, M, h)
    model.load_state({k: np.asarray(v) for k, v in params.items()})
    return model
