"""IndexNeuralNetCodec / IndexQINCo — analogue of faiss/IndexNeuralNetCodec.h.

Wraps a neural codec (utils/neuralnet.QINCo) as an index: encode at add,
decode-and-rerank at search. Weights come from an externally trained model
(load_state with a torch state_dict exported to numpy), matching the
reference's usage where QINCo models are trained in torch and executed by
the embedded inference lib.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..base import Index
from ..metric import MetricType
from ..utils.neuralnet import QINCo
from .flat import IndexFlat


class IndexNeuralNetCodec(Index):
    """reference: IndexNeuralNetCodec.h:20."""

    def __init__(self, d: int, M: int, nbits: int = 8, net=None):
        super().__init__(d, MetricType.L2)
        self.M = int(M)
        self.nbits = int(nbits)
        self.net = net  # object with encode(x)->codes, decode(codes)->x
        self.is_trained = net is not None
        self._codes: Optional[np.ndarray] = None

    def set_net(self, net) -> None:
        self.net = net
        self.is_trained = True

    def train(self, x) -> None:
        raise RuntimeError(
            "neural codecs are trained externally; call set_net() with a "
            "trained model (reference IndexNeuralNetCodec has the same "
            "contract), or use IndexQINCo.train() for the native jax loop"
        )

    def sa_code_size(self) -> int:
        return (self.M * self.nbits + 7) // 8

    def sa_encode(self, x) -> np.ndarray:
        codes = self.net.encode(self._check_input(x))
        from ..codecs.pq import ProductQuantizer

        helper = ProductQuantizer.__new__(ProductQuantizer)
        helper.M, helper.nbits = self.M, self.nbits
        helper.code_size = self.sa_code_size()
        return ProductQuantizer.pack_codes(helper, codes.astype(np.uint16))

    def sa_decode(self, codes) -> np.ndarray:
        from ..codecs.pq import ProductQuantizer

        helper = ProductQuantizer.__new__(ProductQuantizer)
        helper.M, helper.nbits = self.M, self.nbits
        helper.code_size = self.sa_code_size()
        unpacked = ProductQuantizer.unpack_codes(
            helper, np.ascontiguousarray(codes, np.uint8)
        )
        return self.net.decode(unpacked.astype(np.int64)).astype(np.float32)

    def add(self, x) -> None:
        x = self._check_input(x)
        self._check_trained()
        codes = self.net.encode(x).astype(np.int32)
        self._codes = (
            codes if self._codes is None else np.concatenate([self._codes, codes])
        )
        self.ntotal += len(x)

    def search(self, x, k: int, *, params=None):
        # decode-and-scan through the exact flat kernel
        flat = IndexFlat(self.d, self.metric_type)
        flat.add(self.net.decode(self._codes.astype(np.int64)).astype(np.float32))
        return flat.search(x, k, params=params)

    def reconstruct_n(self, n0, ni):
        return self.net.decode(
            self._codes[n0 : n0 + ni].astype(np.int64)
        ).astype(np.float32)

    def reset(self) -> None:
        self._codes = None
        self.ntotal = 0


class IndexQINCo(IndexNeuralNetCodec):
    """reference: IndexNeuralNetCodec.h IndexQINCo."""

    def __init__(self, d: int, M: int, nbits: int, L: int = 2, h: int = 256):
        super().__init__(d, M, nbits)
        self.qinco = QINCo(d, 1 << nbits, L, M, h)
        self.net = self.qinco
        self.is_trained = False  # until weights are loaded

    def load_state(self, state) -> None:
        self.qinco.load_state(state)
        self.is_trained = True

    def train(self, x, epochs: int = 30, batch: int = 1024,
              lr: float = 1e-3, verbose: bool = False) -> None:
        """Native jax/optax QINCo training (utils/neuralnet.train_qinco);
        the reference ships inference only and trains in torch externally."""
        from ..utils.neuralnet import train_qinco

        x = self._check_input(x)
        self.qinco = train_qinco(
            x, K=1 << self.nbits, M=self.M, L=self.qinco.L,
            h=self.qinco.h, epochs=epochs, batch=batch, lr=lr,
            verbose=verbose,
        )
        self.net = self.qinco
        self.is_trained = True
