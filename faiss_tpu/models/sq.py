"""Scalar-quantizer indexes — analogue of faiss/IndexScalarQuantizer.{h,cpp}
and IndexIVFScalarQuantizer.

Codes are stored compressed host-side (the index's memory footprint), and
decoded into the padded device scan layout on demand. The scan itself then
reuses the flat/IVF-flat distance kernels (decode is an elementwise VPU op
that XLA fuses into the distance GEMM when staged; keeping the device copy
in uint8 and decoding inside the scan kernel is a planned optimization).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..base import SearchParameters
from ..codecs.sq import QuantizerType, ScalarQuantizer
from ..metric import MetricType
from .flat import IndexFlat
from .ivf import IndexIVF


class IndexScalarQuantizer(IndexFlat):
    """Flat SQ index (reference: IndexScalarQuantizer.h:26)."""

    def __init__(self, d: int, qtype=QuantizerType.QT_8bit, metric=MetricType.L2):
        if QuantizerType(qtype) == QuantizerType.QT_0bit:
            # sq-dispatch.h:408: centroid-only distance needs an IVF around it
            raise ValueError(
                "QT_0bit does not support standalone quantization, "
                "use IndexIVFScalarQuantizer"
            )
        super().__init__(d, metric)
        self.sq = ScalarQuantizer(d, qtype)
        self.is_trained = self.sq.is_trained
        self.code_size = self.sq.code_size
        self._codes: Optional[np.ndarray] = None

    def train(self, x) -> None:
        self.sq.train(self._check_input(x))
        self.is_trained = True

    def add(self, x) -> None:
        x = self._check_input(x)
        self._check_trained()
        codes = self.sq.compute_codes(x)
        self._codes = (
            codes if self._codes is None else np.concatenate([self._codes, codes])
        )
        # store the *reconstruction* for the scan path (codec-faithful:
        # search distances are to decoded vectors, like the reference)
        super().add(self.sq.decode(codes))

    def reset(self) -> None:
        super().reset()
        self._codes = None

    def reconstruct_n(self, n0: int, ni: int) -> np.ndarray:
        return self.sq.decode(self._codes[n0 : n0 + ni])

    def sa_code_size(self) -> int:
        return self.sq.code_size

    def sa_encode(self, x) -> np.ndarray:
        return self.sq.compute_codes(self._check_input(x))

    def sa_decode(self, codes) -> np.ndarray:
        return self.sq.decode(codes)


class IndexIVFScalarQuantizer(IndexIVF):
    """IVF + SQ codes (reference: IndexIVFScalarQuantizer, IndexScalarQuantizer.h:61)."""

    def __init__(
        self,
        quantizer,
        d: int,
        nlist: int,
        qtype=QuantizerType.QT_8bit,
        metric=MetricType.L2,
        by_residual: bool = False,
    ):
        super().__init__(quantizer, d, nlist, metric)
        self.sq = ScalarQuantizer(d, qtype)
        # QT_0bit reconstructs each vector as its list centroid — only
        # meaningful with residual coding (scanners.h:162)
        self.by_residual = (
            True if self.sq.qtype == QuantizerType.QT_0bit else by_residual
        )
        self.code_size = self.sq.code_size

    def train_encoder(self, x, assign) -> None:
        if self.by_residual:
            x = x - self.quantizer.vectors()[assign]
        self.sq.train(x)

    def encode_vectors(self, x, listnos) -> np.ndarray:
        if self.by_residual:
            x = x - self.quantizer.vectors()[listnos]
        return self.sq.compute_codes(x)

    def decode_vectors(self, codes, listnos) -> np.ndarray:
        out = self.sq.decode(codes)
        if self.by_residual:
            out = out + self.quantizer.vectors()[listnos]
        return out

    def _stage_codes(self, slot_ids, lengths, max_len, sorted_ln, ranks, order):
        import jax.numpy as jnp

        d = self.d
        pad_codes = np.zeros((self.nlist, max_len, d), np.float32)
        if self.ntotal:
            decoded = self.decode_vectors(
                self._codes_host[order], self._listnos_host[order]
            )
            pad_codes[sorted_ln, ranks] = decoded
        dev = {
            "codes": jnp.asarray(pad_codes),
            "slot_ids": jnp.asarray(slot_ids),
            "lengths": jnp.asarray(lengths),
        }
        if self.metric_type == MetricType.L2:
            dev["code_norms"] = jnp.sum(jnp.square(dev["codes"]), axis=-1)
        else:
            dev["code_norms"] = None
        return dev

    def sa_code_size(self) -> int:
        return self.sq.code_size
