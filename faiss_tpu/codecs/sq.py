"""ScalarQuantizer — analogue of faiss/impl/ScalarQuantizer.{h,cpp}.

Per-dimension (or uniform) linear codecs: QT_8bit/4bit/6bit trained ranges,
fp16/bf16 passthrough, 8bit_direct variants (ScalarQuantizer.h:27-47).
Encode/decode are elementwise VPU ops; trained stats use the reference's
RangeStat policies (RS_minmax default, RS_quantiles).
"""

from __future__ import annotations

import enum
from typing import Optional

import numpy as np

from .pq import Quantizer


class QuantizerType(enum.IntEnum):
    """reference: ScalarQuantizer.h:27."""

    QT_8bit = 0
    QT_4bit = 1
    QT_8bit_uniform = 2
    QT_4bit_uniform = 3
    QT_fp16 = 4
    QT_8bit_direct = 5
    QT_6bit = 6
    QT_bf16 = 7
    QT_8bit_direct_signed = 8


class RangeStat(enum.IntEnum):
    """reference: ScalarQuantizer.h:54."""

    RS_minmax = 0
    RS_meanstd = 1
    RS_quantiles = 2
    RS_optim = 3


_BITS = {
    QuantizerType.QT_8bit: 8,
    QuantizerType.QT_4bit: 4,
    QuantizerType.QT_8bit_uniform: 8,
    QuantizerType.QT_4bit_uniform: 4,
    QuantizerType.QT_6bit: 6,
}


class ScalarQuantizer(Quantizer):
    """reference: impl/ScalarQuantizer.h:20."""

    # expose enum values as class attrs, faiss-style
    QT_8bit = QuantizerType.QT_8bit
    QT_4bit = QuantizerType.QT_4bit
    QT_8bit_uniform = QuantizerType.QT_8bit_uniform
    QT_4bit_uniform = QuantizerType.QT_4bit_uniform
    QT_fp16 = QuantizerType.QT_fp16
    QT_8bit_direct = QuantizerType.QT_8bit_direct
    QT_6bit = QuantizerType.QT_6bit
    QT_bf16 = QuantizerType.QT_bf16
    QT_8bit_direct_signed = QuantizerType.QT_8bit_direct_signed
    RS_minmax = RangeStat.RS_minmax
    RS_meanstd = RangeStat.RS_meanstd
    RS_quantiles = RangeStat.RS_quantiles
    RS_optim = RangeStat.RS_optim

    def __init__(self, d: int, qtype: QuantizerType = QuantizerType.QT_8bit):
        self.qtype = QuantizerType(qtype)
        self.rangestat = RangeStat.RS_minmax
        self.rangestat_arg = 0.0
        self.bits = _BITS.get(self.qtype, 16 if self.qtype in (
            QuantizerType.QT_fp16, QuantizerType.QT_bf16) else 8)
        if self.qtype in (QuantizerType.QT_fp16, QuantizerType.QT_bf16):
            code_size = d * 2
        elif self.qtype in (
            QuantizerType.QT_8bit,
            QuantizerType.QT_8bit_uniform,
            QuantizerType.QT_8bit_direct,
            QuantizerType.QT_8bit_direct_signed,
        ):
            code_size = d
        else:
            code_size = (d * self.bits + 7) // 8
        super().__init__(d, code_size)
        self.trained: Optional[np.ndarray] = None  # [2, d] or [2] : vmin, vdiff
        self._needs_train = self.qtype in _BITS

    @property
    def is_trained(self) -> bool:
        return not self._needs_train or self.trained is not None

    # -- training (scalar_quantizer/training.cpp train_* functions) ----------
    def train(self, x) -> None:
        x = np.ascontiguousarray(x, np.float32)
        if not self._needs_train:
            self.trained = np.zeros((2, 1), np.float32)
            return
        uniform = self.qtype in (
            QuantizerType.QT_8bit_uniform,
            QuantizerType.QT_4bit_uniform,
        )
        if self.rangestat == RangeStat.RS_quantiles:
            lo = self.rangestat_arg if self.rangestat_arg > 0 else 0.01
            if uniform:
                vmin = np.quantile(x, lo)
                vmax = np.quantile(x, 1 - lo)
            else:
                vmin = np.quantile(x, lo, axis=0)
                vmax = np.quantile(x, 1 - lo, axis=0)
        elif self.rangestat == RangeStat.RS_meanstd:
            arg = self.rangestat_arg if self.rangestat_arg > 0 else 1.0
            if uniform:
                vmin = x.mean() - arg * x.std()
                vmax = x.mean() + arg * x.std()
            else:
                vmin = x.mean(0) - arg * x.std(0)
                vmax = x.mean(0) + arg * x.std(0)
        else:  # minmax
            vmin = x.min() if uniform else x.min(axis=0)
            vmax = x.max() if uniform else x.max(axis=0)
        vdiff = np.maximum(np.asarray(vmax) - np.asarray(vmin), 1e-20)
        self.trained = np.stack(
            [np.broadcast_to(np.asarray(vmin, np.float32), np.shape(vdiff)).reshape(-1),
             np.asarray(vdiff, np.float32).reshape(-1)]
        ).astype(np.float32)

    # -- codec -----------------------------------------------------------------
    def _quantize_units(self, x) -> np.ndarray:
        """x -> integer codes [n, d] per the trained range."""
        vmin, vdiff = self.trained[0], self.trained[1]
        levels = (1 << self.bits)
        unit = (x - vmin) / vdiff
        q = np.floor(unit * levels)
        return np.clip(q, 0, levels - 1).astype(np.uint8)

    def _dequantize_units(self, q) -> np.ndarray:
        vmin, vdiff = self.trained[0], self.trained[1]
        levels = (1 << self.bits)
        return ((q.astype(np.float32) + 0.5) / levels * vdiff + vmin).astype(
            np.float32
        )

    def compute_codes(self, x) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float32)
        n = len(x)
        t = self.qtype
        if t == QuantizerType.QT_fp16:
            return x.astype(np.float16).view(np.uint8).reshape(n, -1)
        if t == QuantizerType.QT_bf16:
            return (
                x.view(np.uint32).astype(np.uint32) >> 16
            ).astype("<u2").view(np.uint8).reshape(n, -1)
        if t == QuantizerType.QT_8bit_direct:
            return np.clip(np.round(x), 0, 255).astype(np.uint8)
        if t == QuantizerType.QT_8bit_direct_signed:
            return (np.clip(np.round(x), -128, 127) + 128).astype(np.uint8)
        q = self._quantize_units(x)
        if self.bits == 8:
            return q
        if self.bits == 4:
            if self.d % 2:
                q = np.concatenate([q, np.zeros((n, 1), np.uint8)], 1)
            return (q[:, 0::2] | (q[:, 1::2] << 4)).astype(np.uint8)
        # 6-bit generic packing
        out = np.zeros((n, self.code_size), np.uint8)
        bit = 0
        for j in range(self.d):
            for b in range(6):
                byte, off = divmod(bit, 8)
                out[:, byte] |= (((q[:, j] >> b) & 1) << off).astype(np.uint8)
                bit += 1
        return out

    def decode(self, codes) -> np.ndarray:
        codes = np.ascontiguousarray(codes, np.uint8)
        n = len(codes)
        t = self.qtype
        if t == QuantizerType.QT_fp16:
            return codes.view(np.float16).astype(np.float32).reshape(n, self.d)
        if t == QuantizerType.QT_bf16:
            u = codes.view("<u2").astype(np.uint32) << 16
            return u.view(np.float32).reshape(n, self.d)
        if t == QuantizerType.QT_8bit_direct:
            return codes.astype(np.float32).reshape(n, self.d)
        if t == QuantizerType.QT_8bit_direct_signed:
            return (codes.astype(np.float32) - 128).reshape(n, self.d)
        if self.bits == 8:
            q = codes
        elif self.bits == 4:
            q = np.empty((n, self.d), np.uint8)
            q[:, 0::2] = codes[:, : (self.d + 1) // 2] & 0xF
            q[:, 1::2] = codes[:, : self.d // 2] >> 4
        else:
            q = np.zeros((n, self.d), np.uint8)
            bit = 0
            for j in range(self.d):
                for b in range(6):
                    byte, off = divmod(bit, 8)
                    q[:, j] |= ((codes[:, byte] >> off) & 1).astype(np.uint8) << b
                    bit += 1
        return self._dequantize_units(q.reshape(n, self.d))
