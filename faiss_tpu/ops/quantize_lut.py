"""uint8 LUT quantization for fast ADC scans.

Reference: faiss/utils/quantize_lut.{h,cpp} — FastScan quantizes the
per-query ADC lookup tables to uint8 with one scale per query and one bias
per (query, subquantizer) so the SIMD accumulator stays in 8/16-bit integers
(impl/fast_scan/fast_scan.h:125). The TPU analogue feeds the int8 MXU:
the fused ADC kernel (ops/pallas_knn.ivfpq_fused_pallas_v3) contracts int8
LUTs against an int8 one-hot of the codes at 2x the bf16 rate, then
dequantizes the integer accumulator with the (a, c) metadata produced here:

    true_sum ~= a * acc + c        acc = sum_m q8[m, code_m]  (int32)

where q8 = round((lut - b_m) / a) - 128 (int8), c = sum_m b_m + 128*M*a.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def quantize_luts_int8(luts3: jax.Array):
    """Quantize per-query ADC tables for the int8 fused kernel.

    luts3: [nq, M, ksub] f32 (any sign). Returns (q8 [nq, M*ksub] int8,
    meta [nq, 256] f32) where meta[:, 0:128] broadcasts the per-query scale
    ``a`` and meta[:, 128:256] the dequant constant ``c`` (128-lane blocks so
    the kernel reads them without sub-128 lane slicing).
    """
    nq, M, ksub = luts3.shape
    bmin = jnp.min(luts3, axis=-1)  # [nq, M] per-(q, m) bias
    rel = luts3 - bmin[..., None]
    a = jnp.max(rel, axis=(-2, -1)) / 255.0  # [nq] per-query scale
    a = jnp.maximum(a, 1e-30)
    q = jnp.round(rel / a[:, None, None]) - 128.0
    q8 = jnp.clip(q, -128, 127).astype(jnp.int8).reshape(nq, M * ksub)
    c = jnp.sum(bmin, axis=-1) + a * (128.0 * M)
    meta = jnp.concatenate(
        [
            jnp.broadcast_to(a[:, None], (nq, 128)),
            jnp.broadcast_to(c[:, None], (nq, 128)),
        ],
        axis=1,
    ).astype(jnp.float32)
    return q8, meta


def quantize_LUT_and_bias(
    luts: np.ndarray, biases: np.ndarray | None = None
):
    """Host parity API (reference utils/quantize_lut.h:47 quantize_LUT_and_bias).

    luts: [nprobe, M, ksub] (or [M, ksub]) f32; biases: optional [nprobe]
    coarse terms folded into the quantized domain. Returns
    (lut_u8, bias_u16, a, b) such that
    ``a * (sum_m lut_u8[m, code_m] + bias_u16) + b`` reproduces the float
    ADC sum + bias to within M/2 quantization steps.
    """
    luts = np.asarray(luts, np.float32)
    squeeze = luts.ndim == 2
    if squeeze:
        luts = luts[None]
    nprobe, M, ksub = luts.shape
    bmin = luts.min(-1)  # [nprobe, M]
    rng_lut = (luts - bmin[..., None]).max()
    if biases is not None:
        biases = np.asarray(biases, np.float32)
        bias_shift = biases.min()
        rng_bias = (biases - bias_shift).max()
    else:
        bias_shift = 0.0
        rng_bias = 0.0
    a = max(rng_lut / 255.0, rng_bias / 65535.0, 1e-30)
    lut_u8 = np.clip(
        np.round((luts - bmin[..., None]) / a), 0, 255
    ).astype(np.uint8)
    if biases is not None:
        bias_u16 = np.clip(
            np.round((biases - bias_shift) / a), 0, 65535
        ).astype(np.uint16)
    else:
        bias_u16 = np.zeros(nprobe, np.uint16)
    b = bmin.sum(-1) + bias_shift  # [nprobe]
    if squeeze:
        lut_u8, bias_u16, b = lut_u8[0], bias_u16[0], float(b[0])
    return lut_u8, bias_u16, a, b


def dequantize_sum(acc, bias_u16, a, b):
    """Invert quantize_LUT_and_bias: float score from integer accumulator."""
    return a * (np.asarray(acc, np.float64) + np.asarray(bias_u16, np.float64)) + b


@functools.partial(jax.jit, static_argnames=("ksub", "int8"))
def _expand_onehot_chunk(codesT, lid, ksub, int8):
    M, c = codesT.shape
    K = M * ksub
    rep = jnp.repeat(codesT.astype(jnp.int32), ksub, axis=0)  # [K, c]
    rbit = jax.lax.broadcasted_iota(jnp.int32, (K, c), 0) % ksub
    dt = jnp.int8 if int8 else jnp.bfloat16
    oh = (rep == rbit).astype(dt)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (128, c), 0)
    loh = (lrow == lid.astype(jnp.int32)).astype(dt)
    return jnp.concatenate([oh, loh], axis=0)  # [K+128, c]


def expand_onehot(codesT, lid, ksub: int, int8: bool, chunk: int = 1 << 17):
    """Stage the [M*ksub + 128, S] one-hot layout for the v3 fused kernel.

    Built on device in column chunks (a single jit over the full S would
    allocate multi-GB int32 intermediates). codesT: [M, S] uint8 device;
    lid: [1, S] int32 device local-list ids. int8 selects the quantized-LUT
    kernel's dtype (half the HBM of bf16).
    """
    S = codesT.shape[1]
    pieces = []
    for s in range(0, S, chunk):
        pieces.append(
            _expand_onehot_chunk(
                codesT[:, s : s + chunk], lid[:, s : s + chunk], ksub, int8
            )
        )
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
