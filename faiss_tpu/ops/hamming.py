"""Hamming distance kernels — analogue of faiss/utils/hamming.{h,cpp}.

Binary vectors are uint8 arrays of d/8 bytes. Distances use the VPU
population-count (jax.lax.population_count) over int32-packed words, with
chunked scans + fused k-select like the float path — replacing the
reference's per-ISA HammingComputer templates
(utils/hamming_distance/hamming_computer.h).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .topk import merge_topk, topk


def pack_bits(x: np.ndarray) -> np.ndarray:
    """float/bool [n, d] -> uint8 codes [n, d/8] (sign/threshold packing)."""
    return np.packbits(np.asarray(x) > 0, axis=1, bitorder="little")


def _to_i32(codes: jax.Array) -> jax.Array:
    """uint8 [n, nbytes] -> int32 words [n, nwords] (pad to 4-byte multiple)."""
    n, nbytes = codes.shape
    pad = (-nbytes) % 4
    if pad:
        codes = jnp.pad(codes, ((0, 0), (0, pad)))
    c = codes.reshape(n, -1, 4).astype(jnp.uint32)
    w = c[..., 0] | (c[..., 1] << 8) | (c[..., 2] << 16) | (c[..., 3] << 24)
    return w.astype(jnp.int32)


def hamming_distances_tile(xa: jax.Array, xb: jax.Array) -> jax.Array:
    """[na, w] x [nb, w] int32 words -> [na, nb] int32 hamming distances."""
    x = xa[:, None, :] ^ xb[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "db_chunk"))
def hamming_knn(
    xq_words: jax.Array,  # [nq, w] int32
    xb_words: jax.Array,  # [nb, w] int32
    k: int,
    db_chunk: int = 1 << 14,
) -> Tuple[jax.Array, jax.Array]:
    """k-NN under hamming distance (reference: hammings_knn_hc,
    utils/hamming.cpp). Returns (dist int32 [nq,k], ids int32 [nq,k])."""
    nq = xq_words.shape[0]
    nb = xb_words.shape[0]
    kk = min(k, nb)
    if nb <= db_chunk:
        d = hamming_distances_tile(xq_words, xb_words).astype(jnp.float32)
        vals, ids = topk(d, kk, largest=False)
    else:
        nchunks = -(-nb // db_chunk)
        pad = nchunks * db_chunk - nb
        xbp = jnp.pad(xb_words, ((0, pad), (0, 0))).reshape(
            nchunks, db_chunk, -1
        )

        def body(carry, inputs):
            vals, ids = carry
            ci, bt = inputs
            d = hamming_distances_tile(xq_words, bt).astype(jnp.float32)
            col = jnp.arange(db_chunk, dtype=jnp.int32) + ci * db_chunk
            d = jnp.where(col[None, :] < nb, d, jnp.inf)
            cv, cp = topk(d, kk, largest=False)
            vals, ids = merge_topk(vals, ids, cv, col[cp], kk, largest=False)
            return (vals, ids), None

        init = (
            jnp.full((nq, kk), jnp.inf, jnp.float32),
            jnp.full((nq, kk), -1, jnp.int32),
        )
        (vals, ids), _ = jax.lax.scan(
            body, init, (jnp.arange(nchunks), xbp)
        )
    if kk < k:
        vals = jnp.concatenate([vals, jnp.full((nq, k - kk), jnp.inf)], -1)
        ids = jnp.concatenate(
            [ids, jnp.full((nq, k - kk), -1, jnp.int32)], -1
        )
    return vals.astype(jnp.int32), ids


def hamming_knn_host(xq: np.ndarray, xb: np.ndarray, k: int):
    """Host API: uint8 codes in, (int32 dists, int64 ids) out."""
    qw = _to_i32(jnp.asarray(xq))
    bw = _to_i32(jnp.asarray(xb))
    d, i = hamming_knn(qw, bw, k)
    return np.asarray(d), np.asarray(i).astype(np.int64)
