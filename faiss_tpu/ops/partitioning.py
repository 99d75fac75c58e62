"""Device-side fuzzy partitioning + histograms.

The reference selects the ~q smallest values of a scratch array with a
SIMD quickselect over uint16 keys (faiss/utils/partitioning.h:25
``partition_fuzzy``) and fixed 8/16-bin SIMD histograms
(partitioning.h:46 ``simd_histogram_8/16``) — the machinery behind its
reservoir result handlers.

TPU re-design: partitioning is *batched* (one row per query — the natural
TPU shape; the reference partitions one thread-local array at a time) and
the threshold is found by a bitwise radix descent over the
order-preserving uint32 image of the keys — 16 or 32 fixed
``lax.fori_loop`` steps of a masked count-reduce, O(n) per row like the
reference's histogram pivots, with no data-dependent control flow so the
whole thing stays inside one XLA program. Reordering uses a stable mask
argsort instead of in-place swaps (arrays are immutable under jit).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SIGN = jnp.uint32(0x80000000)


def _orderable_key(vals: jax.Array) -> Tuple[jax.Array, int]:
    """Map vals to uint32 keys whose unsigned order matches the value
    order (classic sign-flip encoding for floats; signed ints bias to
    excess-K so the key stays inside the radix width). Returns
    (keys, nbits) — every key fits in the low nbits."""
    if jnp.issubdtype(vals.dtype, jnp.floating):
        b = jax.lax.bitcast_convert_type(vals.astype(jnp.float32), jnp.uint32)
        return jnp.where(b >= _SIGN, ~b, b | _SIGN), 32
    if vals.dtype in (jnp.uint16, jnp.uint8):
        return vals.astype(jnp.uint32), 16
    if vals.dtype in (jnp.int16, jnp.int8):
        bias = 32768 if vals.dtype == jnp.int16 else 128
        return (vals.astype(jnp.int32) + bias).astype(jnp.uint32), 16
    b = jax.lax.bitcast_convert_type(vals.astype(jnp.int32), jnp.uint32)
    return b ^ _SIGN, 32


def _decode_float(key: jax.Array) -> jax.Array:
    """Inverse of the float32 sign-flip encoding."""
    b = jnp.where(key >= _SIGN, key ^ _SIGN, ~key)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


@partial(jax.jit, static_argnames=("nbins",))
def histogram_shifted(
    data: jax.Array, vmin: jax.Array, shift: jax.Array, nbins: int = 16
) -> jax.Array:
    """Batched ``simd_histogram_8/16`` analogue (partitioning.h:46).

    ``data`` is [..., n] integer; bin = (x - vmin) >> shift, out-of-range
    values are ignored. Returns [..., nbins] int32 counts. The one-hot
    compare + sum vectorizes on the VPU — the same arithmetic the
    reference's SIMD version does per 32-byte group.
    """
    x = data.astype(jnp.int32)
    bins = jax.lax.shift_right_logical(
        x - vmin.astype(jnp.int32), shift.astype(jnp.int32)
    )
    valid = (bins >= 0) & (bins < nbins)
    onehot = (
        bins[..., None] == jnp.arange(nbins, dtype=jnp.int32)
    ) & valid[..., None]
    return onehot.sum(axis=-2, dtype=jnp.int32)


@partial(jax.jit, static_argnames=("q_min", "q_max", "keep_max"))
def _partition_device(vals, q_min: int, q_max: int, keep_max: bool):
    keys, nbits = _orderable_key(vals)
    # invert WITHIN the radix width: ~keys on a 16-bit key would set high
    # bits the nbits-step descent never probes (keep_max would no-op)
    inv_mask = jnp.uint32(0xFFFFFFFF if nbits == 32 else (1 << nbits) - 1)
    if keep_max:  # select the q LARGEST: reverse the key order
        keys = keys ^ inv_mask

    # Bitwise radix descent for the q_min-th smallest key: grow t from the
    # MSB, keeping the invariant count(keys < t) < q_min; the maximal such
    # t IS that key (each count is one vectorized reduce over the row).
    def step(i, t):
        cand = t | (jnp.uint32(1) << (nbits - 1 - i))
        below = jnp.sum(keys < cand, axis=-1, dtype=jnp.int32)
        return jnp.where(below[..., None] < q_min, cand, t)

    t0 = jnp.zeros(keys.shape[:-1] + (1,), jnp.uint32)
    thresh_key = jax.lax.fori_loop(0, nbits, step, t0)

    count_lt = jnp.sum(keys < thresh_key, axis=-1, dtype=jnp.int32)
    is_eq = keys == thresh_key
    n_eq = jnp.sum(is_eq, axis=-1, dtype=jnp.int32)
    # fuzzy: admit ties up to q_max; q_out lands in [q_min, q_max]
    q_out = jnp.clip(count_lt + n_eq, q_min, q_max)
    n_eq_keep = q_out - count_lt

    tie_rank = jnp.cumsum(is_eq, axis=-1) - 1
    keep = (keys < thresh_key) | (is_eq & (tie_rank < n_eq_keep[..., None]))
    # stable partition: kept elements first, original order preserved
    order = jnp.argsort(~keep, axis=-1, stable=True)

    tk = thresh_key.squeeze(-1)
    if keep_max:
        tk = tk ^ inv_mask
    if jnp.issubdtype(vals.dtype, jnp.floating):
        thresh = _decode_float(tk).astype(vals.dtype)
    elif vals.dtype in (jnp.uint16, jnp.uint8):
        thresh = tk.astype(vals.dtype)
    elif vals.dtype in (jnp.int16, jnp.int8):
        bias = 32768 if vals.dtype == jnp.int16 else 128
        thresh = (tk.astype(jnp.int32) - bias).astype(vals.dtype)
    else:
        thresh = jax.lax.bitcast_convert_type(tk ^ _SIGN, jnp.int32).astype(
            vals.dtype
        )
    return order, thresh, q_out


def partition_fuzzy(
    vals,
    ids: Optional[np.ndarray] = None,
    q_min: Optional[int] = None,
    q_max: Optional[int] = None,
    *,
    keep_max: bool = False,
):
    """Batched fuzzy partition (partitioning.h:25 ``partition_fuzzy``).

    vals: [..., n]. Reorders each row so its first ``q`` elements are all
    <= (>= for keep_max) the remaining ones, with q in [q_min, q_max]
    chosen to absorb ties cheaply (reference CMax/CMin semantics). Returns
    (vals_out, ids_out, thresh, q_out); ids_out is None when ids is None.
    Unlike the reference the tail q:n is preserved, not destroyed.
    """
    vals = jnp.asarray(vals)
    if q_min is None:
        raise ValueError("q_min is required")
    if q_max is None:
        q_max = q_min
    n = vals.shape[-1]
    if not 0 < q_min <= q_max <= n:
        raise ValueError(
            f"need 0 < q_min <= q_max <= n, got {q_min},{q_max},{n}"
        )
    order, thresh, q_out = _partition_device(vals, q_min, q_max, keep_max)
    vals_out = jnp.take_along_axis(vals, order, axis=-1)
    ids_out = None
    if ids is not None:
        ids_out = jnp.take_along_axis(jnp.asarray(ids), order, axis=-1)
    return vals_out, ids_out, thresh, q_out
