"""Bitpacking: dense tensors <-> packed uint32 words along the channel axis.

Semantic contract (must match the reference bit-for-bit so that packed
artifacts and xor-popcount accumulators agree):

* 32 values per word, packed along the **last** axis, LSB-first: bit ``j`` of
  word ``w`` holds element ``32*w + j`` (reference
  `core/bitpacking/bitpack.h:33-111`, bitfield order).
* A **set** bit encodes a *negative* value: ``bit = (value < zero_point)``
  (floating-point inputs use ``zero_point = 0``). A set bit therefore
  represents -1 and a clear bit +1 (`core/bitpacking/bitpack.h:78-110,159-191`).
* Padding bits (when ``channels % 32 != 0``) are always **0**, i.e. +1
  (`core/bitpacking/bitpack.h:238-244`).
* Out-of-range zero-points short-circuit to all-zeros / all-ones-with-zero-
  padding fills (`core/bitpacking/bitpack.h:259-288`).
* Unpacking maps set bits to ``one_bit_result`` (default -1) and clear bits to
  ``zero_bit_result`` (default +1) (`core/bitpacking/bitpack.h:310-346`).

These are pure-jnp implementations usable both inside jitted model code and
host-side (converter); the Pallas fused variants live in
``compute_engine_tpu.kernels``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .types import BITWIDTH, PACKED_DTYPE, packed_size

__all__ = ["bitpack", "bitunpack", "bitpack_np", "packed_shape"]


def packed_shape(shape):
    """Shape after packing the last axis: ``(..., ceil(C/32))``."""
    return (*shape[:-1], packed_size(shape[-1]))


def _bit_shifts():
    # (32,) vector [1<<0, 1<<1, ..., 1<<31] — LSB-first bit order.
    return jnp.asarray(
        np.left_shift(np.uint32(1), np.arange(BITWIDTH, dtype=np.uint32)),
        dtype=PACKED_DTYPE,
    )


def bitpack(x, zero_point: int = 0):
    """Pack the last axis of ``x`` into uint32 words, 32 values per word.

    Args:
      x: array of float, int8 or bool values; packed along the last axis.
      zero_point: static int. For integer inputs, ``bit = value < zero_point``;
        for floats it must be 0. Bool inputs pack ``bit = value`` (True bits
        set), matching the reference's ``<1``-on-the-underlying-uint trick
        (`tflite/kernels/quantization.cc:88-108` packs bool via LceQuantize).

    Returns:
      uint32 array of shape ``(*x.shape[:-1], ceil(C/32))``; padding bits 0.
    """
    channels = x.shape[-1]
    n_words = packed_size(channels)

    if x.dtype == jnp.bool_:
        bits = x
    elif jnp.issubdtype(x.dtype, jnp.floating):
        if zero_point != 0:
            raise ValueError("zero_point must be 0 for floating-point input")
        bits = x < 0
    else:
        # Out-of-range zero-point fast paths (`bitpack.h:259-288`): the
        # comparison below would be wrong after casting zero_point into the
        # input dtype, so resolve statically.
        info = jnp.iinfo(x.dtype)
        if zero_point <= info.min:
            bits = jnp.zeros(x.shape, jnp.bool_)
        elif zero_point > info.max:
            bits = jnp.ones(x.shape, jnp.bool_)
        else:
            bits = x < jnp.asarray(zero_point, x.dtype)

    pad = n_words * BITWIDTH - channels
    if pad:
        # Padding bits are 0 == +1 (`bitpack.h:238-244`).
        bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])

    bits = bits.reshape(*x.shape[:-1], n_words, BITWIDTH).astype(PACKED_DTYPE)
    # Each bit occupies a distinct position, so a sum is a bitwise-or.
    return jnp.sum(bits * _bit_shifts(), axis=-1, dtype=PACKED_DTYPE)


def bitpack_np(x, zero_point: int = 0) -> np.ndarray:
    """Host-side bitpack with identical semantics to :func:`bitpack`.

    Used by the converter (which runs under ``jax.eval_shape`` where jnp ops
    would be staged out rather than executed) and host input pipelines.
    Dispatches to the native C++ library (csrc/bitpack.cc) when available,
    with a pure-numpy fallback."""
    x = np.asarray(x)
    if x.dtype in (np.float32, np.int8):
        from ..utils.native import native_bitpack

        out = native_bitpack(x, zero_point)
        if out is not None:
            return out
    channels = x.shape[-1]
    n_words = packed_size(channels)
    if x.dtype == np.bool_:
        bits = x
    elif np.issubdtype(x.dtype, np.floating):
        if zero_point != 0:
            raise ValueError("zero_point must be 0 for floating-point input")
        bits = x < 0
    else:
        info = np.iinfo(x.dtype)
        if zero_point <= info.min:
            bits = np.zeros(x.shape, np.bool_)
        elif zero_point > info.max:
            bits = np.ones(x.shape, np.bool_)
        else:
            bits = x < np.asarray(zero_point, x.dtype)
    pad = n_words * BITWIDTH - channels
    if pad:
        bits = np.concatenate(
            [bits, np.zeros((*bits.shape[:-1], pad), np.bool_)], axis=-1)
    bits = bits.reshape(*x.shape[:-1], n_words, BITWIDTH).astype(np.uint32)
    shifts = np.left_shift(np.uint32(1), np.arange(BITWIDTH, dtype=np.uint32))
    return np.bitwise_or.reduce(bits * shifts, axis=-1).astype(np.uint32)


def bitunpack(packed, channels: int, zero_bit_result=1, one_bit_result=-1,
              dtype=jnp.float32):
    """Unpack uint32 words back to ``channels`` values along the last axis.

    Set bits map to ``one_bit_result`` (-1 by default), clear bits to
    ``zero_bit_result`` (+1). Reference: `core/bitpacking/bitpack.h:310-346`.
    """
    n_words = packed.shape[-1]
    if n_words != packed_size(channels):
        raise ValueError(
            f"packed last dim {n_words} does not match channels={channels}")
    shifts = jnp.arange(BITWIDTH, dtype=PACKED_DTYPE)
    bits = jnp.bitwise_and(
        jnp.right_shift(packed[..., None], shifts), PACKED_DTYPE(1))
    bits = bits.reshape(*packed.shape[:-1], n_words * BITWIDTH)[..., :channels]
    if dtype == jnp.bool_:
        return bits.astype(jnp.bool_)
    return jnp.where(
        bits != 0,
        jnp.asarray(one_bit_result, dtype),
        jnp.asarray(zero_bit_result, dtype),
    )
