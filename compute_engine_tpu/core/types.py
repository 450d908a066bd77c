"""Core type and constant definitions for the TPU-native binary compute engine.

Mirrors the semantic contract of the reference engine's
``larq_compute_engine/core/types.h:38-104`` (``TBitpacked``,
``bitpacking_bitwidth``, ``xor_popcount``, int8 ``saturate``/``round``) with a
TPU-first realisation:

* Packed words are ``uint32`` (the reference uses ``int32``; only bitwise
  XOR/AND/popcount are ever applied so signedness is irrelevant, and unsigned
  words avoid bitcast noise in JAX/Pallas).
* ``xor_popcount`` is ``jax.lax.population_count`` on the VPU instead of a
  scalar builtin.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp

# Number of values packed into one word. Reference:
# `core/types.h:41` (`bitpacking_bitwidth = 32`).
BITWIDTH = 32

# Packed-word dtype (reference `TBitpacked = std::int32_t`, `core/types.h:41`).
PACKED_DTYPE = jnp.uint32

# Accumulator dtype for xor-popcount sums. The reference chooses int16 on ARM
# when `depth + 512 < 2^16` (`tflite/kernels/bconv2d.cc:522-536`); on TPU the
# VPU is natively 32-bit so we always accumulate in int32.
ACCUM_DTYPE = jnp.int32


class Padding(enum.Enum):
    """Convolution padding mode.

    ``SAME`` uses the TFLite SAME-padding formula. ``pad_value`` on the op
    distinguishes one-padding (pad with +1 bits) from zero-padding (pad with
    the value 0, which requires an accumulator correction; reference
    `core/bconv2d/reference.h:70-102` and `zero_padding_correction.h`).
    """

    VALID = "VALID"
    SAME = "SAME"


class Activation(enum.Enum):
    """Fused activation function, in the *conceptual* (-K..K) output domain.

    Matches the TFLite enum subset accepted by the reference op
    (`tflite/kernels/utils.h:10-27`).
    """

    NONE = "NONE"
    RELU = "RELU"
    RELU_N1_TO_1 = "RELU_N1_TO_1"
    RELU6 = "RELU6"


def xor_popcount(a, b):
    """Number of bits that differ between packed words ``a`` and ``b``.

    Reference: `core/types.h:45-48`. On TPU this lowers to VPU xor +
    population-count instructions.
    """
    return jax.lax.population_count(jnp.bitwise_xor(a, b))


def saturate_int8(x):
    """Clamp an int32 array to the int8 range and cast.

    Reference: `core/bconv2d/output_transform.h:17-27`.
    """
    return jnp.clip(x, -128, 127).astype(jnp.int8)


def round_half_away(y):
    """Round-to-nearest with ties away from zero (C++ ``std::round``).

    The reference uses ``TfLiteRound`` (`core/bconv2d/output_transform.h:31-44`)
    whose tie behaviour is explicitly unspecified; we match the x86 reference
    behaviour (half away from zero). ``jnp.round`` would round half-to-even.
    """
    return jnp.where(y >= 0, jnp.floor(y + 0.5), jnp.ceil(y - 0.5))


def ceil_div(a: int, b: int) -> int:
    """Static ceiling division (reference `core/types.h` ``CeilDiv``)."""
    return -(-a // b)


def packed_size(channels: int) -> int:
    """Number of packed words needed for ``channels`` values.

    Reference: `core/bitpacking/bitpack.h:24-26` (``GetBitpackedSize``).
    """
    return ceil_div(channels, BITWIDTH)
