"""Quantize / Dequantize boundary ops: dense <-> bitpacked.

TPU-native counterpart of the ``LceQuantize`` / ``LceDequantize`` custom ops
(`tflite/kernels/quantization.cc`): quantize packs float/int8/bool to uint32
words; dequantize unpacks to +-1 float, to int8 ``zp -+ round(1/scale)``
clamped to the int8 range (`quantization.cc:130-138`), or to bool.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.bitpack import bitpack, bitunpack

__all__ = ["quantize", "dequantize"]


def quantize(x, zero_point: int = 0):
    """Pack the channel (last) axis to bitpacked uint32.

    float: bit = x < 0; int8: bit = x < zero_point; bool: bit = x.
    Reference: `tflite/kernels/quantization.cc:76-108`.
    """
    return bitpack(x, zero_point=zero_point)


def dequantize(packed, channels: int, dtype=jnp.float32,
               scale: float | None = None, zero_point: int = 0):
    """Unpack bitpacked words to +-1 values.

    For int8 output the +-1 is expressed in the quantised domain:
    ``zero_point -+ round(1/scale)`` saturated to int8
    (`tflite/kernels/quantization.cc:130-138`).
    """
    if dtype == jnp.int8:
        if scale is None:
            raise ValueError("int8 dequantize requires a scale")
        step = int(np.round(1.0 / scale))
        one = int(np.clip(zero_point + step, -128, 127))
        minus_one = int(np.clip(zero_point - step, -128, 127))
        return bitunpack(packed, channels, zero_bit_result=one,
                         one_bit_result=minus_one, dtype=jnp.int8)
    if dtype == jnp.bool_:
        return bitunpack(packed, channels, dtype=jnp.bool_)
    return bitunpack(packed, channels, dtype=dtype)
