"""Binary max-pooling on packed words.

Max over {-1, +1} values is bitwise **AND** over the packed representation
(a set bit encodes -1, so the max is +1/clear unless every value is -1/set).
Reference: `core/bmaxpool.h:23-88` — window initialised to all-ones and
clamped to the valid input region, which is exactly ``reduce_window`` with an
``~0`` identity element.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .params import tflite_same_padding
from .types import PACKED_DTYPE, Padding

__all__ = ["bmaxpool", "BMaxPoolParams"]

import dataclasses


@dataclasses.dataclass(frozen=True)
class BMaxPoolParams:
    """Static pooling parameters (reference `core/bmaxpool.h:14-21`)."""

    filter_size: tuple[int, int]
    stride: tuple[int, int]
    padding: Padding = Padding.SAME


def bmaxpool(packed_input, params: BMaxPoolParams):
    """AND-reduce packed words over each pooling window.

    Args:
      packed_input: (N, H, W, Cp) uint32.

    Returns (N, OH, OW, Cp) uint32.
    """
    fh, fw = params.filter_size
    sh, sw = params.stride
    _, in_h, in_w, _ = packed_input.shape
    if params.padding == Padding.SAME:
        _, pt, pb = tflite_same_padding(in_h, fh, sh, 1)
        _, pl, pr = tflite_same_padding(in_w, fw, sw, 1)
        pad = ((0, 0), (pt, pb), (pl, pr), (0, 0))
    else:
        pad = ((0, 0), (0, 0), (0, 0), (0, 0))
    ones = PACKED_DTYPE(jnp.iinfo(PACKED_DTYPE).max)  # ~0: identity for AND
    return jax.lax.reduce_window(
        packed_input,
        ones,
        jnp.bitwise_and,
        window_dimensions=(1, fh, fw, 1),
        window_strides=(1, sh, sw, 1),
        padding=pad,
    )
