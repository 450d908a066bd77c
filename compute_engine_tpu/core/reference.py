"""Packed-word reference binary convolution — the in-repo semantic oracle.

This is the TPU analogue of `core/bconv2d/reference.h:35-148`: a simple,
obviously-correct implementation operating directly on packed uint32 words
that every optimised kernel (Pallas xor-popcount bgemm, MXU path) must match
bit-exactly. It is vectorised jnp (no scalar loops — the 7-deep loop nest of
the reference becomes static tap loops + broadcast xor-popcount) so it runs
under jit on CPU/TPU, but it materialises large intermediates and is not the
production path.

Zero padding (SAME with pad_value=0) is handled *exactly* for all output
types via an accumulator correction:

    accum_zero_pad = accum_one_pad
                     + sum_outside_taps (binary_zero_point - filter_tap_popcount)

which follows from `reference.h:100-102` (outside taps contribute
``binary_zero_point``) versus one-padding (outside taps contribute
``popcount(0 ^ filter_word)``). The reference engine instead restricts
zero-padding to the float-output/no-activation case and applies a post-hoc
float correction (`core/bconv2d/zero_padding_correction.h`); on TPU the exact
integer correction is cheap, so we support zero-padding for every output
type — a strict superset of the reference's capability
(`tflite/kernels/bconv2d.cc:188-200`).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .bitpack import bitpack  # noqa: F401  (re-exported for convenience)
from .params import BConv2DParams
from .transforms import (
    OutputTransform,
    apply_output_transform_bitpacked,
    apply_output_transform_float,
    apply_output_transform_int8,
)
from .types import Padding, xor_popcount

__all__ = ["bconv2d_reference", "extract_packed_patches",
           "zero_padding_accum_correction", "outside_tap_mask"]


def extract_packed_patches(x, filter_h, filter_w, stride, dilation,
                           pad_top, pad_left, out_h, out_w):
    """im2col on packed words: (N,H,W,Cp) -> (N,OH,OW,FH,FW,Cp).

    Out-of-image taps read 0-words (= +1 values), matching the reference's
    one-padded im2col (`core/bconv2d/optimized_bgemm.h:30-31`, zero_byte=0).
    """
    sh, sw = stride
    dh, dw = dilation
    # Pad enough on the bottom/right for the largest tap offset.
    need_h = (out_h - 1) * sh + (filter_h - 1) * dh + 1
    need_w = (out_w - 1) * sw + (filter_w - 1) * dw + 1
    pad_bottom = max(0, need_h - (x.shape[1] + pad_top))
    pad_right = max(0, need_w - (x.shape[2] + pad_left))
    xp = jnp.pad(x, ((0, 0), (pad_top, pad_bottom), (pad_left, pad_right),
                     (0, 0)))
    taps = []
    for fy in range(filter_h):
        row = []
        for fx in range(filter_w):
            tap = jax.lax.slice(
                xp,
                (0, fy * dh, fx * dw, 0),
                (xp.shape[0], fy * dh + (out_h - 1) * sh + 1,
                 fx * dw + (out_w - 1) * sw + 1, xp.shape[3]),
                (1, sh, sw, 1),
            )
            row.append(tap)
        taps.append(jnp.stack(row, axis=3))
    return jnp.stack(taps, axis=3)  # (N, OH, OW, FH, FW, Cp)


def outside_tap_mask(in_h, in_w, out_h, out_w, filter_h, filter_w, stride,
                     dilation, pad_top, pad_left):
    """Static bool mask [OH, OW, FH, FW]: tap reads outside the image.

    Depends only on static shapes, so it is computed with numpy and becomes a
    compile-time constant under jit.
    """
    oy = np.arange(out_h)[:, None, None, None]
    ox = np.arange(out_w)[None, :, None, None]
    fy = np.arange(filter_h)[None, None, :, None]
    fx = np.arange(filter_w)[None, None, None, :]
    in_y = oy * stride[0] - pad_top + fy * dilation[0]
    in_x = ox * stride[1] - pad_left + fx * dilation[1]
    return ~((in_y >= 0) & (in_y < in_h) & (in_x >= 0) & (in_x < in_w))


def zero_padding_accum_correction(packed_filter, params: BConv2DParams,
                                  mask):
    """Integer accumulator correction for SAME/zero padding.

    Args:
      packed_filter: (O, FH, FW, Cpg) uint32.
      mask: bool [OH, OW, FH, FW] from :func:`outside_tap_mask`.

    Returns int32 [OH, OW, O]:
      sum over outside taps of (binary_zero_point - popcount(filter_tap)).
    """
    # Per-(channel, tap) popcount of the filter words, minus the zero point.
    tap_pop = jnp.sum(jax.lax.population_count(packed_filter).astype(jnp.int32),
                      axis=-1)  # (O, FH, FW)
    delta = params.binary_zero_point - tap_pop  # (O, FH, FW)
    m = jnp.asarray(mask, jnp.int32)  # (OH, OW, FH, FW)
    return jnp.einsum("yxhw,ohw->yxo", m, delta)


def bconv2d_reference(packed_input, packed_filter, transform: OutputTransform,
                      params: BConv2DParams, output_kind: str = "float"):
    """Binary 2D convolution on packed words (semantic oracle).

    Args:
      packed_input: (N, H, W, Cp) uint32, Cp = ceil(channels_in / 32).
      packed_filter: (O, FH, FW, Cpg) uint32, Cpg = ceil-packed per-group
        depth; groups inferred from params (reference infers them from the
        filter packed depth, `tflite/kernels/bconv2d.cc:169-186`).
      transform: fused output transform (mul/bias or thresholds).
      output_kind: "float" | "int8" | "bitpacked".

    Returns (N, OH, OW, C_out) float32/int8, or (N, OH, OW, ceil(C_out/32))
    uint32 for bitpacked output.
    """
    n, in_h, in_w, cp = packed_input.shape
    c_out, filter_h, filter_w, cpg = packed_filter.shape
    groups = params.groups
    if cp != groups * cpg:
        raise ValueError(
            f"packed input depth {cp} != groups {groups} * packed filter depth"
            f" {cpg}")
    if c_out % groups:
        raise ValueError("channels_out must be divisible by groups")

    out_h, out_w, pad_top, pad_left = params.output_spatial(
        in_h, in_w, filter_h, filter_w)

    patches = extract_packed_patches(
        packed_input, filter_h, filter_w, params.stride, params.dilation,
        pad_top, pad_left, out_h, out_w)  # (N, OH, OW, FH, FW, Cp)

    # Grouped xor-popcount contraction over (FH, FW, Cpg).
    o_per_g = c_out // groups
    patches = patches.reshape(n, out_h, out_w, filter_h, filter_w, groups, cpg)
    filt = packed_filter.reshape(groups, o_per_g, filter_h, filter_w, cpg)
    accum = jnp.zeros((n, out_h, out_w, groups, o_per_g), jnp.int32)
    for fy in range(filter_h):
        for fx in range(filter_w):
            # (N, OH, OW, G, 1, Cpg) ^ (G, Opg, Cpg) -> popcount-sum over Cpg
            p = patches[:, :, :, fy, fx, :, None, :]
            f = filt[:, :, fy, fx, :]
            accum = accum + jnp.sum(
                xor_popcount(p, f).astype(jnp.int32), axis=-1)
    accum = accum.reshape(n, out_h, out_w, c_out)

    if params.padding == Padding.SAME and params.pad_value == 0:
        mask = outside_tap_mask(in_h, in_w, out_h, out_w, filter_h, filter_w,
                                params.stride, params.dilation, pad_top,
                                pad_left)
        # Correction is per-group-local, but broadcasting over the full C_out
        # axis is exactly equivalent because each output channel only sees its
        # own group's filter taps.
        accum = accum + zero_padding_accum_correction(
            packed_filter, params, mask)[None]

    if output_kind == "float":
        return apply_output_transform_float(accum, transform)
    if output_kind == "int8":
        return apply_output_transform_int8(accum, transform)
    if output_kind == "bitpacked":
        return apply_output_transform_bitpacked(accum, transform)
    raise ValueError(f"unknown output_kind: {output_kind}")
