"""Output-transform math: accumulator -> final value, plus the converter-time
fusion that folds batch-norm / activation / int8-quantisation into per-channel
(multiplier, bias) pairs or bitpacked-output thresholds.

Conceptual model (reference `core/bconv2d/output_transform.h:59-92`):

  accum          xor-popcount accumulator in {0..K}, K = FH*FW*C_in_per_group
  true output    K - 2*accum   (== the +-1 float convolution result)
  float out      float(clamp(K - 2*accum, c, C)) * mul + bias
  fast form      float(clamp'(accum << 1)) * mul' + bias'
                   with clamp'_min = -C + K, clamp'_max = -c + K,
                        mul' = -mul, bias' = bias + K*mul
  int8 out       saturate(round(fast_form / scale + zero_point)), fused into
                 mul'/bias' (`tflite/kernels/bconv2d.cc:369-378`)
  bitpacked out  bit = accum > threshold[ch]
                 (`core/bconv2d/output_transform.h:160-168`), thresholds from
                 `mlir/transforms/optimize.cc:128-188`, which REQUIRES the
                 filter weights pre-multiplied by sign(mul) per channel.

Fusion functions here run host-side in float64 (matching the reference's use
of `double` in `bconv2d.cc:369-378`) and return float32/int32 numpy arrays.
Apply functions are pure jnp and run on device inside jitted code; the Pallas
kernels implement the same epilogues fused into the GEMM.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from .types import Activation, round_half_away, saturate_int8
from .bitpack import bitpack

INT32_MIN = np.int32(np.iinfo(np.int32).min)
INT32_MAX = np.int32(np.iinfo(np.int32).max)


def nominal_activation_range(activation: Activation):
    """Clamp range of the fused activation in the conceptual (-K..K) domain.

    Matches TFLite ``CalculateActivationRange`` as used at
    `tflite/kernels/bconv2d.cc:380-382` and the table at
    `mlir/transforms/optimize.cc:225-231`.
    """
    if activation == Activation.RELU:
        return 0, int(INT32_MAX)
    if activation == Activation.RELU_N1_TO_1:
        return -1, 1
    if activation == Activation.RELU6:
        return 0, 6
    return int(INT32_MIN), int(INT32_MAX)


@dataclasses.dataclass(frozen=True)
class OutputTransform:
    """Parameters to map int32 accumulators to the final output.

    Exactly one of (multiplier, bias) [float/int8 output] or thresholds
    [bitpacked output] is set, mirroring the three ``OutputTransform<T>``
    specialisations in `core/bconv2d/output_transform.h:93-168`.
    """

    # For float / int8 output: transformed clamps + per-channel mul'/bias'.
    clamp_min: int = int(INT32_MIN)
    clamp_max: int = int(INT32_MAX)
    multiplier: np.ndarray | None = None  # float32 [C_out]
    bias: np.ndarray | None = None        # float32 [C_out]
    # For bitpacked output: per-channel int32 thresholds.
    thresholds: np.ndarray | None = None  # int32 [C_out]


def fuse_output_transform(
    post_activation_multiplier,
    post_activation_bias,
    backtransform_add: int,
    activation: Activation = Activation.NONE,
    output_scale: float | None = None,
    output_zero_point: int = 0,
) -> OutputTransform:
    """Fold back-transform (+ optional int8 requantisation) into mul'/bias'.

    Reference: `tflite/kernels/bconv2d.cc:353-389` (``OneTimeSetup``):
      mul'  = -post_mul / scale
      bias' = (post_bias + K * post_mul) / scale + zero_point
      clamp'_min = -nominal_clamp_max + K,  clamp'_max = -nominal_clamp_min + K
    with the nominal clamps first clipped to [-K, K].
    """
    post_mul = np.asarray(post_activation_multiplier, np.float64)
    post_bias = np.asarray(post_activation_bias, np.float64)
    k = float(backtransform_add)
    scale = 1.0 if output_scale is None else float(output_scale)
    zp = 0.0 if output_scale is None else float(output_zero_point)

    multiplier = (-1.0 * post_mul / scale).astype(np.float32)
    bias = ((post_bias + k * post_mul) / scale + zp).astype(np.float32)

    nominal_min, nominal_max = nominal_activation_range(activation)
    nominal_min = max(nominal_min, -backtransform_add)
    nominal_max = min(nominal_max, backtransform_add)
    return OutputTransform(
        clamp_min=-nominal_max + backtransform_add,
        clamp_max=-nominal_min + backtransform_add,
        multiplier=multiplier,
        bias=bias,
    )


def compute_output_thresholds(
    post_activation_multiplier,
    post_activation_bias,
    backtransform_add: int,
    activation: Activation = Activation.NONE,
) -> np.ndarray:
    """Per-channel int32 thresholds for writing bitpacked output.

    A 1-bit (-1) is written iff ``accum > threshold``. Callers MUST
    pre-multiply the filter weights by ``sign(post_activation_multiplier)``
    per output channel (the negative-gamma weight-flip trick); see
    `mlir/transforms/optimize.cc:79-127` — output is wrong otherwise.

    Math (`mlir/transforms/optimize.cc:128-188`):
      general case:  tau = floor(0.5 * (bias / |mul| + K))
      mul == 0:      tau = -inf if bias < 0 else +inf
      clamp range not crossing 0: +-inf accordingly (constant sign).
    """
    mult = np.asarray(post_activation_multiplier, np.float32)
    bias = np.asarray(post_activation_bias, np.float32)
    k = int(backtransform_add)
    clamp_min, clamp_max = nominal_activation_range(activation)
    clamp_min = max(clamp_min, -k)
    clamp_max = min(clamp_max, k)

    out = np.empty(mult.shape, np.int32)
    for i in range(mult.size):
        m, b = float(mult.flat[i]), float(bias.flat[i])
        if m == 0.0:
            out.flat[i] = INT32_MIN if b < 0.0 else INT32_MAX
            continue
        eff_min, eff_max = (clamp_min, clamp_max) if m > 0 else (-clamp_max, -clamp_min)
        range_start = eff_min * abs(m) + b
        range_end = eff_max * abs(m) + b
        if range_start < 0 and range_end < 0:
            out.flat[i] = INT32_MIN  # always write a 1-bit
        elif range_start >= 0 and range_end >= 0:
            out.flat[i] = INT32_MAX  # always write a 0-bit
        else:
            out.flat[i] = np.int32(np.floor(0.5 * (b / abs(m) + k)))
    return out


# ---------------------------------------------------------------------------
# Device-side application (jnp; used by the reference path and as the
# semantic definition the Pallas fused epilogues must match).
# ---------------------------------------------------------------------------


def apply_output_transform_float(accum, transform: OutputTransform):
    """float(clamp'(accum << 1)) * mul' + bias'
    (`core/bconv2d/output_transform.h:100-106`). ``accum``: int32 [..., C]."""
    x = jnp.clip(accum * 2, transform.clamp_min, transform.clamp_max)
    mul = jnp.asarray(transform.multiplier, jnp.float32)
    bias = jnp.asarray(transform.bias, jnp.float32)
    return x.astype(jnp.float32) * mul + bias


def apply_output_transform_int8(accum, transform: OutputTransform):
    """Float transform + round-to-nearest + int8 saturation
    (`core/bconv2d/output_transform.h:132-143`)."""
    y = apply_output_transform_float(accum, transform)
    return saturate_int8(round_half_away(y).astype(jnp.int32))


def apply_output_transform_bitpacked(accum, transform: OutputTransform):
    """bit = accum > threshold, packed along the channel axis
    (`core/bconv2d/output_transform.h:164-167`, packing as in
    `core/bconv2d/reference.h:119-135`)."""
    thr = jnp.asarray(transform.thresholds, jnp.int32)
    return bitpack(accum > thr)
