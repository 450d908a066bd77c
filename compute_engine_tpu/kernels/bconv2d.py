"""Optimised binary 2D convolution paths.

Two production lowerings, selected by the op layer (``ops.bconv2d``):

1. ``bconv2d_bgemm``  — conv-as-GEMM on packed words: XLA-side packed im2col
   (pure data movement, fused by XLA) followed by the Pallas xor-popcount
   BGEMM with fused epilogue. TPU counterpart of
   `core/bconv2d/optimized_bgemm.h:64-184` (im2col + ruy BGemm).

2. ``bconv2d_mxu``    — unpack packed operands to +-1 bf16 and run the
   convolution on the MXU via ``lax.conv_general_dilated``. +-1 products are
   exact in bf16 and accumulation is fp32, so ``true_output = K - 2*accum``
   is exact; the output transform is then applied in the conceptual domain.
   There is no reference analogue — this path exists because the TPU's
   systolic array at bf16 outpaces VPU popcounting for large convs; the
   packed format still buys 32x weight-memory compression in HBM.

Both paths implement zero-padding (SAME, pad_value=0) exactly for all output
kinds via integer accumulator corrections, superseding the reference's
float-only border correction (`core/bconv2d/zero_padding_correction.h`).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.bitpack import bitpack, bitunpack
from ..core.params import BConv2DParams
from ..core.reference import (
    extract_packed_patches,
    outside_tap_mask,
    zero_padding_accum_correction,
)
from ..core.transforms import (
    OutputTransform,
    apply_output_transform_bitpacked,
    apply_output_transform_float,
    apply_output_transform_int8,
)
from ..core.types import Padding, ceil_div as _cdiv
from .bgemm import bgemm

__all__ = ["bconv2d_bgemm", "bconv2d_mxu", "bconv2d_mxu_float_in",
           "bconv2d_mxu_s2d"]


def _apply_transform(accum, transform, output_kind):
    if output_kind == "float":
        return apply_output_transform_float(accum, transform)
    if output_kind == "int8":
        return apply_output_transform_int8(accum, transform)
    if output_kind == "bitpacked":
        return apply_output_transform_bitpacked(accum, transform)
    raise ValueError(output_kind)


def bconv2d_bgemm(packed_input, packed_filter, transform: OutputTransform,
                  params: BConv2DParams, output_kind: str = "float"):
    """Packed im2col + Pallas xor-popcount BGEMM.

    Args/returns: same contract as ``core.reference.bconv2d_reference``.
    Groups are handled by blocking the GEMM per group (grouped filters keep
    per-group packed depth, `tflite/kernels/bconv2d.cc:169-186`).
    """
    n, in_h, in_w, cp = packed_input.shape
    c_out, fh, fw, cpg = packed_filter.shape
    groups = params.groups
    out_h, out_w, pad_top, pad_left = params.output_spatial(in_h, in_w, fh, fw)

    patches = extract_packed_patches(
        packed_input, fh, fw, params.stride, params.dilation, pad_top,
        pad_left, out_h, out_w)  # (N, OH, OW, FH, FW, Cp)
    m = n * out_h * out_w

    zero_pad = params.padding == Padding.SAME and params.pad_value == 0
    # The fused epilogues cover all output kinds; only zero-padding (which
    # needs a position-dependent accumulator correction) and grouped convs
    # fall back to raw accumulators + XLA-side transform.
    needs_accum = zero_pad or groups > 1

    if groups == 1:
        lhs = patches.reshape(m, fh * fw * cp)
        rhs = packed_filter.reshape(c_out, fh * fw * cpg).T
        if needs_accum:
            accum = bgemm(lhs, rhs, out_kind="accum")
        elif output_kind == "bitpacked":
            out = bgemm(lhs, rhs, thresholds=jnp.asarray(transform.thresholds),
                        out_kind="bitpacked")
            return out.reshape(n, out_h, out_w, out.shape[-1])
        else:
            out = bgemm(lhs, rhs, jnp.asarray(transform.multiplier),
                        jnp.asarray(transform.bias),
                        clamp_min=transform.clamp_min,
                        clamp_max=transform.clamp_max, out_kind=output_kind)
            return out.reshape(n, out_h, out_w, c_out)
    else:
        o_per_g = c_out // groups
        p = patches.reshape(m, fh * fw, groups, cpg)
        filt = packed_filter.reshape(groups, o_per_g, fh * fw * cpg)
        accums = []
        for g in range(groups):
            lhs_g = p[:, :, g, :].reshape(m, fh * fw * cpg)
            accums.append(bgemm(lhs_g, filt[g].T, out_kind="accum"))
        accum = jnp.concatenate(accums, axis=-1)

    accum = accum.reshape(n, out_h, out_w, c_out)
    if zero_pad:
        mask = outside_tap_mask(in_h, in_w, out_h, out_w, fh, fw,
                                params.stride, params.dilation, pad_top,
                                pad_left)
        accum = accum + zero_padding_accum_correction(
            packed_filter, params, mask)[None]
    return _apply_transform(accum, transform, output_kind)


def _true_output_transform(true_out, transform: OutputTransform,
                           params: BConv2DParams, k: int, output_kind: str,
                           exact_parity: bool = True):
    """Apply the output transform given the conceptual +-1 conv result.

    When every window tap is a real +-1 value (``exact_parity``),
    ``K - true_out == 2*accum`` holds exactly, so the transform is applied
    to ``true_out`` DIRECTLY: ``clip(K - t, c', C')`` equals
    ``clip(2*accum, c', C')`` bit-for-bit, and the bitpacked predicate
    ``accum > thr`` equals ``t < K - 2*clip(thr, -1, K)`` (thresholds are
    clipped into the accumulator's [0, K] range first, which also
    neutralises the +-INT32_MAX sentinels without overflow). The direct
    form saves an integer div/mul round-trip over the whole accumulator —
    measured 69us/block at 56x56x64 b128 on v5e.

    ``exact_parity=False`` (zero-padding with odd per-group depth — the
    reference's floor(c/2) zero-point quirk, `reference.h:74-77`)
    reconstructs integer accumulators with the reference's floor division.
    """
    if not exact_parity:
        accum = ((k - true_out.astype(jnp.int32)) // 2).astype(jnp.int32)
        return _apply_transform(accum, transform, output_kind)
    t = true_out.astype(jnp.int32)
    if output_kind in ("float", "int8"):
        y = jnp.clip(k - t, transform.clamp_min, transform.clamp_max)
        y = (y.astype(jnp.float32)
             * jnp.asarray(transform.multiplier, jnp.float32)
             + jnp.asarray(transform.bias, jnp.float32))
        if output_kind == "float":
            return y
        from ..core.types import round_half_away, saturate_int8
        return saturate_int8(round_half_away(y).astype(jnp.int32))
    if output_kind == "bitpacked":
        thr = jnp.clip(jnp.asarray(transform.thresholds, jnp.int32), -1, k)
        return bitpack(t < (k - 2 * thr))
    raise ValueError(output_kind)


def bconv2d_mxu(packed_input, packed_filter, transform: OutputTransform,
                params: BConv2DParams, output_kind: str = "float",
                unpacked_filter=None):
    """Binary conv on the MXU: unpack to +-1 bf16, conv, exact transform.

    ``unpacked_filter`` ((FH, FW, Cg, O) bf16 +-1) may be passed to skip
    per-call filter unpacking (the converter can choose to store it).
    """
    n, in_h, in_w, cp = packed_input.shape
    c_out, fh, fw, cpg = packed_filter.shape
    groups = params.groups
    c_in = params.channels_in
    cg = c_in // groups
    out_h, out_w, pad_top, pad_left = params.output_spatial(in_h, in_w, fh, fw)
    k = params.backtransform_add(fh, fw)

    zero_pad = params.padding == Padding.SAME and params.pad_value == 0

    # Padding strategy (perf-critical — an explicit jnp.pad of the unpacked
    # bf16 activations with a non-zero constant costs ~25x a fused conv pad
    # on TPU, measured on v5e):
    #   one-padding: pad the PACKED words with 0-words (= +1 values) before
    #     unpacking — 32x less data to pad, and the conv stays VALID.
    #   zero-padding: the literal 0.0 pad is exactly the conv's native SAME
    #     zero padding, which XLA fuses into the convolution.
    conv_padding = "VALID"
    if params.padding == Padding.SAME:
        if zero_pad:
            conv_padding = "SAME"  # TFLite SAME == TF SAME by construction
        else:
            eff_h = (fh - 1) * params.dilation[0] + 1
            eff_w = (fw - 1) * params.dilation[1] + 1
            pad_bottom = max(0, (out_h - 1) * params.stride[0] + eff_h
                             - (in_h + pad_top))
            pad_right = max(0, (out_w - 1) * params.stride[1] + eff_w
                            - (in_w + pad_left))
            packed_input = jnp.pad(
                packed_input,
                ((0, 0), (pad_top, pad_bottom), (pad_left, pad_right),
                 (0, 0)))

    x = bitunpack(packed_input, c_in, dtype=jnp.bfloat16)
    if unpacked_filter is None:
        w = bitunpack(packed_filter, cg, dtype=jnp.bfloat16)
        w = jnp.transpose(w, (1, 2, 3, 0))  # (FH, FW, Cg, O)
    else:
        w = unpacked_filter

    true_out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=params.stride,
        padding=conv_padding,
        rhs_dilation=params.dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )

    odd_zero_pad = zero_pad and (cg % 2)
    if odd_zero_pad:
        # Match the reference's integer zero-point quirk for odd per-group
        # depth: each outside tap contributes floor(c/2) to the accumulator
        # (`reference.h:74-77`), i.e. (c mod 2) to the true output.
        mask = outside_tap_mask(in_h, in_w, out_h, out_w, fh, fw,
                                params.stride, params.dilation, pad_top,
                                pad_left)
        n_outside = jnp.asarray(np.sum(mask, axis=(2, 3)), jnp.float32)
        true_out = true_out + n_outside[None, :, :, None]

    return _true_output_transform(true_out, transform, params, k, output_kind,
                                  exact_parity=not odd_zero_pad)


def _s2d_weights(w, fh, fw, c, o, stride, conv_dtype):
    """Retile a (FH, FW, C, O) filter for space-to-depth(2) execution.

    For stride 1 the output keeps its own 2x2 phase structure (4*O channels);
    for stride 2 the output phases collapse (stride-2 output index i reads
    input rows 2i+dy only). Tap (dy, dx) of output phase (di, dj) lands at
    s2d-cell offset ((di+dy)//2, (dj+dx)//2), input sub-phase
    ((di+dy)%2, (dj+dx)%2); every (dy, dx) maps to a unique slot, the rest of
    the retiled filter is zero. Zeros are exact in the +-1 formulation: they
    contribute nothing to the integer-valued conv result, so the accumulator
    back-transform is unchanged.
    """
    if stride == 1:
        qh, qw = fh // 2 + 1, fw // 2 + 1
        phases = [(0, 0), (0, 1), (1, 0), (1, 1)]
    else:
        qh, qw = (fh - 1) // 2 + 1, (fw - 1) // 2 + 1
        phases = [(0, 0)]
    w2 = jnp.zeros((qh, qw, 4 * c, len(phases) * o), conv_dtype)
    for p, (di, dj) in enumerate(phases):
        for dy in range(fh):
            qy, u = divmod(di + dy, 2)
            for dx in range(fw):
                qx, v = divmod(dj + dx, 2)
                ch = (u * 2 + v) * c
                w2 = w2.at[qy, qx, ch:ch + c, p * o:(p + 1) * o].set(
                    w[dy, dx].astype(conv_dtype))
    return w2, qh, qw, len(phases)


def _s2d(x):
    """(B, 2H, 2W, C) -> (B, H, W, 4C), cell channels ordered (u, v, c)."""
    b, h2, w2, c = x.shape
    x = x.reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, h2 // 2, w2 // 2, 4 * c)


def bconv2d_mxu_s2d(x, packed_filter, transform: OutputTransform,
                    params: BConv2DParams, output_kind: str = "float",
                    unpacked_filter=None, conv_dtype=jnp.int8):
    """MXU binary conv via space-to-depth(2): float activations in.

    The early binary sections (56x56x64, 28x28x128) underfill the MXU's 128
    input/output lanes. Space-to-depth folds a 2x2 spatial cell into the
    channel dim (C -> 4C, O -> 4O for stride 1), trading ~1.8x more MACs
    (the retiled filter is ~56% dense) for full lane occupancy — the TPU
    counterpart of the reference's im2col layout tuning
    (`core/bconv2d/optimized_bgemm.h:19-61`). Exactness: all operands stay
    {-1, 0, +1}, padding is applied explicitly in the sign domain before the
    reshape, so the integer conv result equals the direct formulation's.

    Requires groups == 1, dilation == 1, square stride in {1, 2}, and even
    channels_in (the odd-depth zero-padding quirk is not retiled).
    """
    n, in_h, in_w, c_in = x.shape
    c_out, fh, fw, cpg = packed_filter.shape
    if c_in != params.channels_in:
        raise ValueError(f"input channels {c_in} != params.channels_in "
                         f"{params.channels_in}")
    if (params.groups != 1 or params.dilation != (1, 1)
            or params.stride[0] != params.stride[1]
            or params.stride[0] not in (1, 2) or c_in % 2):
        raise ValueError("s2d path requires groups=1, dilation=1, square "
                         "stride in {1,2}, even channels_in")
    s = params.stride[0]
    out_h, out_w, pad_top, pad_left = params.output_spatial(in_h, in_w, fh, fw)
    k = params.backtransform_add(fh, fw)
    acc_dtype = jnp.int32 if conv_dtype == jnp.int8 else jnp.float32

    xq = jnp.where(x < 0, -1, 1).astype(conv_dtype)
    if unpacked_filter is None:
        w = bitunpack(packed_filter, c_in, dtype=conv_dtype)
        w = jnp.transpose(w, (1, 2, 3, 0))  # (FH, FW, C, O)
    else:
        w = jnp.asarray(unpacked_filter).astype(conv_dtype)
    w2, qh, qw, n_phases = _s2d_weights(w, fh, fw, c_in, c_out, s, conv_dtype)

    # Explicit padding in the sign domain: one-padding pads +1, zero-padding
    # pads the literal 0 (exact — zeros contribute nothing, matching the
    # even-depth zero-padding semantics). Rows beyond the true SAME extent
    # (alignment to even cells) are never read by kept outputs.
    if s == 1:
        cells_h, cells_w = _cdiv(out_h, 2), _cdiv(out_w, 2)
    else:
        cells_h, cells_w = out_h, out_w
    hp = 2 * (cells_h + qh - 1)
    wp = 2 * (cells_w + qw - 1)
    pad_val = 1 if (params.padding == Padding.SAME
                    and params.pad_value == 1) else 0
    # Clamp to >= 0: a stride-2 VALID conv with unconsumed trailing rows
    # has in_h > the s2d extent hp (those rows are never read by kept
    # outputs); a negative pad amount would crash jnp.pad. Cropping to the
    # consumed extent first is exact for the same reason.
    pad_b = hp - in_h - pad_top
    pad_r = wp - in_w - pad_left
    if pad_b < 0:
        xq = xq[:, :in_h + pad_b, :, :]
        pad_b = 0
    if pad_r < 0:
        xq = xq[:, :, :in_w + pad_r, :]
        pad_r = 0
    xq = jnp.pad(
        xq,
        ((0, 0), (pad_top, pad_b), (pad_left, pad_r), (0, 0)),
        constant_values=pad_val)

    y = jax.lax.conv_general_dilated(
        _s2d(xq), w2,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype,
    )  # (N, cells_h, cells_w, n_phases * c_out)

    if s == 1:
        # Inverse space-to-depth of the 2x2 output phases, then crop.
        y = y.reshape(n, cells_h, cells_w, 2, 2, c_out)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            n, 2 * cells_h, 2 * cells_w, c_out)
        true_out = y[:, :out_h, :out_w, :]
    else:
        true_out = y

    return _true_output_transform(true_out, transform, params, k, output_kind)


def bconv2d_mxu_float_in(x, packed_filter, transform: OutputTransform,
                         params: BConv2DParams, output_kind: str = "float",
                         unpacked_filter=None, conv_dtype=jnp.bfloat16):
    """MXU binary conv taking *float* activations (pre-quantize).

    The model runtime holds float activations between binary blocks (residual
    adds keep them float); routing them through ``quantize`` -> packed ->
    unpack -> conv costs two extra full-activation memory passes. This path
    signs directly to +-1 (``bit = x < 0`` convention is exactly
    ``sign with sign(0)=+1``) and runs the conv on the MXU. One-padding
    (pad_value=1) pads the literal +1 in the tiny int8 sign domain and runs
    the conv VALID — measured faster on v5e than SAME + post-conv filter-sum
    correction (the round-2 formulation), and every window tap is then a
    real +-1 so the direct-parity output transform applies. Zero-padding
    uses the conv's native fused SAME (the literal 0.0 pad IS the zero-pad
    semantic). Pass ``unpacked_filter`` ((FH, FW, Cg, O) +-1) to skip the
    per-call bit-unpack — measured 90us/block at 56x56x64 b128; the model
    runtime pre-unpacks once at load (`builder.prepare_runtime_arrays`),
    the analogue of ruy's cached weight packing
    (`core/bconv2d/optimized_bgemm.h:133-134`).
    """
    n, in_h, in_w, c_in = x.shape
    c_out, fh, fw, cpg = packed_filter.shape
    groups = params.groups
    cg = c_in // groups
    if c_in != params.channels_in:
        raise ValueError(f"input channels {c_in} != params.channels_in "
                         f"{params.channels_in}")
    out_h, out_w, pad_top, pad_left = params.output_spatial(in_h, in_w, fh, fw)
    k = params.backtransform_add(fh, fw)
    zero_pad = params.padding == Padding.SAME and params.pad_value == 0

    # +-1 operands are exact in bf16 (fp32 MXU accumulation) and in int8
    # (int32 accumulation, 2x MXU rate on v5e).
    acc_dtype = jnp.int32 if conv_dtype == jnp.int8 else jnp.float32
    xq = jnp.where(x < 0, -1, 1).astype(conv_dtype)
    if unpacked_filter is None:
        w = bitunpack(packed_filter, cg, dtype=conv_dtype)
        w = jnp.transpose(w, (1, 2, 3, 0))  # (FH, FW, Cg, O)
    else:
        w = jnp.asarray(unpacked_filter).astype(conv_dtype)

    one_pad = params.padding == Padding.SAME and not zero_pad
    conv_padding = "SAME" if zero_pad else "VALID"
    if one_pad:
        eff_h = (fh - 1) * params.dilation[0] + 1
        eff_w = (fw - 1) * params.dilation[1] + 1
        pad_bottom = max(0, (out_h - 1) * params.stride[0] + eff_h
                         - (in_h + pad_top))
        pad_right = max(0, (out_w - 1) * params.stride[1] + eff_w
                        - (in_w + pad_left))
        xq = jnp.pad(
            xq,
            ((0, 0), (pad_top, pad_bottom), (pad_left, pad_right), (0, 0)),
            constant_values=jnp.ones((), conv_dtype))

    true_out = jax.lax.conv_general_dilated(
        xq, w,
        window_strides=params.stride,
        padding=conv_padding,
        rhs_dilation=params.dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=acc_dtype,
    )

    odd_zero_pad = zero_pad and (cg % 2)
    if odd_zero_pad:
        # Reference integer zero-point quirk (see bconv2d_mxu).
        mask = outside_tap_mask(in_h, in_w, out_h, out_w, fh, fw,
                                params.stride, params.dilation, pad_top,
                                pad_left)
        n_outside = jnp.asarray(np.sum(mask, axis=(2, 3)), acc_dtype)
        true_out = true_out + n_outside[None, :, :, None]

    return _true_output_transform(true_out, transform, params, k, output_kind,
                                  exact_parity=not odd_zero_pad)
