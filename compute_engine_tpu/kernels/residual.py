"""Fused binary residual block: sign + 3x3 one-padded bconv + BN + add.

The QuickNet-family hot loop is ``x = x + BN(bconv3x3(sign(x)))``. This
kernel performs the whole block in one VMEM residency: read the x tile
once, sign it in-register, build the one-padded tap matrix in VMEM, run the
3x3 conv as int8 MXU matmuls, apply the output transform, and add the
residual before the single output write.

**Status: explicit opt-in (``kernel="residual"``), NOT auto-selected.**
Round-3 measurement (honest differencing timer, v5e, batch 128) showed the
hypothesis behind this kernel was wrong for XLA on TPU: XLA already fuses
the sign cast into the producing block's epilogue and the residual add into
the conv's output fusion, so the separate-ops chain runs near the 2-pass
HBM floor anyway (207us at 56x56x64 vs 557us for this kernel, whose
in-VMEM tap-matrix construction — 9 shifted relayout copies of the padded
tile — costs more than the passes it saves). Kept as a tested, bit-exact
alternative lowering and as the substrate for future Mosaic work; see
BENCHMARKS.md "round-3 reconciliation".

Exactness: operands are +-1 int8 with int32 MXU accumulation and
one-padding is applied literally to the sign tile (equivalent to the
post-conv correction in ``bconv2d_mxu_float_in`` — both are exact
integers), so the conv result ``t`` is bit-identical to the unfused path
(tested with an identity transform). The float epilogue
``clip(K - t, cmin, cmax) * mul + bias`` evaluates the same fp32
expression, but the compiler may or may not contract the multiply-add to
an FMA in each program, so final values can differ from the unfused chain
by one FMA rounding (~1 ulp of the product magnitude) — the same
tolerance class as any XLA refusion, and far below the bf16 resolution of
the stored activation stream.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.bitpack import bitunpack
from ..core.params import BConv2DParams
from ..core.transforms import OutputTransform
from ..core.types import Padding

__all__ = ["binary_residual_block", "residual_block_supported"]

_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the ~16 MB core VMEM


def _pick_nb(n: int, hw: int) -> int:
    """Images per grid step: enough rows to fill the MXU's M dimension."""
    nb = 1
    while nb < n and nb * hw < 1024 and n % (nb * 2) == 0:
        nb *= 2
    return nb


def residual_block_supported(x_shape, params: BConv2DParams, c_out: int,
                             fh: int, fw: int) -> bool:
    """Static conditions under which the fused kernel applies."""
    n, h, w, c = x_shape
    if (fh, fw) != (3, 3) or c != c_out or c % 8:
        return False
    if (params.groups != 1 or params.stride != (1, 1)
            or params.dilation != (1, 1)
            or params.padding != Padding.SAME or params.pad_value != 1):
        return False
    nb = _pick_nb(n, h * w)
    m = nb * h * w
    # VMEM estimate: x/out tiles (double-buffered), padded sign tile,
    # 9-tap matrix, weights, fp32 accumulator. The x/out term uses 4-byte
    # elements (the f32 worst case the kernel documents — a 2-byte
    # assumption under-counted float32 inputs 2x near the budget edge).
    bytes_needed = (4 * nb * h * w * c * 4       # x in + out, 2 buffers each
                    + nb * (h + 2) * (w + 2) * c  # padded int8 signs
                    + m * 9 * c                   # tap matrix int8
                    + 9 * c * c_out               # weights int8
                    + 4 * m * c_out)              # accumulator f32
    return bytes_needed <= _VMEM_BUDGET


def _block_kernel(x_ref, w_ref, mul_ref, bias_ref, out_ref, *, nb, h, w, c,
                  c_out, k, clamp_min, clamp_max, concat_k):
    xb = x_ref[:]  # (nb, H, W, C) compute dtype
    # Sign on a 2D-collapsed view: a 4D bf16 compare produces a 4D i1
    # vector Mosaic cannot relayout ("Invalid relayout ... vector<...xi1>");
    # collapsing to (rows, lanes) keeps the mask in a supported layout.
    x2 = xb.reshape(nb * h * w, c).astype(jnp.float32)
    xs = jnp.where(x2 < 0, -1, 1).astype(jnp.int8).reshape(nb, h, w, c)
    # One-padding applied literally: +1 border in the sign domain.
    xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=1)
    m = nb * h * w
    taps = [xp[:, dy:dy + h, dx:dx + w, :].reshape(m, c)
            for dy in range(3) for dx in range(3)]
    if concat_k:
        # K-concatenate the taps so the MXU's contraction rows stay filled
        # when C < 128 (one (M, 9C) @ (9C, O) matmul).
        lhs = jnp.concatenate(taps, axis=1)
        t = jax.lax.dot_general(
            lhs, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    else:
        t = jax.lax.dot_general(
            taps[0], w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        for i in range(1, 9):
            t = t + jax.lax.dot_general(
                taps[i], w_ref[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    # Debug assertion (RUY_DCHECK analogue, compiled out unless
    # pl.enable_debug_checks): the +-1 conv of K = 9*C taps is bounded by
    # K — trips if the tap-matrix construction or the literal one-padding
    # produced values outside the sign domain.
    pl.debug_check(jnp.all(jnp.abs(t) <= jnp.int32(k)),
                   "residual: |pm1 conv| > K — tap matrix or one-padding "
                   "invariant broken")
    # t == the +-1 conv result (K - 2*accum); the float transform expressed
    # on it directly: clip(2*accum) == clip(K - t) exactly.
    y = jnp.clip(k - t, clamp_min, clamp_max).astype(jnp.float32)
    y = y * mul_ref[:] + bias_ref[:]
    out_ref[:] = xb + y.astype(xb.dtype).reshape(nb, h, w, c_out)


def binary_residual_block(x, packed_filter, transform: OutputTransform,
                          params: BConv2DParams, interpret=None):
    """``x + float_transform(bconv3x3_onepad(sign(x)))`` in one kernel.

    Args:
      x: (N, H, W, C) float activations (bf16 or f32 — the compute dtype).
      packed_filter: (C_out, 3, 3, ceil(C/32)) uint32 packed filter.
      transform: float OutputTransform (multiplier/bias/clamps).
      params: stride-1 SAME one-padding BConv2DParams, groups=1.

    Returns (N, H, W, C) in x.dtype. Matches
    ``x + store(bconv2d_mxu_float_in(x, ...))`` with an exact integer conv
    and at most one FMA rounding in the float epilogue (see module doc).
    """
    if interpret is None:
        # CPU test meshes run the kernel interpreted (same policy as bgemm).
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    c_out, fh, fw, _ = packed_filter.shape
    if not residual_block_supported(x.shape, params, c_out, fh, fw):
        raise ValueError("fused residual block unsupported for "
                         f"shape {x.shape} / filter {packed_filter.shape}")
    nb = _pick_nb(n, h * w)
    k = params.backtransform_add(fh, fw)

    wf = bitunpack(packed_filter, c, dtype=jnp.int8)  # (O, 3, 3, C) +-1
    wmat = jnp.transpose(wf, (1, 2, 3, 0)).reshape(9, c, c_out)
    concat_k = c < 128
    if concat_k:
        w_arg = wmat.reshape(9 * c, c_out)
        w_spec = pl.BlockSpec((9 * c, c_out), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_arg = wmat
        w_spec = pl.BlockSpec((9, c, c_out), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    mul = jnp.asarray(transform.multiplier, jnp.float32).reshape(1, c_out)
    bias = jnp.asarray(transform.bias, jnp.float32).reshape(1, c_out)

    kernel = functools.partial(
        _block_kernel, nb=nb, h=h, w=w, c=c, c_out=c_out, k=k,
        clamp_min=int(transform.clamp_min),
        clamp_max=int(transform.clamp_max), concat_k=concat_k)
    flops = 2 * n * h * w * 9 * c * c_out
    bytesize = np.dtype(x.dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, h, w, c_out), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c_out), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * n * h * w * c * bytesize + 9 * c * c_out,
            transcendentals=0),
        interpret=interpret,
    )(x, w_arg, mul, bias)
