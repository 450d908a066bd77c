"""Pallas TPU binary GEMM: fused in-VMEM unpack + MXU contraction.

TPU-native counterpart of the reference's ruy-based BGemm stack
(`core/bgemm/bgemm.h:25-84`, NEON EOR+CNT+ADDV microkernels in
`core/bgemm/kernels_aarch64.h`) — but re-designed for the hardware rather
than translated:

* On ARM CPUs, xor+popcount is the fastest way to contract 1-bit operands.
  On TPU, the MXU systolic array multiplies +-1 bf16 operands an order of
  magnitude faster than the VPU can popcount, and the +-1 product identity
      dot_pm1(a, b) = K - 2 * xor_popcount_accum(a, b)
  makes the two exactly interchangeable (products are exact in bf16 and the
  MXU accumulates in fp32, exact below 2^24).
* The operands stay **bitpacked in HBM and VMEM** (32x compression — the
  entire point of a BNN engine); each kernel invocation unpacks words to +-1
  bf16 *bit-planes* in VMEM/registers and feeds the MXU. The weight planes
  are unpacked once into persistent VMEM scratch on the first grid step and
  reused for every M tile, so the VPU unpack cost is amortised to O(M*K)
  while the MXU does O(M*N*K).
* The fused epilogues (clamp -> mul -> bias, int8 round/saturate, threshold
  compare — `kernels_aarch64.h:87-91`'s asm-if variants) run on the VPU on
  the fp32 tile before it is written back.

Bit-plane trick: the contraction order over the K*32 unpacked positions is
irrelevant as long as LHS and RHS agree, so words are unpacked bit-major
(plane j = bit j of every word) and concatenated — no interleaving shuffles.
Channel-padding bits are 0 in *both* operands (`bitpack.h:238-244`), so they
contribute +1*+1 = +1 per padded position; the constant ``pad_bits`` is
subtracted in the epilogue to recover the exact accumulator:
      accum = (32*KW - dot_pm1_padded) / 2.

GEMM convention (matches `core/bconv2d/optimized_bgemm.h:64-151`):
  LHS  activations/patches, packed words, shape (M, KW)
  RHS  filter, packed words, shape (KW, N)   [filter transposed to K-major]
  OUT  (M, N) float32 / int8, or int32 accumulators
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import BITWIDTH, PACKED_DTYPE


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _planes_pm1(words, dtype=jnp.bfloat16):
    """Unpack (..., KW) uint32 -> list of 32 +-1 planes of shape (..., KW).

    Plane j holds 1 - 2*bit_j: set bit (encoding -1) -> -1.0.
    """
    one = jnp.uint32(1)
    return [
        (1 - (jnp.bitwise_and(jnp.right_shift(words, jnp.uint32(j)), one)
              << 1).astype(jnp.int32)).astype(dtype)
        for j in range(BITWIDTH)
    ]


def _bgemm_kernel(lhs_ref, rhs_ref, mul_ref, bias_ref, out_ref, b_unp_ref, *,
                  clamp_min: int, clamp_max: int, out_kind: str,
                  total_bits: int):
    """Grid step i: one (TM, N) output stripe.

    lhs_ref: (TM, KW) packed; rhs_ref: (KW, N) packed (whole matrix);
    b_unp_ref: (32*KW, N) bf16 persistent scratch of unpacked weights.
    """

    # Unpack the weights once; scratch persists across grid steps.
    @pl.when(pl.program_id(0) == 0)
    def _():
        kw = rhs_ref.shape[0]
        for j, plane in enumerate(_planes_pm1(rhs_ref[:, :])):
            b_unp_ref[pl.ds(j * kw, kw), :] = plane

    # Unpack this activation stripe bit-major and contract on the MXU.
    a_unp = jnp.concatenate(_planes_pm1(lhs_ref[:, :]), axis=1)  # (TM, 32KW)
    t = jnp.dot(a_unp, b_unp_ref[:, :], preferred_element_type=jnp.float32)

    # Exact accumulator: accum = (32*KW - t) / 2 (see module docstring).
    acc = ((total_bits - t.astype(jnp.int32)) // 2).astype(jnp.int32)

    if out_kind == "accum":
        out_ref[:, :] = acc
        return
    # Fused epilogue: float(clamp(acc << 1)) * mul + bias
    # (`core/bconv2d/output_transform.h:100-106`).
    x = jnp.clip(acc * 2, clamp_min, clamp_max).astype(jnp.float32)
    y = x * mul_ref[0, :] + bias_ref[0, :]
    if out_kind == "float":
        out_ref[:, :] = y
    elif out_kind == "int8":
        # Round half away from zero + saturate
        # (`core/bconv2d/output_transform.h:132-143`).
        r = jnp.where(y >= 0, jnp.floor(y + 0.5), jnp.ceil(y - 0.5))
        out_ref[:, :] = jnp.clip(r, -128, 127).astype(jnp.int8)
    else:
        raise ValueError(out_kind)


@functools.partial(
    jax.jit,
    static_argnames=("clamp_min", "clamp_max", "out_kind", "block_m"),
)
def bgemm(lhs, rhs, multiplier=None, bias=None, *,
          clamp_min: int = -(2 ** 31) + 1, clamp_max: int = 2 ** 31 - 1,
          out_kind: str = "float", block_m: int = 256):
    """Binary GEMM on packed words with fused output transform.

    Args:
      lhs: (M, KW) uint32 packed words (im2col patches / dense activations).
      rhs: (KW, N) uint32 packed words (filter, K-major).
      multiplier, bias: (N,) float32 per-channel epilogue params (required
        for out_kind float/int8).
      out_kind: "float" | "int8" | "accum" (raw int32 xor-popcount
        accumulators — used by the bitpacked-output wrapper and tests).

    Returns (M, N) float32 / int8 / int32.
    """
    m, kw = lhs.shape
    kw2, n = rhs.shape
    assert kw == kw2, (kw, kw2)
    assert lhs.dtype == PACKED_DTYPE and rhs.dtype == PACKED_DTYPE

    block_m = min(block_m, _round_up(m, 32))
    mp = _round_up(m, block_m)
    np_ = _round_up(n, 128)
    lhs_p = jnp.pad(lhs, ((0, mp - m), (0, 0)))
    rhs_p = jnp.pad(rhs, ((0, 0), (0, np_ - n)))
    if out_kind == "accum":
        mul_p = jnp.zeros((1, np_), jnp.float32)
        bias_p = jnp.zeros((1, np_), jnp.float32)
        out_dtype = jnp.int32
    else:
        mul_p = jnp.pad(multiplier.astype(jnp.float32),
                        (0, np_ - n)).reshape(1, np_)
        bias_p = jnp.pad(bias.astype(jnp.float32),
                         (0, np_ - n)).reshape(1, np_)
        out_dtype = jnp.float32 if out_kind == "float" else jnp.int8

    kernel = functools.partial(
        _bgemm_kernel, clamp_min=clamp_min, clamp_max=clamp_max,
        out_kind=out_kind, total_bits=BITWIDTH * kw)

    # On non-TPU backends (CPU test meshes) run the kernel interpreted so the
    # same code path is exercised everywhere.
    interpret = jax.default_backend() != "tpu"

    out = pl.pallas_call(
        kernel,
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, kw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, np_), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((BITWIDTH * kw, np_), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kw * BITWIDTH,
            bytes_accessed=(mp * kw + kw * np_) * 4 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lhs_p, rhs_p, mul_p, bias_p)
    return out[:m, :n]
