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


def _bgemm_kernel(lhs_ref, rhs_ref, *rest, clamp_min: int, clamp_max: int,
                  out_kind: str, total_bits: int):
    """Grid step i: one (TM, N) output stripe.

    lhs_ref: (TM, KW) packed; rhs_ref: (KW, N) packed (whole matrix);
    ``rest`` holds per-out_kind epilogue operands (see ``bgemm``), then
    out_ref and the persistent (32*KW, N) bf16 weight scratch.
    """
    *epi_refs, out_ref, b_unp_ref = rest

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
    if out_kind == "bitpacked":
        # Threshold epilogue (`core/bconv2d/output_transform.h:164-167`)
        # with in-kernel lane packing: bits (TM, N) {0,1} are packed 32-per-
        # word by two small f32 matmuls against constant matrices holding
        # 2^(j%32) for the low/high 16 bit positions of each word (each dot
        # sums <=16 terms < 2^16 — exact in f32), then fused as lo | hi<<16.
        thr_ref, lo_ref, hi_ref = epi_refs
        bits = (acc > thr_ref[0, :]).astype(jnp.float32)
        lo = jnp.dot(bits, lo_ref[:, :], preferred_element_type=jnp.float32)
        hi = jnp.dot(bits, hi_ref[:, :], preferred_element_type=jnp.float32)
        # Mosaic has no f32->u32 cast; assemble in int32 (the <<16 wraps into
        # the sign bit, which is exactly the bitwise intent) and bitcast to
        # uint32 outside the kernel.
        out_ref[:, :] = (lo.astype(jnp.int32)
                         | (hi.astype(jnp.int32) << 16))
        return
    # Fused epilogue: float(clamp(acc << 1)) * mul + bias
    # (`core/bconv2d/output_transform.h:100-106`).
    mul_ref, bias_ref = epi_refs
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


def _pack_matrices(n):
    """Constant (N, N/32) f32 matrices for in-kernel lane packing."""
    import numpy as np

    nw = n // BITWIDTH
    j = np.arange(n)
    w = j // BITWIDTH
    pos = j % BITWIDTH
    lo = np.zeros((n, nw), np.float32)
    hi = np.zeros((n, nw), np.float32)
    lo[j[pos < 16], w[pos < 16]] = (2.0 ** pos[pos < 16])
    hi[j[pos >= 16], w[pos >= 16]] = (2.0 ** (pos[pos >= 16] - 16))
    return lo, hi


@functools.partial(
    jax.jit,
    static_argnames=("clamp_min", "clamp_max", "out_kind", "block_m"),
)
def bgemm(lhs, rhs, multiplier=None, bias=None, thresholds=None, *,
          clamp_min: int = -(2 ** 31) + 1, clamp_max: int = 2 ** 31 - 1,
          out_kind: str = "float", block_m: int = 256):
    """Binary GEMM on packed words with fused output transform.

    Args:
      lhs: (M, KW) uint32 packed words (im2col patches / dense activations).
      rhs: (KW, N) uint32 packed words (filter, K-major).
      multiplier, bias: (N,) float32 per-channel epilogue params (required
        for out_kind float/int8).
      thresholds: (N,) int32 (required for out_kind "bitpacked").
      out_kind: "float" | "int8" | "bitpacked" (packed words, fused
        in-kernel threshold + lane packing) | "accum" (raw int32
        xor-popcount accumulators).

    Returns (M, N) float32/int8/int32, or (M, ceil(N/32)) uint32.
    """
    import numpy as np

    m, kw = lhs.shape
    kw2, n = rhs.shape
    assert kw == kw2, (kw, kw2)
    assert lhs.dtype == PACKED_DTYPE and rhs.dtype == PACKED_DTYPE

    block_m = min(block_m, _round_up(m, 32))
    mp = _round_up(m, block_m)
    np_ = _round_up(n, 128)
    lhs_p = jnp.pad(lhs, ((0, mp - m), (0, 0)))
    rhs_p = jnp.pad(rhs, ((0, 0), (0, np_ - n)))

    full_spec = pl.BlockSpec((1, np_), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    if out_kind == "accum":
        epi, epi_specs = [], []
        out_dtype, out_cols = jnp.int32, np_
    elif out_kind == "bitpacked":
        # Padded channels get threshold +inf => always a 0 bit, so the
        # padding bits of the last real word stay 0 (`bitpack.h:238-244`).
        thr_p = jnp.pad(thresholds.astype(jnp.int32), (0, np_ - n),
                        constant_values=np.int32(2 ** 31 - 1)).reshape(1, np_)
        lo, hi = _pack_matrices(np_)
        nw = np_ // BITWIDTH
        epi = [thr_p, jnp.asarray(lo), jnp.asarray(hi)]
        epi_specs = [
            full_spec,
            pl.BlockSpec((np_, nw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, nw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_dtype, out_cols = jnp.int32, nw  # bitcast to uint32 after
    else:
        mul_p = jnp.pad(multiplier.astype(jnp.float32),
                        (0, np_ - n)).reshape(1, np_)
        bias_p = jnp.pad(bias.astype(jnp.float32),
                         (0, np_ - n)).reshape(1, np_)
        epi = [mul_p, bias_p]
        epi_specs = [full_spec, full_spec]
        out_dtype = jnp.float32 if out_kind == "float" else jnp.int8
        out_cols = np_

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
            *epi_specs,
        ],
        out_specs=pl.BlockSpec((block_m, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, out_cols), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((BITWIDTH * kw, np_), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kw * BITWIDTH,
            bytes_accessed=(mp * kw + kw * np_) * 4 + mp * out_cols * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lhs_p, rhs_p, *epi)
    if out_kind == "bitpacked":
        from ..core.types import packed_size

        return jax.lax.bitcast_convert_type(
            out[:m, :packed_size(n)], PACKED_DTYPE)
    return out[:m, :n]
