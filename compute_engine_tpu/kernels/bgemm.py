"""Pallas TPU binary GEMM: fused in-VMEM unpack + MXU contraction.

TPU-native counterpart of the reference's ruy-based BGemm stack
(`core/bgemm/bgemm.h:25-84`, NEON EOR+CNT+ADDV microkernels in
`core/bgemm/kernels_aarch64.h`) — but re-designed for the hardware rather
than translated:

* On ARM CPUs, xor+popcount is the fastest way to contract 1-bit operands.
  On TPU, the MXU systolic array multiplies +-1 operands an order of
  magnitude faster than the VPU can popcount, and the +-1 product identity
      dot_pm1(a, b) = K - 2 * xor_popcount_accum(a, b)
  makes the two exactly interchangeable. Planes default to **int8 with
  int32 accumulation** — the MXU's 2x int8 rate and half the scratch VMEM
  of bf16 (measured 1.3-1.8x end-to-end, round 4); ``plane_dtype`` can
  select bf16/fp32-accum instead. Both are exact for +-1 operands (int32
  trivially; bf16 products are exact and fp32 accumulation is exact below
  2^24 terms).
* The operands stay **bitpacked in HBM and VMEM** (32x compression — the
  entire point of a BNN engine); each kernel invocation unpacks words to +-1
  *bit-planes* in VMEM/registers and feeds the MXU.
* The fused epilogues (clamp -> mul -> bias, int8 round/saturate, threshold
  compare — `kernels_aarch64.h:87-91`'s asm-if variants) run on the VPU on
  the fp32 tile before it is written back.

Tiling (the TPU analogue of ruy TrMul's cache-blocked traversal +
`select_kernel.h`'s depth-blocked microkernels):

* The LHS is fed **K-major** (KW, M): with M in the lane dimension, every
  unpack shift/mask runs at full 128-lane VPU occupancy regardless of KW.
  The previous M-major layout put KW (9-18 words on zoo conv shapes) in
  lanes and wasted ~90% of every unpack op — measured 6x slower end-to-end
  on the 56x56x64 conv GEMM (BENCHMARKS.md round-4). The contraction is a
  transposed-LHS ``dot_general`` over the sublane dims, native on the MXU.
* The grid tiles N into ``block_n`` columns and M into ``block_m`` lanes,
  with the M dimension iterating fastest, so the weight strip for one N
  tile is unpacked into persistent VMEM scratch exactly once (at the first
  M step) and reused for every M tile — the VPU unpack cost is O(K*N)
  total while the MXU does O(M*N*K).
* Inside a step, the packed LHS tile is unpacked and contracted in
  ``chunk_kw``-word K slices, bounding the unpacked-activation temporary to
  (32*chunk_kw, block_m) planes regardless of K.
* ``block_n`` is chosen so the weight scratch (32*KW, block_n) fits a fixed
  VMEM budget. If K is so large that even the minimum block_n cannot fit a
  full-K strip, the grid gains a third K dimension and partial products
  accumulate in an accumulator VMEM scratch across K steps (weights are
  then unpacked per step — the unavoidable cost of K far beyond the zoo
  family's shapes).

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

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import BITWIDTH, PACKED_DTYPE, ceil_div, packed_size

# VMEM budget for the persistent unpacked-weight scratch. v5e has
# ~16 MB of VMEM per core; this leaves room for the double-buffered input
# blocks, the unpacked-LHS temporary and the output tile.
_WEIGHT_SCRATCH_BUDGET = 4 * 1024 * 1024
# Bound on the unpacked-LHS temporary (block_m, 32*chunk_kw) bf16.
_CHUNK_KW = 64  # 2048 unpacked K per slice


_cdiv = ceil_div  # shared ceiling-division helper (core.types)


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


def _acc_dtype(plane_dtype):
    """MXU accumulator type per operand type: int8 ops accumulate in int32
    (the 2x-rate MXU path), bf16 in fp32. Both are exact for +-1 operands
    below 2^24 contraction terms."""
    return (jnp.int32 if jnp.dtype(plane_dtype) == jnp.dtype(jnp.int8)
            else jnp.float32)


def _chunked_contract(lhs_ref, w_ref, kw, chunk_kw, plane_dtype):
    """sum_k unpack(lhsT)[32k, ..]^T @ w_ref[32k, ..] in chunk_kw slices.

    ``lhs_ref`` is the K-MAJOR (KW, block_m) packed tile: unpacking then
    runs shift/mask ops whose minor (lane) dimension is block_m >= 128 —
    full VPU lane occupancy — instead of the KW-minor layout whose planes
    wasted (128 - KW)/128 of every vector op on zoo conv shapes (KW of
    9-18 words left lanes ~90% idle; measured 6x end-to-end on the
    56x56x64 conv GEMM, see BENCHMARKS.md round-4). The contraction is a
    transposed-LHS dot_general (contract sublane dim of both operands),
    which the MXU executes natively.
    """
    acc = None
    for c0 in range(0, kw, chunk_kw):
        c = min(chunk_kw, kw - c0)
        # Planes stacked along the sublane dim: row j*c + w for word w,
        # bit j — the same chunk-major order _unpack_chunks writes.
        a_t = jnp.concatenate(
            _planes_pm1(lhs_ref[pl.ds(c0, c), :], plane_dtype),
            axis=0)  # (32c, TM)
        w = w_ref[pl.ds(c0 * BITWIDTH, c * BITWIDTH), :]
        t = jax.lax.dot_general(
            a_t, w, (((0,), (0,)), ((), ())),
            preferred_element_type=_acc_dtype(plane_dtype))
        acc = t if acc is None else acc + t
    return acc


def _unpack_chunks(scratch_ref, words, kw, chunk_kw):
    """Unpack (kw, n) words chunk-major so _chunked_contract rows line up."""
    for c0 in range(0, kw, chunk_kw):
        c = min(chunk_kw, kw - c0)
        for j, plane in enumerate(_planes_pm1(words[c0:c0 + c, :],
                                              scratch_ref.dtype)):
            scratch_ref[pl.ds(c0 * BITWIDTH + j * c, c), :] = plane


def _epilogue(acc, epi_refs, out_ref, *, clamp_min, clamp_max, out_kind):
    """Fused output transform on an fp32 int-valued accumulator tile."""
    if out_kind == "accum":
        out_ref[:, :] = acc
        return
    if out_kind == "bits8":
        # Threshold bits as int8 0/1, packed to words OUTSIDE the kernel —
        # the fallback when the fused lane-pack epilogue's single-strip
        # weight scratch cannot fit VMEM (see bgemm's bitpacked branch).
        (thr_ref,) = epi_refs
        out_ref[:, :] = (acc > thr_ref[0, :]).astype(jnp.int8)
        return
    if out_kind == "bitpacked":
        # Threshold epilogue (`core/bconv2d/output_transform.h:164-167`)
        # with in-kernel lane packing: bits (TM, TN) {0,1} are packed 32-per-
        # word by two small f32 matmuls against constant matrices holding
        # 2^(j%32) for the low/high 16 bit positions of each word (each dot
        # sums <=16 terms < 2^16 — exact in f32), then fused as lo | hi<<16.
        thr_ref, lo_ref, hi_ref = epi_refs
        bits = (acc > thr_ref[0, :]).astype(jnp.float32)
        lo = jnp.dot(bits, lo_ref[:, :], preferred_element_type=jnp.float32)
        hi = jnp.dot(bits, hi_ref[:, :], preferred_element_type=jnp.float32)
        # RUY_DCHECK analogue (`core/bgemm/kernels.h:35-44`): each lane-pack
        # dot sums <=16 power-of-two terms, so it must be an exact uint16.
        pl.debug_check(
            jnp.all((lo >= 0) & (lo < 65536.0)
                    & (hi >= 0) & (hi < 65536.0)),
            "bgemm: lane-pack dot outside uint16 range — pack-matrix "
            "invariant broken")
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


def _bgemm_kernel(lhs_ref, rhs_ref, *rest, clamp_min: int, clamp_max: int,
                  out_kind: str, total_bits: int, chunk_kw: int,
                  plane_dtype):
    """Grid step (j, i): one (block_m, block_n) output tile.

    lhs_ref: (KW, block_m) K-major packed tile at M tile i (M lives in
    lanes for full-occupancy unpacking — see _chunked_contract); rhs_ref:
    (KW, block_n) packed at N strip j; ``rest`` holds per-out_kind epilogue
    operands (see ``bgemm``), then out_ref and the persistent
    (32*KW, block_n) weight scratch in plane_dtype (unpacked once per N
    strip, at the first M step).
    """
    *epi_refs, out_ref, w_ref = rest
    kw = rhs_ref.shape[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        _unpack_chunks(w_ref, rhs_ref[:, :], kw, chunk_kw)

    t = _chunked_contract(lhs_ref, w_ref, kw, chunk_kw, plane_dtype)
    # Debug assertion (compiled out unless pl.enable_debug_checks — the
    # RUY_DCHECK model, `core/bgemm/kernels.h:35-44`): a +-1 contraction of
    # total_bits terms is bounded by total_bits; a violation means the
    # unpack, the K/total_bits accounting, or the zero-padding-bit contract
    # (`bitpack.h:238-244`) broke inside the kernel.
    pl.debug_check(
        jnp.all(jnp.abs(t) <= t.dtype.type(total_bits)),
        "bgemm: |pm1 contraction| > total_bits — unpack/total_bits "
        "accounting broken")
    # Exact accumulator: accum = (32*KW - t) / 2 (see module docstring).
    acc = ((total_bits - t.astype(jnp.int32)) // 2).astype(jnp.int32)
    _epilogue(acc, epi_refs, out_ref, clamp_min=clamp_min,
              clamp_max=clamp_max, out_kind=out_kind)


def _bgemm_kernel_bigk(lhs_ref, rhs_ref, *rest, clamp_min: int,
                       clamp_max: int, out_kind: str, total_bits: int,
                       chunk_kw: int, num_k: int, block_kw: int, kw: int,
                       plane_dtype):
    """Grid step (i, j, k): K-blocked fallback for K beyond VMEM capacity.

    Partial +-1 dot products accumulate in an accumulator scratch across K
    steps (the weight strip no longer fits VMEM whole, so weights are
    unpacked per step); the epilogue runs at the last K step. Analogue of
    ruy's depth-blocked TrMul traversal for deep GEMMs.
    """
    *epi_refs, out_ref, acc_ref = rest
    k_id = pl.program_id(2)
    this_kw = lhs_ref.shape[0]
    adt = _acc_dtype(plane_dtype)

    # Unpack + contract in chunk_kw slices to bound temporaries. Both
    # operands are K-major; planes stack along the sublane (K) dim in the
    # same order, and the MXU contracts the sublane dims directly.
    t = None
    for c0 in range(0, this_kw, chunk_kw):
        c = min(chunk_kw, this_kw - c0)
        a_t = jnp.concatenate(
            _planes_pm1(lhs_ref[pl.ds(c0, c), :], plane_dtype), axis=0)
        w_unp = jnp.concatenate(
            _planes_pm1(rhs_ref[pl.ds(c0, c), :], plane_dtype), axis=0)
        p = jax.lax.dot_general(a_t, w_unp, (((0,), (0,)), ((), ())),
                                preferred_element_type=adt)
        t = p if t is None else t + p
    # Mask out the contribution of K-padding words beyond the true KW: the
    # grid pads K to num_k*block_kw with zero words in BOTH operands, each
    # contributing +1*+1 = +1; total_bits already counts only real words, so
    # subtract the pad-word count here.
    pad_words = num_k * block_kw - kw
    is_last = k_id == num_k - 1

    @pl.when(k_id == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    acc_ref[:, :] += t

    @pl.when(is_last)
    def _():
        total = acc_ref[:, :] - acc_ref.dtype.type(pad_words * BITWIDTH)
        # Debug assertion: after removing the K-padding words' +1*+1
        # contribution, the contraction must be bounded by the REAL bit
        # count — trips if pad_words accounting (num_k*block_kw vs kw)
        # drifts from the actual grid padding.
        pl.debug_check(
            jnp.all(jnp.abs(total) <= acc_ref.dtype.type(total_bits)),
            "bgemm bigk: pad_words accounting broken — corrected "
            "contraction exceeds 32*KW")
        acc = ((total_bits - total.astype(jnp.int32)) // 2).astype(jnp.int32)
        _epilogue(acc, epi_refs, out_ref, clamp_min=clamp_min,
                  clamp_max=clamp_max, out_kind=out_kind)


def _pack_matrices(n):
    """Constant (N, N/32) f32 matrices for in-kernel lane packing."""
    nw = n // BITWIDTH
    j = np.arange(n)
    w = j // BITWIDTH
    pos = j % BITWIDTH
    lo = np.zeros((n, nw), np.float32)
    hi = np.zeros((n, nw), np.float32)
    lo[j[pos < 16], w[pos < 16]] = (2.0 ** pos[pos < 16])
    hi[j[pos >= 16], w[pos >= 16]] = (2.0 ** (pos[pos >= 16] - 16))
    return lo, hi


def _pick_blocks(m, kw, n, vmem_budget=None, plane_bytes=2):
    """Choose (block_m, block_n, block_kw, num_k) under the VMEM budget.

    block_n is the largest multiple of 128 (<= 512) whose full-K weight strip
    (32*KW, block_n) bf16 fits ``vmem_budget`` (default: the module's
    _WEIGHT_SCRATCH_BUDGET, read at call time so tests can force the big-K
    path); if none fits, K is blocked into the largest block_kw that fits at
    block_n=128.
    """
    if vmem_budget is None:
        vmem_budget = _WEIGHT_SCRATCH_BUDGET
    strip_bytes_per_col = BITWIDTH * kw * plane_bytes
    # The grid pads N to round_up(N, block_n), and dead columns cost real
    # MXU/unpack work — a 512-wide block on an N=64 GEMM would spend 8x
    # (caught by the round-5 ceiling model: the N=64 conv GEMM measured
    # 2.1x its predicted bound before this), and N=520 at block_n=512
    # would pad to 1024. Among the VMEM-feasible candidates pick the one
    # minimising the padded width; prefer the larger block on ties (fewer
    # weight-strip unpack repetitions).
    block_n = 128
    best_padded = _round_up(max(n, 1), 128)
    for cand in (512, 384, 256, 128):
        if cand * strip_bytes_per_col > vmem_budget:
            continue
        padded = _round_up(max(n, 1), cand)
        if padded < best_padded or (padded == best_padded
                                    and cand > block_n):
            block_n = cand
            best_padded = padded
    if 128 * strip_bytes_per_col <= vmem_budget:
        num_k, block_kw = 1, kw
    else:
        block_kw = max(_CHUNK_KW,
                       (vmem_budget // (128 * BITWIDTH * plane_bytes))
                       // _CHUNK_KW * _CHUNK_KW)
        num_k = _cdiv(kw, block_kw)
        block_n = 128
    # M lives in the LANE dim of the K-major LHS tile, so block_m must be a
    # 128 multiple; 1024 balances grid-step amortisation against the
    # (block_m, block_n) fp32 output tile's VMEM (measured: 2048 is ~2%
    # faster than 1024 on the 56x56 conv GEMM but doubles the out tile).
    block_m = min(1024, _round_up(m, 128))
    return block_m, block_n, block_kw, num_k


@functools.partial(
    jax.jit,
    static_argnames=("clamp_min", "clamp_max", "out_kind", "block_m",
                     "block_n", "plane_dtype"),
)
def bgemm(lhs, rhs, multiplier=None, bias=None, thresholds=None, *,
          clamp_min: int = -(2 ** 31) + 1, clamp_max: int = 2 ** 31 - 1,
          out_kind: str = "float", block_m: int | None = None,
          block_n: int | None = None, plane_dtype=jnp.int8):
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
      block_m, block_n: optional tile overrides (defaults picked to fit the
        VMEM budget; see _pick_blocks).
      plane_dtype: dtype of the unpacked +-1 planes fed to the MXU —
        ``jnp.int8`` (default: int32 accumulation at the MXU's 2x int8
        rate, half the weight-scratch VMEM) or ``jnp.bfloat16`` (fp32
        accumulation). Both are exact for +-1 operands (module docstring).

    Returns (M, N) float32/int8/int32, or (M, ceil(N/32)) uint32.
    """
    m, kw = lhs.shape
    kw2, n = rhs.shape
    assert kw == kw2, (kw, kw2)
    assert lhs.dtype == PACKED_DTYPE and rhs.dtype == PACKED_DTYPE
    plane_dtype = jnp.dtype(plane_dtype).type
    plane_bytes = jnp.dtype(plane_dtype).itemsize

    bm, bn, block_kw, num_k = _pick_blocks(m, kw, n,
                                           plane_bytes=plane_bytes)
    block_m = (bm if block_m is None
               else _round_up(min(block_m, _round_up(m, 128)), 128))
    # Mosaic requires the lane (last) block dim to be 128-divisible; round
    # a user override like block_m's handling above (a raw 100 would pass
    # CPU interpret mode and fail at TPU compile).
    block_n = bn if block_n is None else _round_up(block_n, 128)

    pack_outside = False
    if out_kind == "bitpacked":
        # The fused lane-pack epilogue writes (block_m, block_n/32) word
        # tiles; Mosaic requires the last block dim to be 128-divisible or
        # equal to the full array dim, and words-per-strip can never reach
        # 128 — so the N grid must be a SINGLE full-width strip. Allow the
        # weight scratch a relaxed budget for it; when even that cannot fit
        # (huge N*K, e.g. packed-domain 4096-wide fc layers), compute int8
        # 0/1 bits in-kernel (block-friendly) and pack to words outside.
        np128 = _round_up(n, 128)
        strip_bytes = BITWIDTH * kw * np128 * plane_bytes
        if strip_bytes <= 2 * _WEIGHT_SCRATCH_BUDGET:
            block_n = np128
            num_k, block_kw = 1, kw
        else:
            pack_outside = True
            out_kind = "bits8"

    mp = _round_up(m, block_m)
    np_ = _round_up(n, block_n)
    num_i, num_j = mp // block_m, np_ // block_n

    # LHS is fed K-MAJOR (KW, M): M in lanes makes the in-kernel unpack run
    # at full VPU lane occupancy (see _chunked_contract). The transpose is
    # one XLA pass over the packed (32x-compressed) words.
    lhs_t = jnp.pad(lhs, ((0, mp - m), (0, num_k * block_kw - kw))).T
    rhs_p = jnp.pad(rhs, ((0, num_k * block_kw - kw), (0, np_ - n)))

    # --- epilogue operands, blocked over N ---
    if num_k == 1:
        ep_idx = lambda j, i: (0, j)  # noqa: E731
        pk_idx = lambda j, i: (0, 0)  # noqa: E731
    else:
        ep_idx = lambda i, j, k: (0, j)  # noqa: E731
        pk_idx = lambda i, j, k: (0, 0)  # noqa: E731
    row_spec = pl.BlockSpec((1, block_n), ep_idx, memory_space=pltpu.VMEM)
    if out_kind == "accum":
        epi, epi_specs = [], []
        out_dtype, out_cols, out_bn = jnp.int32, np_, block_n
    elif out_kind == "bits8":
        thr_p = jnp.pad(thresholds.astype(jnp.int32), (0, np_ - n),
                        constant_values=np.int32(2 ** 31 - 1)).reshape(1, np_)
        epi = [thr_p]
        epi_specs = [row_spec]
        out_dtype, out_cols, out_bn = jnp.int8, np_, block_n
    elif out_kind == "bitpacked":
        # Padded channels get threshold +inf => always a 0 bit, so the
        # padding bits of the last real word stay 0 (`bitpack.h:238-244`).
        thr_p = jnp.pad(thresholds.astype(jnp.int32), (0, np_ - n),
                        constant_values=np.int32(2 ** 31 - 1)).reshape(1, np_)
        lo, hi = _pack_matrices(block_n)
        nw = block_n // BITWIDTH
        epi = [thr_p, jnp.asarray(lo), jnp.asarray(hi)]
        epi_specs = [
            row_spec,
            pl.BlockSpec((block_n, nw), pk_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, nw), pk_idx, memory_space=pltpu.VMEM),
        ]
        out_dtype, out_cols, out_bn = jnp.int32, np_ // BITWIDTH, nw
    else:
        mul_p = jnp.pad(multiplier.astype(jnp.float32),
                        (0, np_ - n)).reshape(1, np_)
        bias_p = jnp.pad(bias.astype(jnp.float32),
                         (0, np_ - n)).reshape(1, np_)
        epi = [mul_p, bias_p]
        epi_specs = [row_spec, row_spec]
        out_dtype = jnp.float32 if out_kind == "float" else jnp.int8
        out_cols, out_bn = np_, block_n

    # On non-TPU backends (CPU test meshes) run the kernel interpreted so the
    # same code path is exercised everywhere.
    interpret = jax.default_backend() != "tpu"

    flops = 2 * mp * np_ * kw * BITWIDTH
    if out_kind == "bitpacked":
        # Two extra lane-packing matmuls per tile: (TM, TN) @ (TN, TN/32).
        flops += 2 * 2 * mp * np_ * (block_n // BITWIDTH)
    cost = pl.CostEstimate(
        # LHS is streamed once per N strip.
        flops=flops,
        bytes_accessed=(mp * kw * num_j + kw * np_) * 4 + mp * out_cols * 4,
        transcendentals=0,
    )

    if num_k == 1:
        kernel = functools.partial(
            _bgemm_kernel, clamp_min=clamp_min, clamp_max=clamp_max,
            out_kind=out_kind, total_bits=BITWIDTH * kw, chunk_kw=_CHUNK_KW,
            plane_dtype=plane_dtype)
        grid = (num_j, num_i)
        in_specs = [
            pl.BlockSpec((kw, block_m), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            *epi_specs,
        ]
        out_spec = pl.BlockSpec((block_m, out_bn), lambda j, i: (i, j),
                                memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((BITWIDTH * kw, block_n), plane_dtype)]
    else:
        kernel = functools.partial(
            _bgemm_kernel_bigk, clamp_min=clamp_min, clamp_max=clamp_max,
            out_kind=out_kind, total_bits=BITWIDTH * kw, chunk_kw=_CHUNK_KW,
            num_k=num_k, block_kw=block_kw, kw=kw, plane_dtype=plane_dtype)
        grid = (num_i, num_j, num_k)
        in_specs = [
            pl.BlockSpec((block_kw, block_m), lambda i, j, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_kw, block_n), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            *epi_specs,
        ]
        out_spec = pl.BlockSpec((block_m, out_bn), lambda i, j, k: (i, j),
                                memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((block_m, block_n), _acc_dtype(plane_dtype))]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((mp, out_cols), out_dtype),
        scratch_shapes=scratch,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid)),
        interpret=interpret,
    )(lhs_t, rhs_p, *epi)
    if out_kind == "bitpacked":
        return jax.lax.bitcast_convert_type(
            out[:m, :packed_size(n)], PACKED_DTYPE)
    if pack_outside:
        # Pack the int8 0/1 bits to words in XLA (LSB-first, padding bits 0
        # — `bitpack.h:238-244`). XLA fuses the shift/sum into the kernel's
        # consumer, so the extra pass touches int8 bits, not int32 words.
        nw_t = packed_size(n)
        bits = jnp.pad(out[:m, :n], ((0, 0), (0, nw_t * BITWIDTH - n)))
        lanes = jnp.arange(BITWIDTH, dtype=jnp.uint32)
        return (bits.reshape(m, nw_t, BITWIDTH).astype(jnp.uint32)
                << lanes).sum(axis=-1, dtype=jnp.uint32)
    return out[:m, :n]
