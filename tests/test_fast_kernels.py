"""Optimised kernels (Pallas bgemm, MXU conv) vs the packed reference oracle.

TPU analogue of running `tflite/tests/bconv2d_test.cc` over all kernel
registrations (`:284-289`): every fast path must match the reference
bit-exactly for all output kinds. On CPU the Pallas kernel runs in interpret
mode; the same code path compiles on real TPU (verified by the e2e drive in
`.claude/skills/verify`).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from compute_engine_tpu.core import (
    Activation,
    BConv2DParams,
    OutputTransform,
    Padding,
    bitpack,
    bconv2d_reference,
    compute_output_thresholds,
    fuse_output_transform,
)
from compute_engine_tpu.ops import bconv2d
from compute_engine_tpu.kernels.bgemm import bgemm

CASES = [
    ((1, 8, 8, 32), (16, 3, 3), (1, 1), (1, 1), Padding.VALID, 1, 1,
     Activation.NONE),
    ((2, 7, 9, 64), (8, 3, 3), (1, 1), (1, 1), Padding.SAME, 1, 1,
     Activation.NONE),
    ((1, 8, 8, 64), (32, 3, 3), (2, 2), (1, 1), Padding.SAME, 1, 1,
     Activation.RELU),
    ((1, 10, 10, 33), (7, 2, 2), (1, 1), (2, 2), Padding.VALID, 1, 1,
     Activation.NONE),
    ((1, 8, 8, 64), (16, 3, 3), (1, 1), (1, 1), Padding.SAME, 0, 1,
     Activation.NONE),
    ((1, 6, 6, 128), (16, 3, 3), (1, 1), (1, 1), Padding.SAME, 1, 4,
     Activation.RELU6),
    ((1, 4, 4, 300), (40, 2, 2), (1, 1), (1, 1), Padding.SAME, 1, 1,
     Activation.RELU_N1_TO_1),
]


def make_case(rng, case):
    in_shape, (o, fh, fw), stride, dilation, padding, pad_value, groups, act \
        = case
    c = in_shape[-1]
    params = BConv2DParams(channels_in=c, stride=stride, dilation=dilation,
                           padding=padding, pad_value=pad_value,
                           groups=groups, activation=act)
    x = rng.choice(np.array([-1.0, 1.0], np.float32), size=in_shape)
    w = rng.choice(np.array([-1.0, 1.0], np.float32),
                   size=(o, fh, fw, c // groups))
    post_mul = (rng.uniform(0.1, 2.0, o) * rng.choice([-1.0, 1.0], o)).astype(
        np.float32)
    post_bias = rng.uniform(-5.0, 5.0, o).astype(np.float32)
    return params, bitpack(jnp.asarray(x)), bitpack(jnp.asarray(w)), \
        post_mul, post_bias


@pytest.mark.parametrize("kernel", ["bgemm", "mxu"])
@pytest.mark.parametrize("case", CASES, ids=range(len(CASES)))
@pytest.mark.parametrize("output_kind", ["float", "int8", "bitpacked"])
def test_fast_kernel_bit_exact(kernel, case, output_kind, rng):
    params, xp, wp, post_mul, post_bias = make_case(rng, case)
    fh, fw = wp.shape[1], wp.shape[2]
    k = params.backtransform_add(fh, fw)
    if output_kind == "bitpacked":
        thr = compute_output_thresholds(post_mul, post_bias, k,
                                        params.activation)
        transform = OutputTransform(thresholds=thr)
    else:
        scale, zp = (0.15, 3) if output_kind == "int8" else (None, 0)
        transform = fuse_output_transform(post_mul, post_bias, k,
                                          params.activation,
                                          output_scale=scale,
                                          output_zero_point=zp)
    want = np.asarray(
        bconv2d_reference(xp, wp, transform, params, output_kind))
    got = np.asarray(
        bconv2d(xp, wp, transform, params, output_kind, kernel=kernel))
    if output_kind == "bitpacked":
        # Accumulators and thresholds are integer-exact in every path.
        np.testing.assert_array_equal(got, want)
    elif output_kind == "int8":
        # FMA association in the float epilogue may flip exact .5 rounding
        # boundaries; off-by-one allowed, as in `bconv2d_test.cc:408-428`.
        assert np.max(np.abs(got.astype(np.int32) - want.astype(np.int32))) <= 1
    else:
        # Float epilogue: same math, different FMA association -> ulp noise.
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _accum_oracle(lhs, rhs):
    want = np.zeros((lhs.shape[0], rhs.shape[1]), np.int64)
    for k in range(rhs.shape[0]):
        x = np.bitwise_xor(lhs[:, k, None], rhs[None, k, :])
        want += np.vectorize(lambda v: bin(v).count("1"))(x)
    return want


@pytest.mark.parametrize("m,kw,n", [
    (7, 3, 5), (128, 18, 64), (200, 144, 130),
    # BinaryAlexNet fc1 depth (9216 unpacked K) — exceeded VMEM before the
    # N/K-tiled rewrite; must route through block_n=128 full-K strips.
    (8, 288, 512),
    # K beyond the weight-scratch budget at BOTH plane byte widths (int8
    # needs kw > 1024 at the default budget): exercises the K-blocked grid
    # with partial accumulation and pad-word correction.
    (40, 1100, 96),
])
@pytest.mark.parametrize("plane_dtype", ["bfloat16", "int8"])
def test_bgemm_accum_matches_numpy(m, kw, n, plane_dtype, rng):
    """Raw accumulator output vs a numpy xor-popcount oracle, for both MXU
    operand types (bf16/fp32-accum and int8/int32-accum — the 2x-rate
    path)."""
    from compute_engine_tpu.kernels.bgemm import _pick_blocks

    lhs = rng.integers(0, 2 ** 32, size=(m, kw), dtype=np.uint32)
    rhs = rng.integers(0, 2 ** 32, size=(kw, n), dtype=np.uint32)
    want = _accum_oracle(lhs, rhs)
    got = np.asarray(bgemm(jnp.asarray(lhs), jnp.asarray(rhs),
                           out_kind="accum", plane_dtype=plane_dtype))
    np.testing.assert_array_equal(got, want)
    if kw == 1100:
        # Guard: this case must actually hit the K-blocked path with the
        # plane byte width of the dtype under test (ADVICE r4: the old
        # kw=600 guard used the bf16 width, so the int8 default — the
        # production path — silently took the single-K branch).
        plane_bytes = jnp.dtype(plane_dtype).itemsize
        assert _pick_blocks(m, kw, n, plane_bytes=plane_bytes)[3] > 1


@pytest.mark.parametrize("n", [1, 31, 32, 33, 40, 64, 127, 128])
def test_bgemm_bitpacked_alignment_sweep(n, rng):
    """channels_out alignment sweep through the fused in-kernel lane-packing
    epilogue: padding bits of the last word must be 0 at every alignment
    (`bitpack.h:238-244` invariant), and real bits must match the oracle."""
    m, kw = 48, 6
    lhs = rng.integers(0, 2 ** 32, size=(m, kw), dtype=np.uint32)
    rhs = rng.integers(0, 2 ** 32, size=(kw, n), dtype=np.uint32)
    accum = _accum_oracle(lhs, rhs)
    thr = rng.integers(kw * 16 - 20, kw * 16 + 20, n).astype(np.int32)
    bits = (accum > thr).astype(np.uint32)
    want = np.zeros((m, -(-n // 32)), np.uint32)
    for j in range(n):
        want[:, j // 32] |= bits[:, j] << (j % 32)
    for plane_dtype in ("bfloat16", "int8"):
        got = np.asarray(bgemm(jnp.asarray(lhs), jnp.asarray(rhs),
                               thresholds=jnp.asarray(thr),
                               out_kind="bitpacked",
                               plane_dtype=plane_dtype))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("m,kw,n", [
    # Packed-domain 512-channel 3x3 conv GEMM: words-per-strip (block_n/32)
    # can never be 128-divisible, so the N grid must be one full strip —
    # the Mosaic violation the round-4 autotune exposed on real TPU.
    (16, 144, 512),
    # 4096-wide fc GEMM: the single-strip weight scratch exceeds even the
    # relaxed VMEM budget -> int8-bits epilogue + outside word packing.
    (16, 288, 4096),
])
def test_bgemm_bitpacked_wide_shapes(m, kw, n, rng):
    from compute_engine_tpu.kernels import bgemm as bgemm_mod

    lhs = rng.integers(0, 2 ** 32, size=(m, kw), dtype=np.uint32)
    rhs = rng.integers(0, 2 ** 32, size=(kw, n), dtype=np.uint32)
    accum = _accum_oracle(lhs, rhs)
    thr = rng.integers(kw * 16 - 30, kw * 16 + 30, n).astype(np.int32)
    bits = (accum > thr).astype(np.uint32)
    want = np.zeros((m, -(-n // 32)), np.uint32)
    for j in range(n):
        want[:, j // 32] |= bits[:, j] << (j % 32)
    # The same expression bgemm's bitpacked branch evaluates (int8 planes
    # are the default => plane_bytes 1, not the bf16 width).
    np128 = -(-n // 128) * 128
    strip = 32 * kw * np128 * jnp.dtype(jnp.int8).itemsize
    assert (strip <= 2 * bgemm_mod._WEIGHT_SCRATCH_BUDGET) == (n == 512), \
        "test shapes must cover both the single-strip and bits8 paths"
    got = np.asarray(bgemm(jnp.asarray(lhs), jnp.asarray(rhs),
                           thresholds=jnp.asarray(thr),
                           out_kind="bitpacked"))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("case", CASES, ids=range(len(CASES)))
@pytest.mark.parametrize("output_kind", ["float", "bitpacked"])
def test_float_in_mxu_bit_exact(case, output_kind, rng):
    """The float-activation MXU path (sign -> conv + padding corrections)
    must match the packed reference exactly."""
    from compute_engine_tpu.kernels.bconv2d import bconv2d_mxu_float_in

    in_shape = case[0]
    params, xp, wp, post_mul, post_bias = make_case(rng, case)
    if params.groups > 1 and output_kind == "bitpacked":
        pytest.skip("grouped bitpacked covered elsewhere")
    fh, fw = wp.shape[1], wp.shape[2]
    k = params.backtransform_add(fh, fw)
    if output_kind == "bitpacked":
        transform = OutputTransform(thresholds=compute_output_thresholds(
            post_mul, post_bias, k, params.activation))
    else:
        transform = fuse_output_transform(post_mul, post_bias, k,
                                          params.activation)
    want = np.asarray(
        bconv2d_reference(xp, wp, transform, params, output_kind))
    # Reconstruct the float activations the model runtime would hold.
    from compute_engine_tpu.core import bitunpack
    x_float = bitunpack(xp, params.channels_in, dtype=jnp.float32)
    got = np.asarray(bconv2d_mxu_float_in(x_float, wp, transform, params,
                                          output_kind))
    if output_kind == "bitpacked":
        np.testing.assert_array_equal(got, want)
    else:
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("case", CASES, ids=range(len(CASES)))
def test_float_in_int8_operands_bit_exact(case, rng):
    """int8 +-1 operands (int32 MXU accumulation) must also be exact."""
    from compute_engine_tpu.core import bitunpack
    from compute_engine_tpu.kernels.bconv2d import bconv2d_mxu_float_in

    params, xp, wp, post_mul, post_bias = make_case(rng, case)
    fh, fw = wp.shape[1], wp.shape[2]
    k = params.backtransform_add(fh, fw)
    transform = fuse_output_transform(post_mul, post_bias, k,
                                      params.activation)
    want = np.asarray(bconv2d_reference(xp, wp, transform, params, "float"))
    x_float = bitunpack(xp, params.channels_in, dtype=jnp.float32)
    got = np.asarray(bconv2d_mxu_float_in(x_float, wp, transform, params,
                                          "float", conv_dtype=jnp.int8))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_s2d_stride2_valid_unconsumed_rows(rng):
    """Round-5 review regression: a stride-2 VALID conv whose input has
    trailing rows no output window reads used to produce a NEGATIVE pad
    amount in the s2d retile and crash at trace time; the retile must
    crop instead (exact — those rows are never read)."""
    from compute_engine_tpu.core.transforms import fuse_output_transform
    from compute_engine_tpu.kernels.bconv2d import (bconv2d_mxu_float_in,
                                                    bconv2d_mxu_s2d)

    for (h, fh) in ((9, 2), (11, 4)):
        c_in, c_out = 16, 32
        x = jnp.asarray(rng.normal(0, 1, (2, h, h, c_in)).astype(np.float32))
        wp = bitpack(jnp.asarray(rng.choice(
            [-1.0, 1.0], (c_out, fh, fh, c_in)).astype(np.float32)))
        params = BConv2DParams(channels_in=c_in, stride=(2, 2),
                               padding=Padding.VALID)
        tr = fuse_output_transform(
            np.ones(c_out, np.float32), np.zeros(c_out, np.float32),
            fh * fh * c_in)
        want = np.asarray(bconv2d_mxu_float_in(x, wp, tr, params, "float"))
        got = np.asarray(bconv2d_mxu_s2d(x, wp, tr, params, "float"))
        np.testing.assert_allclose(got, want, atol=1e-5)
