"""Reference packed bconv2d vs an unpacked float convolution oracle.

TPU analogue of `tflite/tests/bconv2d_test.cc`: the oracle is a plain float
convolution (`lax.conv_general_dilated`) on the +-1 unpacked tensors
(`bconv2d_test.cc:60` uses TFLite's builtin float conv). Float outputs must
match within 1e-3, bitpacked outputs bit-exactly, int8 within 0.55 of the
*unrounded* quantised oracle (`bconv2d_test.cc:380-428`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from compute_engine_tpu.core import (
    Activation,
    BConv2DParams,
    Padding,
    bitpack,
    bitunpack,
    bconv2d_reference,
    compute_output_thresholds,
    fuse_output_transform,
    OutputTransform,
)


def random_pm1(rng, shape):
    return rng.choice(np.array([-1.0, 1.0], np.float32), size=shape)


def float_conv_oracle(x, w, params: BConv2DParams, post_mul, post_bias,
                      activation: Activation):
    """Plain float conv on +-1 data + clamp + per-channel mul/bias."""
    fh, fw = w.shape[1], w.shape[2]
    k = params.backtransform_add(fh, fw)
    if params.padding == Padding.SAME and params.pad_value == 1:
        _, _, pt, pl = params.output_spatial(x.shape[1], x.shape[2], fh, fw)
        oh, ow, _, _ = params.output_spatial(x.shape[1], x.shape[2], fh, fw)
        eff_h = (fh - 1) * params.dilation[0] + 1
        eff_w = (fw - 1) * params.dilation[1] + 1
        need_h = (oh - 1) * params.stride[0] + eff_h
        need_w = (ow - 1) * params.stride[1] + eff_w
        pb = max(0, need_h - (x.shape[1] + pt))
        pr = max(0, need_w - (x.shape[2] + pl))
        x = np.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)),
                   constant_values=1.0)
        padding = "VALID"
    elif params.padding == Padding.SAME:
        padding = "SAME"
    else:
        padding = "VALID"
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(np.transpose(w, (1, 2, 3, 0))),
        window_strides=params.stride,
        padding=padding,
        rhs_dilation=params.dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=params.groups,
    )
    out = np.asarray(out)
    lo, hi = {
        Activation.NONE: (-k, k),
        Activation.RELU: (0, k),
        Activation.RELU_N1_TO_1: (-1, 1),
        Activation.RELU6: (0, 6),
    }[activation]
    out = np.clip(out, lo, hi)
    return out * post_mul + post_bias


def pack_filter(w):
    """(O, FH, FW, Cg) float +-1 -> (O, FH, FW, ceil(Cg/32)) uint32."""
    return bitpack(jnp.asarray(w))


CASES = [
    # (in_shape, filter (O, FH, FW), stride, dilation, padding, pad_value,
    #  groups, activation)
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
    ((1, 9, 9, 64), (12, 3, 3), (2, 2), (1, 1), Padding.SAME, 0, 1,
     Activation.NONE),
    ((1, 6, 6, 64), (8, 3, 3), (1, 1), (1, 1), Padding.VALID, 1, 2,
     Activation.NONE),
    ((1, 6, 6, 128), (16, 3, 3), (1, 1), (1, 1), Padding.SAME, 1, 4,
     Activation.RELU6),
    ((1, 5, 5, 1), (4, 1, 1), (1, 1), (1, 1), Padding.VALID, 1, 1,
     Activation.NONE),
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
    x = random_pm1(rng, in_shape)
    w = random_pm1(rng, (o, fh, fw, c // groups))
    post_mul = rng.uniform(0.1, 2.0, o).astype(np.float32) * rng.choice(
        [-1.0, 1.0], o).astype(np.float32)
    post_bias = rng.uniform(-5.0, 5.0, o).astype(np.float32)
    return params, x, w, post_mul, post_bias


@pytest.mark.parametrize("case", CASES, ids=range(len(CASES)))
def test_float_output(case, rng):
    params, x, w, post_mul, post_bias = make_case(rng, case)
    fh, fw = w.shape[1], w.shape[2]
    k = params.backtransform_add(fh, fw)
    oracle = float_conv_oracle(x, w, params, post_mul, post_bias,
                               params.activation)

    transform = fuse_output_transform(post_mul, post_bias, k,
                                      params.activation)
    got = np.asarray(bconv2d_reference(
        bitpack(jnp.asarray(x)), pack_filter(w), transform, params, "float"))
    np.testing.assert_allclose(got, oracle, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("case", CASES, ids=range(len(CASES)))
def test_bitpacked_output(case, rng):
    params, x, w, post_mul, post_bias = make_case(rng, case)
    fh, fw = w.shape[1], w.shape[2]
    k = params.backtransform_add(fh, fw)
    oracle = float_conv_oracle(x, w, params, post_mul, post_bias,
                               params.activation)
    oracle_bits = oracle < 0

    thresholds = compute_output_thresholds(post_mul, post_bias, k,
                                           params.activation)
    # The negative-gamma weight-flip trick: thresholds assume the filter is
    # pre-multiplied by sign(mul) (`mlir/transforms/optimize.cc:120-127`).
    w_flipped = w * np.where(post_mul >= 0, 1.0, -1.0)[:, None, None, None]
    transform = OutputTransform(thresholds=thresholds)
    got_packed = np.asarray(bconv2d_reference(
        bitpack(jnp.asarray(x)), pack_filter(w_flipped), transform, params,
        "bitpacked"))
    got_bits = np.asarray(
        bitunpack(jnp.asarray(got_packed), w.shape[0], dtype=jnp.bool_))
    np.testing.assert_array_equal(got_bits, oracle_bits)


@pytest.mark.parametrize("case", CASES, ids=range(len(CASES)))
def test_int8_output(case, rng):
    params, x, w, post_mul, post_bias = make_case(rng, case)
    fh, fw = w.shape[1], w.shape[2]
    k = params.backtransform_add(fh, fw)
    scale, zp = 0.15, 3
    oracle = float_conv_oracle(x, w, params, post_mul, post_bias,
                               params.activation)
    unrounded = np.clip(oracle / scale + zp, -128, 127)

    transform = fuse_output_transform(post_mul, post_bias, k,
                                      params.activation, output_scale=scale,
                                      output_zero_point=zp)
    got = np.asarray(bconv2d_reference(
        bitpack(jnp.asarray(x)), pack_filter(w), transform, params,
        "int8")).astype(np.float64)
    # Off-by-one (rounding) allowed, off-by-two not (`bconv2d_test.cc:408-428`).
    assert np.max(np.abs(got - unrounded)) < 1.0 + 1e-3


def test_int16_overflow_stress(rng):
    """Large-depth case (`bconv2d_test.cc:808-825` drives 5*5*3072); on TPU we
    always use int32 accumulators, so this just checks no overflow."""
    params = BConv2DParams(channels_in=3072)
    x = random_pm1(rng, (1, 5, 5, 3072))
    w = random_pm1(rng, (4, 5, 5, 3072))
    post_mul = np.ones(4, np.float32)
    post_bias = np.zeros(4, np.float32)
    k = params.backtransform_add(5, 5)
    oracle = float_conv_oracle(x, w, params, post_mul, post_bias,
                               Activation.NONE)
    transform = fuse_output_transform(post_mul, post_bias, k)
    got = np.asarray(bconv2d_reference(
        bitpack(jnp.asarray(x)), pack_filter(w), transform, params, "float"))
    np.testing.assert_allclose(got, oracle, atol=1e-2, rtol=1e-4)
