"""Death-test analogues: every validation ``raise`` in the op layer fires.

Counterpart of the reference's death tests for unsupported configurations
(`tflite/tests/bconv2d_test.cc:858-895`).
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
    fuse_output_transform,
)
from compute_engine_tpu.ops import bconv2d, bmaxpool2d, dequantize
from compute_engine_tpu.parallel import make_mesh
from compute_engine_tpu.parallel.collective import tp_bconv2d


@pytest.fixture
def packed_case(rng):
    c_in, c_out = 64, 32
    x = bitpack(jnp.asarray(
        rng.choice([-1.0, 1.0], size=(1, 8, 8, c_in)).astype(np.float32)))
    w = bitpack(jnp.asarray(
        rng.choice([-1.0, 1.0], size=(c_out, 3, 3, c_in)).astype(
            np.float32)))
    t = fuse_output_transform(
        rng.uniform(0.5, 1.5, c_out).astype(np.float32),
        rng.uniform(-1, 1, c_out).astype(np.float32), 9 * c_in)
    params = BConv2DParams(channels_in=c_in, padding=Padding.SAME)
    return x, w, t, params


def test_bconv2d_rejects_unpacked_input(packed_case, rng):
    x, w, t, params = packed_case
    xf = rng.normal(0, 1, (1, 8, 8, 64)).astype(np.float32)
    with pytest.raises(TypeError, match="packed_input must be"):
        bconv2d(jnp.asarray(xf), w, t, params)


def test_bconv2d_rejects_bad_rank(packed_case):
    x, w, t, params = packed_case
    with pytest.raises(ValueError, match="rank 4"):
        bconv2d(x[0], w, t, params)


def test_bconv2d_rejects_filter_depth_mismatch(packed_case):
    x, w, t, params = packed_case
    bad = BConv2DParams(channels_in=96, padding=Padding.SAME)
    with pytest.raises(ValueError, match="packed filter depth"):
        bconv2d(x, w, t, bad)


def test_bconv2d_rejects_input_depth_mismatch(packed_case, rng):
    x, w, t, params = packed_case
    x_wide = bitpack(jnp.asarray(
        rng.choice([-1.0, 1.0], size=(1, 8, 8, 128)).astype(np.float32)))
    with pytest.raises(ValueError, match="packed input depth"):
        bconv2d(x_wide, w, t, params)


def test_bconv2d_rejects_bad_group_divisibility(rng):
    # channels_in/groups = 24, not a multiple of 32
    # (`prepare_tf.cc:121-146` divisibility rule).
    c_in, groups, c_out = 48, 2, 32
    x = bitpack(jnp.asarray(
        rng.choice([-1.0, 1.0], size=(1, 8, 8, c_in)).astype(np.float32)))
    w = bitpack(jnp.asarray(rng.choice(
        [-1.0, 1.0], size=(c_out, 3, 3, c_in // groups)).astype(np.float32)))
    t = fuse_output_transform(np.ones(c_out, np.float32),
                              np.zeros(c_out, np.float32),
                              9 * c_in // groups)
    params = BConv2DParams(channels_in=c_in, groups=groups,
                           padding=Padding.VALID)
    with pytest.raises(ValueError, match="multiple of"):
        bconv2d(x, w, t, params)


def test_bconv2d_rejects_unknown_output_kind(packed_case):
    x, w, t, params = packed_case
    with pytest.raises(ValueError, match="output_kind"):
        bconv2d(x, w, t, params, "float16")


def test_bconv2d_rejects_unknown_kernel(packed_case):
    x, w, t, params = packed_case
    with pytest.raises(ValueError, match="unknown kernel"):
        bconv2d(x, w, t, params, kernel="neon")


def test_bmaxpool_rejects_unpacked_input(rng):
    with pytest.raises(TypeError, match="bitpacked"):
        bmaxpool2d(jnp.zeros((1, 4, 4, 8), jnp.float32), 2)


def test_dequantize_int8_requires_scale(rng):
    packed = bitpack(jnp.asarray(
        rng.choice([-1.0, 1.0], size=(2, 64)).astype(np.float32)))
    with pytest.raises(ValueError, match="scale"):
        dequantize(packed, 64, dtype=jnp.int8)


def test_s2d_rejects_unsupported_configs(rng):
    from compute_engine_tpu.kernels.bconv2d import bconv2d_mxu_s2d

    c_in, c_out = 64, 16
    xf = jnp.asarray(rng.normal(0, 1, (1, 8, 8, c_in)).astype(np.float32))
    w = bitpack(jnp.asarray(rng.choice(
        [-1.0, 1.0], size=(c_out, 3, 3, c_in)).astype(np.float32)))
    t = fuse_output_transform(np.ones(c_out, np.float32),
                              np.zeros(c_out, np.float32), 9 * c_in)
    for bad in (
        BConv2DParams(channels_in=c_in, stride=(3, 3), padding=Padding.SAME),
        BConv2DParams(channels_in=c_in, stride=(1, 2), padding=Padding.SAME),
        BConv2DParams(channels_in=c_in, dilation=(2, 2),
                      padding=Padding.SAME),
    ):
        with pytest.raises(ValueError, match="s2d path requires"):
            bconv2d_mxu_s2d(xf, w, t, bad)
    with pytest.raises(ValueError, match="channels_in"):
        bconv2d_mxu_s2d(
            xf, w, t, BConv2DParams(channels_in=128, padding=Padding.SAME))


def test_selector_falls_back_when_s2d_invalid():
    """'auto' must never pick s2d for shapes the retile cannot handle."""
    from compute_engine_tpu.kernels.select import select_bconv2d_kernel

    assert select_bconv2d_kernel(
        "float", c_in=64, c_out=64, fh=3, fw=3, m=128 * 56 * 56,
        groups=2) == "mxu"
    assert select_bconv2d_kernel(
        "float", c_in=64, c_out=64, fh=3, fw=3, m=128 * 56 * 56,
        stride=(3, 3)) == "mxu"
    assert select_bconv2d_kernel(
        "float", c_in=33, c_out=64, fh=3, fw=3, m=128 * 56 * 56) != "s2d"


def test_tp_bconv2d_rejects_indivisible_channels(packed_case):
    x, w, t, params = packed_case  # c_out = 32, model axis = 4 -> ok; use 3
    mesh = make_mesh((1, 8))
    with pytest.raises(ValueError, match="not divisible"):
        tp_bconv2d(x, w[:30], OutputTransform(
            clamp_min=t.clamp_min, clamp_max=t.clamp_max,
            multiplier=t.multiplier[:30], bias=t.bias[:30]),
            params, mesh, axis="model")


def test_tp_pipelined_rejects_indivisible_batch(packed_case):
    x, w, t, params = packed_case  # batch 1 over 4 shards
    mesh = make_mesh((2, 4))
    with pytest.raises(ValueError, match="batch"):
        tp_bconv2d(x, w, t, params, mesh, axis="model", mode="pipelined")


def test_packed_builder_rejects_unknown_domain():
    from compute_engine_tpu.models import PackedBuilder

    with pytest.raises(ValueError, match="domain"):
        PackedBuilder({}, domain="mixed")
