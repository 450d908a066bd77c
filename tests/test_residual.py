"""Fused binary residual block vs the unfused op chain — bit-exact."""

import numpy as np
import pytest

import jax.numpy as jnp

from compute_engine_tpu.core.bitpack import bitpack
from compute_engine_tpu.core.params import BConv2DParams
from compute_engine_tpu.core.transforms import fuse_output_transform
from compute_engine_tpu.core.types import Padding
from compute_engine_tpu.kernels.bconv2d import bconv2d_mxu_float_in
from compute_engine_tpu.kernels.residual import (
    binary_residual_block,
    residual_block_supported,
)


def _case(rng, n, h, w, c, identity=False):
    x = rng.normal(0, 1, (n, h, w, c)).astype(np.float32)
    filt = rng.choice([-1.0, 1.0], size=(c, 3, 3, c)).astype(np.float32)
    if identity:
        post_mul = np.ones(c, np.float32)
        post_bias = np.zeros(c, np.float32)
    else:
        post_mul = rng.uniform(0.1, 2.0, c).astype(np.float32)
        post_bias = rng.uniform(-5, 5, c).astype(np.float32)
    params = BConv2DParams(channels_in=c, stride=(1, 1),
                           padding=Padding.SAME, pad_value=1)
    tr = fuse_output_transform(post_mul, post_bias, 9 * c)
    return x, bitpack(jnp.asarray(filt)), tr, params


CASES = [
    (2, 8, 8, 64),     # concat-K path (C < 128)
    (1, 6, 6, 128),    # per-tap path, single image
    (8, 4, 4, 64),     # nb > 1 (multiple images per grid step)
    (4, 5, 5, 32),     # odd spatial size
]


@pytest.mark.parametrize("n,h,w,c", CASES)
def test_conv_bit_exact(rng, n, h, w, c):
    """Identity transform isolates the integer conv + padding: bit-exact."""
    x, pf, tr, params = _case(rng, n, h, w, c, identity=True)
    xd = jnp.asarray(x)
    fused = binary_residual_block(xd, pf, tr, params, interpret=True)
    y = bconv2d_mxu_float_in(xd, pf, tr, params, output_kind="float",
                             conv_dtype=jnp.int8)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(xd + y))


@pytest.mark.parametrize("n,h,w,c", CASES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_unfused(rng, n, h, w, c, dtype):
    """Full random transform: equal to within one FMA rounding of the
    ``clip*mul + bias`` epilogue (the compiler is free to contract it in
    either program; the conv itself is exact — see test_conv_bit_exact)."""
    x, pf, tr, params = _case(rng, n, h, w, c)
    xd = jnp.asarray(x).astype(dtype)
    fused = binary_residual_block(xd, pf, tr, params, interpret=True)
    y = bconv2d_mxu_float_in(xd, pf, tr, params, output_kind="float",
                             conv_dtype=jnp.int8)
    want = xd + y.astype(dtype)
    assert fused.dtype == dtype
    if dtype == jnp.float32:
        # One FMA rounding of |clip*mul| <= 2*9c*max|mul| -> atol ~ 2e-4.
        np.testing.assert_allclose(
            np.asarray(fused, np.float32), np.asarray(want, np.float32),
            rtol=2e-5, atol=2e-4)
    else:
        # In bf16 the FMA residue can flip the last stored bit: allow one
        # bf16 ulp, and require it to be rare (<2% of elements differ).
        f = np.asarray(fused, np.float32)
        g = np.asarray(want, np.float32)
        np.testing.assert_allclose(f, g, rtol=1.6e-2, atol=0.5)
        assert np.mean(f != g) < 0.02


def test_supported_predicate(rng):
    params = BConv2DParams(channels_in=64, stride=(1, 1),
                           padding=Padding.SAME, pad_value=1)
    assert residual_block_supported((2, 8, 8, 64), params, 64, 3, 3)
    # channel mismatch (no residual), zero padding, stride, kernel size
    assert not residual_block_supported((2, 8, 8, 64), params, 128, 3, 3)
    assert not residual_block_supported((2, 8, 8, 64), params, 64, 5, 5)
    zp = BConv2DParams(channels_in=64, stride=(1, 1), padding=Padding.SAME,
                       pad_value=0)
    assert not residual_block_supported((2, 8, 8, 64), zp, 64, 3, 3)
    st = BConv2DParams(channels_in=64, stride=(2, 2), padding=Padding.SAME,
                       pad_value=1)
    assert not residual_block_supported((2, 8, 8, 64), st, 64, 3, 3)
    # VMEM budget: a huge tile must be rejected, and the op must raise.
    assert not residual_block_supported((1, 512, 512, 256), params, 256, 3, 3)


def test_unsupported_raises(rng):
    x, pf, tr, params = _case(rng, 2, 8, 8, 64)
    bad = BConv2DParams(channels_in=64, stride=(2, 2), padding=Padding.SAME,
                        pad_value=1)
    with pytest.raises(ValueError, match="fused residual block unsupported"):
        binary_residual_block(jnp.asarray(x), pf, tr, bad, interpret=True)
