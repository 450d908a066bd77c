"""Packed-domain model execution: bitpacked activation chaining.

Model-level realisation of the reference's bitpacked-activation rewrite
(`mlir/transforms/optimize.cc:128-244`, `bitpack_activations_patterns.td:20-60`)
and packed pooling (`optimize_patterns_target_arm.td:4-20`): consecutive
binary layers exchange bitpacked words; maxpool between them runs in the
packed domain. Exactness contract: thresholds + sign-flipped filters produce
the *same bits* as signing the float-domain output, so both modes must agree
to float tolerance end to end.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from compute_engine_tpu.models import (convert_model, init_model,
                                       packed_apply)
from compute_engine_tpu.models.zoo import ModelSpec, MODELS


def _mini_alexnet(b, x, num_classes=10):
    """BinaryAlexNet's topology at toy scale: the conv2->pool->conv3->conv4
    ->conv5 chain and the fc1->fc2 chain are the reference's packed fast
    paths (conv3/4/5 run entirely bitpacked-in/bitpacked-out)."""
    x = b.conv_bn(x, 32, 3, stride=2, name="stem")
    x = b.max_pool(x, 3, 2, padding="VALID")
    x = b.binary_conv_bn(x, 64, 3, pad_value=1, name="conv2")
    x = b.max_pool(x, 3, 2, padding="VALID")
    x = b.binary_conv_bn(x, 96, 3, pad_value=1, name="conv3")
    x = b.binary_conv_bn(x, 96, 3, pad_value=1, name="conv4")
    x = b.binary_conv_bn(x, 64, 3, pad_value=1, name="conv5")
    x = b.max_pool(x, 2, 2, padding="VALID")
    x = b.flatten(x)
    x = b.binary_dense_bn(x, 128, name="fc1")
    x = b.binary_dense_bn(x, 128, name="fc2")
    x = b.dense(x, num_classes, name="head")
    return b.softmax(x)


MINI_ALEXNET = ModelSpec("mini_alexnet", _mini_alexnet, input_size=(32, 32),
                         num_classes=10)


@pytest.fixture(scope="module")
def mini_artifact():
    params = init_model(MINI_ALEXNET, seed=3, randomize_bn=True)
    return convert_model(MINI_ALEXNET, params)


def test_packed_domain_matches_float_domain(mini_artifact, rng):
    x = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32))
    out_f = np.asarray(packed_apply(MINI_ALEXNET, mini_artifact, x,
                                    compute_dtype=jnp.float32,
                                    return_logits=True))
    out_p = np.asarray(packed_apply(MINI_ALEXNET, mini_artifact, x,
                                    compute_dtype=jnp.float32,
                                    return_logits=True, domain="packed"))
    # The binary trunk is bit-exact between modes (thresholds == sign of the
    # float output, incl. the tie y==0 -> +1); residual float noise comes
    # only from the float head.
    np.testing.assert_allclose(out_f, out_p, atol=1e-3)
    np.testing.assert_array_equal(out_f.argmax(-1), out_p.argmax(-1))


def test_packed_domain_quicknet_small_section(rng):
    """Residual models pull the float view (adds consume floats); packed
    mode must still be exact there — the lazy-stream fallback path."""
    from compute_engine_tpu.models.zoo import _quicknet_forward

    def tiny(b, x):
        return _quicknet_forward(b, x, section_filters=(32, 64),
                                 section_blocks=(2, 2), num_classes=8)

    spec = ModelSpec("tiny_quicknet", tiny, input_size=(32, 32),
                     num_classes=8)
    layers = convert_model(spec, init_model(spec, seed=1, randomize_bn=True))
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32))
    out_f = np.asarray(packed_apply(spec, layers, x,
                                    compute_dtype=jnp.float32))
    out_p = np.asarray(packed_apply(spec, layers, x,
                                    compute_dtype=jnp.float32,
                                    domain="packed"))
    np.testing.assert_allclose(out_f, out_p, atol=1e-3)


def test_packed_trunk_output_is_bitpacked(mini_artifact, rng):
    """A model ending on a binary layer returns raw packed words — the
    strip_lcedequantize analogue (`mlir/python/util.py:225-365`)."""

    def trunk(b, x):
        x = b.conv_bn(x, 32, 3, stride=2, name="stem")
        x = b.max_pool(x, 3, 2, padding="VALID")
        x = b.binary_conv_bn(x, 64, 3, pad_value=1, name="conv2")
        return b.binary_conv_bn(x, 64, 3, pad_value=1, name="conv3")

    spec = ModelSpec("trunk", trunk, input_size=(32, 32), num_classes=0)
    layers = convert_model(spec, init_model(spec, seed=0, randomize_bn=True))
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32))
    # f32 stream on both sides: the sign of near-zero stem activations must
    # be computed from identical values for the bits to compare equal.
    out = packed_apply(spec, layers, x, domain="packed",
                       compute_dtype=jnp.float32)
    assert out.dtype == jnp.uint32
    assert out.shape[-1] == 64 // 32
    # Bits must equal the sign of the float-domain output.
    from compute_engine_tpu.core import bitpack

    out_f = packed_apply(spec, layers, x, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(bitpack(out_f)))


def test_old_artifact_without_thresholds_still_runs(mini_artifact, rng):
    """domain='packed' on a pre-threshold artifact degrades to float mode."""
    stripped = {name: {k: v for k, v in layer.items()
                       if k not in ("thresholds", "packed_filter_flipped",
                                    "packed_kernel_flipped")}
                for name, layer in mini_artifact.items()}
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32))
    out_p = np.asarray(packed_apply(MINI_ALEXNET, stripped, x,
                                    compute_dtype=jnp.float32,
                                    domain="packed"))
    out_f = np.asarray(packed_apply(MINI_ALEXNET, mini_artifact, x,
                                    compute_dtype=jnp.float32))
    np.testing.assert_allclose(out_p, out_f, atol=1e-3)
