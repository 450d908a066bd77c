"""End-to-end model tests: packed inference vs the QAT float oracle.

Mirrors `tests/end2end_test.py` in the reference: build models exercising
one-padding, zero-padding, residuals, concat and binary convs; convert; and
assert packed predictions match the float model (`end2end_test.py:210-217`
uses rtol/atol 1e-3 after brief training — we use randomised BN stats).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from compute_engine_tpu.models import (
    convert_model,
    float_apply,
    get_model,
    init_model,
    packed_apply,
)
from compute_engine_tpu.models.zoo import ModelSpec, _quicknet_forward
from compute_engine_tpu.converter import load_artifact, save_artifact


def tiny_quicknet(b, x):
    return _quicknet_forward(b, x, section_filters=(32, 64),
                             section_blocks=(1, 1), num_classes=10)


TINY = ModelSpec("tiny_quicknet", tiny_quicknet, input_size=(32, 32),
                 num_classes=10)


def _check_packed_matches_float(spec, x, atol=1e-2):
    params = init_model(spec, seed=1, randomize_bn=True)
    want = np.asarray(float_apply(spec, params, jnp.asarray(x)))
    layers = convert_model(spec, params)
    for kernel in ("auto", "mxu", "bgemm"):
        got = np.asarray(packed_apply(spec, layers, jnp.asarray(x),
                                      kernel=kernel,
                                      compute_dtype=jnp.float32))
        np.testing.assert_allclose(got, want, atol=atol, rtol=1e-2,
                                   err_msg=f"kernel={kernel}")
    return layers


def test_tiny_quicknet_end2end(rng):
    x = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    _check_packed_matches_float(TINY, x)


def test_birealnet_small_input(rng):
    """Zero-padding (correction path) + strided binary convs + shortcuts."""
    from compute_engine_tpu.models.zoo import birealnet18

    def small_bireal(b, x):
        return birealnet18(b, x, num_classes=10)

    spec = ModelSpec("small_bireal", small_bireal, input_size=(64, 64),
                     num_classes=10)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    _check_packed_matches_float(spec, x)


def test_densenet_tiny(rng):
    from compute_engine_tpu.models.zoo import _binary_densenet_forward

    def tiny_densenet(b, x):
        return _binary_densenet_forward(
            b, x, layers_per_block=(2, 2), reductions=(2.0,),
            growth_rate=32, initial_filters=32, num_classes=10)

    spec = ModelSpec("tiny_densenet", tiny_densenet, input_size=(32, 32),
                     num_classes=10)
    x = rng.normal(0, 1, (1, 32, 32, 3)).astype(np.float32)
    _check_packed_matches_float(spec, x)


def test_artifact_roundtrip(tmp_path, rng):
    params = init_model(TINY, seed=2, randomize_bn=True)
    layers = convert_model(TINY, params)
    path = str(tmp_path / "tiny.npz")
    save_artifact(path, layers, TINY.name, {"input_size": [32, 32]})
    name, config, loaded = load_artifact(path)
    assert name == TINY.name
    assert config["input_size"] == [32, 32]
    x = rng.normal(0, 1, (1, 32, 32, 3)).astype(np.float32)
    a = np.asarray(packed_apply(TINY, layers, jnp.asarray(x),
                                compute_dtype=jnp.float32))
    b = np.asarray(packed_apply(TINY, loaded, jnp.asarray(x),
                                compute_dtype=jnp.float32))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("name", ["quicknet_small", "quicknet",
                                  "quicknet_large", "birealnet18",
                                  "binary_resnet_e18", "binary_alexnet",
                                  "binary_densenet28", "binary_densenet37",
                                  "binary_densenet45"])
def test_full_models_build(name):
    """Every zoo model initialises and converts (shape-level, no math)."""
    spec = get_model(name)
    params = init_model(spec, seed=0)
    layers = convert_model(spec, params)
    n_bconv = sum(1 for l in layers.values() if l["kind"] == "bconv")
    assert n_bconv > 0
    # Binary weight footprint stays packed (uint32).
    for l in layers.values():
        if l["kind"] == "bconv":
            assert l["packed_filter"].dtype == np.uint32


def test_default_bf16_stream_matches_fp32(rng):
    """The shipped default (bf16 inter-layer stream) tracks the fp32 path.

    Accumulation inside every layer stays fp32/int32; only the stored
    residual stream is bf16. Across residual chains that costs a few ulps,
    so the check is top-1 agreement on every sample plus a loose allclose
    on probabilities — guarding the production default's numerics (they
    were previously only covered with compute_dtype=float32).
    """
    params = init_model(TINY, seed=3, randomize_bn=True)
    layers = convert_model(TINY, params)
    x = rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32)
    ref = np.asarray(packed_apply(TINY, layers, jnp.asarray(x),
                                  compute_dtype=jnp.float32))
    got = np.asarray(packed_apply(TINY, layers, jnp.asarray(x),
                                  compute_dtype=jnp.bfloat16))
    assert (got.argmax(-1) == ref.argmax(-1)).all()
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.1)


def test_binary_dense_model_end2end(rng):
    """binary_dense_bn across all builders (BinaryAlexNet-style tail)."""
    def bd_model(b, x):
        x = b.conv_bn(x, 16, 3, stride=2, activation="relu", name="stem")
        x = b.binary_conv_bn(x, 32, 3, pad_value=1, name="bconv")
        x = b.max_pool(x, 2, 2)
        x = b.flatten(x)
        x = b.binary_dense_bn(x, 64, name="bfc")
        x = b.dense(x, 10, name="head")
        return b.softmax(x)

    spec = ModelSpec("bd_model", bd_model, input_size=(16, 16),
                     num_classes=10)
    x = rng.normal(0, 1, (2, 16, 16, 3)).astype(np.float32)
    layers = _check_packed_matches_float(spec, x)
    assert layers["bfc"]["kind"] == "bdense"
    assert layers["bfc"]["packed_kernel"].dtype == np.uint32


def test_rectangular_binary_conv_end_to_end(rng):
    """Non-square binary conv kernels (the reference accepts any FHxFW;
    `core/bconv2d/params.h` carries independent filter dims) through
    convert + packed execution, float-oracle faithful."""
    import jax.numpy as jnp

    from compute_engine_tpu.models import (convert_model, float_apply,
                                           init_model, packed_apply)
    from compute_engine_tpu.models.zoo import ModelSpec

    def rect_net(b, x, num_classes=6):
        x = b.conv_bn(x, 32, 3, stride=2, name="stem")
        y = b.binary_conv_bn(x, 32, (1, 5), pad_value=1, name="rect_a")
        x = b.add(x, y)
        y = b.binary_conv_bn(x, 32, (3, 1), pad_value=0, name="rect_b")
        x = b.add(x, y)
        x = b.global_avg_pool(x)
        x = b.dense(x, num_classes, name="head")
        return b.softmax(x)

    spec = ModelSpec("rect_net", rect_net, input_size=(32, 32),
                     num_classes=6)
    params = init_model(spec, seed=0, randomize_bn=True)
    x = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)).astype("float32"))
    want = np.asarray(float_apply(spec, params, x))
    layers = convert_model(spec, params)
    got = np.asarray(packed_apply(spec, layers, x,
                                  compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=1e-5)
