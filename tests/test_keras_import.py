"""Keras weight import: build a Keras twin of a tiny model, import, compare.

Analogue of the reference's converter end-to-end tests
(`tests/end2end_test.py`): Keras model prediction vs our float/packed
forward with imported weights.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from compute_engine_tpu.converter.keras_import import import_keras_weights  # noqa: E402
from compute_engine_tpu.models import convert_model, float_apply, packed_apply  # noqa: E402
from compute_engine_tpu.models.zoo import ModelSpec  # noqa: E402


def tiny_forward(b, x):
    x = b.conv_bn(x, 16, 3, stride=2, activation="relu", name="stem")
    y = b.binary_conv_bn(x, 16, 3, pad_value=1, name="block0")
    x = b.add(x, y)
    x = b.global_avg_pool(x)
    x = b.dense(x, 10, name="head")
    return b.softmax(x)


SPEC = ModelSpec("tiny_keras", tiny_forward, input_size=(32, 32),
                 num_classes=10)


def build_keras_twin(rng):
    """Same architecture in plain Keras; ste_sign applied manually."""
    layers = tf.keras.layers

    class SteSign(layers.Layer):
        def call(self, t):
            return tf.where(t < 0, -tf.ones_like(t), tf.ones_like(t))

    inp = layers.Input((32, 32, 3))
    x = layers.Conv2D(16, 3, strides=2, padding="same", use_bias=False)(inp)
    x = layers.BatchNormalization(epsilon=1e-5)(x)
    x = layers.Activation("relu")(x)
    # Binary block: sign -> +1-pad -> conv(sign(w) at import time) -> BN.
    xq = SteSign()(x)
    xq = tf.keras.layers.Lambda(
        lambda t: tf.pad(t, [[0, 0], [1, 1], [1, 1], [0, 0]],
                         constant_values=1.0))(xq)
    y = layers.Conv2D(16, 3, padding="valid", use_bias=False,
                      name="binary_conv")(xq)
    y = layers.BatchNormalization(epsilon=1e-5)(y)
    x = layers.Add()([x, y])
    x = layers.GlobalAveragePooling2D()(x)
    out = layers.Softmax()(layers.Dense(10)(x))
    model = tf.keras.Model(inp, out)

    # Randomise weights (incl. BN stats) for a non-trivial comparison.
    for v in model.weights:
        shape = v.shape.as_list()
        if "moving_variance" in v.name:
            v.assign(rng.uniform(0.5, 2.0, shape).astype(np.float32))
        else:
            v.assign(rng.normal(0, 0.5, shape).astype(np.float32))
    return model


def test_keras_import_end2end(rng):
    keras_model = build_keras_twin(rng)
    params = import_keras_weights(keras_model, SPEC)

    x = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    # Keras forward with weights binarised for the binary conv (the keras
    # twin holds latent weights; binarise a copy for a fair oracle).
    w_lat = keras_model.get_layer("binary_conv").get_weights()[0]
    keras_model.get_layer("binary_conv").set_weights(
        [np.where(w_lat < 0, -1.0, 1.0).astype(np.float32)])
    want = keras_model(x, training=False).numpy()

    got_float = np.asarray(float_apply(SPEC, params, jnp.asarray(x)))
    np.testing.assert_allclose(got_float, want, atol=1e-4, rtol=1e-3)

    layers_art = convert_model(SPEC, params)
    got_packed = np.asarray(packed_apply(SPEC, layers_art, jnp.asarray(x),
                                         compute_dtype=jnp.float32))
    np.testing.assert_allclose(got_packed, want, atol=1e-3, rtol=1e-2)


def test_keras_import_mismatch_raises(rng):
    keras_model = build_keras_twin(rng)

    def wrong_forward(b, x):
        x = b.conv_bn(x, 16, 3, stride=2, name="stem")
        x = b.global_avg_pool(x)
        x = b.dense(x, 10, name="head")
        return b.softmax(x)

    wrong = ModelSpec("wrong", wrong_forward, input_size=(32, 32),
                      num_classes=10)
    with pytest.raises(ValueError, match="mismatch"):
        import_keras_weights(keras_model, wrong)
