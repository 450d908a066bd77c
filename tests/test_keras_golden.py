"""Full-architecture Keras golden tests.

Analogue of the reference's trained end-to-end golden tests
(`tests/end2end_test.py:27-143,199-217`): a Keras twin of each zoo
architecture is built *from the same ModelSpec forward* via a builder that
emits Keras layers, randomised (incl. BN moving stats), imported through
``keras_import``, and the float + packed forwards must reproduce the Keras
prediction. This proves the import path on every layer kind the zoo uses
(stem depthwise, transitions, one-padded residual binary blocks, zero-padded
Bi-Real blocks, avg-pool shortcuts) — not just a toy.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from compute_engine_tpu.converter.keras_import import import_keras_weights  # noqa: E402
from compute_engine_tpu.core.params import tflite_same_padding  # noqa: E402
from compute_engine_tpu.models import (convert_model, float_apply,  # noqa: E402
                                       packed_apply)
from compute_engine_tpu.models.zoo import ModelSpec, get_model  # noqa: E402

L = tf.keras.layers


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _ste_sign(t):
    return tf.where(t < 0, -tf.ones_like(t), tf.ones_like(t))


class KerasTwinBuilder:
    """Builds the Keras functional twin by tracing the same spec forward.

    Binary layers are named ``bin_<name>`` so their latent weights can be
    binarised before the golden prediction (larq's QuantConv2D does this
    inside the layer; plain Keras holds latent weights).
    """

    def __init__(self):
        self.binary_layers = []

    def conv_bn(self, x, filters, ksize, *, stride=1, padding="SAME",
                activation=None, name, groups=1, dilation=1):
        y = L.Conv2D(filters, _pair(ksize), strides=_pair(stride),
                     padding=padding.lower(), use_bias=False,
                     groups=groups, dilation_rate=_pair(dilation))(x)
        y = L.BatchNormalization(epsilon=1e-5)(y)
        return L.Activation(activation)(y) if activation else y

    def depthwise_conv_bn(self, x, ksize, *, stride=1, activation=None,
                          name):
        y = L.DepthwiseConv2D(_pair(ksize), strides=_pair(stride),
                              padding="same", use_bias=False)(x)
        y = L.BatchNormalization(epsilon=1e-5)(y)
        return L.Activation(activation)(y) if activation else y

    def binary_conv_bn(self, x, filters, ksize, *, stride=1, padding="SAME",
                       pad_value=1, name, groups=1, dilation=1):
        kh, kw = _pair(ksize)
        sh, sw = _pair(stride)
        dh, dw = _pair(dilation)
        xq = L.Lambda(_ste_sign)(x)
        if padding == "SAME" and pad_value == 1:
            # The PadV2(+1) pattern (`prepare_patterns_common.td:136-168`):
            # +1-pad after quantisation, then a VALID conv.
            _, pt, pb = tflite_same_padding(int(x.shape[1]), kh, sh, dh)
            _, pl, pr = tflite_same_padding(int(x.shape[2]), kw, sw, dw)
            xq = L.Lambda(lambda t: tf.pad(
                t, [[0, 0], [pt, pb], [pl, pr], [0, 0]],
                constant_values=1.0))(xq)
            conv_padding = "valid"
        else:
            conv_padding = padding.lower()
        lname = f"bin_{name}"
        self.binary_layers.append(lname)
        y = L.Conv2D(filters, (kh, kw), strides=(sh, sw),
                     padding=conv_padding, use_bias=False, name=lname,
                     groups=groups, dilation_rate=(dh, dw))(xq)
        return L.BatchNormalization(epsilon=1e-5)(y)

    def binary_dense_bn(self, x, units, *, name):
        xq = L.Lambda(_ste_sign)(x)
        lname = f"bin_{name}"
        self.binary_layers.append(lname)
        y = L.Dense(units, use_bias=False, name=lname)(xq)
        return L.BatchNormalization(epsilon=1e-5)(y)

    def dense(self, x, units, *, use_bias=True, activation=None, name):
        y = L.Dense(units, use_bias=use_bias)(x)
        return L.Activation(activation)(y) if activation else y

    def max_pool(self, x, pool_size, stride=None, padding="SAME"):
        stride = stride if stride is not None else pool_size
        return L.MaxPooling2D(_pair(pool_size), _pair(stride),
                              padding=padding.lower())(x)

    def avg_pool(self, x, pool_size, stride=None, padding="VALID"):
        stride = stride if stride is not None else pool_size
        return L.AveragePooling2D(_pair(pool_size), _pair(stride),
                                  padding=padding.lower())(x)

    def global_avg_pool(self, x):
        return L.GlobalAveragePooling2D()(x)

    def add(self, a, b):
        return L.Add()([a, b])

    def concat(self, xs):
        return L.Concatenate(axis=-1)(xs)

    def flatten(self, x):
        return L.Flatten()(x)

    def activation(self, x, kind):
        return L.Activation(kind)(x)

    def softmax(self, x):
        return L.Softmax()(x)


def build_keras_twin(spec, rng):
    b = KerasTwinBuilder()
    inp = L.Input((*spec.input_size, 3))
    out = spec.forward(b, inp)
    model = tf.keras.Model(inp, out)
    for v in model.weights:
        shape = v.shape.as_list()
        if "moving_variance" in v.name:
            v.assign(rng.uniform(0.5, 2.0, shape).astype(np.float32))
        else:
            v.assign(rng.normal(0, 0.5, shape).astype(np.float32))
    return model, b.binary_layers


def golden_compare(spec, rng, batch=2, atol_float=1e-3, atol_packed=2e-3):
    model, binary_layers = build_keras_twin(spec, rng)
    params = import_keras_weights(model, spec)
    x = rng.normal(0, 1, (batch, *spec.input_size, 3)).astype(np.float32)

    # Golden: Keras prediction with the latent binary weights binarised
    # (larq binarises inside QuantConv2D; the twin holds latent weights).
    for lname in binary_layers:
        layer = model.get_layer(lname)
        (w,) = layer.get_weights()
        layer.set_weights([np.where(w < 0, -1.0, 1.0).astype(np.float32)])
    want = model(x, training=False).numpy()

    got_float = np.asarray(float_apply(spec, params, jnp.asarray(x)))
    np.testing.assert_allclose(got_float, want, atol=atol_float, rtol=1e-2)
    np.testing.assert_array_equal(got_float.argmax(-1), want.argmax(-1))

    artifact = convert_model(spec, params)
    got_packed = np.asarray(packed_apply(spec, artifact, jnp.asarray(x),
                                         compute_dtype=jnp.float32))
    np.testing.assert_allclose(got_packed, want, atol=atol_packed, rtol=1e-2)
    np.testing.assert_array_equal(got_packed.argmax(-1), want.argmax(-1))


def test_quicknet_golden(rng):
    """Full QuickNet at 224x224: depthwise stem, maxpool+conv transitions,
    16 one-padded binary residual blocks."""
    golden_compare(get_model("quicknet"), rng, batch=2)


def test_birealnet_small_golden(rng):
    """Bi-RealNet topology (zero-padded binary convs incl. stride 2,
    avg-pool + 1x1-conv downsample shortcuts) at reduced depth/size."""

    def small_bireal(b, x, num_classes=10):
        x = b.conv_bn(x, 32, 7, stride=2, name="stem_conv")
        x = b.max_pool(x, 3, 2)
        for s, f in enumerate((32, 64)):
            for i in range(2):
                stride = 2 if (s > 0 and i == 0) else 1
                if stride == 2:
                    shortcut = b.avg_pool(x, 2, 2, padding="SAME")
                    shortcut = b.conv_bn(shortcut, f, 1, name=f"shortcut_{s}")
                else:
                    shortcut = x
                y = b.binary_conv_bn(x, f, 3, stride=stride, pad_value=0,
                                     name=f"stage_{s}_block_{i}")
                x = b.add(shortcut, y)
        x = b.global_avg_pool(x)
        x = b.dense(x, num_classes, name="head")
        return b.softmax(x)

    spec = ModelSpec("small_bireal", small_bireal, input_size=(64, 64),
                     num_classes=10)
    golden_compare(spec, rng, batch=2)


def test_binary_densenet_small_golden(rng):
    """BinaryDenseNet block structure: dense concats + 1x1 reduction +
    avg-pool transitions."""

    def small_densenet(b, x, num_classes=10):
        x = b.conv_bn(x, 32, 7, stride=2, activation="relu",
                      name="stem_conv")
        x = b.max_pool(x, 3, 2)
        for block_idx, n_layers in enumerate((2, 2)):
            for i in range(n_layers):
                y = b.binary_conv_bn(x, 32, 3, pad_value=1,
                                     name=f"block_{block_idx}_layer_{i}")
                x = b.concat([x, y])
            if block_idx == 0:
                x = b.conv_bn(x, 64, 1, activation="relu",
                              name="transition_0")
                x = b.avg_pool(x, 2, 2)
        x = b.activation(x, "relu")
        x = b.global_avg_pool(x)
        x = b.dense(x, num_classes, name="head")
        return b.softmax(x)

    spec = ModelSpec("small_densenet", small_densenet, input_size=(64, 64),
                     num_classes=10)
    golden_compare(spec, rng, batch=2)
