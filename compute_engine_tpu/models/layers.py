"""Primitive layer math shared by the model builders.

Float-domain primitives follow Keras semantics (kernel layout (H, W, I, O),
BatchNormalization with moving statistics) so that Larq/Keras checkpoints map
1:1 onto our parameter tree, and ``ste_sign`` matches larq's quantizer
(sign with sign(0) = +1), which is exactly the bitpacking convention
``bit = value < 0`` (`core/bitpacking/bitpack.h:159-191`).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

BN_EPSILON = 1e-5


@jax.custom_jvp
def ste_sign(x):
    """larq ``ste_sign``: +-1 with sign(0) = +1; straight-through gradient.

    The backward pass is the clipped identity (``1`` where ``|x| <= 1``),
    matching larq's SteSign quantizer — this makes the QAT float forward
    trainable (used by ``models.train`` for the brief synthetic training
    that produces realistic BN statistics for the golden-logit fixtures,
    the analogue of the reference's `tests/end2end_test.py:199-206`).
    """
    return jnp.where(x < 0, -1.0, 1.0).astype(x.dtype)


@ste_sign.defjvp
def _ste_sign_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return ste_sign(x), jnp.where(jnp.abs(x) <= 1.0, dx, 0.0)


def conv2d(x, kernel, stride=(1, 1), padding="SAME", groups=1,
           dilation=(1, 1)):
    """Plain conv, kernel (H, W, I, O), NHWC."""
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=tuple(stride),
        padding=padding, rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )


def depthwise_conv2d(x, kernel, stride=(1, 1), padding="SAME"):
    """Depthwise conv, kernel (H, W, C, 1) (Keras depthwise layout)."""
    c = x.shape[-1]
    k = jnp.reshape(kernel, (*kernel.shape[:2], 1, c))
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=tuple(stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        preferred_element_type=jnp.float32,
    )


def batch_norm(x, bn_params):
    """Inference-mode BN with moving statistics (Keras semantics)."""
    scale = bn_params["gamma"] * jax.lax.rsqrt(
        bn_params["moving_variance"] + BN_EPSILON)
    return (x - bn_params["moving_mean"]) * scale + bn_params["beta"]


def fold_batch_norm(bn_params):
    """BN -> per-channel (multiplier, bias) on the layer's raw output.

    These are the reference's ``post_activation_multiplier/bias`` inputs
    (`mlir/ir/lce_ops.td` Bconv2d operands 2-3), produced by the OptimizeLCE
    BN-fusion patterns (`optimize_patterns_common.td:39-113`).
    """
    gamma = np.asarray(bn_params["gamma"], np.float64)
    beta = np.asarray(bn_params["beta"], np.float64)
    mean = np.asarray(bn_params["moving_mean"], np.float64)
    var = np.asarray(bn_params["moving_variance"], np.float64)
    mul = gamma / np.sqrt(var + BN_EPSILON)
    bias = beta - mean * mul
    return mul.astype(np.float32), bias.astype(np.float32)


def apply_activation(x, activation):
    if activation is None or activation == "NONE":
        return x
    if activation == "relu":
        return jax.nn.relu(x)
    if activation == "relu6":
        return jnp.clip(x, 0, 6)
    raise ValueError(f"unknown activation {activation!r}")


def max_pool(x, pool_size, stride, padding="SAME"):
    # init must be a CONCRETE scalar of the operand dtype: lax.reduce_window
    # rejects a (weak) int32 Python scalar against an int8 operand, and a
    # traced jnp array init loses the reduce_window_max autodiff path.
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = -jnp.inf
    else:
        init = np.dtype(x.dtype).type(jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x, init, jax.lax.max,
        (1, *pool_size, 1), (1, *stride, 1), padding)


def avg_pool(x, pool_size, stride, padding="VALID"):
    s = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        (1, *pool_size, 1), (1, *stride, 1), padding)
    return (s / float(np.prod(pool_size))).astype(x.dtype)


def global_avg_pool(x):
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


def dense(x, kernel, bias=None):
    y = jnp.dot(x, kernel.astype(x.dtype),
                preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias
    return y


# ---------------------------------------------------------------------------
# Initializers (host-side numpy; used by InitBuilder)
# ---------------------------------------------------------------------------


def he_normal(rng, shape, fan_in):
    return rng.normal(0.0, float(np.sqrt(2.0 / fan_in)),
                      size=shape).astype(np.float32)


def glorot_uniform(rng, shape, fan_in, fan_out):
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return rng.uniform(-limit, limit, size=shape).astype(np.float32)


def init_bn(rng, channels, randomize=False):
    """Random moving stats (when ``randomize``) make conversion tests
    non-trivial — the packed path must reproduce arbitrary BN folds."""
    if randomize:
        return {
            "gamma": rng.uniform(0.2, 1.5, channels).astype(np.float32)
            * rng.choice([-1.0, 1.0], channels).astype(np.float32),
            "beta": rng.normal(0, 0.5, channels).astype(np.float32),
            "moving_mean": rng.normal(0, 1.0, channels).astype(np.float32),
            "moving_variance": rng.uniform(0.5, 2.0,
                                           channels).astype(np.float32),
        }
    return {
        "gamma": np.ones(channels, np.float32),
        "beta": np.zeros(channels, np.float32),
        "moving_mean": np.zeros(channels, np.float32),
        "moving_variance": np.ones(channels, np.float32),
    }
