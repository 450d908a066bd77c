"""Model builders: one architecture definition, four execution modes.

The reference splits model handling between a Keras graph, an MLIR pass
pipeline, and a TFLite flatbuffer (SURVEY.md §2.3). The TPU-native redesign
replaces all of that with a single Python model definition executed by
pluggable builders:

  InitBuilder     creates a float parameter tree (Keras layouts)
  FloatBuilder    QAT-style float forward (ste_sign fake-quant) — the
                  semantic oracle, equivalent to running the Keras model
  ConvertBuilder  walks the same definition and emits the packed inference
                  artifact (BN folding, sign binarisation, bitpacking) —
                  this *is* the converter; the pattern-matching MLIR passes
                  are unnecessary because layer structure is explicit
  PackedBuilder   packed inference forward using ops.bconv2d / bmaxpool2d

Builders that only need shapes (Init, Convert) run under ``jax.eval_shape``,
so no real math is executed at convert time except the host-side numpy
weight transformation.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.bitpack import bitpack_np
from ..core.params import BConv2DParams
from ..core.transforms import (OutputTransform, compute_output_thresholds,
                               fuse_output_transform)
from ..core.types import Activation, Padding
from ..ops import bconv2d, bmaxpool2d, quantize
from . import layers as L

__all__ = ["InitBuilder", "FloatBuilder", "CalibrateBuilder",
           "ConvertBuilder", "PackedBuilder", "Int8Tensor", "init_model",
           "float_apply", "calibrate_model", "convert_model",
           "packed_apply", "prepare_runtime_arrays"]


class _Base:
    """Shared pooling/arithmetic ops (identical in every mode)."""

    def max_pool(self, x, pool_size, stride=None, padding="SAME"):
        pool_size = _pair(pool_size)
        stride = _pair(stride) if stride is not None else pool_size
        return L.max_pool(x, pool_size, stride, padding)

    def avg_pool(self, x, pool_size, stride=None, padding="VALID"):
        pool_size = _pair(pool_size)
        stride = _pair(stride) if stride is not None else pool_size
        return L.avg_pool(x, pool_size, stride, padding)

    def global_avg_pool(self, x):
        return L.global_avg_pool(x)

    def add(self, a, b):
        return a + b

    def concat(self, xs):
        return jnp.concatenate(xs, axis=-1)

    def flatten(self, x):
        return x.reshape(x.shape[0], -1)

    def activation(self, x, kind):
        return L.apply_activation(x, kind)

    def softmax(self, x):
        return jax.nn.softmax(x.astype(jnp.float32), axis=-1)


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class InitBuilder(_Base):
    """Creates the float parameter tree while tracing the forward."""

    def __init__(self, seed=0, randomize_bn=False):
        self.rng = np.random.default_rng(seed)
        self.params = {}
        self.randomize_bn = randomize_bn

    def _bn(self, c):
        return L.init_bn(self.rng, c, randomize=self.randomize_bn)

    def conv_bn(self, x, filters, ksize, *, stride=1, padding="SAME",
                activation=None, name, groups=1, dilation=1):
        kh, kw = _pair(ksize)
        c = x.shape[-1] // groups
        kernel = L.he_normal(self.rng, (kh, kw, c, filters), kh * kw * c)
        self.params[name] = {"kernel": kernel, "bn": self._bn(filters)}
        return L.batch_norm(
            L.conv2d(x, jnp.asarray(kernel), _pair(stride), padding,
                     groups=groups, dilation=_pair(dilation)),
            {k: jnp.asarray(v) for k, v in self.params[name]["bn"].items()})

    def depthwise_conv_bn(self, x, ksize, *, stride=1, activation=None,
                          name):
        kh, kw = _pair(ksize)
        c = x.shape[-1]
        kernel = L.he_normal(self.rng, (kh, kw, c, 1), kh * kw)
        self.params[name] = {"kernel": kernel, "bn": self._bn(c)}
        return L.batch_norm(
            L.depthwise_conv2d(x, jnp.asarray(kernel), _pair(stride)),
            {k: jnp.asarray(v) for k, v in self.params[name]["bn"].items()})

    def binary_conv_bn(self, x, filters, ksize, *, stride=1, padding="SAME",
                       pad_value=1, name, groups=1, dilation=1):
        kh, kw = _pair(ksize)
        c = x.shape[-1] // groups
        # Latent real-valued weights (binarised by ste_sign at use).
        kernel = self.rng.uniform(-1, 1,
                                  (kh, kw, c, filters)).astype(np.float32)
        self.params[name] = {"kernel": kernel, "bn": self._bn(filters)}
        return L.batch_norm(
            _float_binary_conv(x, jnp.asarray(kernel), _pair(stride), padding,
                               pad_value, groups=groups,
                               dilation=_pair(dilation)),
            {k: jnp.asarray(v) for k, v in self.params[name]["bn"].items()})

    def binary_dense_bn(self, x, units, *, name):
        c = x.shape[-1]
        kernel = self.rng.uniform(-1, 1, (c, units)).astype(np.float32)
        self.params[name] = {"kernel": kernel, "bn": self._bn(units)}
        return L.batch_norm(
            _float_binary_dense(x, jnp.asarray(kernel)),
            {k: jnp.asarray(v) for k, v in self.params[name]["bn"].items()})

    def dense(self, x, units, *, use_bias=True, activation=None, name):
        c = x.shape[-1]
        kernel = L.glorot_uniform(self.rng, (c, units), c, units)
        p = {"kernel": kernel}
        if use_bias:
            p["bias"] = np.zeros(units, np.float32)
        self.params[name] = p
        y = L.dense(x, jnp.asarray(kernel),
                    jnp.asarray(p["bias"]) if use_bias else None)
        return L.apply_activation(y, activation)


def _float_binary_conv(x, kernel, stride, padding, pad_value, groups=1,
                       dilation=(1, 1)):
    """QAT forward: sign(x) conv sign(w), with one- or zero-padding.

    One-padding pads +1 *after* quantisation (the PadV2(+1) pattern the
    converter recognises, `prepare_patterns_common.td:136-168`); zero-padding
    pads the literal 0.0 like a plain SAME conv on the quantised input.
    Groups and dilation follow the reference's coverage (`prepare_tf.cc:
    121-146` grouped shape validation, `:172` dilated recomposition).
    """
    xq = L.ste_sign(x)
    wq = L.ste_sign(kernel)
    if padding == "SAME" and pad_value == 1:
        kh, kw = kernel.shape[0], kernel.shape[1]
        # TF SAME split: before = total // 2 for stride-agnostic shapes we
        # compute via the params helper to stay exact.
        from ..core.params import tflite_same_padding
        _, pt, pb = tflite_same_padding(x.shape[1], kh, stride[0],
                                        dilation[0])
        _, pl_, pr = tflite_same_padding(x.shape[2], kw, stride[1],
                                         dilation[1])
        xq = jnp.pad(xq, ((0, 0), (pt, pb), (pl_, pr), (0, 0)),
                     constant_values=1.0)
        return L.conv2d(xq, wq, stride, "VALID", groups=groups,
                        dilation=dilation)
    return L.conv2d(xq, wq, stride, padding, groups=groups,
                    dilation=dilation)


def _float_binary_dense(x, kernel):
    """QAT binary dense: sign(x) @ sign(w) (larq QuantDense)."""
    return jnp.dot(L.ste_sign(x), L.ste_sign(kernel),
                   preferred_element_type=jnp.float32)


class FloatBuilder(_Base):
    """QAT-style float forward from a parameter tree (the accuracy oracle)."""

    def __init__(self, params):
        self.params = params

    def _bn(self, name):
        return {k: jnp.asarray(v) for k, v in self.params[name]["bn"].items()}

    def _apply_bn(self, y, name):
        """BN application hook — inference-mode moving statistics here;
        ``models.train.TrainBuilder`` overrides this with batch statistics."""
        return L.batch_norm(y, self._bn(name))

    def conv_bn(self, x, filters, ksize, *, stride=1, padding="SAME",
                activation=None, name, groups=1, dilation=1):
        y = L.conv2d(x, jnp.asarray(self.params[name]["kernel"]),
                     _pair(stride), padding, groups=groups,
                     dilation=_pair(dilation))
        return L.apply_activation(self._apply_bn(y, name), activation)

    def depthwise_conv_bn(self, x, ksize, *, stride=1, activation=None,
                          name):
        y = L.depthwise_conv2d(x, jnp.asarray(self.params[name]["kernel"]),
                               _pair(stride))
        return L.apply_activation(self._apply_bn(y, name), activation)

    def binary_conv_bn(self, x, filters, ksize, *, stride=1, padding="SAME",
                       pad_value=1, name, groups=1, dilation=1):
        y = _float_binary_conv(x, jnp.asarray(self.params[name]["kernel"]),
                               _pair(stride), padding, pad_value,
                               groups=groups, dilation=_pair(dilation))
        return self._apply_bn(y, name)

    def binary_dense_bn(self, x, units, *, name):
        p = self.params[name]
        return self._apply_bn(_float_binary_dense(x, jnp.asarray(p["kernel"])),
                              name)

    def dense(self, x, units, *, use_bias=True, activation=None, name):
        p = self.params[name]
        y = L.dense(x, jnp.asarray(p["kernel"]),
                    jnp.asarray(p["bias"]) if use_bias else None)
        return L.apply_activation(y, activation)


class CalibrateBuilder(FloatBuilder):
    """Float forward that records per-layer input/output abs-max ranges.

    The activation-range calibration pass for int8 conversion — the analogue
    of the reference's quantisation statistics (FakeQuant ranges consumed by
    `LCEQuantizePass`, with `experimental_default_int8_range` as fallback,
    `converter.py:94-101`). Run it over a few batches, then pass ``ranges``
    to ``convert_model(..., int8_ranges=...)``; pass ``out_ranges`` as
    ``int8_out_ranges=`` to keep int8 tensors flowing *between* consecutive
    int8 layers (the true-int8 pipeline, `mlir/transforms/quantize.cc:15-42`)
    instead of rescaling to float after every layer.
    """

    def __init__(self, params, ranges=None):
        super().__init__(params)
        self.ranges = ranges if ranges is not None else {}
        self.out_ranges = {}
        self._add_idx = 0

    def _record(self, name, x, table):
        table[name] = max(table.get(name, 0.0), float(jnp.max(jnp.abs(x))))

    def add(self, a, b):
        # Residual adds get synthesized names by trace order (the forward
        # is deterministic, so every builder sees the same sequence). An
        # add with a calibrated output range becomes an int8 op in the
        # converted model — the TFLite int8 ADD analogue that lets the
        # residual stream itself flow int8 (the stream's bf16 width is
        # what caps the float pipeline at ~68% MAC-SOL; see
        # section_profile's floors).
        name = f"__add_{self._add_idx}"
        self._add_idx += 1
        y = super().add(a, b)
        self._record(name, y, self.out_ranges)
        return y

    def conv_bn(self, x, filters, ksize, **kw):
        self._record(kw["name"], x, self.ranges)
        y = super().conv_bn(x, filters, ksize, **kw)
        self._record(kw["name"], y, self.out_ranges)
        return y

    def depthwise_conv_bn(self, x, ksize, **kw):
        self._record(kw["name"], x, self.ranges)
        y = super().depthwise_conv_bn(x, ksize, **kw)
        self._record(kw["name"], y, self.out_ranges)
        return y

    def binary_conv_bn(self, x, filters, ksize, **kw):
        # Only the OUTPUT of a binary conv is quantisable (its input is
        # 1-bit by definition); an out range enables int8-output bconv.
        y = super().binary_conv_bn(x, filters, ksize, **kw)
        self._record(kw["name"], y, self.out_ranges)
        return y

    def dense(self, x, units, **kw):
        self._record(kw["name"], x, self.ranges)
        y = super().dense(x, units, **kw)
        self._record(kw["name"], y, self.out_ranges)
        return y


class ConvertBuilder(_Base):
    """Emits the packed inference artifact while tracing the forward.

    Weight transformation per layer kind:
      float conv  BN folded into the kernel (+bias) — standard fusion; with
                  an int8 calibration range, additionally per-channel int8
                  weight quantisation (int8 model support, the analogue of
                  `mlir/transforms/quantize.cc` + LCEQuantizePass).
      binary conv latent weights -> sign -> OHWI bitpack
                  (`mlir/transforms/bitpack_weights.cc:13-49`); BN -> per-
                  channel post_mul/post_bias -> fused transform
                  (`tflite/kernels/bconv2d.cc:353-389`).
    """

    def __init__(self, params, int8_ranges=None, int8_out_ranges=None):
        self.params = params
        self.layers = {}
        self.int8_ranges = int8_ranges or {}
        # Output ranges enable the true-int8 pipeline: a layer with an
        # out_scale REQUANTISES to int8 instead of rescaling to float, so
        # consecutive int8 layers exchange int8 tensors
        # (`mlir/transforms/quantize.cc:15-42`).
        self.int8_out_ranges = int8_out_ranges or {}
        self._add_idx = 0

    def add(self, a, b):
        # Calibrated residual adds convert to int8 ADD ops (TFLite int8
        # Add analogue): the artifact records the output scale under the
        # synthesized trace-order name; PackedBuilder then executes the
        # add in the int8 domain when both operands arrive int8.
        name = f"__add_{self._add_idx}"
        self._add_idx += 1
        if name in self.int8_out_ranges:
            self.layers[name] = {
                "kind": "add",
                "out_scale": float(self.int8_out_ranges[name]) / 127.0,
            }
        return super().add(a, b)

    def _maybe_int8(self, name, entry, reduce_axes=None):
        """Per-channel int8 weight quantisation + input/output scales.

        ``reduce_axes``: kernel axes reduced for the per-channel scale
        (default: all but the last = per-output-channel; depthwise kernels
        pass (0, 1, 3) to scale per depth channel).
        """
        if name not in self.int8_ranges:
            return entry
        kernel = entry["kernel"]  # BN already folded
        if reduce_axes is None:
            reduce_axes = tuple(range(kernel.ndim - 1))
        w_scale = np.maximum(
            np.max(np.abs(kernel), axis=reduce_axes, keepdims=True),
            1e-9) / 127.0
        entry["kernel_int8"] = np.clip(
            np.round(kernel / w_scale), -127, 127).astype(np.int8)
        entry["w_scale"] = np.squeeze(w_scale, reduce_axes).astype(np.float32)
        entry["in_scale"] = float(self.int8_ranges[name]) / 127.0
        if name in self.int8_out_ranges:
            entry["out_scale"] = float(self.int8_out_ranges[name]) / 127.0
        del entry["kernel"]
        return entry

    def conv_bn(self, x, filters, ksize, *, stride=1, padding="SAME",
                activation=None, name, groups=1, dilation=1):
        p = self.params[name]
        mul, bias = L.fold_batch_norm(p["bn"])
        kernel = np.asarray(p["kernel"], np.float32) * mul
        self.layers[name] = self._maybe_int8(name, {
            "kind": "conv", "kernel": kernel.astype(np.float32),
            "bias": bias, "stride": _pair(stride), "padding": padding,
            "activation": activation, "groups": groups,
            "dilation": _pair(dilation),
        })
        return L.batch_norm(
            L.conv2d(x, jnp.asarray(p["kernel"]), _pair(stride), padding,
                     groups=groups, dilation=_pair(dilation)),
            {k: jnp.asarray(v) for k, v in p["bn"].items()})

    def depthwise_conv_bn(self, x, ksize, *, stride=1, activation=None,
                          name):
        p = self.params[name]
        mul, bias = L.fold_batch_norm(p["bn"])
        kernel = np.asarray(p["kernel"], np.float32) * mul.reshape(1, 1, -1, 1)
        self.layers[name] = self._maybe_int8(name, {
            "kind": "depthwise_conv", "kernel": kernel.astype(np.float32),
            "bias": bias, "stride": _pair(stride), "activation": activation,
        }, reduce_axes=(0, 1, 3))
        return L.batch_norm(
            L.depthwise_conv2d(x, jnp.asarray(p["kernel"]), _pair(stride)),
            {k: jnp.asarray(v) for k, v in p["bn"].items()})

    def binary_conv_bn(self, x, filters, ksize, *, stride=1, padding="SAME",
                       pad_value=1, name, groups=1, dilation=1):
        p = self.params[name]
        channels_in = int(x.shape[-1])
        post_mul, post_bias = L.fold_batch_norm(p["bn"])
        kh, kw = _pair(ksize)
        # K = FH*FW*C_in_per_group (`tflite/kernels/bconv2d.cc:361-363`).
        k = kh * kw * (channels_in // groups)
        transform = fuse_output_transform(post_mul, post_bias, k)
        # Binarise + OHWI-transpose + pack (compile-time, like
        # BitpackWeightsLCE const-folding). Grouped filters keep per-group
        # packed depth (`tflite/kernels/bconv2d.cc:169-186`).
        w = np.asarray(p["kernel"], np.float32)  # (H, W, I/groups, O)
        w_ohwi = np.transpose(w, (3, 0, 1, 2))
        packed = bitpack_np(w_ohwi)
        # Packed-domain chaining support: per-channel thresholds require the
        # filter pre-multiplied by sign(post_mul) (the negative-gamma flip,
        # `mlir/transforms/optimize.cc:79-127`); padding bits must stay 0, so
        # the flipped filter is binarised and re-packed rather than the
        # packed words inverted.
        flip = np.where(post_mul < 0, -1.0, 1.0).astype(np.float32)
        self.layers[name] = {
            "kind": "bconv",
            "packed_filter": packed,
            "packed_filter_flipped": bitpack_np(
                np.where(w_ohwi * flip[:, None, None, None] < 0, -1.0, 1.0)),
            "thresholds": compute_output_thresholds(post_mul, post_bias, k),
            "multiplier": transform.multiplier,
            "bias": transform.bias,
            "clamp_min": transform.clamp_min,
            "clamp_max": transform.clamp_max,
            "channels_in": channels_in,
            "stride": _pair(stride),
            "padding": padding,
            "pad_value": pad_value,
            "groups": groups,
            "dilation": _pair(dilation),
        }
        if name in self.int8_out_ranges:
            # int8-output binary conv: the int8 requantisation is folded
            # into the per-channel transform (`tflite/kernels/bconv2d.cc:
            # 369-378`), so the kernel writes int8 directly.
            out_scale = float(self.int8_out_ranges[name]) / 127.0
            tr8 = fuse_output_transform(post_mul, post_bias, k,
                                        output_scale=out_scale)
            self.layers[name]["int8_multiplier"] = tr8.multiplier
            self.layers[name]["int8_bias"] = tr8.bias
            self.layers[name]["out_scale"] = out_scale
        return L.batch_norm(
            _float_binary_conv(x, jnp.asarray(p["kernel"]), _pair(stride),
                               padding, pad_value, groups=groups,
                               dilation=_pair(dilation)),
            {k2: jnp.asarray(v) for k2, v in p["bn"].items()})

    def binary_dense_bn(self, x, units, *, name):
        p = self.params[name]
        channels_in = int(x.shape[-1])
        post_mul, post_bias = L.fold_batch_norm(p["bn"])
        transform = fuse_output_transform(post_mul, post_bias, channels_in)
        w = np.asarray(p["kernel"], np.float32)  # (C, units)
        packed = bitpack_np(np.where(w.T < 0, -1.0, 1.0))  # (units, Cp)
        flip = np.where(post_mul < 0, -1.0, 1.0).astype(np.float32)
        self.layers[name] = {
            "kind": "bdense",
            "packed_kernel": packed,
            "packed_kernel_flipped": bitpack_np(
                np.where(w.T * flip[:, None] < 0, -1.0, 1.0)),
            "thresholds": compute_output_thresholds(post_mul, post_bias,
                                                    channels_in),
            "multiplier": transform.multiplier,
            "bias": transform.bias,
            "clamp_min": transform.clamp_min,
            "clamp_max": transform.clamp_max,
            "channels_in": channels_in,
        }
        return L.batch_norm(
            _float_binary_dense(x, jnp.asarray(p["kernel"])),
            {k2: jnp.asarray(v) for k2, v in p["bn"].items()})

    def dense(self, x, units, *, use_bias=True, activation=None, name):
        p = self.params[name]
        self.layers[name] = self._maybe_int8(name, {
            "kind": "dense",
            "kernel": np.asarray(p["kernel"], np.float32),
            "bias": np.asarray(p["bias"], np.float32) if use_bias else None,
            "activation": activation,
        })
        y = L.dense(x, jnp.asarray(p["kernel"]),
                    jnp.asarray(p["bias"]) if use_bias else None)
        return L.apply_activation(y, activation)


class _BinaryStream:
    """Lazily materialised output of a binary layer (packed-domain mode).

    The reference's bitpacked-activation optimisation decides statically
    whether a binary op's output is consumed packed (next op is binary ->
    write bitpacked via thresholds, `bitpack_activations_patterns.td:20-60`)
    or dense. Builders trace forward without lookahead, so the decision is
    made lazily at the *consumer*: a binary layer returns this wrapper, and
    whichever representation the consumer pulls is the one that executes
    (memoised — a single consumer computes exactly one conv).
    """

    def __init__(self, packed_fn, float_fn, channels: int):
        self._packed_fn, self._float_fn = packed_fn, float_fn
        self.channels = channels
        self._packed = self._float = None

    def packed(self):
        if self._packed is None:
            self._packed = self._packed_fn()
        return self._packed

    def to_float(self):
        if self._float is None:
            self._float = self._float_fn()
        return self._float


class Int8Tensor:
    """An int8 activation tensor with its symmetric scale (zero_point = 0).

    The unit of the true-int8 pipeline: layers converted with an out_scale
    requantise to int8 and hand this wrapper to the next layer, which
    consumes the int8 values directly — no float rescale round-trip between
    consecutive int8 layers (reference analogue:
    `mlir/transforms/quantize.cc:15-42`, int8 tensors flowing between TFLite
    int8 kernels). Binary layers read signs straight off the int8 values
    (bit = v < 0, exact for zero_point 0).
    """

    def __init__(self, values, scale: float):
        self.values = values
        self.scale = float(scale)

    def to_float(self):
        return self.values.astype(jnp.float32) * self.scale


class _DeferredBConv:
    """A float-output binary conv whose execution waits for its consumer.

    The zoo's hot loop is ``x = add(x, binary_conv_bn(x, ...))``. When the
    consumer turns out to be that residual add, the whole block runs as ONE
    Pallas kernel (`kernels/residual.binary_residual_block`) — sign, conv,
    output transform and add in a single VMEM residency, cutting the
    HBM-bound early sections from ~4 activation passes to the 2-pass floor.
    This is the builder-level analogue of the reference's graph-fusion
    passes (`mlir/transforms/optimize.cc:52-126` fuses BN/activations into
    the conv; the residual add has no reference fusion — it is the
    TPU-specific extension). Any other consumer calls ``materialize()``,
    which falls back to the normal per-op path.
    """

    def __init__(self, x, packed_filter, transform, params, unfused_fn):
        self.x = x
        self.packed_filter = packed_filter
        self.transform = transform
        self.params = params
        self._unfused_fn = unfused_fn
        self._value = None
        self._fused = None

    def materialize(self):
        if self._value is None:
            if self._fused is not None:
                # The conv already ran inside the fused residual kernel;
                # recover conv(x) = fused - x rather than running a second
                # conv that could differ by an FMA rounding.
                self._value = self._fused - self.x.astype(self._fused.dtype)
            else:
                self._value = self._unfused_fn()
        return self._value

    def fuses_with(self, other):
        """True when ``add(other, self)`` is this conv's own residual add."""
        return other is self.x and self._value is None

    def fused_add(self):
        from ..kernels.residual import binary_residual_block

        if self._fused is None:
            self._fused = binary_residual_block(
                self.x, self.packed_filter, self.transform, self.params)
        return self._fused


class PackedBuilder(_Base):
    """Packed inference forward over a converted artifact.

    ``return_logits`` turns the final softmax into identity — the analogue of
    the reference's output-surgery utilities (`mlir/python/util.py:176-365`)
    that re-expose raw model outputs.

    ``domain="packed"`` chains consecutive binary ops through bitpacked
    activations (thresholds + sign-flipped filters computed at convert time)
    and pools in the packed domain — the model-level realisation of the
    reference's bitpacked-activation graph rewrite
    (`mlir/transforms/optimize.cc:128-244`,
    `optimize_patterns_target_arm.td:4-20`). Non-binary consumers pull the
    float representation instead, so mixed graphs (residual adds, concats)
    stay exact.
    """

    def __init__(self, artifact_layers, kernel="auto",
                 compute_dtype=jnp.bfloat16, return_logits=False,
                 binary_dtype=jnp.int8, domain="float"):
        self.layers = artifact_layers
        self.kernel = kernel
        self.compute_dtype = compute_dtype
        self.return_logits = return_logits
        # Operand dtype for the +-1 MXU convs: bf16 (fp32 accum) or int8
        # (int32 accum, 2x MXU rate) — both exact for +-1 operands.
        self.binary_dtype = binary_dtype
        if domain not in ("float", "packed"):
            raise ValueError(f"unknown domain {domain!r}")
        self.domain = domain
        self._add_idx = 0

    # -- packed-domain plumbing ---------------------------------------------

    def _f(self, x):
        """Materialise a float view of a wrapped (packed / int8) tensor."""
        if isinstance(x, _DeferredBConv):
            return x.materialize()
        if isinstance(x, (_BinaryStream, Int8Tensor)):
            return x.to_float()
        return x

    def max_pool(self, x, pool_size, stride=None, padding="SAME"):
        if isinstance(x, _DeferredBConv):
            x = x.materialize()
        if isinstance(x, Int8Tensor):
            # max commutes with the positive scale: pool in the int8 domain.
            ps = _pair(pool_size)
            st = _pair(stride) if stride is not None else ps
            return Int8Tensor(L.max_pool(x.values, ps, st, padding),
                              x.scale)
        if isinstance(x, _BinaryStream):
            # sign is monotonic, so max commutes with it: pooling in the
            # packed domain (bitwise AND) equals sign(float maxpool). The
            # reference's Quantize(MaxPool) -> BMaxPool(Quantize) rewrite.
            ps = _pair(pool_size)
            st = _pair(stride) if stride is not None else ps
            pad = Padding.SAME if padding == "SAME" else Padding.VALID
            return _BinaryStream(
                lambda: bmaxpool2d(x.packed(), ps, st, pad),
                lambda: super(PackedBuilder, self).max_pool(
                    x.to_float(), pool_size, stride, padding),
                x.channels)
        return super().max_pool(x, pool_size, stride, padding)

    def flatten(self, x):
        if isinstance(x, _DeferredBConv):
            x = x.materialize()
        if isinstance(x, Int8Tensor):
            return Int8Tensor(x.values.reshape(x.values.shape[0], -1),
                              x.scale)
        if isinstance(x, _BinaryStream):
            if x.channels % 32 == 0:
                # Packed flatten is exact only when no padding bits would
                # interleave into the flattened word stream.
                return _BinaryStream(
                    lambda: x.packed().reshape(x.packed().shape[0], -1),
                    lambda: super(PackedBuilder, self).flatten(x.to_float()),
                    -1)
            x = x.to_float()
        return super().flatten(x)

    def avg_pool(self, x, *a, **kw):
        return super().avg_pool(self._f(x), *a, **kw)

    def global_avg_pool(self, x):
        return super().global_avg_pool(self._f(x))

    def add(self, a, b):
        name = f"__add_{self._add_idx}"
        self._add_idx += 1
        for u, v in ((a, b), (b, a)):
            if isinstance(v, _DeferredBConv) and v.fuses_with(u):
                return v.fused_add()
        entry = self.layers.get(name)
        if (entry is not None and entry.get("kind") == "add"
                and isinstance(a, Int8Tensor) and isinstance(b, Int8Tensor)):
            # int8 residual add (TFLite int8 ADD semantics: rescale both
            # operands to the calibrated output scale, round, saturate).
            # The residual stream then stays int8 end to end — half the
            # HBM bytes of the bf16 stream, which is the binding resource
            # of the early sections (see section_profile floors).
            from ..core.types import round_half_away

            so = float(entry["out_scale"])
            y = (a.values.astype(jnp.float32) * (a.scale / so)
                 + b.values.astype(jnp.float32) * (b.scale / so))
            y_q = jnp.clip(round_half_away(y), -127, 127).astype(jnp.int8)
            return Int8Tensor(y_q, so)
        return super().add(self._f(a), self._f(b))

    def concat(self, xs):
        return super().concat([self._f(x) for x in xs])

    def activation(self, x, kind):
        return super().activation(self._f(x), kind)

    def softmax(self, x):
        x = self._f(x)
        if self.return_logits:
            return x.astype(jnp.float32)
        return super().softmax(x)

    def _store(self, y):
        """Materialise an inter-layer activation in the compute dtype.

        Accumulation stays fp32/int32 inside each layer; storing the stream
        in bf16 (the production default) halves HBM traffic between layers,
        which dominates the early high-resolution sections. compute_dtype=
        float32 keeps the whole stream fp32 (bit-exact test mode).
        """
        return y.astype(self.compute_dtype)

    def _int8_in(self, x, a):
        """int8 input values + their scale, quantising floats on entry.

        An Int8Tensor input is consumed directly at the PRODUCER's scale —
        the true-int8 pipeline has no float round-trip between layers."""
        from ..core.types import round_half_away

        if isinstance(x, Int8Tensor):
            return x.values, x.scale
        x = self._f(x)
        x_q = jnp.clip(round_half_away(x.astype(jnp.float32)
                                       / a["in_scale"]),
                       -127, 127).astype(jnp.int8)
        return x_q, a["in_scale"]

    def _int8_out(self, acc, scale, a, activation, store=True):
        """Rescale an int32 accumulator: to an Int8Tensor when the layer has
        an out_scale (requantise, activation applied in the quantised
        domain), else to float."""
        from ..core.types import round_half_away

        bias = jnp.asarray(a["bias"]) if a.get("bias") is not None else 0.0
        if "out_scale" in a:
            out_s = a["out_scale"]
            y = acc.astype(jnp.float32) * (scale / out_s) + bias / out_s
            if activation == "relu":
                y = jnp.maximum(y, 0.0)
            elif activation == "relu6":
                y = jnp.clip(y, 0.0, 6.0 / out_s)
            elif activation is not None:
                raise ValueError(
                    f"unsupported activation {activation!r} on an "
                    "int8-output layer")
            y_q = jnp.clip(round_half_away(y), -127, 127).astype(jnp.int8)
            return Int8Tensor(y_q, out_s)
        y = acc.astype(jnp.float32) * scale + bias
        y = L.apply_activation(y, activation)
        return self._store(y) if store else y

    def conv_bn(self, x, filters, ksize, *, stride=1, padding="SAME",
                activation=None, name, groups=1, dilation=1):
        a = self.layers[name]
        if "kernel_int8" in a:
            x_q, in_s = self._int8_in(x, a)
            acc = jax.lax.conv_general_dilated(
                x_q, jnp.asarray(a["kernel_int8"]),
                window_strides=_pair(stride), padding=padding,
                rhs_dilation=_pair(dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
                preferred_element_type=jnp.int32)
            return self._int8_out(acc, jnp.asarray(a["w_scale"]) * in_s,
                                  a, activation)
        x = self._f(x)
        y = L.conv2d(x.astype(self.compute_dtype),
                     jnp.asarray(a["kernel"]), _pair(stride), padding,
                     groups=groups, dilation=_pair(dilation))
        y = y.astype(jnp.float32) + jnp.asarray(a["bias"])
        return self._store(L.apply_activation(y, activation))

    def depthwise_conv_bn(self, x, ksize, *, stride=1, activation=None,
                          name):
        a = self.layers[name]
        if "kernel_int8" in a:
            x_q, in_s = self._int8_in(x, a)
            k = jnp.asarray(a["kernel_int8"])  # (H, W, C, 1)
            c = x_q.shape[-1]
            acc = jax.lax.conv_general_dilated(
                x_q, k.reshape(*k.shape[:2], 1, c),
                window_strides=_pair(stride), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
                preferred_element_type=jnp.int32)
            return self._int8_out(acc, jnp.asarray(a["w_scale"]) * in_s,
                                  a, activation)
        x = self._f(x)
        y = L.depthwise_conv2d(x.astype(self.compute_dtype),
                               jnp.asarray(a["kernel"]), _pair(stride))
        y = y.astype(jnp.float32) + jnp.asarray(a["bias"])
        return self._store(L.apply_activation(y, activation))

    def binary_conv_bn(self, x, filters, ksize, *, stride=1, padding="SAME",
                       pad_value=1, name, groups=1, dilation=1):
        from ..kernels.bconv2d import bconv2d_mxu_float_in, bconv2d_mxu_s2d

        if isinstance(x, Int8Tensor):
            # Signs read straight off the int8 values (bit = v < 0, exact
            # for zero_point 0) — no dequantisation pass.
            x = x.values
        a = self.layers[name]
        params = BConv2DParams(
            channels_in=int(a["channels_in"]),
            stride=_pair(stride),
            dilation=_pair(a.get("dilation", dilation)),
            padding=Padding.SAME if padding == "SAME" else Padding.VALID,
            pad_value=int(a["pad_value"]),
            groups=int(a.get("groups", groups)),
            activation=Activation.NONE,
        )
        transform = OutputTransform(
            clamp_min=int(a["clamp_min"]), clamp_max=int(a["clamp_max"]),
            multiplier=a["multiplier"], bias=a["bias"])
        # Packed-domain chaining: when the input is already a binary stream
        # (or this layer's output may feed a binary consumer), run through
        # ops.bconv2d on packed operands, emitting bitpacked output via the
        # convert-time thresholds + sign-flipped filter for binary consumers
        # and the float transform otherwise.
        if self.domain == "packed" and "thresholds" in a:
            # "residual"/"mxu"-family names are float-domain lowerings; in
            # the packed domain they mean "let selection decide".
            pk = ("auto" if self.kernel in ("auto", "s2d", "residual")
                  else self.kernel)
            if isinstance(x, _BinaryStream):
                xq_fn = x.packed
            else:
                x_float = x

                def xq_fn():
                    return quantize(x_float)

            def packed_fn():
                return bconv2d(
                    xq_fn(), jnp.asarray(a["packed_filter_flipped"]),
                    OutputTransform(thresholds=jnp.asarray(a["thresholds"])),
                    params, output_kind="bitpacked", kernel=pk)

            def float_fn():
                return self._store(bconv2d(
                    xq_fn(), jnp.asarray(a["packed_filter"]), transform,
                    params, output_kind="float", kernel=pk))

            return _BinaryStream(packed_fn, float_fn, filters)

        x = self._f(x)
        # int8-output binary conv (`tflite/kernels/bconv2d.cc:369-378`): the
        # requantisation is folded into the transform, the kernel's fused
        # int8 epilogue writes int8 directly, and the result flows on as an
        # Int8Tensor.
        out_kind = "float"
        if "out_scale" in a:
            transform = OutputTransform(
                clamp_min=int(a["clamp_min"]), clamp_max=int(a["clamp_max"]),
                multiplier=a["int8_multiplier"], bias=a["int8_bias"])
            out_kind = "int8"

        def run():
            kernel = self.kernel
            if kernel in ("auto", "residual"):
                # Per-layer measured dispatch in the float domain
                # (activations are float between blocks): direct sign->conv,
                # the s2d retile for lane-underfilled early sections, or
                # pack+Pallas bgemm.
                from ..kernels.select import select_bconv2d_kernel

                n, in_h, in_w, _ = x.shape
                kh, kw_ = _pair(ksize)
                out_h, out_w, _, _ = params.output_spatial(
                    in_h, in_w, kh, kw_)
                kernel = select_bconv2d_kernel(
                    "float", c_in=params.channels_in, c_out=filters, fh=kh,
                    fw=kw_, m=n * out_h * out_w, out_kind="float",
                    groups=params.groups, dilation=params.dilation,
                    stride=params.stride)
            # Pre-unpacked +-1 filter when the runtime prepared one
            # (prepare_runtime_arrays) — skips a measured ~90us/block
            # in-graph unpack.
            upf = a.get("filter_pm1")
            if kernel == "s2d":
                y = bconv2d_mxu_s2d(
                    x, jnp.asarray(a["packed_filter"]), transform, params,
                    output_kind=out_kind, conv_dtype=self.binary_dtype,
                    unpacked_filter=upf)
            elif kernel == "mxu":
                # Sign directly to +-1 instead of a pack -> unpack
                # round-trip (two full activation memory passes saved;
                # bit-exact).
                y = bconv2d_mxu_float_in(
                    x, jnp.asarray(a["packed_filter"]), transform, params,
                    output_kind=out_kind, conv_dtype=self.binary_dtype,
                    unpacked_filter=upf)
            else:
                xq = quantize(x)  # runtime LceQuantize boundary
                y = bconv2d(xq, jnp.asarray(a["packed_filter"]), transform,
                            params, output_kind=out_kind, kernel=kernel)
            if out_kind == "int8":
                return Int8Tensor(y, a["out_scale"])
            return self._store(y)

        # Residual-add fusion: defer the conv so that add(x, conv(x)) can
        # run the whole block in one Pallas kernel (kernels/residual.py).
        # EXPLICIT OPT-IN ONLY: measured on v5e (fixed timer, batch 128) the
        # XLA path wins — XLA already fuses the sign cast into the producer
        # epilogue and the residual add into the conv epilogue, so the
        # hand-fused kernel's VMEM tap-matrix construction costs more than
        # the HBM passes it saves (557us vs 207us at 56x56x64). "auto"
        # therefore never selects it; see BENCHMARKS.md round-3 notes.
        if (out_kind == "float" and self.kernel == "residual"
                and not isinstance(x, Int8Tensor) and hasattr(x, "ndim")
                and x.ndim == 4):
            from ..kernels.residual import residual_block_supported

            kh, kw_ = _pair(ksize)
            if residual_block_supported(x.shape, params, filters, kh, kw_):
                return _DeferredBConv(
                    x, jnp.asarray(a["packed_filter"]), transform, params,
                    run)
        return run()

    def binary_dense_bn(self, x, units, *, name):
        from ..kernels.bgemm import bgemm
        from ..core.bitpack import bitunpack

        if isinstance(x, Int8Tensor):
            x = x.values  # sign(v < 0) is exact at zero_point 0
        a = self.layers[name]
        c_in = int(a["channels_in"])
        k = c_in
        if self.domain == "packed" and "thresholds" in a:
            # Chain fc layers through bitpacked activations (BinaryAlexNet's
            # fc1 -> fc2 is the reference's packed fast path for dense).
            if isinstance(x, _BinaryStream):
                xq_fn = x.packed
            else:
                x_float = x

                def xq_fn():
                    return quantize(x_float)

            def packed_fn():
                return bgemm(xq_fn(),
                             jnp.asarray(a["packed_kernel_flipped"]).T,
                             thresholds=jnp.asarray(a["thresholds"]),
                             out_kind="bitpacked")

            def float_fn():
                return self._store(bgemm(
                    xq_fn(), jnp.asarray(a["packed_kernel"]).T,
                    jnp.asarray(a["multiplier"]), jnp.asarray(a["bias"]),
                    clamp_min=int(a["clamp_min"]),
                    clamp_max=int(a["clamp_max"]), out_kind="float"))

            return _BinaryStream(packed_fn, float_fn, units)
        x = self._f(x)
        kernel = self.kernel
        if kernel == "auto":
            # Measured dispatch for the fc GEMM too (a binary dense is the
            # fh=fw=1 entry of the same selection table, m = batch): the
            # batch-1 autotune showed quantize->bgemm beating the direct
            # matmul at deep fc shapes (BENCHMARKS.md round-4 batch-1 notes).
            from ..kernels.select import select_bconv2d_kernel

            kernel = select_bconv2d_kernel(
                "float", c_in=c_in, c_out=units, fh=1, fw=1,
                m=int(x.shape[0]), out_kind="float")
        if kernel in ("mxu", "s2d", "residual"):
            # sign -> +-1 bf16 matmul on the MXU (exact; see
            # bconv2d_mxu_float_in for the rationale).
            acc_dtype = (jnp.int32 if self.binary_dtype == jnp.int8
                         else jnp.float32)
            xq = jnp.where(x < 0, -1, 1).astype(self.binary_dtype)
            if "kernel_pm1" in a:  # pre-unpacked at load time
                w = jnp.asarray(a["kernel_pm1"]).astype(self.binary_dtype)
            else:
                w = bitunpack(jnp.asarray(a["packed_kernel"]), c_in,
                              dtype=self.binary_dtype).T  # (C, units)
            t = jnp.dot(xq, w, preferred_element_type=acc_dtype)
            accum = ((k - t.astype(jnp.int32)) // 2).astype(jnp.int32)
            acc2 = jnp.clip(accum * 2, int(a["clamp_min"]),
                            int(a["clamp_max"]))
            return self._store(
                acc2.astype(jnp.float32) * jnp.asarray(a["multiplier"])
                + jnp.asarray(a["bias"]))
        lhs = quantize(x)  # (M, Cp)
        rhs = jnp.asarray(a["packed_kernel"]).T  # (Cp, units)
        return self._store(
            bgemm(lhs, rhs, jnp.asarray(a["multiplier"]),
                  jnp.asarray(a["bias"]), clamp_min=int(a["clamp_min"]),
                  clamp_max=int(a["clamp_max"]), out_kind="float"))

    def dense(self, x, units, *, use_bias=True, activation=None, name):
        a = self.layers[name]
        if "kernel_int8" in a:
            x_q, in_s = self._int8_in(x, a)
            acc = jax.lax.dot_general(
                x_q, jnp.asarray(a["kernel_int8"]),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return self._int8_out(acc, jnp.asarray(a["w_scale"]) * in_s,
                                  a, activation, store=False)
        x = self._f(x)
        y = L.dense(x.astype(self.compute_dtype), jnp.asarray(a["kernel"]))
        if a["bias"] is not None:
            y = y + jnp.asarray(a["bias"])
        return L.apply_activation(y, activation)


# ---------------------------------------------------------------------------
# Convenience drivers
# ---------------------------------------------------------------------------


def init_model(spec, seed=0, randomize_bn=False):
    """Create a float parameter tree for a ModelSpec."""
    b = InitBuilder(seed=seed, randomize_bn=randomize_bn)
    x = jax.ShapeDtypeStruct((1, *spec.input_size, 3), jnp.float32)
    jax.eval_shape(lambda t: spec.forward(b, t), x)
    return b.params


def float_apply(spec, params, x):
    """QAT float forward (the oracle)."""
    return spec.forward(FloatBuilder(params), x)


def convert_model(spec, params, int8_ranges=None, int8_out_ranges=None):
    """Float params -> packed artifact layer dict (the converter).

    ``int8_ranges`` (from :func:`calibrate_model`) additionally quantises the
    listed non-binary layers to int8 weights + activation scales;
    ``int8_out_ranges`` makes those layers (and listed binary convs) EMIT
    int8 tensors, so consecutive int8 layers exchange int8 directly (the
    true-int8 pipeline)."""
    b = ConvertBuilder(params, int8_ranges=int8_ranges,
                       int8_out_ranges=int8_out_ranges)
    x = jax.ShapeDtypeStruct((1, *spec.input_size, 3), jnp.float32)
    jax.eval_shape(lambda t: spec.forward(b, t), x)
    return b.layers


def calibrate_model(spec, params, batches, with_outputs=False):
    """Record per-layer activation abs-max ranges over calibration batches.

    Returns the input-range dict; with ``with_outputs=True`` returns
    ``(in_ranges, out_ranges)`` for the true-int8 pipeline."""
    b = CalibrateBuilder(params)
    for x in batches:
        b._add_idx = 0  # synthesized add names restart per forward trace
        spec.forward(b, jnp.asarray(x, jnp.float32))
    if with_outputs:
        return b.ranges, b.out_ranges
    return b.ranges


def prepare_runtime_arrays(layers):
    """Augment artifact layers with once-unpacked +-1 int8 filters.

    The artifact stores binary filters 32x-bitpacked (storage/transfer
    format). The MXU conv paths consume +-1 int8 operands; unpacking inside
    the traced forward costs a measured ~90us/block (56x56x64 b128, v5e)
    PER CALL. This runs the unpack ONCE at load time — the runtime analogue
    of ruy's cached weight packing (`core/bconv2d/optimized_bgemm.h:
    133-134`, CachePolicy::kAlwaysCache) — adding:

      bconv:  ``filter_pm1`` (FH, FW, C, O) int8
      bdense: ``kernel_pm1`` (C, units) int8

    The packed arrays stay in the artifact (the packed-domain kernels and
    the 32x-compressed storage still use them). Call before ``split_arrays``
    so the unpacked filters travel as jit arguments with the rest.
    """
    from ..core.bitpack import bitunpack

    out = {}
    for name, a in layers.items():
        a = dict(a)
        if a.get("kind") == "bconv" and "filter_pm1" not in a:
            # Grouped filters keep per-group packed depth.
            cg = int(a["channels_in"]) // int(a.get("groups", 1))
            w = bitunpack(jnp.asarray(a["packed_filter"]), cg,
                          dtype=jnp.int8)
            a["filter_pm1"] = np.asarray(jnp.transpose(w, (1, 2, 3, 0)))
        elif a.get("kind") == "bdense" and "kernel_pm1" not in a:
            w = bitunpack(jnp.asarray(a["packed_kernel"]),
                          int(a["channels_in"]), dtype=jnp.int8)
            a["kernel_pm1"] = np.asarray(w.T)  # (C, units)
        out[name] = a
    return out


def packed_apply(spec, artifact_layers, x, kernel="auto",
                 compute_dtype=jnp.bfloat16, return_logits=False,
                 binary_dtype=jnp.int8, domain="float"):
    """Packed inference forward.

    ``domain="packed"`` chains binary->binary layers through bitpacked
    activations (see PackedBuilder)."""
    out = spec.forward(
        PackedBuilder(artifact_layers, kernel=kernel,
                      compute_dtype=compute_dtype,
                      return_logits=return_logits,
                      binary_dtype=binary_dtype, domain=domain), x)
    # A model ending on a binary layer returns its packed words — the
    # analogue of strip_lcedequantize raw bitpacked outputs
    # (`mlir/python/util.py:225-365`). An int8 tail dequantises to float.
    if isinstance(out, _BinaryStream):
        out = out.packed()
    elif isinstance(out, Int8Tensor):
        out = out.to_float()
    elif isinstance(out, _DeferredBConv):
        out = out.materialize()
    return out
