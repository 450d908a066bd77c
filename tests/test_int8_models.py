"""int8 model support: calibration + int8 execution of non-binary layers.

Analogue of the reference's int8 model path (`tests/end2end_test.py` int8
FakeQuant models; tolerance there is 0.025 = off-by-one-but-not-two in the
quantised domain, `end2end_test.py:210-217`).
"""

import numpy as np

import jax.numpy as jnp

from compute_engine_tpu.models import (
    calibrate_model,
    convert_model,
    float_apply,
    init_model,
    packed_apply,
)
from compute_engine_tpu.models.zoo import ModelSpec, _quicknet_forward


def tiny(b, x):
    return _quicknet_forward(b, x, section_filters=(32, 64),
                             section_blocks=(1, 1), num_classes=10)


SPEC = ModelSpec("tiny_int8", tiny, input_size=(32, 32), num_classes=10)


def test_int8_conversion_end2end(rng):
    params = init_model(SPEC, seed=9, randomize_bn=True)
    calib = [rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32)
             for _ in range(3)]
    ranges = calibrate_model(SPEC, params, calib)
    # Every conv/depthwise/dense layer input gets a recorded range (binary
    # conv inputs are 1-bit by definition and stay unlisted).
    assert set(ranges) == {"stem_conv", "stem_depthwise", "stem_pointwise",
                           "transition_1", "head"}
    assert all(v > 0 for v in ranges.values())

    layers_f = convert_model(SPEC, params)
    layers_q = convert_model(SPEC, params, int8_ranges=ranges)
    n_int8 = sum(1 for l in layers_q.values() if "kernel_int8" in l)
    assert n_int8 == len(ranges)
    for l in layers_q.values():
        if "kernel_int8" in l:
            assert l["kernel_int8"].dtype == np.int8
            assert "kernel" not in l

    x = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    want = np.asarray(float_apply(SPEC, params, jnp.asarray(x)))
    got_f = np.asarray(packed_apply(SPEC, layers_f, jnp.asarray(x),
                                    compute_dtype=jnp.float32))
    got_q = np.asarray(packed_apply(SPEC, layers_q, jnp.asarray(x),
                                    compute_dtype=jnp.float32))
    np.testing.assert_allclose(got_f, want, atol=1e-2, rtol=1e-2)
    # int8 path: probabilities within a few quantisation steps.
    np.testing.assert_allclose(got_q, want, atol=0.05)


def test_int8_artifact_roundtrip(tmp_path, rng):
    from compute_engine_tpu.converter import load_artifact, save_artifact

    params = init_model(SPEC, seed=9, randomize_bn=True)
    ranges = calibrate_model(
        SPEC, params,
        [rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)])
    layers = convert_model(SPEC, params, int8_ranges=ranges)
    path = str(tmp_path / "q.npz")
    save_artifact(path, layers, SPEC.name)
    _, _, loaded = load_artifact(path)
    x = rng.normal(0, 1, (1, 32, 32, 3)).astype(np.float32)
    a = np.asarray(packed_apply(SPEC, layers, jnp.asarray(x),
                                compute_dtype=jnp.float32))
    b = np.asarray(packed_apply(SPEC, loaded, jnp.asarray(x),
                                compute_dtype=jnp.float32))
    np.testing.assert_array_equal(a, b)


def _within_half_step(int8_tensor, float_oracle):
    """Reference int8 tolerance: within 0.55 of the UNROUNDED quantised
    oracle — off-by-one from rounding allowed, anything more is a bug
    (`bconv2d_test.cc:408-428`)."""
    want = np.clip(np.asarray(float_oracle) / int8_tensor.scale, -127, 127)
    got = np.asarray(int8_tensor.values, dtype=np.float64)
    assert np.max(np.abs(got - want)) <= 0.55


def _deq_weights(a):
    """Float view of a layer's quantised weights (the per-op oracle runs on
    the SAME quantised operands the int8 kernel sees)."""
    w = np.asarray(a["kernel_int8"], np.float32)
    ws = np.asarray(a["w_scale"], np.float32)
    if a["kind"] == "depthwise_conv":  # (H, W, C, 1), scale per C
        return w * ws.reshape(1, 1, -1, 1)
    return w * ws  # per-output-channel, last axis


def test_int8_pipeline_no_float_roundtrip(rng):
    """The true-int8 pipeline: layers with an out_scale hand Int8Tensors to
    their consumers (incl. the depthwise stem), which consume the int8
    values directly. Each layer's quantised output must be within one step
    of quantising the float oracle run on the SAME (dequantised) input —
    the reference's per-op int8 contract. (End-to-end softmax comparison is
    meaningless on an untrained model: one sign flip at a binary conv input
    — a value within half a quantisation step of zero — legitimately flips
    the prediction; the reference trains its int8 end2end models precisely
    to avoid this, end2end_test.py:199-206.)"""
    from compute_engine_tpu.models import Int8Tensor, PackedBuilder

    params = init_model(SPEC, seed=9, randomize_bn=True)
    calib = [rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32)
             for _ in range(3)]
    in_ranges, out_ranges = calibrate_model(SPEC, params, calib,
                                            with_outputs=True)
    assert "stem_depthwise" in in_ranges
    layers = convert_model(SPEC, params, int8_ranges=in_ranges,
                           int8_out_ranges=out_ranges)
    # The stem chain conv -> depthwise -> pointwise is fully int8.
    for name in ("stem_conv", "stem_depthwise", "stem_pointwise"):
        assert "kernel_int8" in layers[name], name
        assert "out_scale" in layers[name], name

    import jax

    pb = PackedBuilder(layers, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32))

    def oracle_conv(x_deq, a, stride, groups=1):
        w = jnp.asarray(_deq_weights(a))
        if a["kind"] == "depthwise_conv":
            c = x_deq.shape[-1]
            w = w.reshape(*w.shape[:2], 1, c)
            groups = c
        y = jax.lax.conv_general_dilated(
            x_deq, w, window_strides=(stride, stride), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups) + jnp.asarray(a["bias"])
        return jnp.maximum(y, 0) if a["activation"] == "relu" else y

    # Layer 1 quantises the float input on entry; the oracle sees the same
    # dequantised input.
    a1 = layers["stem_conv"]
    x_deq = jnp.clip(jnp.round(x / a1["in_scale"]), -127,
                     127) * a1["in_scale"]
    y1 = pb.conv_bn(x, 8, 3, stride=2, activation="relu", name="stem_conv")
    assert isinstance(y1, Int8Tensor) and y1.values.dtype == jnp.int8
    _within_half_step(y1, oracle_conv(x_deq, a1, 2))

    # int8 flows INTO the next layers directly (no re-quantisation), so the
    # per-op oracle input is exactly y_prev.to_float().
    y2 = pb.depthwise_conv_bn(y1, 3, stride=2, activation="relu",
                              name="stem_depthwise")
    assert isinstance(y2, Int8Tensor) and y2.values.dtype == jnp.int8
    _within_half_step(y2, oracle_conv(y1.to_float(),
                                      layers["stem_depthwise"], 2))

    y3 = pb.conv_bn(y2, 32, 1, name="stem_pointwise")
    assert isinstance(y3, Int8Tensor)
    _within_half_step(y3, oracle_conv(y2.to_float(),
                                      layers["stem_pointwise"], 1))

    # Whole-model forward still runs and produces a sane distribution.
    got = np.asarray(packed_apply(SPEC, layers, x,
                                  compute_dtype=jnp.float32))
    assert got.shape == (2, 10)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_int8_output_binary_conv(rng):
    """A binary conv with a calibrated output range writes int8 directly
    through the fused epilogue and flows on as an Int8Tensor."""
    from compute_engine_tpu.models import Int8Tensor, PackedBuilder

    def chain(b, x):
        x = b.conv_bn(x, 32, 3, stride=2, name="stem")
        x = b.binary_conv_bn(x, 32, 3, pad_value=1, name="bconv")
        x = b.conv_bn(x, 16, 1, name="post")
        x = b.global_avg_pool(x)
        return x

    spec = ModelSpec("int8_chain", chain, input_size=(16, 16),
                     num_classes=0)
    params = init_model(spec, seed=4, randomize_bn=True)
    in_r, out_r = calibrate_model(
        spec, params, [rng.normal(0, 1, (2, 16, 16, 3)).astype(np.float32)],
        with_outputs=True)
    layers = convert_model(spec, params, int8_ranges=in_r,
                           int8_out_ranges=out_r)
    assert "int8_multiplier" in layers["bconv"]
    assert "out_scale" in layers["bconv"]

    pb = PackedBuilder(layers, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 3)).astype(np.float32))
    s = pb.conv_bn(x, 32, 3, stride=2, name="stem")
    y = pb.binary_conv_bn(s, 32, 3, pad_value=1, name="bconv")
    assert isinstance(y, Int8Tensor) and y.values.dtype == jnp.int8

    # Same signs, same int8 transform, through the independently-tested
    # kernel: the builder's int8-out wiring must be exact.
    from compute_engine_tpu.core import (BConv2DParams, OutputTransform,
                                         Padding)
    from compute_engine_tpu.kernels.bconv2d import bconv2d_mxu_float_in

    a = layers["bconv"]
    params_op = BConv2DParams(channels_in=32, padding=Padding.SAME,
                              pad_value=1)
    tr8 = OutputTransform(clamp_min=int(a["clamp_min"]),
                          clamp_max=int(a["clamp_max"]),
                          multiplier=a["int8_multiplier"],
                          bias=a["int8_bias"])
    want = np.asarray(bconv2d_mxu_float_in(
        s.to_float(), jnp.asarray(a["packed_filter"]), tr8, params_op,
        output_kind="int8"))
    np.testing.assert_array_equal(np.asarray(y.values), want)

    out = np.asarray(packed_apply(spec, layers, x,
                                  compute_dtype=jnp.float32))
    assert out.shape == (2, 16) and np.all(np.isfinite(out))


def test_int8_maxpool_in_int8_domain(rng):
    """Regression: an int8-producing conv feeding max_pool (the Bi-RealNet
    stem under the int8 pipeline) must pool in the int8 domain — lax
    requires the reduce_window init value bound at the operand dtype."""
    from compute_engine_tpu.models import Int8Tensor, PackedBuilder

    def stem_pool(b, x, *, num_classes=8):
        x = b.conv_bn(x, 16, 3, stride=2, name="stem_conv")
        x = b.max_pool(x, 3, 2)
        x = b.global_avg_pool(x)
        x = b.dense(x, num_classes, name="head")
        return b.softmax(x)

    spec = ModelSpec("stem_pool", stem_pool, input_size=(32, 32),
                     num_classes=8)
    params = init_model(spec, seed=3, randomize_bn=True)
    calib = [rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32)]
    in_r, out_r = calibrate_model(spec, params, calib, with_outputs=True)
    layers8 = convert_model(spec, params, int8_ranges=in_r,
                            int8_out_ranges=out_r)
    assert "out_scale" in layers8["stem_conv"]

    # Direct check that the pooled tensor stayed int8 (not dequantised).
    pb = PackedBuilder(layers8, compute_dtype=jnp.float32)
    h = pb.conv_bn(jnp.asarray(calib[0]), 16, 3, stride=2,
                   name="stem_conv")
    assert isinstance(h, Int8Tensor)
    pooled = pb.max_pool(h, 3, 2)
    assert isinstance(pooled, Int8Tensor)
    assert pooled.values.dtype == jnp.int8

    x = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(packed_apply(spec, layers8, jnp.asarray(x),
                                  compute_dtype=jnp.float32))
    want = np.asarray(float_apply(spec, params, jnp.asarray(x)))
    assert got.shape == want.shape and np.all(np.isfinite(got))
    # max commutes with the positive scale: int8-domain pooling tracks the
    # float oracle up to quantisation error.
    np.testing.assert_allclose(got, want, atol=0.15)


def test_int8_residual_add_chain(rng, monkeypatch):
    """Calibrated residual adds run in the int8 domain (TFLite int8 ADD
    analogue): the artifact records __add entries, the packed forward
    keeps Int8Tensor flowing THROUGH the adds (so the residual stream is
    int8 end to end — the stream-width lever behind the 68% MAC-SOL cap
    in section_profile's floor analysis), and accuracy tracks the float
    oracle within the int8 contract."""
    from compute_engine_tpu.models.builder import Int8Tensor, PackedBuilder

    params = init_model(SPEC, seed=3, randomize_bn=True)
    calib = [rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32)
             for _ in range(3)]
    in_r, out_r = calibrate_model(SPEC, params, calib, with_outputs=True)
    adds = [k for k in out_r if k.startswith("__add_")]
    assert len(adds) == 2, adds  # one residual add per tiny section

    layers = convert_model(SPEC, params, int8_ranges=in_r,
                           int8_out_ranges=out_r)
    assert all(layers[k]["kind"] == "add" and layers[k]["out_scale"] > 0
               for k in adds)

    captured = []
    orig_add = PackedBuilder.add

    def spy(self, a, b):
        out = orig_add(self, a, b)
        captured.append(type(out).__name__)
        return out

    monkeypatch.setattr(PackedBuilder, "add", spy)
    x = rng.normal(0, 1, (16, 32, 32, 3)).astype(np.float32)
    got = np.asarray(packed_apply(SPEC, layers, jnp.asarray(x),
                                  compute_dtype=jnp.float32))
    assert captured.count("Int8Tensor") == 2, captured

    want = np.asarray(float_apply(SPEC, params, jnp.asarray(x)))
    # int8-quantised stream: same closeness contract as the int8 pipeline
    # tests (probabilities within the quantisation-error scale).
    assert float(np.abs(got - want).max()) <= 0.2
    assert (got.argmax(-1) == want.argmax(-1)).mean() >= 0.9
