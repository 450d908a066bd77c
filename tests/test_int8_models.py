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
    # Every conv/dense layer input gets a recorded range (depthwise and
    # binary convs are left float).
    assert set(ranges) == {"stem_conv", "stem_pointwise", "transition_1",
                           "head"}
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
