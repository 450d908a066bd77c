"""Interpreter API tests: predict shapes/batching, int8 I/O, logits mode.

Mirrors `tflite/tests/interpreter_test.py` plus the int8-I/O surgery test
(`tests/end2end_test.py:231-252` test_int8_input_output).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from compute_engine_tpu.models import convert_model, init_model
from compute_engine_tpu.models.zoo import ModelSpec, _quicknet_forward
from compute_engine_tpu.runtime import Interpreter


def tiny(b, x):
    return _quicknet_forward(b, x, section_filters=(32,), section_blocks=(1,),
                             num_classes=7)


SPEC = ModelSpec("tiny_interp", tiny, input_size=(32, 32), num_classes=7)


@pytest.fixture(scope="module")
def artifact():
    params = init_model(SPEC, seed=5, randomize_bn=True)
    return convert_model(SPEC, params)


def test_predict_single_and_batch(artifact, rng):
    interp = Interpreter(SPEC, artifact, compute_dtype=jnp.float32)
    x = rng.normal(0, 1, (32, 32, 3)).astype(np.float32)
    single = interp.predict(x)
    assert single.shape == (7,)
    np.testing.assert_allclose(single.sum(), 1.0, rtol=1e-3)

    batch = rng.normal(0, 1, (5, 32, 32, 3)).astype(np.float32)
    out = interp.predict(batch)
    assert out.shape == (5, 7)
    # Chunked predict pads the tail batch but must return identical results.
    chunked = interp.predict(batch, batch_size=2)
    np.testing.assert_allclose(chunked, out, atol=1e-5)


def test_logits_mode(artifact, rng):
    x = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    probs = Interpreter(SPEC, artifact,
                        compute_dtype=jnp.float32).predict(x)
    logits = Interpreter(SPEC, artifact, compute_dtype=jnp.float32,
                         output_mode="logits").predict(x)
    ex = np.exp(logits - logits.max(axis=-1, keepdims=True))
    np.testing.assert_allclose(ex / ex.sum(-1, keepdims=True), probs,
                               atol=1e-5)


def test_int8_io(artifact, rng):
    scale, zp = 1 / 127.0, 0
    xf = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    x8 = np.clip(np.round(xf / scale + zp), -128, 127).astype(np.int8)

    f_interp = Interpreter(SPEC, artifact, compute_dtype=jnp.float32)
    q_interp = Interpreter(SPEC, artifact, compute_dtype=jnp.float32,
                           input_scale=scale, input_zero_point=zp,
                           output_mode="int8", output_scale=1 / 256.0,
                           output_zero_point=-128)
    want = f_interp.predict((x8.astype(np.float32) - zp) * scale)
    got = q_interp.predict(x8)
    assert got.dtype == np.int8
    deq = (got.astype(np.float32) + 128) / 256.0
    # Off-by-one-LSB tolerance, as in `end2end_test.py:210-217` (0.025 for
    # int8 = one quantisation step but not two).
    np.testing.assert_allclose(deq, want, atol=1.5 / 256.0)


def test_output_mode_validation(artifact):
    with pytest.raises(ValueError, match="output_mode"):
        Interpreter(SPEC, artifact, output_mode="bogus")
    with pytest.raises(ValueError, match="output_scale"):
        Interpreter(SPEC, artifact, output_mode="int8")


def test_interpreter_introspection_properties(rng):
    """Reference-parity introspection (`interpreter_base.py:30-73`):
    types/shapes/scales/zero-points of the I/O boundary."""
    import numpy as np

    from compute_engine_tpu.models import (convert_model, init_model,
                                           tiny_quicknet)
    from compute_engine_tpu.runtime.interpreter import Interpreter

    spec = tiny_quicknet(num_classes=8, input_size=32)
    layers = convert_model(spec, init_model(spec, seed=0))
    i = Interpreter(model=spec, layers=layers)
    assert i.input_shape == (None, 32, 32, 3)
    assert i.output_shape == (None, 8)
    assert i.input_type == np.float32 and i.output_type == np.float32
    assert i.input_scales == [None] and i.output_scales == [None]

    i8 = Interpreter(model=spec, layers=layers, input_scale=1 / 64.0,
                     input_zero_point=3, output_mode="int8",
                     output_scale=1 / 127.0)
    assert i8.input_type == np.int8 and i8.output_type == np.int8
    assert i8.input_scales == [1 / 64.0]
    assert i8.input_zero_points == [3]
    assert i8.output_scales == [1 / 127.0]
