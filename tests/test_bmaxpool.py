"""Binary maxpool vs builtin float max-pool oracle on unpacked +-1 data.

Mirrors `tflite/tests/bmaxpool_test.cc` (oracle = builtin MaxPool on the
unpacked data).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from compute_engine_tpu.core import (
    BMaxPoolParams,
    Padding,
    bitpack,
    bitunpack,
    bmaxpool,
)


@pytest.mark.parametrize("shape,filter_size,stride,padding", [
    ((1, 8, 8, 32), (2, 2), (2, 2), Padding.VALID),
    ((2, 7, 9, 64), (2, 2), (2, 2), Padding.SAME),
    ((1, 8, 8, 33), (3, 3), (2, 2), Padding.SAME),
    ((1, 10, 6, 100), (3, 2), (1, 2), Padding.SAME),
    ((1, 5, 5, 1), (5, 5), (1, 1), Padding.VALID),
])
def test_bmaxpool_vs_float_oracle(shape, filter_size, stride, padding, rng):
    c = shape[-1]
    x = rng.choice(np.array([-1.0, 1.0], np.float32), size=shape)

    params = BMaxPoolParams(filter_size=filter_size, stride=stride,
                            padding=padding)
    got_packed = bmaxpool(bitpack(jnp.asarray(x)), params)

    oracle = jax.lax.reduce_window(
        jnp.asarray(x), -jnp.inf, jax.lax.max,
        window_dimensions=(1, *filter_size, 1),
        window_strides=(1, *stride, 1),
        padding=padding.value,
    )
    got = np.asarray(bitunpack(got_packed, c))
    np.testing.assert_array_equal(got, np.asarray(oracle))
