"""Bitpacking round-trip and bit-layout tests.

Mirrors `core/bitpacking/tests/bitpack_test.cc` (packing round-trips for
float/int8, zero-points, padding bits) plus explicit LSB-first layout checks.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from compute_engine_tpu.core import (
    BITWIDTH,
    bitpack,
    bitunpack,
    packed_shape,
)


def np_pack_oracle(x, zero_point=0):
    """Independent numpy oracle: bit j of word w = (x[32w+j] < zero_point)."""
    x = np.asarray(x)
    c = x.shape[-1]
    n_words = -(-c // BITWIDTH)
    bits = (x < zero_point).astype(np.uint32)
    pad = n_words * BITWIDTH - c
    if pad:
        bits = np.concatenate(
            [bits, np.zeros((*bits.shape[:-1], pad), np.uint32)], axis=-1)
    bits = bits.reshape(*x.shape[:-1], n_words, BITWIDTH)
    out = np.zeros(bits.shape[:-1], np.uint32)
    for j in range(BITWIDTH):
        out |= bits[..., j] << np.uint32(j)
    return out


@pytest.mark.parametrize("channels", [1, 31, 32, 33, 64, 100, 130])
def test_float_roundtrip(channels, rng):
    x = np.sign(rng.standard_normal((3, channels))).astype(np.float32)
    x[x == 0] = 1.0
    packed = np.asarray(bitpack(jnp.asarray(x)))
    assert packed.shape == packed_shape(x.shape)
    np.testing.assert_array_equal(packed, np_pack_oracle(x))
    unpacked = np.asarray(bitunpack(jnp.asarray(packed), channels))
    np.testing.assert_array_equal(unpacked, x)


def test_bit_layout_lsb_first():
    # Element 0 negative -> bit 0 of word 0 set.
    x = np.ones((1, 64), np.float32)
    x[0, 0] = -1.0
    x[0, 33] = -1.0
    packed = np.asarray(bitpack(jnp.asarray(x)))
    assert packed[0, 0] == 1
    assert packed[0, 1] == 2  # element 33 -> word 1, bit 1


def test_padding_bits_are_zero(rng):
    # All values negative; 40 channels -> last word has 8 padding bits = 0.
    x = -np.ones((2, 40), np.float32)
    packed = np.asarray(bitpack(jnp.asarray(x)))
    assert np.all(packed[:, 0] == np.uint32(0xFFFFFFFF))
    assert np.all(packed[:, 1] == np.uint32(0x000000FF))


@pytest.mark.parametrize("zero_point", [-5, 0, 3, 127])
def test_int8_zero_point(zero_point, rng):
    x = rng.integers(-128, 128, size=(4, 70), dtype=np.int8)
    packed = np.asarray(bitpack(jnp.asarray(x), zero_point=zero_point))
    np.testing.assert_array_equal(packed, np_pack_oracle(x, zero_point))


def test_int8_out_of_range_zero_point(rng):
    """`bitpack.h:259-288`: out-of-range zero-points short-circuit."""
    x = rng.integers(-128, 128, size=(2, 40), dtype=np.int8)
    # zero_point <= lowest: all bits 0.
    packed = np.asarray(bitpack(jnp.asarray(x), zero_point=-128))
    assert np.all(packed == 0)
    # zero_point > max: all bits 1 except padding bits.
    packed = np.asarray(bitpack(jnp.asarray(x), zero_point=200))
    assert np.all(packed[:, 0] == np.uint32(0xFFFFFFFF))
    assert np.all(packed[:, 1] == np.uint32(0x000000FF))


def test_bool_pack(rng):
    b = rng.integers(0, 2, size=(3, 37)).astype(bool)
    packed = np.asarray(bitpack(jnp.asarray(b)))
    expected = np_pack_oracle(np.where(b, -1.0, 1.0).astype(np.float32))
    np.testing.assert_array_equal(packed, expected)
    back = np.asarray(bitunpack(jnp.asarray(packed), 37, dtype=jnp.bool_))
    np.testing.assert_array_equal(back, b)


def test_unpack_custom_results(rng):
    x = np.sign(rng.standard_normal((2, 33))).astype(np.float32)
    x[x == 0] = 1.0
    packed = jnp.asarray(np_pack_oracle(x))
    # int8 dequantize semantics: zp +- round(1/scale)
    # (`tflite/kernels/quantization.cc:130-138`).
    got = np.asarray(
        bitunpack(packed, 33, zero_bit_result=7, one_bit_result=-3,
                  dtype=jnp.int8))
    expected = np.where(x < 0, -3, 7).astype(np.int8)
    np.testing.assert_array_equal(got, expected)
