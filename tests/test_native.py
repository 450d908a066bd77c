"""Native host library (csrc/bitpack.cc) vs numpy semantics."""

import numpy as np
import pytest

from compute_engine_tpu.utils.native import (
    get_lib,
    native_bitpack,
    native_unpack,
)


def _numpy_pack(x, zero_point=0):
    c = x.shape[-1]
    nw = -(-c // 32)
    if np.issubdtype(x.dtype, np.floating):
        bits = x < 0
    else:
        info = np.iinfo(x.dtype)
        if zero_point <= info.min:
            bits = np.zeros(x.shape, bool)
        elif zero_point > info.max:
            bits = np.ones(x.shape, bool)
        else:
            bits = x < np.asarray(zero_point, x.dtype)
    pad = nw * 32 - c
    if pad:
        bits = np.concatenate(
            [bits, np.zeros((*bits.shape[:-1], pad), bool)], axis=-1)
    bits = bits.reshape(*x.shape[:-1], nw, 32).astype(np.uint32)
    shifts = np.uint32(1) << np.arange(32, dtype=np.uint32)
    return np.bitwise_or.reduce(bits * shifts, axis=-1)


needs_lib = pytest.mark.skipif(get_lib() is None,
                               reason="native lib unavailable")


@needs_lib
@pytest.mark.parametrize("cols", [1, 31, 32, 33, 100, 512])
def test_native_pack_f32(cols, rng):
    x = rng.normal(0, 1, (7, cols)).astype(np.float32)
    np.testing.assert_array_equal(native_bitpack(x), _numpy_pack(x))


@needs_lib
@pytest.mark.parametrize("zp", [-128, -5, 0, 3, 127, 200])
def test_native_pack_i8(zp, rng):
    x = rng.integers(-128, 128, size=(5, 70), dtype=np.int8)
    np.testing.assert_array_equal(native_bitpack(x, zp), _numpy_pack(x, zp))


@needs_lib
def test_native_unpack_roundtrip(rng):
    x = np.sign(rng.standard_normal((4, 97))).astype(np.float32)
    x[x == 0] = 1.0
    packed = native_bitpack(x)
    back = native_unpack(packed, 97)
    np.testing.assert_array_equal(back, x)


@needs_lib
def test_native_pack_3d(rng):
    x = rng.normal(0, 1, (2, 3, 65)).astype(np.float32)
    np.testing.assert_array_equal(native_bitpack(x), _numpy_pack(x))
