"""In-kernel debug assertions (the RUY_DCHECK analogue, VERDICT r3 #7).

The reference laces its microkernels with ``RUY_DCHECK``/``TFLITE_DCHECK``
(`core/bgemm/kernels.h:35-44`) that are compiled out of production builds.
Our Pallas kernels carry ``pl.debug_check`` assertions with the same
semantics: no-ops unless ``pl.enable_debug_checks()`` is active (and, off
device, the call is checkified). These tests prove

  1. the production kernels pass their own assertions on every output kind
     (no false alarms), and
  2. a deliberately-broken kernel configuration — the class of internal bug
     the checks guard against — actually trips them.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import checkify
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from compute_engine_tpu.core.bitpack import bitpack
from compute_engine_tpu.core.params import BConv2DParams
from compute_engine_tpu.core.transforms import (OutputTransform,
                                                compute_output_thresholds)
from compute_engine_tpu.core.types import BITWIDTH, Padding
from compute_engine_tpu.kernels import bgemm as bgemm_mod
from compute_engine_tpu.kernels.bgemm import _bgemm_kernel, bgemm


def _packed_operands(rng, m=32, kw=4, n=128):
    lhs = rng.integers(0, 2 ** 32, (m, kw), dtype=np.uint32)
    rhs = rng.integers(0, 2 ** 32, (kw, n), dtype=np.uint32)
    return jnp.asarray(lhs), jnp.asarray(rhs)


def test_bgemm_checks_pass_all_out_kinds(rng):
    """Checkified production bgemm raises nothing with checks enabled."""
    lhs, rhs = _packed_operands(rng)
    n = rhs.shape[1]
    mul = jnp.asarray(rng.uniform(0.5, 2, n), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 1, n), jnp.float32)
    thr = jnp.asarray(rng.integers(-64, 64, n), jnp.int32)
    with pl.enable_debug_checks():
        for kwargs in ({"out_kind": "accum"},
                       {"out_kind": "float", "multiplier": mul, "bias": bias},
                       {"out_kind": "int8", "multiplier": mul, "bias": bias},
                       {"out_kind": "bitpacked", "thresholds": thr}):
            err, _ = checkify.checkify(functools.partial(bgemm, **kwargs))(
                lhs, rhs)
            err.throw()  # no assertion fired


@pytest.mark.parametrize("plane_dtype", ["bfloat16", "int8"])
def test_bgemm_bigk_checks_pass(rng, plane_dtype):
    """The K-blocked fallback path under its own assertions, for BOTH MXU
    plane dtypes (int8/int32-accum is the production default — the budget
    below forces num_k > 1 at either plane byte width)."""
    import jax.numpy as _jnp

    plane_bytes = _jnp.dtype(plane_dtype).itemsize
    kw = 512
    lhs, rhs = _packed_operands(rng, m=32, kw=kw, n=128)
    orig = bgemm_mod._WEIGHT_SCRATCH_BUDGET
    # 1 MB < 128 * 32 * 512 * plane_bytes for both int8 (2 MB strip) and
    # bf16 (4 MB strip), so both dtypes take the K-blocked grid.
    bgemm_mod._WEIGHT_SCRATCH_BUDGET = 1024 * 1024
    try:
        bm, bn, block_kw, num_k = bgemm_mod._pick_blocks(
            32, kw, 128, plane_bytes=plane_bytes)
        assert num_k > 1, "test setup must hit the big-K path"
        with pl.enable_debug_checks():
            err, out = checkify.checkify(
                functools.partial(bgemm, out_kind="accum",
                                  plane_dtype=plane_dtype))(lhs, rhs)
            err.throw()
    finally:
        bgemm_mod._WEIGHT_SCRATCH_BUDGET = orig
    # And it is still numerically right (vs the single-block path).
    want = bgemm(lhs, rhs, out_kind="accum")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_broken_total_bits_trips_check():
    """A kernel built with lying total_bits — the internal-accounting bug
    class the assertion guards — must trip the debug check."""
    m, kw, n = 128, 4, 128
    lhs_t = jnp.zeros((kw, m), jnp.uint32)  # all bits 0 => all +1 planes
    rhs = jnp.zeros((kw, n), jnp.uint32)    # contraction = +32*kw exactly

    def build(total_bits):
        kernel = functools.partial(
            _bgemm_kernel, clamp_min=-(2 ** 31) + 1, clamp_max=2 ** 31 - 1,
            out_kind="accum", total_bits=total_bits, chunk_kw=64,
            plane_dtype=jnp.bfloat16)
        return pl.pallas_call(
            kernel,
            grid=(1, 1),
            in_specs=[
                pl.BlockSpec((kw, m), lambda j, i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kw, n), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, n), lambda j, i: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
            scratch_shapes=[pltpu.VMEM((BITWIDTH * kw, n), jnp.bfloat16)],
            interpret=jax.default_backend() != "tpu",
        )

    with pl.enable_debug_checks():
        err, _ = checkify.checkify(build(BITWIDTH * kw))(lhs_t, rhs)
        err.throw()  # honest accounting passes
        err, _ = checkify.checkify(build(BITWIDTH * kw - 32))(lhs_t, rhs)
        with pytest.raises(Exception, match="total_bits"):
            err.throw()


def test_residual_checks_pass_and_trip(rng):
    """The fused residual kernel's conv-bound assertion: passes on honest
    K, trips when the K accounting is deliberately understated."""
    from unittest import mock

    from compute_engine_tpu.kernels.residual import binary_residual_block

    n, h, w, c = 2, 8, 8, 32
    x = jnp.asarray(rng.normal(0, 1, (n, h, w, c)).astype(np.float32))
    filt = bitpack(jnp.asarray(
        rng.choice([-1.0, 1.0], (c, 3, 3, c)).astype(np.float32)))
    k = 9 * c
    tr = OutputTransform(
        multiplier=np.full(c, 0.5, np.float32),
        bias=np.zeros(c, np.float32),
        clamp_min=-k, clamp_max=k)
    params = BConv2DParams(channels_in=c, stride=(1, 1),
                           padding=Padding.SAME, pad_value=1)

    with pl.enable_debug_checks():
        err, _ = checkify.checkify(binary_residual_block)(
            x, filt, tr, params)
        err.throw()  # honest K passes

        # Understate K with inputs aligned so the conv saturates at +9C:
        # all-ones activations against all-ones filters give t == 9C
        # everywhere, exceeding the lied bound.
        x1 = jnp.ones((n, h, w, c), jnp.float32)
        filt1 = bitpack(jnp.ones((c, 3, 3, c), jnp.float32))
        with mock.patch.object(BConv2DParams, "backtransform_add",
                               return_value=k - 32):
            err, _ = checkify.checkify(binary_residual_block)(
                x1, filt1, tr, params)
        with pytest.raises(Exception, match="one-padding"):
            err.throw()
