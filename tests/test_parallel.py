"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The TPU analogue of the reference's qemu cross-tests (SURVEY.md §4): DP x TP
sharded inference must match single-device results.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from compute_engine_tpu.models import convert_model, init_model, packed_apply
from compute_engine_tpu.models.zoo import ModelSpec, _quicknet_forward
from compute_engine_tpu.parallel import (
    input_sharding,
    make_mesh,
    shard_artifact,
)


def tiny(b, x):
    return _quicknet_forward(b, x, section_filters=(32, 64),
                             section_blocks=(1, 1), num_classes=16)


SPEC = ModelSpec("tiny_parallel", tiny, input_size=(32, 32), num_classes=16)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single_device(mesh_shape, rng):
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    params = init_model(SPEC, seed=3, randomize_bn=True)
    layers = convert_model(SPEC, params)
    x = rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32)

    want = np.asarray(packed_apply(SPEC, layers, jnp.asarray(x),
                                   compute_dtype=jnp.float32))

    mesh = make_mesh(mesh_shape)
    with mesh:
        sharded = shard_artifact(layers, mesh)
        xs = jax.device_put(x, input_sharding(mesh))
        got = np.asarray(jax.jit(
            lambda t: packed_apply(SPEC, sharded, t,
                                   compute_dtype=jnp.float32))(xs))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


@pytest.mark.parametrize("mode", ["gather", "sharded"])
@pytest.mark.parametrize("output_kind", ["float", "bitpacked"])
def test_tp_bconv2d_shard_map(mode, output_kind, rng):
    """Explicit shard_map TP bconv matches the single-device op."""
    from compute_engine_tpu.core import (
        BConv2DParams, OutputTransform, Padding, bitpack,
        compute_output_thresholds, fuse_output_transform)
    from compute_engine_tpu.ops import bconv2d
    from compute_engine_tpu.parallel.collective import tp_bconv2d

    # 128 out-channels over 4 "model" shards = 32 channels (one packed word)
    # per shard, as required for bitpacked TP output.
    c_in, c_out = 64, 128
    params = BConv2DParams(channels_in=c_in, padding=Padding.SAME)
    x = rng.choice(np.array([-1.0, 1.0], np.float32), size=(2, 8, 8, c_in))
    w = rng.choice(np.array([-1.0, 1.0], np.float32),
                   size=(c_out, 3, 3, c_in))
    post_mul = (rng.uniform(0.2, 2.0, c_out)
                * rng.choice([-1.0, 1.0], c_out)).astype(np.float32)
    post_bias = rng.uniform(-3, 3, c_out).astype(np.float32)
    k = 3 * 3 * c_in
    if output_kind == "bitpacked":
        w = w * np.where(post_mul >= 0, 1.0, -1.0)[:, None, None, None]
        t = OutputTransform(
            thresholds=compute_output_thresholds(post_mul, post_bias, k))
    else:
        t = fuse_output_transform(post_mul, post_bias, k)
    xp, wp = bitpack(jnp.asarray(x)), bitpack(jnp.asarray(w))

    want = np.asarray(bconv2d(xp, wp, t, params, output_kind))
    mesh = make_mesh((2, 4))
    got_arr = tp_bconv2d(xp, wp, t, params, mesh, axis="model",
                         output_kind=output_kind, mode=mode)
    if mode == "sharded":
        # Layout-specific check: the output must actually be channel-sharded
        # over the model axis (not gathered).
        spec = got_arr.sharding.spec
        assert spec[-1] == "model", spec
        shard_shapes = {s.data.shape for s in got_arr.addressable_shards}
        assert shard_shapes == {(*want.shape[:-1], want.shape[-1] // 4)}, \
            shard_shapes
    got = np.asarray(got_arr)
    if output_kind == "bitpacked":
        np.testing.assert_array_equal(got, want)
    else:
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("output_kind", ["float", "int8", "bitpacked"])
def test_tp_bconv2d_pipelined(output_kind, rng):
    """Weight-rotation ring TP (batch-sharded x) matches the single-device
    op bit-exactly for every output kind."""
    from compute_engine_tpu.core import (
        BConv2DParams, OutputTransform, Padding, bitpack,
        compute_output_thresholds, fuse_output_transform)
    from compute_engine_tpu.ops import bconv2d
    from compute_engine_tpu.parallel.collective import tp_bconv2d

    c_in, c_out = 64, 128
    params = BConv2DParams(channels_in=c_in, padding=Padding.SAME)
    x = rng.choice(np.array([-1.0, 1.0], np.float32), size=(4, 8, 8, c_in))
    w = rng.choice(np.array([-1.0, 1.0], np.float32),
                   size=(c_out, 3, 3, c_in))
    post_mul = (rng.uniform(0.2, 2.0, c_out)
                * rng.choice([-1.0, 1.0], c_out)).astype(np.float32)
    post_bias = rng.uniform(-3, 3, c_out).astype(np.float32)
    k = 3 * 3 * c_in
    if output_kind == "bitpacked":
        w = w * np.where(post_mul >= 0, 1.0, -1.0)[:, None, None, None]
        t = OutputTransform(
            thresholds=compute_output_thresholds(post_mul, post_bias, k))
    else:
        scale = 0.05 if output_kind == "int8" else None
        t = fuse_output_transform(post_mul, post_bias, k,
                                  output_scale=scale)
    xp, wp = bitpack(jnp.asarray(x)), bitpack(jnp.asarray(w))

    want = np.asarray(bconv2d(xp, wp, t, params, output_kind))
    mesh = make_mesh((2, 4))
    got_arr = tp_bconv2d(xp, wp, t, params, mesh, axis="model",
                         output_kind=output_kind, mode="pipelined")
    # Output is batch-sharded over the model axis.
    assert got_arr.sharding.spec[0] == "model", got_arr.sharding.spec
    got = np.asarray(got_arr)
    if output_kind == "float":
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    else:
        np.testing.assert_array_equal(got, want)


def test_tp_bconv2d_pipelined_hlo_has_no_allgather(rng):
    """The pipelined mode's collective must be ppermute (overlappable), not
    one blocking all-gather — asserted on the compiled HLO."""
    from compute_engine_tpu.core import (BConv2DParams, Padding, bitpack,
                                         fuse_output_transform)
    from compute_engine_tpu.parallel.collective import tp_bconv2d

    c_in, c_out = 64, 128
    params = BConv2DParams(channels_in=c_in, padding=Padding.SAME)
    x = rng.choice(np.array([-1.0, 1.0], np.float32), size=(4, 8, 8, c_in))
    w = rng.choice(np.array([-1.0, 1.0], np.float32),
                   size=(c_out, 3, 3, c_in))
    t = fuse_output_transform(
        rng.uniform(0.2, 2.0, c_out).astype(np.float32),
        rng.uniform(-3, 3, c_out).astype(np.float32), 3 * 3 * c_in)
    xp, wp = bitpack(jnp.asarray(x)), bitpack(jnp.asarray(w))
    mesh = make_mesh((2, 4))

    fn = jax.jit(lambda a, b: tp_bconv2d(a, b, t, params, mesh,
                                         axis="model", mode="pipelined"))
    hlo = fn.lower(xp, wp).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo
