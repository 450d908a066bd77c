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
    got = np.asarray(tp_bconv2d(xp, wp, t, params, mesh, axis="model",
                                output_kind=output_kind, mode=mode))
    if mode == "sharded":
        # shard_map returns the global array; channel-sharded layout equals
        # the gathered result for bit/float comparison purposes.
        pass
    if output_kind == "bitpacked":
        np.testing.assert_array_equal(got, want)
    else:
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
