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
