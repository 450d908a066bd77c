"""Multi-host serving composition on the 8-device CPU mesh: sharded
inference, continuous batching, and health-driven re-sharding."""

import numpy as np

import jax
import jax.numpy as jnp

from compute_engine_tpu.models import convert_model, init_model, packed_apply
from compute_engine_tpu.models.zoo import ModelSpec, _quicknet_forward
from compute_engine_tpu.runtime.distributed_serving import (
    MultiHostServer,
    ShardedInterpreter,
)


def tiny(b, x):
    return _quicknet_forward(b, x, section_filters=(32,), section_blocks=(1,),
                             num_classes=5)


SPEC = ModelSpec("tiny_serve", tiny, input_size=(16, 16), num_classes=5)


def _artifact():
    return convert_model(SPEC, init_model(SPEC, seed=7, randomize_bn=True))


def test_sharded_interpreter_matches_reference(rng):
    layers = _artifact()
    x = rng.normal(0, 1, (8, 16, 16, 3)).astype(np.float32)
    want = np.asarray(packed_apply(SPEC, layers, jnp.asarray(x),
                                   compute_dtype=jnp.float32))
    interp = ShardedInterpreter(SPEC, layers, dp=4, tp=2,
                                compute_dtype=jnp.float32)
    got = np.asarray(interp(x))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_multihost_server_end_to_end(rng):
    layers = _artifact()
    devices = jax.devices()
    hosts = {"h0": devices[:4], "h1": devices[4:]}
    imgs = [rng.normal(0, 1, (16, 16, 3)).astype(np.float32)
            for _ in range(12)]
    with MultiHostServer(SPEC, layers, host_devices=hosts, tp=1,
                         batch_size=8, max_delay_ms=20,
                         heartbeat_timeout_s=3600,
                         compute_dtype=jnp.float32) as server:
        outs = [f.result(timeout=30) for f in
                [server.submit(im) for im in imgs]]
        assert all(o.shape == (5,) for o in outs)

        # Simulate host loss by backdating h1's heartbeat past the (large)
        # timeout; h0's stays fresh so only h1 is dropped even if the
        # background poll thread sweeps concurrently.
        server.monitor.heartbeat("h0")
        server.monitor._last_seen["h1"] = server.monitor._clock() - 7200
        server.monitor.check_now()
        assert server.monitor.alive_hosts() == ["h0"]
        assert server.reshard_count >= 1
        assert server._interp.mesh.devices.size == 4

        # Serving continues after re-sharding.
        out = server.predict(imgs[0], timeout=30)
        assert out.shape == (5,)

        # Recovery: h1 heartbeats again -> mesh re-expands.
        server.monitor.heartbeat("h1")
        server.monitor.check_now()
        assert server._interp.mesh.devices.size == 8
