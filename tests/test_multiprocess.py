"""True multi-process distribution tests.

The reference's qemu suite actually executes on the foreign target
(`tests/qemu_test.bzl:1-50`); the analogue here is real OS processes forming
one jax.distributed group over a CPU mesh (Gloo collectives), plus host-loss
events driven by real process liveness — no hand-poked heartbeat dicts.
"""

import subprocess
import sys
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from compute_engine_tpu.models import convert_model, init_model, packed_apply
from compute_engine_tpu.models.zoo import tiny_quicknet
from compute_engine_tpu.converter import save_artifact
from compute_engine_tpu.runtime.health import (HeartbeatMonitor,
                                               ProcessLivenessSource)


@pytest.mark.slow
def test_two_process_sharded_inference(tmp_path, rng):
    """Two real processes, one global 8-device mesh, batch sharded across
    process boundaries; every process must reproduce the single-process
    result exactly."""
    from compute_engine_tpu.runtime.multiprocess import launch_workers

    spec = tiny_quicknet((32, 64), (1, 1), num_classes=16, input_size=32)
    layers = convert_model(spec, init_model(spec, seed=0, randomize_bn=True))
    artifact = str(tmp_path / "tiny.npz")
    save_artifact(artifact, layers, spec.name)

    procs, outs = launch_workers(
        2, artifact=artifact,
        model="tiny:32,64:1,1:16:32",
        out_dir=str(tmp_path), batch=8, seed=0, local_device_count=4)
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        assert p.returncode == 0, stdout.decode()

    # Single-process reference on the same deterministic input.
    x = np.random.default_rng(0).normal(0, 1, (8, 32, 32, 3)).astype(
        np.float32)
    want = np.asarray(packed_apply(spec, layers, jnp.asarray(x),
                                   compute_dtype=jnp.float32))
    for out in outs:
        got = np.load(out)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_worker_death_triggers_loss_and_reshard(tmp_path, rng):
    """Kill a worker process mid-serving: the liveness source stops pumping
    its heartbeats, the monitor fires a loss event, and the server re-shards
    onto the survivors while continuing to answer."""
    from compute_engine_tpu.runtime.distributed_serving import MultiHostServer

    spec = tiny_quicknet((32,), (1,), num_classes=8, input_size=32)
    layers = convert_model(spec, init_model(spec, seed=1, randomize_bn=True))
    devs = jax.devices()
    assert len(devs) >= 4
    host_devices = {"h0": devs[:2], "h1": devs[2:4]}

    # Real worker processes standing in for remote hosts (on a pod these
    # are the per-host serving agents).
    workers = {h: subprocess.Popen([sys.executable, "-c",
                                    "import time; time.sleep(600)"])
               for h in host_devices}
    server = MultiHostServer(spec, layers, host_devices=host_devices,
                             batch_size=4, heartbeat_timeout_s=0.6)
    source = ProcessLivenessSource(server.monitor, workers,
                                   poll_interval_s=0.05)
    try:
        x = rng.normal(0, 1, (32, 32, 3)).astype(np.float32)
        probs = server.predict(x, timeout=60)
        assert probs.shape == (8,)
        assert server.monitor.alive_hosts() == ["h0", "h1"]
        before = server.reshard_count

        workers["h1"].kill()
        workers["h1"].wait()
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and \
                server.monitor.is_alive("h1"):
            time.sleep(0.05)
        assert not server.monitor.is_alive("h1"), \
            "worker death never became a loss event"
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and \
                server.reshard_count == before:
            time.sleep(0.05)
        assert server.reshard_count > before
        assert not server.degraded

        probs = server.predict(x, timeout=60)
        assert probs.shape == (8,)
        # The rebuilt mesh must only use surviving hosts' devices.
        assert set(server._interp.mesh.devices.ravel()) <= set(devs[:2])
    finally:
        source.close()
        server.close()
        for w in workers.values():
            if w.poll() is None:
                w.kill()
                w.wait()
