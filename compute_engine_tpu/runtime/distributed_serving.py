"""Multi-device / multi-host serving composition.

Glues together:
  * a DP/TP mesh over the available devices (parallel.mesh),
  * TP-sharded packed weights (parallel.sharding),
  * the continuous-batching front-end (runtime.serving),
  * host health monitoring with re-sharding on loss (runtime.health).

In a true multi-host deployment each host launches this with
``jax.distributed.initialize`` and its process-local devices; on one host it
spans the local devices. Host loss triggers rebuilding the mesh over the
surviving devices and re-jitting — continuous batching keeps absorbing
requests during the switch (requests in flight on the old program finish
normally; the queue drains onto the new one).
"""

from __future__ import annotations

import logging
import threading

import numpy as np

import jax
import jax.numpy as jnp

from ..models import get_model, packed_apply
from ..models.zoo import ModelSpec
from ..parallel import input_sharding, make_mesh, shard_artifact
from .health import HeartbeatMonitor
from .serving import ServingEngine

__all__ = ["ShardedInterpreter", "MultiHostServer"]


class ShardedInterpreter:
    """Packed inference jitted over a DP x TP mesh."""

    def __init__(self, model, layers, mesh=None, dp=None, tp=1,
                 kernel="auto", compute_dtype=jnp.bfloat16, devices=None):
        if isinstance(model, str):
            model = get_model(model)
        assert isinstance(model, ModelSpec)
        self.spec = model
        devices = devices if devices is not None else jax.devices()
        if mesh is None:
            dp = dp or len(devices) // tp
            mesh = make_mesh((dp, tp), devices=devices[:dp * tp])
        self.mesh = mesh
        # Weights as jit ARGUMENTS with their TP shardings (see Interpreter):
        # nothing can be constant-folded into the program, and the pre-
        # unpacked +-1 filters are sharded on output channels like the
        # packed words.
        from ..converter import merge_arrays, split_arrays
        from ..models import prepare_runtime_arrays

        self.layers = shard_artifact(prepare_runtime_arrays(layers), mesh)
        self._static, self._arrays = split_arrays(self.layers)
        self._in_sharding = input_sharding(mesh)
        self._jitted = jax.jit(
            lambda arrays, x: packed_apply(
                self.spec, merge_arrays(self._static, arrays), x,
                kernel=kernel, compute_dtype=compute_dtype),
            in_shardings=(None, self._in_sharding))

    @property
    def data_parallelism(self):
        return self.mesh.shape["data"]

    def __call__(self, x):
        return self._jitted(self._arrays, jnp.asarray(x, jnp.float32))


class MultiHostServer:
    """Continuous-batching server over a device mesh with health-driven
    re-sharding.

    Args:
      model, layers: model spec + converted artifact.
      host_devices: dict host_id -> list of devices; on host loss the mesh is
        rebuilt from surviving hosts' devices. Default: one "local" host with
        all devices.
      batch_size: global batch per step (padded; sharded over "data").
    """

    def __init__(self, model, layers, host_devices=None, tp=1,
                 batch_size=32, max_delay_ms=5.0, heartbeat_timeout_s=5.0,
                 kernel="auto", compute_dtype=jnp.bfloat16):
        self._model = model
        self._layers = layers
        self._tp = tp
        self._kernel = kernel
        self._dtype = compute_dtype
        self._batch = batch_size
        self._lock = threading.Lock()
        if host_devices is None:
            host_devices = {"local": list(jax.devices())}
        self._host_devices = dict(host_devices)
        # True while every host has lapsed: the server keeps dispatching on
        # the last good mesh (calls may hang on real dead hardware), so
        # callers must be able to see the state and apply their own timeouts.
        self.degraded = False
        self.monitor = HeartbeatMonitor(
            list(host_devices), timeout_s=heartbeat_timeout_s,
            on_loss=lambda h: self._reshard(),
            on_recovery=lambda h: self._reshard())
        self._build(list(host_devices))
        self.engine = ServingEngine(self._infer, batch_size=batch_size,
                                    max_delay_ms=max_delay_ms)
        self.reshard_count = 0

    def _build(self, hosts):
        devices = [d for h in hosts for d in self._host_devices[h]]
        if not devices:
            raise RuntimeError("no live hosts remain")
        interp = ShardedInterpreter(
            self._model, self._layers, tp=min(self._tp, len(devices)),
            kernel=self._kernel, compute_dtype=self._dtype, devices=devices)
        with self._lock:
            self._interp = interp

    def _reshard(self):
        hosts = self.monitor.alive_hosts()
        if not hosts:
            # Total outage: keep serving on the last good program rather than
            # tearing the server down from the monitor thread; the next
            # recovery event rebuilds the mesh. logging (not warnings.warn)
            # so EVERY recurrence is surfaced, not just the first.
            self.degraded = True
            logging.getLogger(__name__).warning(
                "all hosts lost heartbeat; serving degraded on previous mesh")
            return
        self._build(hosts)
        self.degraded = False
        self.reshard_count = getattr(self, "reshard_count", 0) + 1

    def _infer(self, batch):
        with self._lock:
            interp = self._interp
        return np.asarray(interp(batch))

    def submit(self, image):
        return self.engine.submit(image)

    def predict(self, image, timeout=None):
        return self.engine.predict(image, timeout=timeout)

    def close(self):
        self.engine.close()
        self.monitor.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
