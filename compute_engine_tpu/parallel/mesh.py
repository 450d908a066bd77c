"""Device-mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(shape=None, axis_names=("data", "model"), devices=None):
    """Create a Mesh over the available devices.

    Args:
      shape: (data, model) sizes; default (n_devices, 1). The "data" axis
        shards the image batch (DP); "model" shards binary-conv output
        channels (TP).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(dev_array, axis_names)
