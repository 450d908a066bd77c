"""Sharding specs for packed-model artifacts.

TP layout: binary filters are packed as (O, FH, FW, Cpg) uint32, so sharding
axis 0 over the "model" mesh axis splits *output channels* across chips —
each chip computes a channel slice of every binary conv from the (replicated,
32x-compressed) activations, and GSPMD re-gathers channels where the residual
add / concat / float layers need them. DP shards the batch over "data".
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["artifact_shardings", "shard_artifact", "input_sharding"]


def _layer_specs(layer):
    kind = layer["kind"]
    if kind == "bconv":
        return {
            "packed_filter": P("model", None, None, None),
            # pre-unpacked +-1 filter (prepare_runtime_arrays): HWIO layout,
            # same output-channel TP split on the last axis.
            "filter_pm1": P(None, None, None, "model"),
            "multiplier": P("model"),
            "bias": P("model"),
        }
    if kind == "conv":
        return {"kernel": P(None, None, None, "model"), "bias": P("model")}
    if kind == "depthwise_conv":
        return {"kernel": P(None, None, "model", None), "bias": P("model")}
    if kind == "dense":
        return {"kernel": P(None, "model"), "bias": P("model")}
    if kind == "bdense":
        return {"kernel_pm1": P(None, "model"), "multiplier": P("model"),
                "bias": P("model")}
    return {}


def _fit_spec(spec, shape, mesh):
    """Drop sharding on dims not divisible by their mesh-axis size
    (device_put rejects uneven shardings; replication is always valid)."""
    if spec is None:
        return P()
    fitted = []
    for i, axis in enumerate(spec):
        if axis is None:
            fitted.append(None)
            continue
        size = mesh.shape[axis]
        fitted.append(axis if i < len(shape) and shape[i] % size == 0
                      else None)
    return P(*fitted)


def artifact_shardings(layers, mesh):
    """Per-array NamedSharding tree matching the artifact layer dict."""
    out = {}
    for lname, layer in layers.items():
        specs = _layer_specs(layer)
        out[lname] = {
            k: NamedSharding(mesh, _fit_spec(specs.get(k), np.shape(v), mesh))
            for k, v in layer.items() if isinstance(v, (np.ndarray, jax.Array))
        }
    return out


def shard_artifact(layers, mesh):
    """device_put every artifact array with its TP sharding."""
    shardings = artifact_shardings(layers, mesh)
    out = {}
    for lname, layer in layers.items():
        new = dict(layer)
        for k, sh in shardings[lname].items():
            new[k] = jax.device_put(layer[k], sh)
        out[lname] = new
    return out


def input_sharding(mesh):
    """Batch (DP) sharding for NHWC image inputs."""
    return NamedSharding(mesh, P("data", None, None, None))
