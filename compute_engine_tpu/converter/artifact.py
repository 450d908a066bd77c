"""Packed-model artifact: save/load of converted inference weights.

The reference's persisted artifact is the converted ``.tflite`` flatbuffer
with pre-bitpacked weights (SURVEY.md §5 checkpoint/resume). Ours is a
compressed ``.npz`` holding the packed uint32 filters, fused per-channel
transforms, float-layer kernels, and a JSON header with model name/config —
loadable with zero custom deps.
"""

from __future__ import annotations

import io
import json
import zipfile

import numpy as np

__all__ = ["save_artifact", "load_artifact"]

_HEADER_KEY = "__header__"


def _flatten(layers):
    flat = {}
    meta = {}
    for lname, layer in layers.items():
        lmeta = {}
        for k, v in layer.items():
            if isinstance(v, np.ndarray):
                flat[f"{lname}/{k}"] = v
            elif v is None:
                lmeta[k] = None
            else:
                lmeta[k] = v
        meta[lname] = lmeta
    return flat, meta


def save_artifact(path, layers, model_name: str, extra_config=None):
    """Write a packed-model artifact (.npz)."""
    flat, meta = _flatten(layers)
    header = {
        "format_version": 1,
        "model": model_name,
        "config": extra_config or {},
        "layer_meta": meta,
    }
    flat[_HEADER_KEY] = np.frombuffer(
        json.dumps(header).encode("utf-8"), dtype=np.uint8)
    np.savez_compressed(path, **flat)
    return path


def load_artifact(path):
    """Read a packed-model artifact. Returns (model_name, config, layers)."""
    data = np.load(path, allow_pickle=False)
    header = json.loads(bytes(data[_HEADER_KEY]).decode("utf-8"))
    layers = {name: dict(meta) for name, meta in header["layer_meta"].items()}
    for key in data.files:
        if key == _HEADER_KEY:
            continue
        lname, pname = key.rsplit("/", 1)
        layers.setdefault(lname, {})[pname] = data[key]
    return header["model"], header["config"], layers
