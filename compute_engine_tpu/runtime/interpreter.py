"""``Interpreter`` — the user-facing inference API.

Counterpart of the reference's Python interpreter
(`tflite/python/interpreter.py:40-58`, `interpreter_base.py:30-95`), with the
TFLite graph executor replaced by a jitted XLA program. Where the reference
iterates batch-of-1 samples through a single-threaded interpreter
(`interpreter_base.py:74-95`), we jit once per batch shape and let XLA
schedule the whole graph on the chip.

Kernel selection flags mirror `Interpreter(..., use_reference_bconv,
use_indirect_bgemm)`: here ``kernel`` picks reference / bgemm / mxu.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..models import get_model, packed_apply
from ..models.zoo import ModelSpec
from ..converter import load_artifact

__all__ = ["Interpreter"]


class Interpreter:
    """Runs packed inference for a converted model artifact.

    Args:
      model: ModelSpec or zoo model name.
      layers: converted artifact layer dict (from ``converter.convert`` or
        ``load_artifact``); if ``artifact_path`` is given it is loaded.
      kernel: bconv kernel selection ("auto" | "reference" | "bgemm" | "mxu").
      compute_dtype: dtype for the float (non-binary) layers.
    """

    def __init__(self, model=None, layers=None, artifact_path=None,
                 kernel="auto", compute_dtype=jnp.bfloat16,
                 input_scale=None, input_zero_point=0,
                 output_mode="probs", output_scale=None,
                 output_zero_point=0):
        """``input_scale``/``input_zero_point`` accept int8/uint8 image input
        directly (the analogue of int8-I/O flatbuffer surgery,
        `mlir/python/util.py:176-222`); ``output_mode`` in
        {"probs", "logits", "int8"} controls the output boundary."""
        if artifact_path is not None:
            name, config, layers = load_artifact(artifact_path)
            if model is None:
                if isinstance(config, dict) and config.get("graph_program"):
                    # Self-contained artifact: the graph program travels in
                    # the header (the flatbuffer analogue — model structure
                    # + packed weights in one file), so no registry entry or
                    # Python model definition is needed.
                    from ..converter.graph_import import spec_from_program
                    model = spec_from_program(
                        config["graph_program"],
                        input_size=config["input_size"],
                        num_classes=config["num_classes"], name=name)
                else:
                    model = name
        if isinstance(model, str):
            model = get_model(model)
        if not isinstance(model, ModelSpec) or layers is None:
            raise ValueError("Interpreter needs a model spec and layers "
                             "(or artifact_path)")
        if output_mode not in ("probs", "logits", "int8"):
            raise ValueError(f"unknown output_mode {output_mode!r}")
        if output_mode == "int8" and output_scale is None:
            raise ValueError("output_mode='int8' requires output_scale")
        self.spec = model
        self.layers = layers
        self.kernel = kernel
        self.compute_dtype = compute_dtype
        self.input_scale = input_scale
        self.input_zero_point = input_zero_point
        self.output_mode = output_mode
        self.output_scale = output_scale
        self.output_zero_point = output_zero_point

        # Weights are jit ARGUMENTS, not trace-time constants: XLA cannot
        # constant-fold an unpacked filter into the executable (which would
        # forfeit the 32x packed compression and bloat compile time). They
        # are not donated — the same buffers serve every call.
        from ..converter import merge_arrays, split_arrays
        from ..models import prepare_runtime_arrays

        # One-time unpack of the +-1 filters (ruy weight-cache analogue).
        self._static, arrays = split_arrays(prepare_runtime_arrays(layers))
        self._arrays = jax.tree.map(jnp.asarray, arrays)

        def forward(arrays, x):
            lyrs = merge_arrays(self._static, arrays)
            if self.input_scale is not None:
                x = (x.astype(jnp.float32)
                     - float(self.input_zero_point)) * float(self.input_scale)
            out = packed_apply(self.spec, lyrs, x, kernel=self.kernel,
                               compute_dtype=self.compute_dtype,
                               return_logits=self.output_mode == "logits")
            if self.output_mode == "int8":
                from ..core.types import round_half_away, saturate_int8
                q = out / float(self.output_scale) + float(
                    self.output_zero_point)
                out = saturate_int8(round_half_away(q).astype(jnp.int32))
            return out

        self._jitted = jax.jit(forward)

    # -- introspection (the reference interpreter's properties:
    # `tflite/python/interpreter_base.py:30-73` exposes input/output
    # types, shapes, scales and zero points) -------------------------------

    @property
    def input_shape(self):
        return (None, *self.spec.input_size, 3)

    @property
    def output_shape(self):
        return (None, self.spec.num_classes)

    @property
    def input_type(self):
        return np.int8 if self.input_scale is not None else np.float32

    @property
    def output_type(self):
        return np.int8 if self.output_mode == "int8" else np.float32

    @property
    def input_scales(self):
        return [self.input_scale]

    @property
    def input_zero_points(self):
        return [self.input_zero_point]

    @property
    def output_scales(self):
        return [self.output_scale]

    @property
    def output_zero_points(self):
        return [self.output_zero_point]

    def __call__(self, x):
        x = jnp.asarray(x)
        if self.input_scale is None and x.dtype != jnp.float32:
            x = x.astype(jnp.float32)
        return self._jitted(self._arrays, x)

    def predict(self, x, batch_size: int | None = None):
        """Predict class probabilities; mirrors ``Interpreter.predict``.

        Accepts a single image (H, W, 3) or a batch (N, H, W, 3); optional
        ``batch_size`` splits large inputs into fixed-size chunks so only one
        program shape is compiled.
        """
        x = np.asarray(x, np.float32)
        single = x.ndim == 3
        if single:
            x = x[None]
        if batch_size is None or x.shape[0] <= batch_size:
            out = np.asarray(self(x))
        else:
            chunks = []
            for i in range(0, x.shape[0], batch_size):
                chunk = x[i:i + batch_size]
                if chunk.shape[0] < batch_size:  # pad to the compiled shape
                    pad = batch_size - chunk.shape[0]
                    padded = np.concatenate(
                        [chunk, np.zeros((pad, *x.shape[1:]), np.float32)])
                    chunks.append(np.asarray(self(padded))[:chunk.shape[0]])
                else:
                    chunks.append(np.asarray(self(chunk)))
            out = np.concatenate(chunks)
        return out[0] if single else out
