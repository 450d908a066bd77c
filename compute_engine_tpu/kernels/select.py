"""Runtime kernel selection for binary convolutions.

The TPU-native analogue of the reference's measured runtime dispatch
(`core/indirect_bgemm/select_kernel.h:30-142` picks NEON microkernels by
depth/divisibility/accumulator-width at runtime;
`core/bgemm/kernels_aarch64.h:699` selects int16 vs int32 accumulators).
Here the choice is between whole lowerings rather than microkernels:

  packed input (uint32 words):
    "bgemm"  Pallas fused-unpack xor-popcount GEMM (im2col in the packed
             domain) — wins when the GEMM is deep and the MXU conv path
             would pay a full unpack round-trip.
    "mxu"    unpack to +-1 and run `lax.conv_general_dilated`.

  float input (the model runtime's inter-layer stream):
    "mxu"    sign to +-1 int8/bf16 and conv directly (no pack round-trip).
    "s2d"    same, but space-to-depth(2) retiled — fills the MXU's 128
             lanes when channels_in < 128 (see kernels/bconv2d.py).
    "bgemm"  quantize (pack) then the Pallas bgemm.

Selection is static (shapes are known at trace time), so it is a pure
function of the shape key — the table is consulted during tracing, exactly
like the reference's Prepare-time kernel choice. The built-in table holds
winners measured on the round-2 TPU (v5e-class chip behind the axon tunnel,
fori-loop differencing timer, batch 8 and 128 over the Larq-Zoo layer
shapes); `autotune` re-measures on the current device and overrides it.
"""

from __future__ import annotations

import json
import math

__all__ = ["select_bconv2d_kernel", "autotune_bconv2d", "kernel_table",
           "load_table", "save_table", "reset_table"]


def _m_bucket(m: int) -> int:
    """log2 bucket of the GEMM row count (batch * out_h * out_w)."""
    return max(0, int(math.log2(max(m, 1))))


def _key(domain: str, c_in: int, c_out: int, fhw: int, m: int,
         out_kind: str) -> tuple:
    return (domain, c_in, c_out, fhw, _m_bucket(m), out_kind)


# Measured winners (see module docstring; re-generate with autotune_bconv2d).
# Keys: (domain, c_in, c_out, fh*fw, log2-bucket of M rows, out_kind).
_DEFAULT_TABLE: dict[tuple, str] = {}

_TABLE: dict[tuple, str] = dict(_DEFAULT_TABLE)


def kernel_table() -> dict:
    return _TABLE


def reset_table() -> None:
    _TABLE.clear()
    _TABLE.update(_DEFAULT_TABLE)


def load_table(path: str) -> None:
    with open(path) as f:
        data = json.load(f)
    for k, v in data.items():
        domain, c_in, c_out, fhw, mb, out_kind = k.split("|")
        _TABLE[(domain, int(c_in), int(c_out), int(fhw), int(mb),
                out_kind)] = v


def save_table(path: str) -> None:
    data = {"|".join(str(p) for p in k): v for k, v in _TABLE.items()}
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)


def _heuristic(domain: str, c_in: int, c_out: int, fhw: int, m: int,
               out_kind: str) -> str:
    """Shape heuristic distilled from measurements (TPU v5e, axon tunnel).

    Measured regularities:
      * float input: the direct sign->conv int8 MXU path wins at every
        measured zoo shape and batch (8 and 128). The s2d retile raises
        MXU lane occupancy at c_in < 128 but LOSES end to end — its extra
        full-tensor passes (pad + space-to-depth + inverse) dominate on the
        HBM-bound early sections (QuickNet batch 128: 42.3k img/s direct vs
        20.7k with s2d on the 64/128 sections), so it is never the default;
        it remains selectable explicitly or via a measured table entry.
      * packed input: the MXU unpack+conv path wins at large M (b=8 zoo
        shapes: 25-66us vs 15-260us bgemm); the Pallas bgemm wins when the
        output is bitpacked (fused in-kernel threshold + lane packing avoids
        a full int32 accumulator round-trip) and on deep small-M GEMMs
        (fc shapes), where the conv path would unpack the whole weight
        matrix to compute a handful of rows.
    """
    if domain == "float":
        return "mxu"
    # packed domain
    if out_kind == "bitpacked":
        return "bgemm"
    if m <= 512 and c_in * fhw >= 2048:
        return "bgemm"  # deep, narrow GEMM: fc shapes
    return "mxu"


def select_bconv2d_kernel(domain: str, *, c_in: int, c_out: int, fh: int,
                          fw: int, m: int, out_kind: str = "float",
                          groups: int = 1, dilation=(1, 1),
                          stride=(1, 1)) -> str:
    """Pick the kernel for a bconv2d with the given static shape.

    Args:
      domain: "packed" (uint32 words in) or "float" (sign-domain floats in).
      m: GEMM rows = batch * out_h * out_w.

    Returns a kernel name understood by ops.bconv2d (packed domain) or the
    model builder (float domain).
    """
    choice = _TABLE.get(_key(domain, c_in, c_out, fh * fw, m, out_kind))
    if choice is None:
        choice = _heuristic(domain, c_in, c_out, fh * fw, m, out_kind)
    if choice == "s2d":
        # The retile has hard constraints; fall back when they don't hold.
        ok = (groups == 1 and tuple(dilation) == (1, 1)
              and stride[0] == stride[1] and stride[0] in (1, 2)
              and c_in % 2 == 0 and domain == "float")
        if not ok:
            return "mxu"
    return choice


def autotune_bconv2d(shapes, *, batch=8, out_kind="float", iters=100,
                     pad_value=1, update_table=True):
    """Measure every candidate kernel per shape on the current device.

    ``shapes``: iterable of (h, w, c_in, c_out, fh) layer shapes. Returns
    {shape: {kernel: seconds}} and (by default) records the winners in the
    process-wide table used by ``select_bconv2d_kernel``. The reference
    selects kernels from static rules measured offline
    (`select_kernel.h:30-142`); this is the measure-on-device variant.
    """
    import numpy as np
    import jax.numpy as jnp

    from ..core.bitpack import bitpack
    from ..core.params import BConv2DParams
    from ..core.transforms import (OutputTransform, compute_output_thresholds,
                                   fuse_output_transform)
    from ..core.types import Padding
    from ..ops import bconv2d as bconv2d_op
    from ..ops import quantize
    from ..runtime.microbench import time_fn
    from .bconv2d import bconv2d_mxu_float_in, bconv2d_mxu_s2d

    rng = np.random.default_rng(0)
    results = {}
    for (h, w, c_in, c_out, fh) in shapes:
        params = BConv2DParams(channels_in=c_in, stride=(1, 1),
                               padding=Padding.SAME, pad_value=pad_value)
        k = fh * fh * c_in
        post_mul = rng.uniform(0.1, 2.0, c_out).astype(np.float32)
        post_bias = rng.uniform(-5, 5, c_out).astype(np.float32)
        if out_kind == "bitpacked":
            tr = OutputTransform(thresholds=compute_output_thresholds(
                post_mul, post_bias, k))
        else:
            tr = fuse_output_transform(post_mul, post_bias, k)
        xf = jnp.asarray(rng.normal(0, 1, (batch, h, w, c_in)).astype(
            np.float32))
        xp = bitpack(jnp.sign(xf) + 0.5)
        wp = bitpack(jnp.asarray(rng.choice(
            [-1.0, 1.0], size=(c_out, fh, fh, c_in)).astype(np.float32)))

        per = {}
        per[("packed", "bgemm")] = time_fn(
            lambda xp, wp: bconv2d_op(xp, wp, tr, params, out_kind,
                                      kernel="bgemm"), (xp, wp), iters=iters)
        per[("packed", "mxu")] = time_fn(
            lambda xp, wp: bconv2d_op(xp, wp, tr, params, out_kind,
                                      kernel="mxu"), (xp, wp), iters=iters)
        per[("float", "mxu")] = time_fn(
            lambda xf, wp: bconv2d_mxu_float_in(xf, wp, tr, params, out_kind,
                                                conv_dtype=jnp.int8),
            (xf, wp), iters=iters)
        per[("float", "bgemm")] = time_fn(
            lambda xf, wp: bconv2d_op(quantize(xf), wp, tr, params, out_kind,
                                      kernel="bgemm"), (xf, wp), iters=iters)
        if c_in % 2 == 0:
            per[("float", "s2d")] = time_fn(
                lambda xf, wp: bconv2d_mxu_s2d(xf, wp, tr, params, out_kind,
                                               conv_dtype=jnp.int8),
                (xf, wp), iters=iters)
        results[(h, w, c_in, c_out, fh)] = per

        if update_table:
            m = batch * h * w  # stride-1 SAME
            for domain in ("packed", "float"):
                cands = {kn: t for (d, kn), t in per.items() if d == domain}
                winner = min(cands, key=cands.get)
                _TABLE[_key(domain, c_in, c_out, fh * fh, m,
                            out_kind)] = winner
    return results
