"""Explicit shard_map collectives for tensor-parallel binary convolution.

Two TP execution modes over the "model" mesh axis (filters sharded on output
channels, activations replicated):

  gather   each chip computes its channel slice, then ``all_gather`` over
           ICI re-replicates the output (needed before residual adds /
           float layers). XLA schedules the gather asynchronously, so it
           overlaps with the epilogue/elementwise tail of the conv.
  sharded  returns the channel-sharded output for chaining into ops that
           consume shards (e.g. the next layer's input-channel shard in a
           Megatron-style alternating layout).

The GSPMD path (parallel.sharding + jit) reaches the same layouts
automatically; this module is the explicit-control variant for cases where
the partitioner's choice must be pinned, and the building block for manual
overlap experiments on real multi-chip hardware. Correctness is validated on
the CPU mesh (tests/test_parallel.py) — the qemu analogue (SURVEY.md §4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..core.params import BConv2DParams
from ..core.transforms import OutputTransform
from ..ops import bconv2d

__all__ = ["tp_bconv2d"]


def tp_bconv2d(packed_input, packed_filter, transform: OutputTransform,
               params: BConv2DParams, mesh, axis: str = "model",
               output_kind: str = "float", kernel: str = "auto",
               mode: str = "gather"):
    """Tensor-parallel bconv2d under shard_map.

    Args:
      packed_input: (N, H, W, Cp) uint32, replicated over ``axis``.
      packed_filter: (O, FH, FW, Cpg) uint32, global view — shard_map splits
        axis 0 over ``axis`` (O must be divisible by the axis size).
      transform: global-view output transform (per-channel arrays are split
        with the filter).
      mode: "gather" (replicated output) or "sharded" (channel-sharded).

    Returns (N, OH, OW, C_out) [gather] or the local shard [sharded].
    """
    n_shards = mesh.shape[axis]
    c_out = packed_filter.shape[0]
    if c_out % n_shards:
        raise ValueError(f"channels_out {c_out} not divisible by mesh axis "
                         f"{axis} of size {n_shards}")
    if output_kind == "bitpacked" and (c_out // n_shards) % 32:
        # Each shard packs its own channel slice into whole uint32 words;
        # a partial word per shard would interleave padding bits into the
        # gathered result (same invariant as the reference's byte-aligned
        # threaded bitpacked writes, `core/bgemm/kernels_common.h:82-95`).
        raise ValueError(
            "bitpacked TP output requires channels_out per shard to be a "
            f"multiple of 32; got {c_out // n_shards}")
    if transform.thresholds is not None:
        t_arrays = (jnp.asarray(transform.thresholds),)

        def local_transform(arrs):
            return OutputTransform(thresholds=arrs[0])
    else:
        t_arrays = (jnp.asarray(transform.multiplier),
                    jnp.asarray(transform.bias))

        def local_transform(arrs):
            return OutputTransform(clamp_min=transform.clamp_min,
                                   clamp_max=transform.clamp_max,
                                   multiplier=arrs[0], bias=arrs[1])

    def local_fn(x, w_local, *t_local):
        y_local = bconv2d(x, w_local, local_transform(t_local), params,
                          output_kind=output_kind, kernel=kernel)
        if mode == "gather":
            return jax.lax.all_gather(y_local, axis, axis=-1, tiled=True)
        return y_local

    in_specs = (
        P(),                               # replicated activations
        P(axis, None, None, None),         # filter sharded on out-channels
    ) + tuple(P(axis) for _ in t_arrays)   # per-channel transform arrays
    out_specs = P() if mode == "gather" else P(None, None, None, axis)

    fn = shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    return fn(packed_input, packed_filter, *t_arrays)
