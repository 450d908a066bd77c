"""Explicit shard_map collectives for tensor-parallel binary convolution.

Three TP execution modes over the "model" mesh axis (filters sharded on
output channels):

  gather     activations replicated; each chip computes its channel slice,
             then ``all_gather`` over ICI re-replicates the output (needed
             before residual adds / float layers). XLA schedules the gather
             asynchronously, so it overlaps with the epilogue/elementwise
             tail of the conv.
  sharded    like gather but returns the channel-sharded output for chaining
             into ops that consume shards (Megatron-style alternation).
  pipelined  activations sharded on BATCH over the same axis; the packed
             weight shards (32x compressed — far cheaper to move than
             activations) rotate around the ring via ``ppermute`` while each
             chip convolves the shard it currently holds. Step t's conv is
             independent of step t+1's permute, so XLA's async
             collective-permute overlaps transfer with compute — no blocking
             all-gather anywhere (asserted at HLO level in
             tests/test_parallel.py). Output: batch-sharded, full channels.

The GSPMD path (parallel.sharding + jit) reaches the gather/sharded layouts
automatically; this module is the explicit-control variant for cases where
the partitioner's choice must be pinned, and `pipelined` is the
collective-overlap design SURVEY §7.3 flags as having no reference analogue.
Correctness is validated on the CPU mesh (tests/test_parallel.py) — the
qemu analogue (SURVEY.md §4).
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
    if mode == "pipelined":
        return _tp_bconv2d_pipelined(packed_input, packed_filter, transform,
                                     params, mesh, axis, output_kind, kernel)
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


def _tp_bconv2d_pipelined(packed_input, packed_filter, transform, params,
                          mesh, axis, output_kind, kernel):
    """Weight-rotation ring TP: batch-sharded x, ppermute'd filter shards.

    Each chip holds a batch slice of the activations and one out-channel
    shard of the packed filter (+ its per-channel transform slice). Over S
    ring steps it convolves the shard it currently holds while the next
    shard is already in flight on the ICI ring:

        for t in 0..S-1:
            start ppermute(filter, transforms) -> neighbour   (async)
            y[shard (me - t) % S] = bconv2d(x_local, filter_held)
            wait permute

    The conv at step t and the permute for step t+1 have no data dependency,
    so the XLA latency-hiding scheduler overlaps them (collective-permute,
    never a blocking all-gather); the rotated payload is the 32x-bitpacked
    filter + two O/S-length vectors — orders of magnitude smaller than the
    activation tensors a gather-based TP would move. Output is batch-sharded
    with full channels, composing directly with the DP input sharding.
    """
    n_shards = mesh.shape[axis]
    c_out = packed_filter.shape[0]
    per = c_out // n_shards
    n = packed_input.shape[0]
    if n % n_shards:
        raise ValueError(f"pipelined TP shards the batch: batch {n} not "
                         f"divisible by mesh axis {axis} of size {n_shards}")
    if output_kind == "bitpacked" and per % 32:
        raise ValueError(
            "bitpacked pipelined TP requires channels_out per shard to be a "
            f"multiple of 32; got {per}")

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

    perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]

    def local_fn(x_local, w_local, *t_local):
        me = jax.lax.axis_index(axis)
        held = (w_local, *t_local)
        pieces = []
        for t in range(n_shards):
            if t < n_shards - 1:
                nxt = jax.tree.map(
                    lambda a: jax.lax.ppermute(a, axis, perm), held)
            else:
                nxt = None
            w_t, *tr_t = held
            pieces.append(bconv2d(x_local, w_t, local_transform(tr_t),
                                  params, output_kind=output_kind,
                                  kernel=kernel))
            held = nxt
        # pieces[t] is the slice owned by shard (me - t) % S; reversed, the
        # concat runs ascending from shard (me + 1) % S, so one channel roll
        # places every slice at its global offset.
        full = jnp.concatenate(pieces[::-1], axis=-1)
        width = full.shape[-1]  # c_out, or c_out/32 packed words
        shift = (me + 1) * (width // n_shards)
        return jnp.roll(full, shift, axis=-1)

    in_specs = (
        P(axis),                           # batch-sharded activations
        P(axis, None, None, None),         # filter sharded on out-channels
    ) + tuple(P(axis) for _ in t_arrays)

    fn = shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                   out_specs=P(axis), check_vma=False)
    return fn(packed_input, packed_filter, *t_arrays)
