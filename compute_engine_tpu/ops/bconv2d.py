"""``bconv2d`` — the public binary-convolution op.

Dispatch mirrors the reference's op registration variants
(`tflite/kernels/bconv2d.cc:568-599`: BCONV_2D{_REF,_OPT_BGEMM,...}) plus the
TPU-only MXU path. Validation follows ``Prepare``
(`tflite/kernels/bconv2d.cc:133-300`).
"""

from __future__ import annotations

from ..core.params import BConv2DParams
from ..core.reference import bconv2d_reference
from ..core.transforms import OutputTransform
from ..core.types import PACKED_DTYPE, packed_size
from ..kernels.bconv2d import bconv2d_bgemm, bconv2d_mxu

__all__ = ["bconv2d", "KERNELS"]

KERNELS = ("auto", "reference", "bgemm", "mxu")


def bconv2d(packed_input, packed_filter, transform: OutputTransform,
            params: BConv2DParams, output_kind: str = "float",
            kernel: str = "auto", unpacked_filter=None):
    """Binary 2D convolution on bitpacked operands.

    Args:
      packed_input: (N, H, W, ceil(C_in/32)) uint32.
      packed_filter: (C_out, FH, FW, ceil(C_in/groups/32)) uint32 (OHWI-packed,
        like the reference's packed filter layout).
      transform: fused output transform. For ``output_kind='bitpacked'`` the
        thresholds must have been computed against sign-flipped filters
        (`mlir/transforms/optimize.cc:120-127`).
      params: static conv parameters.
      output_kind: "float" | "int8" | "bitpacked".
      kernel: "auto" | "reference" | "bgemm" (Pallas xor-popcount) | "mxu".
      unpacked_filter: optional pre-unpacked +-1 bf16 (FH, FW, Cg, O) filter
        for the MXU path.

    Returns (N, OH, OW, C_out) float32/int8 or (N, OH, OW, ceil(C_out/32))
    uint32.
    """
    if packed_input.dtype != PACKED_DTYPE:
        raise TypeError(f"packed_input must be {PACKED_DTYPE}, got "
                        f"{packed_input.dtype}")
    if packed_input.ndim != 4 or packed_filter.ndim != 4:
        raise ValueError("bconv2d operands must be rank 4")
    # Groups are validated against the packed filter depth, mirroring
    # `tflite/kernels/bconv2d.cc:169-186`.
    expect_cpg = packed_size(params.channels_in_per_group)
    if packed_filter.shape[3] != expect_cpg:
        raise ValueError(
            f"packed filter depth {packed_filter.shape[3]} does not match "
            f"channels_in={params.channels_in} / groups={params.groups}")
    if packed_input.shape[3] != params.groups * expect_cpg:
        raise ValueError(
            f"packed input depth {packed_input.shape[3]} does not match "
            f"groups * packed filter depth {params.groups * expect_cpg}")
    if params.groups > 1 and params.channels_in_per_group % 32:
        raise ValueError(
            "grouped bconv2d requires channels_in/groups to be a multiple of "
            "32 (`prepare_tf.cc:121-146` divisibility rule)")
    if output_kind not in ("float", "int8", "bitpacked"):
        raise ValueError(f"unknown output_kind {output_kind!r}")

    if kernel == "auto":
        # Shape-keyed runtime kernel selection — the analogue of
        # `core/indirect_bgemm/select_kernel.h:30-142`, consulted at trace
        # time (static shapes) against the measured table in kernels/select.
        from ..kernels.select import select_bconv2d_kernel

        n, in_h, in_w, _ = packed_input.shape
        _, fh, fw, _ = packed_filter.shape
        out_h, out_w, _, _ = params.output_spatial(in_h, in_w, fh, fw)
        kernel = select_bconv2d_kernel(
            "packed", c_in=params.channels_in, c_out=packed_filter.shape[0],
            fh=fh, fw=fw, m=n * out_h * out_w, out_kind=output_kind,
            groups=params.groups, dilation=params.dilation,
            stride=params.stride)
    # Profiler labels, like ruy ScopeLabel "BConv2D (optimized/reference)"
    # (`core/bconv2d/optimized_bgemm.h:77`).
    import jax

    with jax.named_scope(f"bconv2d_{kernel}"):
        if kernel == "reference":
            return bconv2d_reference(packed_input, packed_filter, transform,
                                     params, output_kind)
        if kernel == "bgemm":
            return bconv2d_bgemm(packed_input, packed_filter, transform,
                                 params, output_kind)
        if kernel == "mxu":
            return bconv2d_mxu(packed_input, packed_filter, transform, params,
                               output_kind, unpacked_filter=unpacked_filter)
    raise ValueError(f"unknown kernel {kernel!r}; expected one of {KERNELS}")
