"""Compute core: bitpacking, packed reference kernels, output-transform math.

TPU-native counterpart of `larq_compute_engine/core/` (see SURVEY.md §2.1).
"""

from .types import (  # noqa: F401
    ACCUM_DTYPE,
    Activation,
    BITWIDTH,
    PACKED_DTYPE,
    Padding,
    ceil_div,
    packed_size,
    round_half_away,
    saturate_int8,
    xor_popcount,
)
from .bitpack import bitpack, bitunpack, packed_shape  # noqa: F401
from .params import BConv2DParams, tflite_same_padding  # noqa: F401
from .transforms import (  # noqa: F401
    OutputTransform,
    apply_output_transform_bitpacked,
    apply_output_transform_float,
    apply_output_transform_int8,
    compute_output_thresholds,
    fuse_output_transform,
    nominal_activation_range,
)
from .reference import bconv2d_reference  # noqa: F401
from .bmaxpool import BMaxPoolParams, bmaxpool  # noqa: F401
