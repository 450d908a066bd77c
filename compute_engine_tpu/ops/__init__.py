"""Public functional ops with kernel dispatch.

TPU-native counterpart of the TFLite custom-op layer
(`larq_compute_engine/tflite/kernels/`): each op validates static params and
dispatches to a kernel implementation (reference / pallas bgemm / mxu),
mirroring the reference's ``use_reference_bconv`` / ``use_indirect_bgemm``
registration flags (`tflite/kernels/lce_ops_register.h:25-53`).
"""

from .bconv2d import bconv2d  # noqa: F401
from .bmaxpool import bmaxpool2d  # noqa: F401
from .detection import detection_postprocess  # noqa: F401
from .quantize import dequantize, quantize  # noqa: F401
