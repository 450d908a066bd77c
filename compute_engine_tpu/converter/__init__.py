"""Model converter: float parameter trees -> packed inference artifacts.

TPU-native counterpart of the MLIR converter (`larq_compute_engine/mlir/`):
because our model architecture is explicit (models.zoo + builders), the
pattern-recognition passes collapse into direct weight transformation —
BN folding, sign binarisation, compile-time bitpacking, threshold
computation — performed by ``models.ConvertBuilder``.

Public API mirrors `larq_compute_engine/__init__.py` (convert_keras_model /
convert_saved_model):
  convert(spec, params)            -> artifact layer dict
  save_artifact / load_artifact    -> .npz packed-weight artifact
  keras_import.import_keras_weights -> map a Larq/Keras model onto a KNOWN
                                       spec's params (weight-tree mapping)
  import_keras_model(model)        -> (spec, params) from the Keras graph
                                       alone — the convert_keras_model
                                       equivalent (graph pattern walking,
                                       `mlir/python/converter.py:166-280`)
"""

from ..models.builder import convert_model as convert  # noqa: F401
from .artifact import (load_artifact, merge_arrays,  # noqa: F401
                       save_artifact, split_arrays)
from .graph_import import (graph_int8_ranges,  # noqa: F401
                           import_keras_model, spec_from_program)
