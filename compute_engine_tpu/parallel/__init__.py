"""Multi-chip parallelism: mesh construction and sharding specs.

The reference's only parallelism is ruy's intra-op thread pool
(SURVEY.md §2.5). The TPU-native equivalents:
  intra-op threads  -> Pallas grid / XLA tiling on-chip (kernels/)
  data parallelism  -> batch sharding over the "data" mesh axis
  tensor parallelism-> packed-filter output-channel sharding over "model"
with XLA GSPMD inserting the collectives.
"""

from .collective import tp_bconv2d  # noqa: F401
from .mesh import make_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    artifact_shardings,
    input_sharding,
    shard_artifact,
)
