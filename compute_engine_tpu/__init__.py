"""compute_engine_tpu — a TPU-native binarized-neural-network inference engine.

Re-design of larq/compute-engine (see /root/repo/SURVEY.md) for TPU:
JAX/XLA/Pallas compute path, jax.sharding for multi-chip scale-out.

Subpackages:
  core      bitpacking, packed reference kernels, output-transform math
  kernels   Pallas TPU kernels (xor-popcount bgemm, fused epilogues) + MXU path
  ops       public functional ops with kernel dispatch
  models    Larq-Zoo model family (QuickNet, Bi-RealNet, BinaryDenseNet)
  converter model compiler: float params -> packed inference artifact
  parallel  mesh / sharding specs / distributed conv
  runtime   interpreter-style API, serving loop, benchmarking
"""

__version__ = "0.1.0"

from . import core  # noqa: F401
