"""Profiling labels — TPU counterpart of ruy's ScopeLabel instrumentation.

The reference wraps every kernel in ``ruy::profiler::ScopeLabel`` ("BGemm
(Ruy)" `core/bgemm/bgemm.h:32`, "BConv2D (optimized)"
`optimized_bgemm.h:77`, ...) and the benchmark tool prints a per-label time
treeview. Here, ``annotate`` adds `jax.named_scope` labels that show up in
XLA HLO and xprof/Perfetto traces, and ``trace`` captures a profile
directory viewable with TensorBoard / xprof.
"""

from __future__ import annotations

import contextlib
import functools

import jax

__all__ = ["annotate", "trace"]


def annotate(label: str):
    """Decorator: wrap a function in a named scope carried into HLO."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with jax.named_scope(label):
                return fn(*args, **kwargs)

        return wrapper

    return deco


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profile for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
