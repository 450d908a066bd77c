"""Utilities: profiling annotations, configuration."""

from .profiling import annotate, trace  # noqa: F401
