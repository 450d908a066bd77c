"""Runtime front-end: interpreter-style API, benchmarking, serving."""

from .interpreter import Interpreter  # noqa: F401
