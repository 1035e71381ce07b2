"""Scalar function registry (the expression surface the reference lacks)."""

from .scalar import SCALAR_FUNCTIONS, resolve  # noqa: F401
