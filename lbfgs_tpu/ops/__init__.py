"""Compute primitives: vecmath wrappers and (optionally) Pallas-fused kernels."""

from . import vecmath

__all__ = ["vecmath"]
