from . import csvio

__all__ = ["csvio"]
