from . import csvio, profiling

__all__ = ["csvio", "profiling"]
