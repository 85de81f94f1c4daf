from .jits import cached_jit

__all__ = ["cached_jit"]
