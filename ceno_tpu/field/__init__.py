from . import fops, gl, gl2
from .gl import Gl
from .gl2 import Gl2

__all__ = ["gl", "gl2", "fops", "Gl", "Gl2"]
