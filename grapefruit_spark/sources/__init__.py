from .io import read_any, write_any

__all__ = ["read_any", "write_any"]
