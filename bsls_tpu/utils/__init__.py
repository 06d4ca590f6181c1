from . import refimpl

__all__ = ["refimpl"]
