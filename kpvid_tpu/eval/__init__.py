from .final import FinalGenerator

__all__ = ["FinalGenerator"]
