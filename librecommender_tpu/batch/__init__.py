from .generator import BatchGenerator

__all__ = ["BatchGenerator"]
