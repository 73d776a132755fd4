from .base import FlumeView
from .reduce import NativeStats, Reduce

__all__ = ["FlumeView", "NativeStats", "Reduce"]
