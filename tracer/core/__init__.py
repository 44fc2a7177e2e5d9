from tracer.core.config import RenderConfig
from tracer.core import rng, mathutils

__all__ = ["RenderConfig", "rng", "mathutils"]
