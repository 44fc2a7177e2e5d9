from tracer.geometry import primitives

__all__ = ["primitives"]
