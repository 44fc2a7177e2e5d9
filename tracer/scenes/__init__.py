from tracer.scenes import zoo

__all__ = ["zoo"]
