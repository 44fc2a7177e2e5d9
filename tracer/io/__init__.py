from tracer.io.ppm import load_ppm, write_ppm
from tracer.io.off import load_off

__all__ = ["load_ppm", "write_ppm", "load_off"]
