from tracer.dist.sharding import (make_ray_mesh, render_pixels_sharded,
                                  train_step)

__all__ = ["make_ray_mesh", "render_pixels_sharded", "train_step"]
