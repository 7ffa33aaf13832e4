from .raygen import ray_directions
from .oracle import render_oracle

__all__ = ["ray_directions", "render_oracle"]
