from .tile_sharding import render_sharded, make_render_mesh, dryrun_multichip

__all__ = ["render_sharded", "make_render_mesh", "dryrun_multichip"]
