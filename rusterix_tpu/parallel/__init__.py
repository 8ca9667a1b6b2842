from .mesh import make_mesh, render_frame_sharded, render_sharded_jit

__all__ = ["make_mesh", "render_frame_sharded", "render_sharded_jit"]
