from .matrices import (
    invert,
    look_at_rh,
    mat3_translation_scale,
    orthographic_rh_zo,
    perspective_fov_rh_zo,
)
from .raster import Rasterizer, render_frame
from .scene_pack import PackedScene

__all__ = [
    "invert",
    "look_at_rh",
    "mat3_translation_scale",
    "orthographic_rh_zo",
    "perspective_fov_rh_zo",
    "Rasterizer",
    "render_frame",
    "PackedScene",
]
