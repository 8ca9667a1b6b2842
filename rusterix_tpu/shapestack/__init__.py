from .context import ShapeContext
from .stack import ShapeStack
from .tilebuilder import (
    build_tile,
    compute_sector_overrides,
    extract_anchored_geometry,
    tile_builder,
)

__all__ = [
    "ShapeContext",
    "ShapeStack",
    "build_tile",
    "compute_sector_overrides",
    "extract_anchored_geometry",
    "tile_builder",
]
