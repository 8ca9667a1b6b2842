"""Sector occlusion gates the sky/sun contribution (reference
rasterizer.rs:1327-1366 + MapMini::get_occlusion)."""

import numpy as np

from rusterix_tpu import (
    Assets,
    Batch3D,
    D3FirstPCamera,
    PixelSource,
    Scene,
)
from rusterix_tpu.map.mini import MapMini
from rusterix_tpu.ops.raster import Rasterizer
from rusterix_tpu.utils.rect import Rect


def render(occluded: bool):
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-4.0, -0.2, -4.0, 8.0, 0.2, 8.0)
            .set_source(PixelSource.pixel((200, 200, 200, 255)))
            .with_computed_normals()
        ],
    )
    mini = MapMini()
    if occluded:
        mini.occluded_sectors.append((Rect(-10, -10, 20, 20), 0.25))
    scene.mapmini = mini
    cam = D3FirstPCamera()
    cam.set_parameter_vec3("position", [0, 3.0, 6.0])
    cam.set_parameter_vec3("center", [0, 0, 0])
    rast = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(96, 72)
    ).ambient([0.8, 0.8, 0.8, 1.0])
    return rast.rasterize(scene, 96, 72, 32, Assets.default())


def test_occlusion_darkens_sky_term():
    lit = render(False)
    occ = render(True)
    cy, cx = 40, 48
    assert int(lit[cy, cx, 0]) > int(occ[cy, cx, 0]) + 20
    # occluded ambient = 0.25 of the sky contribution in linear space
    assert occ[cy, cx, 0] > 0  # still some light
