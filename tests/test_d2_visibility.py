"""2D light wall-visibility: walls block non-ambient lights
(reference mapmini.is_visible at rasterizer.rs:841-860)."""

import numpy as np

from rusterix_tpu import (
    Assets,
    Batch2D,
    Light,
    LightType,
    PixelSource,
    Scene,
)
from rusterix_tpu.map.elements import CompiledLinedef
from rusterix_tpu.map.mini import MapMini
from rusterix_tpu.ops.matrices import mat3_translation_scale
from rusterix_tpu.ops.raster import Rasterizer


def test_wall_blocks_2d_light():
    scene = Scene.from_static(
        [
            Batch2D.from_rectangle(-4, -4, 8, 8).set_source(
                PixelSource.pixel((255, 255, 255, 255))
            )
        ],
        [],
    )
    light = Light(LightType.Point).with_position([3.0, 0.5, 0.0]).with_intensity(1.0)
    light.start_distance = 10.0
    light.end_distance = 20.0
    scene.lights = [light.compile()]
    mini = MapMini()
    mini.linedefs.append(
        CompiledLinedef(np.array([1.0, -4.0]), np.array([1.0, 4.0]), 0.0, 2.0)
    )
    scene.mapmini = mini

    proj = mat3_translation_scale(48.0, 36.0, 10.0)
    rast = Rasterizer.setup(
        proj, np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32)
    )
    frame = rast.rasterize(scene, 96, 72, 32, Assets.default())
    assert frame[36, 70, 0] == 255  # light side fully lit
    assert frame[36, 40, 0] == 0  # wall shadow side dark

    # ambient lights ignore walls
    amb = Light(LightType.Ambient).with_intensity(0.5)
    scene.lights = [amb.compile()]
    scene.touch()
    frame = rast.rasterize(scene, 96, 72, 32, Assets.default())
    assert frame[36, 40, 0] > 100
