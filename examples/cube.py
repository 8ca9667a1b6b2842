#!/usr/bin/env python
"""Cube example (reference examples/cube.rs): textured box + 2D rect +
gradient background + animated point light, orbit camera. Headless: renders
frames and saves cube.png."""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rusterix_tpu import (
    Assets,
    Batch2D,
    Batch3D,
    CullMode,
    D3OrbitCamera,
    Light,
    LightType,
    Material,
    MaterialModifier,
    MaterialRole,
    PixelSource,
    Rasterizer,
    Scene,
    Texture,
    Tile,
    VGrayGradientShader,
)

WIDTH, HEIGHT = 640, 480


def main():
    scene = Scene.from_static(
        [Batch2D.from_rectangle(0.0, 0.0, 200.0, 200.0).set_source(
            PixelSource.static_tile_index(0)
        )],
        [
            Batch3D.from_box(-0.5, -0.5, -0.5, 1.0, 1.0, 1.0)
            .set_source(PixelSource.static_tile_index(0))
            .set_cull_mode(CullMode.Off)
            .set_material(
                Material(MaterialRole.Metallic, MaterialModifier.Saturation, 0.6, 0.0)
            )
            .with_computed_normals()
        ],
    ).set_lights(
        [
            Light(LightType.Point)
            .with_intensity(1.0)
            .with_color([1.0, 1.0, 0.95])
            .compile()
        ]
    ).set_background(VGrayGradientShader())

    assets = Assets.default().with_textures(
        [Tile.from_texture(Texture.checkerboard(128, 16))]
    )
    camera = D3OrbitCamera()
    camera.set_parameter_f32("distance", 1.5)

    frame = None
    t0 = time.time()
    n = 30
    for i in range(n):
        elapsed = i / 30.0 * 1.5
        scene.lights[0].position = np.array(
            [2.0 * math.cos(elapsed), 0.8, 2.0 * math.sin(elapsed)], np.float32
        )
        rast = Rasterizer.setup(
            None,
            camera.view_matrix(),
            camera.projection_matrix(WIDTH, HEIGHT),
        ).ambient([0.1, 0.1, 0.1, 1.0])
        frame = rast.rasterize(scene, WIDTH, HEIGHT, 64, assets)
    dt = (time.time() - t0) / n
    print(f"cube: {dt*1000:.2f} ms/frame ({1/dt:.1f} fps) at {WIDTH}x{HEIGHT}")

    from PIL import Image

    Image.fromarray(frame, "RGBA").save("cube.png")
    print("saved cube.png")


if __name__ == "__main__":
    main()
