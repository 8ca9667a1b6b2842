#!/usr/bin/env python
"""Cube-shaded example (reference examples/cube_shaded.rs): procedural wood
rusteria shader on a cube with a point light. Saves cube_shaded.png."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rusterix_tpu import (
    Assets,
    Batch3D,
    CullMode,
    D3OrbitCamera,
    Light,
    LightType,
    PixelSource,
    Rasterizer,
    Scene,
    Texture,
    Tile,
    VGrayGradientShader,
)

WOOD = """
fn shade() {
    let t = time * 0.0;
    let uv2 = uv / 3.0 - vec2(1.5);
    let n1 = sample(uv2 + vec2(t, 0.0), "fbm_perlin");
    let n2 = sample(uv2 * 2.0 + vec2(0.0, t*0.7), "fbm_perlin");
    let turb = 0.65 * n1 + 0.35 * n2;
    let turb_zm = (turb - 0.5) * 2.0;
    let r = length(uv2);
    let rings = r + 0.22 * turb_zm;
    let waves = sin(rings * 10.0);
    let rings_mask = pow(1.0 - abs(waves), 3.0);
    let grain_uv = vec2(uv2.x * 8.0, uv2.y * 40.0);
    let g = sample(grain_uv, "value");
    let grain = (g - 0.5) * 2.0;
    color = mix(vec3(0.72, 0.52, 0.32), vec3(0.45, 0.30, 0.16), rings_mask);
    color *= (1.0 + 0.06 * grain);
    let band = uv2.y + 0.15 * turb_zm;
    let cathedral = pow(1.0 - abs(sin(band * 6.0)), 4.0);
    color = mix(color, color * 0.9, cathedral * 0.2);
    roughness = 0.6 + cathedral * 0.3;
}
"""

WIDTH, HEIGHT = 640, 480


def main():
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-0.5, -0.5, -0.5, 1.0, 1.0, 1.0)
            .set_source(PixelSource.static_tile_index(0))
            .set_cull_mode(CullMode.Off)
            .with_computed_normals()
        ],
    ).set_lights(
        [
            Light(LightType.Point)
            .with_position([2.0, 0.8, 2.0])
            .with_intensity(1.0)
            .with_color([1.0, 1.0, 0.95])
            .compile()
        ]
    ).set_background(VGrayGradientShader())
    idx = scene.add_shader(WOOD)
    scene.d3_static[0].set_shader(idx)

    assets = Assets.default().with_textures(
        [Tile.from_texture(Texture.checkerboard(64, 8))]
    )
    camera = D3OrbitCamera()
    camera.azimuth = 0.9
    camera.set_parameter_f32("distance", 1.5)

    rast = Rasterizer.setup(
        None, camera.view_matrix(), camera.projection_matrix(WIDTH, HEIGHT)
    ).ambient([0.1, 0.1, 0.1, 1.0]).set_time(0.0)
    frame = rast.rasterize(scene, WIDTH, HEIGHT, 64, assets)

    from PIL import Image

    Image.fromarray(frame, "RGBA").save("cube_shaded.png")
    print("saved cube_shaded.png")


if __name__ == "__main__":
    main()
