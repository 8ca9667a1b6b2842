"""Per-batch shader integration: the cube_shaded configuration
(reference examples/cube_shaded.rs) through the full device pipeline."""

import numpy as np

from rusterix_tpu import (
    Assets,
    Batch3D,
    CullMode,
    D3OrbitCamera,
    Light,
    LightType,
    PixelSource,
    Scene,
    Texture,
    Tile,
    VGrayGradientShader,
)
from rusterix_tpu.ops.raster import Rasterizer

WOOD = """
fn shade() {
    let uv2 = uv / 3.0 - vec2(1.5);
    let n1 = sample(uv2, "fbm_perlin");
    let r = length(uv2);
    let rings = r + 0.22 * ((0.65 * n1 - 0.5) * 2.0);
    let waves = sin(rings * 10.0);
    let rings_mask = pow(1.0 - abs(waves), 3.0);
    color = mix(vec3(0.72, 0.52, 0.32), vec3(0.45, 0.30, 0.16), rings_mask);
    roughness = 0.6;
}
"""


def test_cube_shaded_renders():
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-0.5, -0.5, -0.5, 1, 1, 1)
            .set_cull_mode(CullMode.Off)
            .set_source(PixelSource.static_tile_index(0))
            .with_computed_normals()
        ],
    ).set_background(VGrayGradientShader())
    idx = scene.add_shader(WOOD)
    assert idx == 0
    scene.d3_static[0].set_shader(idx)
    scene.set_lights(
        [
            Light(LightType.Point)
            .with_position([2.0, 0.8, 2.0])
            .with_intensity(1.0)
            .with_color([1.0, 1.0, 0.95])
            .compile()
        ]
    )

    assets = Assets.default().with_textures(
        [Tile.from_texture(Texture.checkerboard(16, 4))]
    )
    cam = D3OrbitCamera()
    cam.azimuth = 0.9
    cam.set_parameter_f32("distance", 1.5)
    rast = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(96, 72)
    ).ambient([0.2, 0.2, 0.2, 1.0])
    frame = rast.rasterize(scene, 96, 72, 32, assets)

    assert frame.shape == (72, 96, 4)
    # cube pixels should be wood-toned (red > blue), not checkerboard gray
    center = frame[30:45, 40:60].astype(np.float32)
    assert center[..., 0].mean() > center[..., 2].mean() + 5


def test_shader_changes_roughness_pipeline():
    """A shader writing opacity < 1 keeps pixels out of the opaque pass."""
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-0.5, -0.5, -0.5, 1, 1, 1)
            .set_source(PixelSource.pixel((255, 255, 255, 255)))
        ],
    ).set_background(VGrayGradientShader())
    idx = scene.add_shader("fn shade() { opacity = 0.5; }")
    scene.d3_static[0].set_shader(idx)

    cam = D3OrbitCamera()
    cam.azimuth = 0.9
    cam.set_parameter_f32("distance", 1.5)
    rast = Rasterizer.setup(None, cam.view_matrix(), cam.projection_matrix(64, 48))
    frame = rast.rasterize(scene, 64, 48, 32, Assets.default())
    # all pixels remain background (gradient) since alpha != 255
    golden = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(64, 48)
    ).rasterize(Scene.from_static([], []).set_background(VGrayGradientShader()), 64, 48, 32, Assets.default())
    assert np.array_equal(frame, golden)
