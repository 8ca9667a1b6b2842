"""Golden parity tests: device pipeline vs the NumPy oracle (direct port of
the reference per-pixel algorithm). Parity bar: max abs channel diff <= 2 and
<= 1% of pixels differing by more than that (quantization/fast-math slack),
per SURVEY.md §7 'u8 output semantics & parity'.
"""

import numpy as np
import pytest

from rusterix_tpu import (
    Assets,
    Batch2D,
    Batch3D,
    CullMode,
    D3OrbitCamera,
    Light,
    LightType,
    PixelSource,
    RepeatMode,
    SampleMode,
    Scene,
    Texture,
    Tile,
    VGrayGradientShader,
)
from rusterix_tpu.ops.raster import Rasterizer

from .oracle import rasterize_oracle

W, H = 96, 72


def compare(frame, golden, max_diff=2, frac_bad=0.015):
    """Pixels may differ by >max_diff only at rasterization/texel boundaries
    (f32 device vs f64 oracle edge decisions) — bounded by frac_bad."""
    diff = np.abs(frame.astype(np.int32) - golden.astype(np.int32))
    bad = (diff > max_diff).any(axis=-1)
    assert bad.mean() <= frac_bad, (
        f"{bad.mean()*100:.2f}% pixels differ by more than {max_diff} "
        f"(max diff {diff.max()})"
    )


def render_both(scene, assets, camera, ambient=None, background_shader=None):
    view = camera.view_matrix()
    proj = camera.projection_matrix(W, H)
    rast = Rasterizer.setup(None, view, proj)
    if ambient is not None:
        rast.ambient(ambient)
    frame = rast.rasterize(scene, W, H, 32, assets)
    golden, _ = rasterize_oracle(
        scene, assets, view, proj, W, H,
        ambient=ambient, background_shader=background_shader,
        hash_anim=rast.hash_anim,
    )
    return frame, golden


def default_assets():
    return Assets.default().with_textures(
        [Tile.from_texture(Texture.checkerboard(32, 4))]
    )


def test_cube_flat_pixel_source():
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-0.5, -0.5, -0.5, 1, 1, 1)
            .set_source(PixelSource.pixel((200, 60, 30, 255)))
        ],
    )
    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 1.5)
    frame, golden = render_both(scene, default_assets(), cam, ambient=[0.4, 0.4, 0.4, 1.0])
    compare(frame, golden)


def test_cube_textured_with_light():
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-0.5, -0.5, -0.5, 1, 1, 1)
            .set_source(PixelSource.static_tile_index(0))
            .with_computed_normals()
        ],
    ).set_lights(
        [
            Light(LightType.Point)
            .with_position([2.0, 0.8, 2.0])
            .with_color([1.0, 1.0, 0.95])
            .with_intensity(1.0)
            .compile()
        ]
    )
    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 1.5)
    frame, golden = render_both(scene, default_assets(), cam, ambient=[0.1, 0.1, 0.1, 1.0])
    compare(frame, golden)


def test_background_shader():
    scene = Scene.from_static([], []).set_background(VGrayGradientShader())
    cam = D3OrbitCamera()
    frame, golden = render_both(
        scene, default_assets(), cam, background_shader=VGrayGradientShader()
    )
    compare(frame, golden, max_diff=0, frac_bad=0.0)


def test_near_plane_clipping():
    # camera very close: cube straddles the near plane
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-2.0, -2.0, -2.0, 4, 4, 4)
            .set_source(PixelSource.pixel((90, 120, 200, 255)))
        ],
    )
    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 1.0)
    frame, golden = render_both(scene, default_assets(), cam, ambient=[0.8, 0.8, 0.8, 1.0])
    compare(frame, golden)


@pytest.mark.parametrize("cull", [CullMode.Off, CullMode.Back, CullMode.Front])
def test_cull_modes(cull):
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-0.5, -0.5, -0.5, 1, 1, 1)
            .set_cull_mode(cull)
            .set_source(PixelSource.pixel((255, 255, 255, 255)))
        ],
    )
    cam = D3OrbitCamera()
    # generic azimuth: at exactly pi/2 the box's side faces are view-space
    # degenerate and cull decisions are FP-noise-determined
    cam.azimuth = 0.9
    cam.set_parameter_f32("distance", 1.5)
    frame, golden = render_both(scene, default_assets(), cam, ambient=[0.5, 0.5, 0.5, 1.0])
    compare(frame, golden)


@pytest.mark.parametrize(
    "repeat",
    [RepeatMode.ClampXY, RepeatMode.RepeatXY, RepeatMode.RepeatX, RepeatMode.RepeatY],
)
def test_repeat_modes(repeat):
    batch = (
        Batch3D.from_box(-0.5, -0.5, -0.5, 1, 1, 1)
        .set_source(PixelSource.static_tile_index(0))
        .set_repeat_mode(repeat)
    )
    batch.uvs = batch.uvs * 2.5 - 0.5  # force out-of-range uvs
    scene = Scene.from_static([], [batch])
    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 1.5)
    frame, golden = render_both(scene, default_assets(), cam, ambient=[0.7, 0.7, 0.7, 1.0])
    compare(frame, golden)


def test_z_ordering_two_boxes():
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-0.6, -0.3, -0.9, 0.6, 0.6, 0.6)
            .set_source(PixelSource.pixel((255, 0, 0, 255))),
            Batch3D.from_box(-0.1, -0.3, -0.1, 0.6, 0.6, 0.6)
            .set_source(PixelSource.pixel((0, 255, 0, 255))),
        ],
    )
    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 2.0)
    frame, golden = render_both(scene, default_assets(), cam, ambient=[0.6, 0.6, 0.6, 1.0])
    compare(frame, golden)


def test_spot_and_area_lights():
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-1.0, -0.2, -1.0, 2.0, 0.2, 2.0)
            .set_source(PixelSource.pixel((180, 180, 180, 255)))
            .with_computed_normals()
        ],
    )
    spot = Light(LightType.Spot).with_position([0.0, 2.0, 0.0]).with_intensity(2.0)
    spot.direction = np.array([0.0, -1.0, 0.0], np.float32)
    spot.cone_angle = 0.6
    spot.end_distance = 6.0
    area = Light(LightType.Area).with_position([1.0, 1.0, 1.0]).with_intensity(0.7)
    area.normal = np.array([0.0, -1.0, 0.0], np.float32)
    area.end_distance = 6.0
    scene.lights = [spot.compile(), area.compile()]
    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 3.0)
    frame, golden = render_both(scene, default_assets(), cam)
    compare(frame, golden)


def test_alpha_texels_not_written():
    # a texture with alpha<255 everywhere: opaque pass must write nothing
    tex = Texture(np.full((8, 8, 4), 128, np.uint8))
    assets = Assets.default().with_textures([Tile.from_texture(tex)])
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-0.5, -0.5, -0.5, 1, 1, 1)
            .set_source(PixelSource.static_tile_index(0))
        ],
    ).set_background(VGrayGradientShader())
    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 1.5)
    view = cam.view_matrix()
    proj = cam.projection_matrix(W, H)
    rast = Rasterizer.setup(None, view, proj)
    frame = rast.rasterize(scene, W, H, 32, assets)
    golden, _ = rasterize_oracle(
        scene, assets, view, proj, W, H, background_shader=VGrayGradientShader()
    )
    compare(frame, golden, max_diff=0, frac_bad=0.0)
