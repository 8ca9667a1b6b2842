"""Scene builders mirroring the reference's example binaries, for golden
parity tests against /root/reference/images/screenshot_{cube,obj,map}.png.

cube  — examples/cube.rs:26-63   (logo box + 2D logo rect, orbit cam d=1.5,
        point light at t=0 -> (2.0, 0.8, 0.0), ambient 0.1, gray gradient)
obj   — examples/obj.rs:28-56    (teapot.obj scaled (.35,-.35,.35), RepeatXY,
        ambient 0.8)
map   — examples/map.rs:38-66    (minigame world.rxm via
        collect_from_directory, first-person entity at (6.06,1.0,4.55)
        orientation (0.0349,0.9994))

The 200x200 2D logo rect is specified in *content pixels* at the reference's
window size (1312x812 logical); builders scale it to the render width so the
covered screen fraction matches at any resolution.
"""

from __future__ import annotations

import os

import numpy as np

REF_ROOT = "/root/reference"
REF_CONTENT_W = 1312.0  # reference window content width (logical px)


def have_reference() -> bool:
    return os.path.isdir(os.path.join(REF_ROOT, "images"))


def _logo_tile():
    from rusterix_tpu import Texture, Tile

    return Tile.from_texture(
        Texture.from_image(os.path.join(REF_ROOT, "images", "logo.png"))
    )


def _logo_rect(width: int):
    from rusterix_tpu import Batch2D, PixelSource

    s = 200.0 * width / REF_CONTENT_W
    return Batch2D.from_rectangle(0.0, 0.0, s, s).set_source(
        PixelSource.static_tile_index(0)
    )


def build_cube(width: int, height: int):
    from rusterix_tpu import (
        Assets,
        Batch3D,
        CullMode,
        D3OrbitCamera,
        Light,
        LightType,
        PixelSource,
        Scene,
        VGrayGradientShader,
    )
    from rusterix_tpu.ops.raster import Rasterizer

    light = (
        Light(LightType.Point)
        .with_position([2.0, 0.8, 0.0])
        .with_intensity(1.0)
        .with_color([1.0, 1.0, 0.95])
    )
    scene = Scene.from_static(
        [_logo_rect(width)],
        [
            Batch3D.from_box(-0.5, -0.5, -0.5, 1.0, 1.0, 1.0)
            .set_source(PixelSource.static_tile_index(0))
            .set_cull_mode(CullMode.Off)
            .with_computed_normals()
        ],
    ).set_lights([light.compile()]).set_background(VGrayGradientShader())
    assets = Assets.default().with_textures([_logo_tile()])
    camera = D3OrbitCamera()
    camera.set_parameter_f32("distance", 1.5)
    rast = Rasterizer.setup(
        None, camera.view_matrix(), camera.projection_matrix(width, height)
    ).ambient([0.1, 0.1, 0.1, 0.1])
    return rast, scene, assets


def build_obj(width: int, height: int):
    from rusterix_tpu import (
        Assets,
        Batch3D,
        D3OrbitCamera,
        Light,
        LightType,
        PixelSource,
        RepeatMode,
        Scene,
        VGrayGradientShader,
    )
    from rusterix_tpu.ops.raster import Rasterizer

    scale = np.diag([0.35, -0.35, 0.35, 1.0]).astype(np.float32)
    light = (
        Light(LightType.Point)
        .with_position([2.0, 0.8, 0.0])
        .with_intensity(1.0)
        .with_color([1.0, 1.0, 0.95])
    )
    scene = Scene.from_static(
        [_logo_rect(width)],
        [
            Batch3D.from_obj(os.path.join(REF_ROOT, "examples", "teapot.obj"))
            .set_source(PixelSource.static_tile_index(0))
            .set_repeat_mode(RepeatMode.RepeatXY)
            .set_transform(scale)
            .with_computed_normals()
        ],
    ).set_lights([light.compile()]).set_background(VGrayGradientShader())
    assets = Assets.default().with_textures([_logo_tile()])
    camera = D3OrbitCamera()
    camera.set_parameter_f32("distance", 1.5)
    rast = Rasterizer.setup(
        None, camera.view_matrix(), camera.projection_matrix(width, height)
    ).ambient([0.8, 0.8, 0.8, 0.8])
    return rast, scene, assets


def build_map(width: int, height: int):
    from rusterix_tpu import Assets, D3FirstPCamera, Scene
    from rusterix_tpu.builders import D3Builder
    from rusterix_tpu.ops.raster import Rasterizer
    from rusterix_tpu.server.entity import Entity

    assets = Assets.default()
    assets.collect_from_directory(os.path.join(REF_ROOT, "minigame"))
    world = assets.get_map("world")
    scene = Scene.empty()
    D3Builder().build(world, assets, scene)
    scene.d2_static = [_logo_rect(width).set_receives_light(False)]

    entity = Entity()
    entity.position = np.array([6.0600824, 1.0, 4.5524735], np.float32)
    entity.orientation = np.array([0.03489969, 0.99939084], np.float32)
    camera = D3FirstPCamera()
    entity.apply_to_camera(camera)

    rast = Rasterizer.setup(
        None, camera.view_matrix(), camera.projection_matrix(width, height)
    ).ambient([1.0, 1.0, 1.0, 1.0])
    return rast, scene, assets


BUILDERS = {"cube": build_cube, "obj": build_obj, "map": build_map}
