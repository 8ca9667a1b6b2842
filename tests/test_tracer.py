"""Path tracer tests: convergence, emissive surfaces, sky miss, accumulation."""

import numpy as np

from rusterix_tpu import (
    Assets,
    Batch3D,
    D3OrbitCamera,
    Light,
    LightType,
    Material,
    MaterialRole,
    PixelSource,
    Scene,
)
from rusterix_tpu.models.batch import MaterialModifier
from rusterix_tpu.tracer import AccumBuffer, Tracer


def test_accum_buffer_running_average():
    buf = AccumBuffer(4, 4)
    buf.accumulate(np.full((4, 4, 4), 1.0, np.float32))
    assert np.allclose(buf.pixels, 1.0)
    buf.accumulate(np.full((4, 4, 4), 0.0, np.float32))
    assert np.allclose(buf.pixels, 0.5)
    assert buf.frame == 2
    buf.reset()
    assert buf.frame == 0
    u8 = buf.to_u8()
    assert u8.dtype == np.uint8 and (u8[..., 3] == 255).all()


def test_trace_sky_only():
    scene = Scene.from_static([], [])
    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 2.0)
    buf = AccumBuffer(32, 24)
    tracer = Tracer()
    tracer.trace(cam, scene, buf, 64, Assets.default())
    assert buf.frame == 1
    img = buf.pixels
    assert np.isfinite(img).all()
    # sky gradient: upper rows bluer than lower rows
    assert img[:6, :, 2].mean() > img[-6:, :, 2].mean()


def test_trace_lit_box():
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-0.5, -0.5, -0.5, 1, 1, 1)
            .set_source(PixelSource.pixel((200, 200, 200, 255)))
            .with_computed_normals()
        ],
    ).set_lights(
        [
            Light(LightType.Point)
            .with_position([2.0, 2.0, 2.0])
            .with_intensity(1.0)
            .compile()
        ]
    )
    cam = D3OrbitCamera()
    cam.azimuth = 0.9
    cam.set_parameter_f32("distance", 2.0)
    buf = AccumBuffer(32, 24)
    tracer = Tracer()
    for _ in range(4):
        tracer.trace(cam, scene, buf, 64, Assets.default())
    assert buf.frame == 4
    img = buf.pixels
    assert np.isfinite(img).all()
    # the box should appear (center differs from sky corners)
    center = img[10:14, 14:18, :3].mean()
    assert center > 0.0


def test_trace_emissive_material():
    batch = (
        Batch3D.from_box(-0.5, -0.5, -0.5, 1, 1, 1)
        .set_source(PixelSource.pixel((255, 120, 40, 255)))
        .set_material(
            Material(MaterialRole.Emissive, MaterialModifier.Nothing, 1.0, 0.0)
        )
        .with_computed_normals()
    )
    scene = Scene.from_static([], [batch])
    cam = D3OrbitCamera()
    cam.azimuth = 0.9
    cam.set_parameter_f32("distance", 2.0)
    buf = AccumBuffer(32, 24)
    Tracer().trace(cam, scene, buf, 64, Assets.default())
    # emissive x10: center pixels very bright
    assert buf.pixels[10:14, 14:18, 0].max() > 1.0
