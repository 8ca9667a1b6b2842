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


def _box_scene(material=None, color=(200, 200, 200, 255)):
    b = (
        Batch3D.from_box(-0.5, -0.5, -0.5, 1, 1, 1)
        .set_source(PixelSource.pixel(color))
        .with_computed_normals()
    )
    if material is not None:
        b.set_material(material)
    scene = Scene.from_static([], [b]).set_lights(
        [
            Light(LightType.Point)
            .with_position([2.0, 2.0, 2.0])
            .with_intensity(1.0)
            .compile()
        ]
    )
    return scene


def _trace_once(scene, use_skip=False, seed_frames=1):
    cam = D3OrbitCamera()
    cam.azimuth = 0.9
    cam.set_parameter_f32("distance", 2.0)
    buf = AccumBuffer(32, 24)
    tr = Tracer()
    tr.use_aabb_skip = use_skip
    for _ in range(seed_frames):
        tr.trace(cam, scene, buf, 64, Assets.default())
    return buf.pixels


def test_aabb_skip_matches_brute_force():
    """The Morton-chunk AABB gate is a pure optimization: identical pixels."""
    scene = _box_scene()
    a = _trace_once(scene, use_skip=False)
    b = _trace_once(scene, use_skip=True)
    assert np.allclose(a, b, atol=1e-6)


def test_material_modifier_per_hit():
    """modifier.modify runs on the sampled texel per hit
    (trace.rs:438-465): InvLuminance on a dark texel -> high glossy value ->
    strongly specular surface differs from the Nothing-modifier render."""
    dark = (30, 30, 30, 255)
    base = _trace_once(
        _box_scene(Material(MaterialRole.Glossy, MaterialModifier.Nothing, 0.0, 0.0), dark)
    )
    glossy = _trace_once(
        _box_scene(
            Material(MaterialRole.Glossy, MaterialModifier.InvLuminance, 1.0, 0.0), dark
        )
    )
    assert not np.allclose(base, glossy, atol=1e-3)


def test_trace_render_graph_sky_miss():
    """A ShapeFX Sky node on the graph's miss terminal routes missed rays
    through the same render_miss_d3 sky the rasterizer draws
    (trace.rs:332-346) instead of the built-in debug gradient."""
    from rusterix_tpu.shapefx import ShapeFXGraph

    scene = Scene.from_static([], [])
    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 2.0)

    buf_default = AccumBuffer(32, 24)
    Tracer().trace(cam, scene, buf_default, 64, Assets.default())

    buf_sky = AccumBuffer(32, 24)
    tracer = Tracer().set_render_graph(
        ShapeFXGraph.default_render_graph(with_sky=True)
    )
    tracer.hour = 12.0
    tracer.trace(cam, scene, buf_sky, 64, Assets.default())

    a, b = buf_default.pixels, buf_sky.pixels
    assert np.isfinite(b).all()
    # noon day sky: bluer at the zenith than the debug gradient's fixed ramp
    assert not np.allclose(a, b, atol=1e-3)
    # sky colors are lit, not black (reference with no miss nodes adds
    # nothing; with the node it must contribute)
    assert float(b[..., :3].mean()) > 0.05


def test_onehot_gather_matches_row_gather():
    """Winner-attribute selection via `onehot(ti, T) @ fused_table` (the
    MXU path for small packs) is exact 0/1 selection: pixel-identical to
    the row-gather path (tracer.py _ONEHOT_GATHER_LIMIT rationale)."""
    scene = _box_scene(
        Material(MaterialRole.Glossy, MaterialModifier.Luminance, 0.7, 0.0)
    )

    def run(limit):
        cam = D3OrbitCamera()
        cam.azimuth = 0.9
        cam.set_parameter_f32("distance", 2.0)
        buf = AccumBuffer(32, 24)
        tr = Tracer()
        tr.onehot_limit = limit
        for _ in range(2):
            tr.trace(cam, scene, buf, 64, Assets.default())
        return buf.pixels

    a = run(0)        # row-gather path
    b = run(1 << 20)  # one-hot MXU path
    assert np.array_equal(a, b)
