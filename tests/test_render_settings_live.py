"""Every RenderSettings key is LIVE (VERDICT r4 item 5): the previously
dead keys now drive the renderer — reflection_samples / max_sky_distance
(ops/reflect.py, covered in test_reflect.py), max_shadow_distance /
max_shadow_steps (ops/shadow.py, test_shadow*.py), bump_strength
(SceneVM normal mix, 3d_shader.wgsl:398-404) and max_transparency_bounces
(depth-peeled transparency, the SceneVM front-to-back layer loop,
3d_shader.wgsl:692-846) — plus a completeness check that no field of the
settings block is silently ignored."""

import numpy as np
import pytest

from rusterix_tpu import (
    Assets,
    Batch3D,
    CullMode,
    D3OrbitCamera,
    Light,
    LightType,
    PixelSource,
    Scene,
)
from rusterix_tpu.models.render_settings import RenderSettings
from rusterix_tpu.ops.raster import Rasterizer

W, H = 96, 64

#: every RenderSettings field -> where the renderer consumes it
CONSUMED = {
    "sky_color": "Rasterizer.apply_render_settings -> background fill",
    "sun_color": "uniforms sun_color -> sun BRDF radiance",
    "sun_intensity": "day_factor",
    "sun_direction": "uniforms sun_dir",
    "sun_enabled": "sun_dir None / day_factor 0",
    "ambient_color": "uniforms ambient",
    "ambient_strength": "uniforms ambient scale",
    "fog_color": "distance fog blend",
    "fog_density": "exp^2 fog falloff (SceneVM semantics, fog_mode=1)",
    "ao_samples": "ops/ao.py tap count",
    "ao_radius": "ops/ao.py world radius",
    "bump_strength": "matmap normal mix (shade.py/megakernel.py)",
    "max_transparency_bounces": "depth-peeled transparency layers",
    "max_shadow_distance": "ops/shadow.py occluder range cap",
    "max_sky_distance": "ops/reflect.py ray range cap",
    "max_shadow_steps": "transparency-aware shadow bake",
    "reflection_samples": "ops/reflect.py GGX rays per pixel",
    "frame_time_ms": "update_transitions dt",
    "simulation": "apply_hour daylight",
    "transitions": "timed set() machinery",
}


def test_no_silently_dead_render_settings():
    """Completeness: every dataclass field of RenderSettings appears in the
    consumed map above — adding a new key without wiring it (or extending
    this map with its consumer) fails here."""
    import dataclasses

    fields = {f.name for f in dataclasses.fields(RenderSettings)}
    dead = fields - set(CONSUMED)
    assert not dead, f"RenderSettings keys with no renderer consumer: {dead}"


def _cam_rast():
    cam = D3OrbitCamera()  # default azimuth pi/2: camera on +Z looking -Z
    cam.elevation = 0.05
    cam.set_parameter_f32("distance", 4.0)
    return Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(W, H)
    )


def _layered_scene():
    """Opaque white wall behind TWO transparent panes (red near, blue far)."""
    wall = (
        Batch3D.from_box(-2, -2, -2.2, 4, 4, 0.1)
        .set_cull_mode(CullMode.Off)
        .set_source(PixelSource.pixel((255, 255, 255, 255)))
    )
    scene = Scene.from_static([], [wall])

    def pane(zc, rgba):
        # single quad (a thin box would contribute its BACK face as a
        # legitimate second peel layer)
        v = np.array(
            [[-1.5, -1.5, zc, 1], [1.5, -1.5, zc, 1], [1.5, 1.5, zc, 1],
             [-1.5, 1.5, zc, 1]], np.float32,
        )
        t = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        return (
            Batch3D.new(v, t, uv)
            .set_cull_mode(CullMode.Off)
            .set_source(PixelSource.pixel(rgba))
        )

    scene.d3_dynamic_opacity.extend(
        [pane(0.6, (255, 0, 0, 128)), pane(-0.6, (0, 0, 255, 128))]
    )
    return scene


def _render_layers(layers):
    scene = _layered_scene()
    rast = _cam_rast()
    rast.ambient((1.0, 1.0, 1.0, 1.0))
    rast.transparency_layers = layers
    return rast.rasterize(scene, W, H, 40, Assets.default()).astype(np.int32)


def test_transparency_layers_peel():
    """layers=1 blends only the NEAREST pane (the reference rasterizer's
    single opacity buffer); layers=2 also composites the blue pane behind
    it (the SceneVM's front-to-back loop) — the center pixel loses red and
    gains blue relative to the single-layer frame."""
    one = _render_layers(1)
    two = _render_layers(2)
    c1 = one[H // 2, W // 2]
    c2 = two[H // 2, W // 2]
    # single layer: red over white wall — no blue attenuation
    assert c1[0] > c1[2], f"near red pane missing in layers=1: {c1}"
    # second layer darkens red (blue pane absorbs red) and keeps blue higher
    assert c2[0] < c1[0] - 10, f"far pane not composited: {c1} vs {c2}"
    assert c2[2] >= c1[2], f"blue lost instead of gained: {c1} vs {c2}"
    # pixels outside both panes identical
    assert np.array_equal(one[2, 2], two[2, 2])


def test_transparency_layers_from_render_settings():
    scene = _layered_scene()
    rast = _cam_rast()
    rs = RenderSettings()
    rs.max_transparency_bounces = 3.0
    rast.apply_render_settings(rs)
    assert rast.transparency_layers == 3
    f3 = rast.rasterize(scene, W, H, 40, Assets.default()).astype(np.int32)
    one = _render_layers(1)
    assert np.abs(f3 - one).max() > 10  # extra layers visible


NORMAL_WRITER = """
fn shade() {
    color = vec3(0.6, 0.5, 0.4);
    normal = vec3(sin(uv.x * 6.28318), 0.6, cos(uv.x * 6.28318));
}
"""


def _bump_frame(bump, use_pallas=False):
    b = (
        Batch3D.from_box(-0.6, -0.6, -0.6, 1.2, 1.2, 1.2)
        .set_cull_mode(CullMode.Off)
        .with_computed_normals()
        .set_shader(0)
    )
    scene = Scene.from_static([], [b])
    scene.add_shader(NORMAL_WRITER)
    scene.set_lights(
        [Light(LightType.Point).with_position([2, 1, 2])
         .with_intensity(1.4).compile()]
    )
    rast = _cam_rast()
    rast.ambient((0.35, 0.35, 0.35, 1.0))
    rast.use_pallas = use_pallas
    rs = RenderSettings()
    rs.bump_strength = bump
    rs.sun_enabled = False
    rs.ambient_color = (0.35, 0.35, 0.35)
    rast.apply_render_settings(rs)
    return rast.rasterize(scene, W, H, 40, Assets.default()).astype(np.int32)


def test_bump_strength_blends_matmap_normals():
    """bump=1 fully replaces the normal with the shader-written one (the
    raster path's behavior), bump=0 keeps the geometric normal, 0.5 is a
    renormalized mix strictly between — the SceneVM's
    N = normalize(mix(N, N_written, bump))."""
    full = _bump_frame(1.0)
    off = _bump_frame(0.0)
    half = _bump_frame(0.5)
    assert np.abs(full - off).max() > 10, "bump knob has no effect"
    assert np.abs(half - full).max() > 3, "bump=0.5 == bump=1"
    assert np.abs(half - off).max() > 3, "bump=0.5 == bump=0"


def test_bump_strength_mega_matches_xla():
    for bump in (0.0, 0.5, 1.0):
        ref = _bump_frame(bump, use_pallas=False)
        out = _bump_frame(bump, use_pallas=True)
        assert np.abs(ref - out).max() <= 4, f"bump={bump}"
