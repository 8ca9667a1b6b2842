"""Per-pixel material bakes (matmap): shaders writing emissive / spatially
varying roughness-metallic / normals bake to M1/M2 sidecar atlas tiles and
ride the megakernel instead of the per-pixel XLA fallback.

Reference: shaders write the material registers per pixel inside the hot
loop (src/rasterizer.rs:1284-1303); the TPU-first equivalent quantizes them
to texels at pack time (ops/scene_pack.py matmap bake) so both backends
sample the same sidecars.
"""

import numpy as np

from rusterix_tpu import (
    Assets,
    Batch3D,
    CullMode,
    D3OrbitCamera,
    Light,
    LightType,
    Scene,
)
from rusterix_tpu.ops.raster import Rasterizer
from rusterix_tpu.ops.scene_pack import PackedScene

W, H = 96, 64

EMISSIVE_VARYING = """
fn shade() {
    color = vec3(0.3, 0.3, 0.35);
    emissive = vec3(step(0.5, fract(uv.x * 2.0)) * 0.8, 0.0, 0.1);
    roughness = fract(uv.y * 3.0);
    metallic = step(0.5, fract(uv.y));
}
"""

NORMAL_WRITER = """
fn shade() {
    color = vec3(0.6, 0.5, 0.4);
    normal = vec3(sin(uv.x * 6.28318), 0.6, cos(uv.x * 6.28318));
}
"""


def _scene(shader_src, lights=()):
    b = (
        Batch3D.from_box(-0.6, -0.6, -0.6, 1.2, 1.2, 1.2)
        .set_cull_mode(CullMode.Off)
        .with_computed_normals()
        .set_shader(0)
    )
    scene = Scene.from_static([], [b])
    scene.add_shader(shader_src)
    if lights:
        scene.set_lights(list(lights))
    return scene


def _rast():
    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 2.2)
    return Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(W, H)
    ).ambient([0.35, 0.35, 0.35, 1.0])


def _light():
    return (
        Light(LightType.Point).with_position([2, 1, 2]).with_intensity(1.4)
        .compile()
    )


def test_matmap_shader_bakes_off_runtime():
    packed = PackedScene.from_scene(_scene(EMISSIVE_VARYING), Assets.default())
    assert packed.runtime_shaders == ()
    assert 0 in packed.atlas_index.shader_mat_slots
    m1, m2, em_scale, nmap = packed.atlas_index.shader_mat_slots[0]
    assert m1 >= 0 and m2 == m1 + 1
    assert 0.099 < em_scale <= 0.81  # peak emissive channel is 0.8
    assert nmap == 0.0
    valid = packed.d3.valid > 0.5
    assert (packed.d3.m1_slot[valid] == m1).all()
    assert (packed.d3.m2_slot[valid] == m2).all()


def test_matmap_mega_vs_xla_parity():
    """Both backends sample the same M1/M2 sidecars -> frames agree.

    exp2/log2 shininess ulps diverge between Mosaic and XLA at highlight
    pixels (same tolerance note as test_shader_bake's material test)."""
    frames = []
    for use in (False, True):
        rast = _rast()
        rast.use_pallas = use
        frames.append(
            rast.rasterize(
                _scene(EMISSIVE_VARYING, [_light()]), W, H, 32,
                Assets.default(),
            ).astype(int)
        )
    assert np.abs(frames[0] - frames[1]).max() <= 4


def test_matmap_matches_runtime_oracle():
    """The baked matmap path approximates the true per-pixel shader within
    8-bit texel quantization. The oracle is the SAME shader kept on the
    runtime path by an output-identical hitpoint read (* 0.0), which trips
    the input-load bake gate."""
    oracle_src = EMISSIVE_VARYING.replace(
        "fn shade() {",
        "fn shade() {\n    let q = hitpoint.x * 0.0;",
    ).replace("0.8, 0.0, 0.1", "0.8 + q, 0.0, 0.1")
    sc_baked = _scene(EMISSIVE_VARYING, [_light()])
    sc_oracle = _scene(oracle_src, [_light()])
    packed_o = PackedScene.from_scene(sc_oracle, Assets.default())
    assert len(packed_o.runtime_shaders) == 1  # gate kept the oracle live

    rast = _rast()
    rast.use_pallas = False
    baked = rast.rasterize(sc_baked, W, H, 32, Assets.default()).astype(int)
    rast2 = _rast()
    rast2.use_pallas = False
    oracle = rast2.rasterize(sc_oracle, W, H, 32, Assets.default()).astype(int)
    diff = np.abs(baked - oracle)
    # 8-bit emissive/roughness quantization + bake-grid resampling: small
    # everywhere except the step() seams (a half-texel shift at 128^2)
    assert np.median(diff) <= 2
    assert (diff > 12).mean() < 0.02


def test_emissive_glows_in_the_dark():
    """Emissive texels light up with NO scene lights and no ambient."""
    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 2.2)
    rast = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(W, H)
    )  # no ambient, no lights
    f = rast.rasterize(_scene(EMISSIVE_VARYING), W, H, 32, Assets.default())
    reds = f[..., 0].astype(int)
    assert reds.max() > 60  # emissive stripes visible
    # and the non-emissive stripes stay dark
    hit = f[..., 3] > 0
    assert (reds[hit] < 10).any()


def test_normal_writer_changes_lighting():
    """A normal-writing shader bakes (nmap flag) and shades differently from
    the same color without normals."""
    packed = PackedScene.from_scene(_scene(NORMAL_WRITER), Assets.default())
    assert packed.runtime_shaders == ()
    assert packed.atlas_index.shader_mat_slots[0][3] == 1.0

    flat_src = 'fn shade() { color = vec3(0.6, 0.5, 0.4); }'
    rast = _rast()
    rast.use_pallas = False
    a = rast.rasterize(
        _scene(NORMAL_WRITER, [_light()]), W, H, 32, Assets.default()
    ).astype(int)
    rast2 = _rast()
    rast2.use_pallas = False
    b = rast2.rasterize(
        _scene(flat_src, [_light()]), W, H, 32, Assets.default()
    ).astype(int)
    assert np.abs(a - b).max() > 8


def test_normal_writer_mega_vs_xla_parity():
    frames = []
    for use in (False, True):
        rast = _rast()
        rast.use_pallas = use
        frames.append(
            rast.rasterize(
                _scene(NORMAL_WRITER, [_light()]), W, H, 32, Assets.default()
            ).astype(int)
        )
    assert np.abs(frames[0] - frames[1]).max() <= 4


def test_matmap_with_vertex_blend_parity():
    """A scene mixing a vertex-BLENDED batch with a matmap-baked shader
    batch exercises the kernel's widest column layout (blend extension at
    column 45 when has_matmap; module-header layout in ops/megakernel.py).
    Both backends must agree."""
    verts = np.array(
        [[-1.6, -0.6, -0.9, 1], [-0.4, -0.6, -0.9, 1],
         [-0.4, 0.6, -0.9, 1], [-1.6, 0.6, -0.9, 1]],
        np.float32,
    )
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    from rusterix_tpu import Batch3D, PixelSource

    blended = Batch3D.new(verts, tris, uvs)
    blended.source = PixelSource.pixel((255, 0, 0, 255))
    blended.source2 = PixelSource.pixel((0, 255, 0, 255))
    blended.blend_weights = np.asarray([0.0, 0.0, 1.0, 1.0], np.float32)

    shaded = (
        Batch3D.from_box(0.1, -0.6, -0.6, 1.2, 1.2, 1.2)
        .set_cull_mode(CullMode.Off)
        .with_computed_normals()
        .set_shader(0)
    )
    scene = Scene.from_static([], [blended, shaded])
    scene.add_shader(EMISSIVE_VARYING)
    scene.set_lights([_light()])

    frames = []
    for use in (False, True):
        rast = _rast()
        rast.use_pallas = use
        frames.append(
            rast.rasterize(scene, W, H, 32, Assets.default()).astype(int)
        )
    diff = np.abs(frames[0] - frames[1])
    assert diff.max() <= 4, diff.max()
    # both batches actually rendered (the blended quad is unlit-normal dim;
    # the point here is layout coverage, not appearance)
    f = frames[1]
    hit = f[..., 3] > 0
    assert hit[:, : W // 2].any() and hit[:, W // 2 :].any()


def test_constant_material_with_vertex_blend_parity():
    """Same combined-layout pin for the CONSTANT-material case (no matmap:
    blend extension starts at column 34)."""
    from rusterix_tpu import Batch3D, PixelSource
    from rusterix_tpu.ops.scene_pack import PackedScene

    verts = np.array(
        [[-1.6, -0.6, -0.9, 1], [-0.4, -0.6, -0.9, 1],
         [-0.4, 0.6, -0.9, 1], [-1.6, 0.6, -0.9, 1]],
        np.float32,
    )
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    blended = Batch3D.new(verts, tris, uvs)
    blended.source = PixelSource.pixel((255, 0, 0, 255))
    blended.source2 = PixelSource.pixel((0, 255, 0, 255))
    blended.blend_weights = np.asarray([0.0, 0.0, 1.0, 1.0], np.float32)

    shaded = (
        Batch3D.from_box(0.1, -0.6, -0.6, 1.2, 1.2, 1.2)
        .set_cull_mode(CullMode.Off)
        .with_computed_normals()
        .set_shader(0)
    )
    scene = Scene.from_static([], [blended, shaded])
    scene.add_shader(
        "fn shade() { color = vec3(0.5, 0.4, 0.3); roughness = 0.2;"
        " metallic = 0.7; }"
    )
    scene.set_lights([_light()])
    packed = PackedScene.from_scene(scene, Assets.default())
    assert 0 in packed.atlas_index.shader_slots
    assert 0 not in (packed.atlas_index.shader_mat_slots or {})

    frames = []
    for use in (False, True):
        rast = _rast()
        rast.use_pallas = use
        frames.append(
            rast.rasterize(scene, W, H, 32, Assets.default()).astype(int)
        )
    assert np.abs(frames[0] - frames[1]).max() <= 4
