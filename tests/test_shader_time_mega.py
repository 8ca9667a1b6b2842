"""Time-dependent rusteria shaders on the megakernel (round-2 verdict #1).

Design: genuinely animated shaders bake SHADER_ANIM_FRAMES frames at
t = i * SHADER_ANIM_DT into the tile_first/tile_count animation machinery
(ops/scene_pack.py), so the frame renders through mega_render like any
textured batch — no per-pixel XLA gathers. TPU-first divergence from the
reference's per-pixel in-loop shader calls (rasterizer.rs:1290-1302): the
shader's time axis quantizes to the tile animation clock.
"""

import numpy as np

from rusterix_tpu import (
    Assets,
    Batch3D,
    CullMode,
    D3OrbitCamera,
    PixelSource,
    Scene,
    Texture,
    Tile,
)
from rusterix_tpu.ops.raster import Rasterizer
from rusterix_tpu.ops.scene_pack import (
    SHADER_ANIM_DT,
    SHADER_ANIM_FRAMES,
    PackedScene,
)
from rusterix_tpu.shader import Rusteria

# color sweeps with time: red channel ramps over one anim loop
PULSE = """
fn shade() {
    let t = fract(time / 4.0);
    color = vec3(t, uv.x, 1.0 - t);
}
"""

W, H = 96, 72


def _scene():
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-0.5, -0.5, -0.5, 1, 1, 1)
            .set_cull_mode(CullMode.Off)
            .set_source(PixelSource.static_tile_index(0))
            .with_computed_normals()
        ],
    )
    idx = scene.add_shader(PULSE)
    scene.d3_static[0].set_shader(idx)
    assets = Assets.default().with_textures(
        [Tile.from_texture(Texture.checkerboard(16, 4))]
    )
    cam = D3OrbitCamera()
    cam.azimuth = 0.9
    cam.set_parameter_f32("distance", 1.5)
    return scene, assets, cam


def _rast(cam, use_pallas):
    r = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(W, H)
    ).ambient([0.3, 0.3, 0.3, 1.0])
    r.use_pallas = use_pallas
    return r


def test_time_shader_is_baked_not_runtime():
    scene, assets, cam = _scene()
    packed = PackedScene.from_scene(scene, assets)
    # the animated shader baked to a multi-frame tile...
    assert 0 in (packed.atlas_index.shader_slots or {})
    slot = packed.atlas_index.shader_slots[0][0]
    assert int(packed.atlas_index.atlas.tile_count[slot]) == SHADER_ANIM_FRAMES
    # ...so nothing is left on the per-pixel runtime path
    assert packed.runtime_shaders == ()


def test_time_shader_mega_matches_xla_path():
    scene, assets, cam = _scene()
    frames = {}
    for use_pallas in (False, True):
        rast = _rast(cam, use_pallas)
        frames[use_pallas] = rast.rasterize(scene, W, H, 32, assets)
    np.testing.assert_array_equal(frames[True], frames[False])


def test_time_shader_animates_with_anim_clock():
    scene, assets, cam = _scene()
    rast = _rast(cam, use_pallas=True)
    f0 = rast.rasterize(scene, W, H, 32, assets)
    scene.animation_frame += SHADER_ANIM_FRAMES // 2
    f1 = rast.rasterize(scene, W, H, 32, assets)
    assert not np.array_equal(f0, f1), "shader did not animate"
    # half a loop of the 4s-period ramp = red delta ~0.5 on cube pixels
    c0 = f0[30:45, 40:60, 0].astype(np.float32).mean()
    c1 = f1[30:45, 40:60, 0].astype(np.float32).mean()
    assert abs(c1 - c0) > 40.0

    # a full loop returns to the same frame
    scene.animation_frame += SHADER_ANIM_FRAMES // 2
    f2 = rast.rasterize(scene, W, H, 32, assets)
    np.testing.assert_array_equal(f0, f2)


def test_baked_frame_matches_direct_bake_time():
    """Frame i of the baked tile == a direct bake at t = i * dt."""
    prog = Rusteria.parse_and_compile(PULSE)
    scene, assets, cam = _scene()
    packed = PackedScene.from_scene(scene, assets)
    slot = packed.atlas_index.shader_slots[0][0]
    atlas = packed.atlas_index.atlas
    i = 3
    first = int(atlas.tile_first[slot])
    x, y, w, h = (int(v) for v in atlas.rects[first + i])
    tile_px = atlas.data[y : y + h, x : x + w, :3]
    direct = Rusteria.bake_tile(prog, 128, assets.palette, time=i * SHADER_ANIM_DT)
    np.testing.assert_array_equal(tile_px, direct[..., :3])


def test_animated_per_pixel_material_shader_bakes_matmap_frames():
    """A TIME-dependent shader writing spatially-varying roughness bakes to
    SHADER_ANIM_FRAMES color frames PLUS M1/M2 material sidecar frames in
    lockstep (same tile_count, so the anim clock resolves all three
    together) — nothing stays on the runtime path."""
    scene, assets, cam = _scene()
    idx = scene.add_shader(
        "fn shade() { color = vec3(fract(time), 0, 0); roughness = uv.x; }"
    )
    scene.d3_static[0].set_shader(idx)
    packed = PackedScene.from_scene(scene, assets)
    assert idx in packed.atlas_index.shader_slots
    m1, m2, _em, _nm = packed.atlas_index.shader_mat_slots[idx]
    atlas = packed.atlas_index.atlas
    color_slot = packed.atlas_index.shader_slots[idx][0]
    assert int(atlas.tile_count[color_slot]) == SHADER_ANIM_FRAMES
    assert int(atlas.tile_count[m1]) == SHADER_ANIM_FRAMES
    assert int(atlas.tile_count[m2]) == SHADER_ANIM_FRAMES
    assert packed.runtime_shaders == ()
