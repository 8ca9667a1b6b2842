"""Sharded-renderer parity: render_frame_sharded over an 8-device virtual CPU
mesh must produce byte-identical u8 frames to the single-device render_frame
(VERDICT r1 item 2; SURVEY §2.5 P1-P3 — tile ownership is disjoint, so the
row-sharded framebuffer and dp-sharded setup pass change nothing
observable)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _single_frame(rast, scene, assets, width, height):
    """Single-device XLA reference frame + the cached device inputs."""
    rast.use_pallas = False
    frame = rast.rasterize(scene, width, height, 40, assets)
    cache = rast._scene_cache
    packed = cache["packed"]
    lights = dict(packed.lights)
    lights["flicker_factor"] = rast._flicker_factors(lights)
    ld = {k: jnp.asarray(v) for k, v in lights.items()}
    uni = rast._uniforms(scene)
    if packed.occlusion is not None:
        uni["occ_box"] = jnp.asarray(packed.occlusion["occ_box"])
        uni["occ_val"] = jnp.asarray(packed.occlusion["occ_val"])
    return frame, cache, ld, uni, packed


def _sharded_frame(mesh, cache, ld, uni, width, height, **flags):
    from rusterix_tpu.parallel.mesh import render_frame_sharded

    frame = render_frame_sharded(
        mesh, cache["d3"], cache["d2"], ld, cache["atlas"], uni,
        jnp.zeros((height, width, 4), jnp.float32),
        width, height, **flags,
    )
    return np.asarray(frame)


def _cube_scene(width, height, tris):
    from rusterix_tpu import (
        Assets, Batch2D, Batch3D, CullMode, D3OrbitCamera, Light, LightType,
        PixelSource, Scene, Texture, Tile,
    )
    from rusterix_tpu.ops.raster import Rasterizer
    from rusterix_tpu.ops.scene_pack import PackedScene

    scene = Scene.from_static(
        [Batch2D.from_rectangle(2.0, 2.0, 30.0, 30.0).set_source(
            PixelSource.static_tile_index(0))],
        [
            Batch3D.from_box(-0.5, -0.5, -0.5, 1.0, 1.0, 1.0)
            .set_cull_mode(CullMode.Off)
            .set_source(PixelSource.static_tile_index(0))
            .with_computed_normals()
        ],
    ).set_lights(
        [Light(LightType.Point).with_position([2.0, 0.8, 2.0])
         .with_intensity(1.0).compile()]
    )
    assets = Assets.default().with_textures(
        [Tile.from_texture(Texture.checkerboard(32, 8))]
    )
    camera = D3OrbitCamera()
    camera.set_parameter_f32("distance", 1.6)
    rast = Rasterizer.setup(
        None, camera.view_matrix(), camera.projection_matrix(width, height)
    ).ambient([0.15, 0.15, 0.2, 1.0])
    packed = PackedScene.from_scene(scene, assets, d3_capacity=tris)
    return rast, scene, assets, packed


def _map_scene(width, height):
    from rusterix_tpu import Assets, D3FirstPCamera, Scene, Texture
    from rusterix_tpu.builders import D3Builder, MapScript
    from rusterix_tpu.ops.raster import Rasterizer

    assets = Assets.default()
    assets.textures["brick"] = Texture.checkerboard(16, 4)
    assets.textures["floor"] = Texture.checkerboard(16, 2)
    src = "\n".join([
        'set_default("wall_tex", "brick")',
        'set_default("floor_tex", "floor")',
        'set_default("ceiling_tex", "floor")',
        'set_default("wall_height", 3.0)',
        "move_to(0, 0)",
    ] + ["wall(4)", "turn_right()"] * 4 + [
        'add_point_light("#ffcc88", 2.0, 2.0, 8.0)',
    ])
    m = MapScript(assets).compile(src)
    scene = Scene.empty()
    D3Builder().build(m, assets, scene)
    camera = D3FirstPCamera()
    camera.set_parameter_vec3("position", [1.0, 1.6, 1.0])
    camera.set_parameter_vec3("center", [3.0, 1.2, 3.0])
    rast = Rasterizer.setup(
        None, camera.view_matrix(), camera.projection_matrix(width, height)
    ).ambient([0.25, 0.25, 0.3, 1.0])
    return rast, scene, assets


@pytest.fixture(scope="module")
def mesh8():
    from rusterix_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(8)


def test_cube_sharded_matches_single(mesh8):
    width, height = 64, 48  # 48 rows / 8 devices = 6-row slabs
    # capacity 24: NOT divisible by 8 after the clip 2x expansion alone —
    # from_scene pads to the requested cap; 24 % 8 = 0 but the live tri
    # count (12 box + degenerate 2D slots) is not
    rast, scene, assets, packed = _cube_scene(width, height, tris=24)
    frame, cache, ld, uni, packed = _single_frame(rast, scene, assets, width, height)
    sharded = _sharded_frame(
        mesh8, cache, ld, uni, width, height,
        sample_mode=0, has_ambient=True, has_lights=True, has_d2=True,
    )
    assert sharded.shape == frame.shape
    np.testing.assert_array_equal(sharded, frame)


def test_map_sharded_matches_single(mesh8):
    width, height = 64, 64
    rast, scene, assets = _map_scene(width, height)
    frame, cache, ld, uni, packed = _single_frame(rast, scene, assets, width, height)
    sharded = _sharded_frame(
        mesh8, cache, ld, uni, width, height,
        sample_mode=0, has_ambient=True,
        has_lights=packed.light_count > 0, has_d2=False,
    )
    np.testing.assert_array_equal(sharded, frame)


def test_sharded_nondivisible_rows_autopad(mesh8):
    """height % n != 0 auto-pads: each device owns ceil(h/n) rows, the sky
    overhang is cropped, and the frame matches the single-device render
    byte-for-byte."""
    width, height = 64, 44  # 8 devices -> 6-row slabs, 4 cropped pad rows
    rast, scene, assets, packed = _cube_scene(width, height, tris=16)
    frame, cache, ld, uni, packed = _single_frame(rast, scene, assets, width, height)
    sharded = _sharded_frame(
        mesh8, cache, ld, uni, width, height,
        sample_mode=0, has_ambient=True, has_lights=True, has_d2=True,
    )
    assert sharded.shape == frame.shape
    np.testing.assert_array_equal(np.asarray(sharded), frame)


def test_ggx_sharded_matches_single(mesh8):
    """brdf="ggx" (Cook-Torrance) flows through the sharded XLA path
    byte-identically to the single-device render."""
    width, height = 64, 48
    rast, scene, assets, packed = _cube_scene(width, height, tris=24)
    rast.set_brdf("ggx")
    frame, cache, ld, uni, packed = _single_frame(rast, scene, assets, width, height)
    sharded = _sharded_frame(
        mesh8, cache, ld, uni, width, height,
        sample_mode=0, has_ambient=True, has_lights=True, has_d2=True,
        brdf_ggx=True,
    )
    np.testing.assert_array_equal(sharded, frame)


def test_tracer_sharded_byte_stable_vs_sequential(mesh8):
    """trace_sharded (one full-frame sample per device, rays/samples — the
    embarrassingly parallel axis, reference trace.rs:105-190) folds its
    gathered samples in index order: a fresh AccumBuffer after one sharded
    call must equal 8 sequential trace() calls BIT FOR BIT (same keys,
    same XLA program per sample)."""
    from rusterix_tpu import (
        Assets, Batch3D, D3OrbitCamera, Light, LightType, PixelSource, Scene,
    )
    from rusterix_tpu.tracer.tracer import AccumBuffer, Tracer

    scene = Scene.from_static([], [
        Batch3D.from_box(-0.5, -0.5, -0.5, 1, 1, 1)
        .set_source(PixelSource.pixel((200, 120, 60, 255)))
        .with_computed_normals()
    ]).set_lights(
        [Light(LightType.Point).with_position([2, 2, 2])
         .with_intensity(1.2).compile()]
    )
    cam = D3OrbitCamera()
    cam.azimuth = 0.7
    cam.set_parameter_f32("distance", 3.0)
    assets = Assets.default()
    w, h = 64, 48

    tr = Tracer()
    tr.bounces = 3
    buf_sh = AccumBuffer(w, h)
    tr.trace_sharded(cam, scene, buf_sh, 40, assets, mesh8)
    assert buf_sh.frame == 8

    tr2 = Tracer()
    tr2.bounces = 3
    buf_seq = AccumBuffer(w, h)
    for _ in range(8):
        tr2.trace(cam, scene, buf_seq, 40, assets)

    np.testing.assert_array_equal(buf_sh.pixels, buf_seq.pixels)
    # and the image is non-trivial
    assert buf_sh.pixels[..., :3].max() > 0.05


def test_cube_sharded_megakernel_matches_single(mesh8):
    """The megakernel runs per row-shard (global-coordinate y0 offset) and
    matches the single-device megakernel frame."""
    width, height = 128, 128  # 16-row slabs (two 64-row kernel tiles total)
    rast, scene, assets, packed = _cube_scene(width, height, tris=32)

    rast.use_pallas = True  # interpret-mode megakernel on CPU
    rast.rasterize(scene, width, height, 40, assets)  # populate device cache
    cache = rast._scene_cache
    lights = dict(cache["packed"].lights)
    lights["flicker_factor"] = rast._flicker_factors(lights)
    ld = {k: jnp.asarray(v) for k, v in lights.items()}
    uni = rast._uniforms(scene)

    from rusterix_tpu.parallel.mesh import render_frame_sharded

    sharded = np.asarray(
        render_frame_sharded(
            mesh8, cache["d3"], cache["d2"], ld, cache["atlas"], uni,
            jnp.zeros((height, width, 4), jnp.float32),
            width, height, sample_mode=0, has_ambient=True, has_lights=True,
            has_d2=False, use_pallas=True,
        )
    )
    # the single-device frame includes the d2 overlay; compare the 3D-only
    # region by re-rendering without d2
    rast2, scene2, assets2, _ = _cube_scene(width, height, tris=32)
    scene2.d2_static = []
    rast2.use_pallas = True
    single = rast2.rasterize(scene2, width, height, 40, assets2)
    np.testing.assert_array_equal(sharded, single)


def test_sharded_material_matches_single(mesh8):
    """Per-batch baked-shader materials (has_material) flow through the
    sharded path identically to the single-device XLA render."""
    from rusterix_tpu import Assets, Batch3D, CullMode, D3OrbitCamera, Light, LightType, Scene
    from rusterix_tpu.ops.raster import Rasterizer

    width, height = 64, 48
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-0.6, -0.6, -0.6, 1.2, 1.2, 1.2)
            .set_cull_mode(CullMode.Off)
            .with_computed_normals()
            .set_shader(0)
        ],
    ).set_lights(
        [Light(LightType.Point).with_position([2, 1, 2]).with_intensity(1.3).compile()]
    )
    scene.add_shader(
        "fn shade() { color = vec3(0.7, 0.5, 0.3); roughness = 0.85; metallic = 0.2; }"
    )
    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 2.4)
    rast = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(width, height)
    ).ambient([0.4, 0.4, 0.4, 1.0])
    frame, cache, ld, uni, packed = _single_frame(rast, scene, Assets.default(), width, height)
    assert (packed.d3.rough[packed.d3.valid > 0.5] == np.float32(0.85)).all()
    sharded = _sharded_frame(
        mesh8, cache, ld, uni, width, height,
        sample_mode=0, has_ambient=True, has_lights=True, has_d2=False,
        has_material=True,
    )
    np.testing.assert_array_equal(sharded, frame)


def test_sharded_megakernel_early_out_keeps_lower_shard_geometry(mesh8):
    """Regression: the front-to-back early-out's per-super near bound must
    clip bboxes to the shard's GLOBAL row range [y0, y0+rows_local), not
    [0, rows_local). With the wrong clip, a floor whose invz grows toward
    the bottom of the frame gets its near bound evaluated at the TOP rows
    (far end), sorts behind a mid-depth wall that fills the screen, and the
    early-out stops the scan before ever testing the floor — bottom shards
    render the wall through the floor. Needs >1 super (>128 candidates) to
    engage the early-out at all."""
    from rusterix_tpu import (
        Assets, Batch3D, CullMode, D3FirstPCamera, PixelSource, Texture, Tile,
        Scene,
    )
    from rusterix_tpu.ops.raster import Rasterizer
    from rusterix_tpu.parallel.mesh import render_frame_sharded

    width, height = 64, 128  # 16-row slabs across 8 devices

    # The wall is ONE frustum-filling quad: its two coplanar triangles share
    # identical attribute planes, so their diagonal invz tie renders the same
    # bytes either way, and full coverage lets the early-out actually fire
    # (a gappy wall leaves background pixels whose sentinel best blocks it).
    # Floor quads are NON-adjacent (size < spacing): coplanar shared edges
    # between distinct quads tie on invz with different uv planes, and that
    # scan-order-dependent winner (documented morton_sort caveat) would mask
    # the bug under test.
    wall = Batch3D()
    wall.add_quad([0.0, 1.0, 4.05], [0.0, 0.0, -1.0], 14.0)
    floor = Batch3D()
    for gx in range(12):
        for gz in range(7):
            floor.add_quad(
                [(gx - 5.5) * 0.5, 0.0, 0.5 + gz * 0.5], [0.0, 1.0, 0.0], 0.45
            )
    for b in (wall, floor):
        b.set_cull_mode(CullMode.Off)
        b.set_source(PixelSource.static_tile_index(0))
        b.with_computed_normals()
    scene = Scene.from_static([], [wall, floor])

    assets = Assets.default().with_textures(
        [Tile.from_texture(Texture.checkerboard(32, 8))]
    )
    camera = D3FirstPCamera()
    camera.set_parameter_vec3("position", [0.0, 1.0, 0.0])
    camera.set_parameter_vec3("center", [0.0, 1.0, 4.0])
    rast = Rasterizer.setup(
        None, camera.view_matrix(), camera.projection_matrix(width, height)
    ).ambient([0.4, 0.4, 0.4, 1.0])

    rast.use_pallas = True  # interpret-mode megakernel on CPU
    single = rast.rasterize(scene, width, height, 40, assets)
    cache = rast._scene_cache
    lights = dict(cache["packed"].lights)
    lights["flicker_factor"] = rast._flicker_factors(lights)
    ld = {k: jnp.asarray(v) for k, v in lights.items()}
    uni = rast._uniforms(scene)

    # the scene must actually span >1 super, or the early-out never fires
    assert cache["packed"].d3.valid.shape[0] > 128

    sharded = np.asarray(
        render_frame_sharded(
            mesh8, cache["d3"], cache["d2"], ld, cache["atlas"], uni,
            jnp.zeros((height, width, 4), jnp.float32),
            width, height, sample_mode=0, has_ambient=True, has_lights=False,
            has_d2=False, use_pallas=True,
        )
    )
    np.testing.assert_array_equal(sharded, single)


def test_sharded_light_spec_matches_generic(mesh8):
    """The static lighting specialization (light_spec/sun_off) must be
    byte-identical under sharding too (same bit-compatibility argument as
    the single-chip test in test_shade_pallas)."""
    width, height = 64, 48
    rast, scene, assets, packed = _cube_scene(width, height, tris=24)
    frame, cache, ld, uni, packed = _single_frame(rast, scene, assets, width, height)
    spec = tuple(
        (i, int(t))
        for i, t in enumerate(np.asarray(packed.lights["type"]))
        if float(packed.lights["valid"][i]) > 0.5
    )
    assert spec  # the cube scene has a real point light
    generic = _sharded_frame(
        mesh8, cache, ld, uni, width, height,
        sample_mode=0, has_ambient=True, has_lights=True, has_d2=True,
        use_pallas=True,
    )
    specialized = _sharded_frame(
        mesh8, cache, ld, uni, width, height,
        sample_mode=0, has_ambient=True, has_lights=True, has_d2=True,
        use_pallas=True, light_spec=spec, sun_off=True,
    )
    np.testing.assert_array_equal(generic, specialized)


def _feature_scene(width, height):
    """Mirror floor + wall + blocker + transparent pane + point light +
    sun: exercises shadows (incl. transmittance), AO, GGX, reflections,
    sky light, fog and depth-peeled transparency in one frame."""
    from rusterix_tpu import (
        Assets, Batch3D, D3OrbitCamera, Light, LightType, PixelSource, Scene,
    )
    from rusterix_tpu.models.render_settings import RenderSettings
    from rusterix_tpu.ops.raster import Rasterizer

    floor = (
        Batch3D.from_box(-3, -1.3, -3, 6, 0.2, 6)
        .set_source(PixelSource.pixel((60, 60, 70, 255)))
        .with_computed_normals()
    )
    wall = (
        Batch3D.from_box(-2.5, -1.1, -2.7, 5.0, 2.8, 0.2)
        .set_source(PixelSource.pixel((220, 220, 220, 255)))
        .with_computed_normals()
    )
    blocker = (
        Batch3D.from_box(-0.6, -0.8, -1.3, 1.2, 1.4, 0.2)
        .set_source(PixelSource.pixel((90, 60, 60, 255)))
        .with_computed_normals()
    )
    scene = Scene.from_static([], [floor, wall, blocker])
    pane_v = np.array(
        [[0.8, -1.0, -0.5, 1], [1.6, -1.0, -0.5, 1],
         [1.6, 0.6, -0.5, 1], [0.8, 0.6, -0.5, 1]], np.float32,
    )
    pane_t = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    pane_uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    from rusterix_tpu import CullMode

    scene.d3_dynamic_opacity.append(
        Batch3D.new(pane_v, pane_t, pane_uv)
        .set_cull_mode(CullMode.Off)
        .set_source(PixelSource.pixel((120, 180, 220, 140)))
    )
    scene.set_lights(
        [Light(LightType.Point).with_position([0.0, 0.6, 1.8])
         .with_intensity(1.8).with_range(0.5, 30.0).compile()]
    )
    cam = D3OrbitCamera()
    cam.azimuth = 0.4
    cam.set_parameter_f32("distance", 5.0)
    rast = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(width, height)
    )
    rast.ambient((0.2, 0.2, 0.25, 1.0)).background((70, 90, 120, 255))
    rast.sun_dir = np.array([0.3, -1.0, 0.2], np.float32)
    rast.day_factor = 0.7
    rast.set_brdf("ggx")
    rast.set_shadows(True, res=64, sun_res=64)
    rast.set_reflections(1)
    rast.set_sky_light(True)
    rast.set_ambient_occlusion(True)
    rs = RenderSettings()
    rs.fog_density = 0.05
    rs.ao_samples = 4.0
    rs.ao_radius = 0.6
    rs.reflection_samples = 1.0
    rast.apply_render_settings(rs)
    rast.set_reflections(1)
    return rast, scene


def test_sharded_feature_frame_matches_single(mesh8):
    """The whole SceneVM feature family — per-light geometry shadows
    (with depth-peeled transmittance), SSAO, Cook-Torrance GGX, GGX
    reflections (with shadowed hits), sky light, exp² fog and
    depth-peeled transparency — shards byte-identically to the
    single-chip XLA render (VERDICT r4 item 3)."""
    from rusterix_tpu import Assets
    from rusterix_tpu.parallel.mesh import render_frame_sharded

    width, height = 64, 48
    rast, scene = _feature_scene(width, height)
    rast.use_pallas = False
    rast.keep_frame_args = True
    single = rast.rasterize(scene, width, height, 40, Assets.default())
    fa = rast._frame_args
    assert fa["shadow_spec"] is not None and fa["ao_taps"]
    assert fa["refl_samples"] == 1 and fa["has_opacity"] and fa["has_fog"]

    # mirror render_frame's in-graph dynamic concatenation (the sharded
    # entry point takes pre-concatenated packs; engine loops concatenate
    # host-side the same way)
    d3_in, d3_op_in, d2_in = fa["d3"], fa["d3_op"], fa["d2"]
    if fa["has_dyn"]:
        d3_in = {
            k: jnp.concatenate([d3_in[k], fa["d3_dyn"][k]]) for k in d3_in
        }
        d3_op_in = {
            k: jnp.concatenate([d3_op_in[k], fa["d3_op_dyn"][k]])
            for k in d3_op_in
        }
        d2_in = {
            k: jnp.concatenate([d2_in[k], fa["d2_dyn"][k]]) for k in d2_in
        }

    sharded = np.asarray(
        render_frame_sharded(
            mesh8, d3_in, d2_in, fa["lights"], fa["atlas"],
            fa["uniforms"], fa["background"], width, height,
            sample_mode=fa["sample_mode"],
            has_ambient=fa["has_ambient"], has_lights=fa["has_lights"],
            has_d2=fa["has_d2"], use_pallas=False,
            has_material=fa["has_material"], brdf_ggx=fa["brdf_ggx"],
            tonemap=fa["tonemap"],
            d3_op=d3_op_in, has_opacity=fa["has_opacity"],
            transparency_layers=fa["transparency_layers"],
            has_fog=fa["has_fog"], has_sky=fa["has_sky"],
            sky_pre=fa["sky_pre"],
            shadow_rows=fa["shadow_rows"],
            shadow_params=fa["shadow_params"],
            shadow_spec=fa["shadow_spec"],
            ao_taps=fa["ao_taps"], refl_samples=fa["refl_samples"],
            sky_light=fa["sky_light"],
        )
    )
    np.testing.assert_array_equal(sharded, np.asarray(single))


def test_rasterizer_mesh_entry_point(mesh8):
    """rasterize(mesh=...) — the Rasterizer-level multi-chip entry point —
    matches the single-chip frame byte-for-byte on the full feature scene
    (including the dynamic-opacity concat + dynamic shadow composite that
    render_frame normally does in-graph)."""
    from rusterix_tpu import Assets

    width, height = 64, 48
    rast, scene = _feature_scene(width, height)
    rast.use_pallas = False
    single = rast.rasterize(scene, width, height, 40, Assets.default())
    rast2, scene2 = _feature_scene(width, height)
    rast2.use_pallas = False
    sharded = rast2.rasterize(
        scene2, width, height, 40, Assets.default(), mesh=mesh8
    )
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(single))
