"""GGX reflection pass (ops/reflect.py): hash/intersect oracles, the
mirror-floor golden, range-cap semantics, and RenderSettings plumbing
(reference embedded/shader/3d_shader.wgsl:764-826 driven by
render_settings.rs reflection_samples / max_sky_distance)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rusterix_tpu import (
    Assets,
    Batch3D,
    D3OrbitCamera,
    Light,
    LightType,
    PixelSource,
    Scene,
)
from rusterix_tpu.ops.raster import Rasterizer

W, H = 160, 120


def _hash33_oracle(p):
    """Straight transcription of WGSL hash33 (3d_shader.wgsl:35-39) in f32
    (the WGSL runs f32; fract of f32-vs-f64 products diverges wildly, so
    the oracle must use the same width — and the impl must match it op for
    op)."""
    p = np.asarray(p, np.float32)
    h = (p * np.array([0.1031, 0.1030, 0.0973], np.float32)).astype(np.float32)
    h = (h - np.floor(h)).astype(np.float32)
    d = np.float32(
        h[0] * np.float32(h[1] + np.float32(33.33))
        + h[1] * np.float32(h[0] + np.float32(33.33))
        + h[2] * np.float32(h[2] + np.float32(33.33))
    )
    h = (h + d).astype(np.float32)
    out = ((h[[0, 0, 1]] + h[[1, 0, 0]]) * h[[2, 1, 0]]).astype(np.float32)
    return out - np.floor(out)


def test_hash33_matches_wgsl_oracle():
    from rusterix_tpu.ops.reflect import _hash33

    pts = np.array(
        [[0.3, 1.7, 2.9], [5.5, 0.01, 9.4], [12.25, 7.125, 3.5]], np.float32
    )
    u1, u2 = _hash33(
        jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.asarray(pts[:, 2])
    )
    for i, p in enumerate(pts):
        ref = _hash33_oracle(p)
        assert abs(float(u1[i]) - ref[0]) < 1e-4
        assert abs(float(u2[i]) - ref[1]) < 1e-4
        assert 0.0 <= float(u1[i]) < 1.0
        assert 0.0 <= float(u2[i]) < 1.0


def test_intersect_rays_matches_numpy_mt():
    """Chunked wavefront Möller-Trumbore == brute-force numpy MT on random
    rays vs random triangles (winner index + distance)."""
    from rusterix_tpu.ops.reflect import intersect_rays

    rng = np.random.default_rng(7)
    tcount = 37  # exercises chunk padding (pads to 512)
    tris = rng.uniform(-2.0, 2.0, (tcount, 3, 3)).astype(np.float32)
    pos = np.zeros((tcount, 3, 4), np.float32)
    pos[..., :3] = tris
    valid = np.ones(tcount, np.float32)
    valid[5] = 0.0  # dead slot must never win

    p = 64
    o = rng.uniform(-3.0, 3.0, (p, 3)).astype(np.float32)
    d = rng.normal(size=(p, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t, tri = intersect_rays(
        jnp.asarray(pos), jnp.asarray(valid),
        jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]),
        jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]),
        jnp.float32(100.0),
    )
    t = np.asarray(t)
    tri = np.asarray(tri)

    for ri in range(p):
        best_t, best_i = np.inf, -1
        for ti in range(tcount):
            if valid[ti] == 0.0:
                continue
            a, b, c = tris[ti]
            e1, e2 = b - a, c - a
            h = np.cross(d[ri], e2)
            det = float(e1 @ h)
            if abs(det) < 1e-6:
                continue
            f = 1.0 / det
            sv = o[ri] - a
            u = f * float(sv @ h)
            if u < 0.0 or u > 1.0:
                continue
            q = np.cross(sv, e1)
            v = f * float(d[ri] @ q)
            if v < 0.0 or u + v > 1.0:
                continue
            tt = f * float(e2 @ q)
            if tt > 1e-4 and tt < best_t:
                best_t, best_i = tt, ti
        assert tri[ri] == best_i, f"ray {ri}: {tri[ri]} vs {best_i}"
        if best_i >= 0:
            assert abs(t[ri] - best_t) < 1e-3


def _mirror_scene(sky_dist=None):
    floor = (
        Batch3D.from_box(-3, -1.3, -3, 6, 0.2, 6)
        .set_source(PixelSource.pixel((40, 40, 50, 255)))
        .with_computed_normals()
        .set_shader(0)
    )
    box = (
        Batch3D.from_box(-0.5, -0.5, -0.5, 1.0, 1.0, 1.0)
        .set_source(PixelSource.pixel((250, 40, 40, 255)))
        .with_computed_normals()
    )
    scene = Scene.from_static([], [floor, box])
    scene.add_shader(
        "fn shade() { color = vec3(0.3, 0.3, 0.35); roughness = 0.08;"
        " metallic = 0.95; }"
    )
    scene.set_lights(
        [Light(LightType.Point).with_position([2, 2, 2])
         .with_intensity(1.5).compile()]
    )
    cam = D3OrbitCamera()
    cam.azimuth = 0.8
    cam.set_parameter_f32("distance", 4.0)
    rast = Rasterizer.setup(None, cam.view_matrix(), cam.projection_matrix(W, H))
    rast.ambient((0.25, 0.3, 0.35, 1.0))
    rast.sun_dir = np.array([0.4, -1.0, 0.2], np.float32)
    rast.day_factor = 0.6
    rast.background((90, 120, 160, 255))
    rast.set_brdf("ggx")
    if sky_dist is not None:
        rast._rs_sky_distance = float(sky_dist)
    return rast, scene


def _frame(rast, scene, samples):
    rast.set_reflections(samples)
    return rast.rasterize(scene, W, H, 40, Assets.default()).astype(np.int32)


def test_mirror_floor_golden():
    """A near-mirror metallic floor must (a) pick up the red cube's
    mirrored image below it and (b) tint toward the sky elsewhere —
    and reflections must not touch background pixels."""
    rast, scene = _mirror_scene()
    off = _frame(rast, scene, 0)
    on = _frame(rast, scene, 2)

    # background (z-miss) pixels untouched
    sky_px = off[0, 0]
    assert np.array_equal(on[0, 0], sky_px)

    # mirrored cube: directly under the screen cube there must be a region
    # whose red rises well above its green (the cube reflection), on
    gain_r = on[..., 0] - off[..., 0]
    gain_g = on[..., 1] - off[..., 1]
    lower = slice(int(H * 0.55), H)
    red_excess = (gain_r[lower] - gain_g[lower])
    assert red_excess.max() > 20, "no red cube reflection on the floor"

    # sky tint: floor pixels away from the cube gain blue
    gain_b = on[..., 2] - off[..., 2]
    assert (gain_b[lower] > 10).mean() > 0.3, "no sky reflection on floor"


def test_reflections_match_between_backends():
    frames = []
    for use in (False, True):
        rast, scene = _mirror_scene()
        rast.use_pallas = use
        frames.append(_frame(rast, scene, 2))
    d = np.abs(frames[0] - frames[1])
    # primaries may z-flip on coplanar edges; the reflection term itself is
    # identical (same G-buffer source) — compare loosely
    assert (d > 4).mean() < 0.01


def test_max_sky_distance_caps_reflection_range():
    """Shrinking max_sky_distance below the cube distance removes the
    mirrored cube (rays over-range -> sky), exactly the WGSL's gp6.y cap
    (3d_shader.wgsl:772)."""
    lower = slice(int(H * 0.55), H)

    def red_gain(sky_dist):
        rast, scene = _mirror_scene(sky_dist=sky_dist)
        off = _frame(rast, scene, 0)
        on = _frame(rast, scene, 2)
        gain_r = on[..., 0] - off[..., 0]
        gain_g = on[..., 1] - off[..., 1]
        return (gain_r[lower] - gain_g[lower]).max()

    assert red_gain(None) > red_gain(0.05) + 10, (
        "range cap did not remove the cube reflection"
    )


def test_reflection_scale_keeps_the_image():
    """scale=2 (quarter rays + bilinear upsample) must keep the mirrored
    cube and sky tint, and must not touch background pixels."""
    rast, scene = _mirror_scene()
    rast.set_reflections(0)
    off = _frame(rast, scene, 0)
    rast2, scene2 = _mirror_scene()
    rast2.set_reflections(2, scale=2)
    on = rast2.rasterize(scene2, W, H, 40, Assets.default()).astype(np.int32)
    assert np.array_equal(on[0, 0], off[0, 0])  # sky untouched
    g_r = on[..., 0] - off[..., 0]
    g_g = on[..., 1] - off[..., 1]
    g_b = on[..., 2] - off[..., 2]
    lower = slice(int(H * 0.55), H)
    assert (g_r[lower] - g_g[lower]).max() > 15, "cube reflection lost"
    assert (g_b[lower] > 10).mean() > 0.3, "sky reflection lost"


def test_reflections_compose_under_scenevm_tonemap():
    """With set_tonemap("scenevm") the reflection composite must decode/
    re-encode through the Reinhard pair (the WGSL adds reflections before
    tone mapping, 3d_shader.wgsl:826,871): the mirrored cube still shows,
    and pixels the pass never touched keep their exact tonemapped bytes."""
    rast, scene = _mirror_scene()
    rast.set_tonemap("scenevm")
    off = _frame(rast, scene, 0)
    rast2, scene2 = _mirror_scene()
    rast2.set_tonemap("scenevm")
    on = _frame(rast2, scene2, 2)
    assert np.array_equal(on[0, 0], off[0, 0])  # sky byte-identical
    lower = slice(int(H * 0.55), H)
    g_r = on[..., 0] - off[..., 0]
    g_g = on[..., 1] - off[..., 1]
    assert (g_r[lower] - g_g[lower]).max() > 10, "cube reflection lost"


def test_sky_light_adds_occludable_sky_ambient():
    """set_sky_light(True) — the WGSL sky_contribution (3d_shader.wgsl:
    744-758): upward-facing floor that SEES the sky gains sky-tinted
    ambient; floor under a roof slab gains (almost) none; background
    pixels keep their exact bytes."""
    floor = (
        Batch3D.from_box(-6, -1.2, -4, 12, 0.2, 8)
        .set_source(PixelSource.pixel((120, 120, 120, 255)))
        .with_computed_normals()
    )
    wall = (
        Batch3D.from_box(-6, -1.0, -4, 0.3, 5.0, 8)
        .set_source(PixelSource.pixel((90, 60, 40, 255)))
        .with_computed_normals()
    )

    def build():
        scene = Scene.from_static([], [floor, wall]).set_lights(
            [Light(LightType.Point).with_position([2, 3, 2])
             .with_intensity(1.0).compile()]
        )
        cam = D3OrbitCamera()
        cam.azimuth = 0.0
        cam.elevation = 0.35  # shallow: mirror rays near the wall hit it
        cam.set_parameter_f32("distance", 8.0)
        rast = Rasterizer.setup(
            None, cam.view_matrix(), cam.projection_matrix(W, H)
        ).ambient((0.2, 0.2, 0.2, 1.0))
        rast.background((60, 110, 220, 255))  # blue sky -> blue gain
        return rast, scene

    rast, scene = build()
    off = rast.rasterize(scene, W, H, 40, Assets.default()).astype(np.int32)
    rast2, scene2 = build()
    rast2.set_sky_light(True)
    on = rast2.rasterize(scene2, W, H, 40, Assets.default()).astype(np.int32)

    assert np.array_equal(on[0, 0], off[0, 0])  # sky pixels untouched
    gain_b = on[..., 2] - off[..., 2]
    # near-camera floor (bottom rows): mirror rays clear the wall -> sky
    open_rows = gain_b[int(H * 0.8):]
    assert open_rows.mean() > 30, open_rows.mean()
    # floor just under the wall (rows right below the horizon): the wall
    # blocks the mirror ray for (almost) every pixel
    blocked_rows = gain_b[int(H * 0.34): int(H * 0.5)]
    assert blocked_rows.mean() < open_rows.mean() / 8, (
        blocked_rows.mean(), open_rows.mean()
    )


def test_render_settings_drive_reflections():
    """reflection_samples / max_sky_distance flow from RenderSettings to
    the renderer (the previously-dead keys are now live)."""
    from rusterix_tpu.models.render_settings import RenderSettings

    rs = RenderSettings()
    rs.reflection_samples = 2.0
    rs.max_sky_distance = 123.0
    rast, scene = _mirror_scene()
    rast.apply_render_settings(rs)
    assert rast.reflection_samples == 2
    assert rast._rs_sky_distance == 123.0
    # and the frame actually changes vs samples=0
    base_rast, base_scene = _mirror_scene()
    base_rast.apply_render_settings(RenderSettings())
    assert base_rast.reflection_samples == 0
    off = base_rast.rasterize(base_scene, W, H, 40, Assets.default())
    on = rast.rasterize(scene, W, H, 40, Assets.default())
    assert np.abs(on.astype(int) - off.astype(int)).max() > 10


def test_reflection_stride_matches_full_res_subsampled():
    """The strided (scale=2) reflection_pass must equal the FULL-res pass
    subsampled at the same pixels, on a TEXTURED scene.

    Pins the round-4 advisor finding: gbuffer_pass evaluates attribute
    planes in full-res screen pixel space, so the strided call must
    evaluate them at x*stride + 0.5 (not x + 0.5) and seed its hash33
    with full-res pixel coordinates — a flat solid-color mirror floor
    cannot detect this; a checkerboard floor shifts texels when the
    planes are evaluated at the wrong screen position."""
    from rusterix_tpu import Texture, Tile
    from rusterix_tpu.ops.reflect import reflection_pass
    from rusterix_tpu.ops.setup_pass import setup_pass
    from rusterix_tpu.ops.visibility import visibility_pass

    floor = (
        Batch3D.from_box(-3, -1.3, -3, 6, 0.2, 6)
        .set_source(PixelSource.static_tile_index(0))
        .with_computed_normals()
    )
    box = (
        Batch3D.from_box(-0.5, -0.5, -0.5, 1.0, 1.0, 1.0)
        .set_source(PixelSource.pixel((250, 40, 40, 255)))
        .with_computed_normals()
    )
    scene = Scene.from_static([], [floor, box]).set_lights(
        [Light(LightType.Point).with_position([2, 2, 2])
         .with_intensity(1.5).compile()]
    )
    assets = Assets.default().with_textures(
        [Tile.from_texture(Texture.checkerboard(32, 4))]
    )
    cam = D3OrbitCamera()
    cam.azimuth = 0.8
    cam.set_parameter_f32("distance", 4.0)
    rast = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(W, H)
    )
    rast.ambient((0.25, 0.3, 0.35, 1.0)).background((90, 120, 160, 255))
    rast.set_reflections(1)
    rast.keep_frame_args = True
    rast.rasterize(scene, W, H, 40, assets)
    fa = rast._frame_args
    d3, atlas = fa["d3"], fa["atlas"]
    lights, uniforms = fa["lights"], fa["uniforms"]

    vis, attr, bbox, alive, tri_id = setup_pass(
        d3["pos"], d3["uv"], d3["nrm"], d3["valid"], d3["cull"],
        uniforms["view"], uniforms["proj"], W, H,
    )
    z, idx, hit = visibility_pass(vis, alive.astype(jnp.float32), W, H)
    full, fmask = reflection_pass(
        z, idx, hit, attr, tri_id, d3, atlas, lights, uniforms, W, H, 0, 2,
    )
    sl = (slice(0, H, 2), slice(0, W, 2))
    lo, lmask = reflection_pass(
        z[sl], idx[sl], hit[sl], attr, tri_id, d3, atlas, lights, uniforms,
        W // 2, H // 2, 0, 2, stride=2,
    )
    np.testing.assert_array_equal(np.asarray(lmask), np.asarray(fmask)[sl])
    np.testing.assert_allclose(
        np.asarray(lo), np.asarray(full)[sl], atol=1e-5, rtol=0
    )


def test_reflection_hits_are_shadowed():
    """A mirrored SHADOWED wall must read darker in the floor reflection
    than the same wall unshadowed: the WGSL nests trace_shadow inside the
    pbr_lighting it runs on every reflection hit (3d_shader.wgsl:578-580
    via the hit shading at :846-852); here the hits sample the baked maps.

    The reflection term is isolated per shadow setting as
    (refl-on frame - refl-off frame), which cancels all primary-shading
    differences — shadowing can only REMOVE reflected light."""
    def build():
        floor = (
            Batch3D.from_box(-3, -1.3, -3, 6, 0.2, 6)
            .set_source(PixelSource.pixel((40, 40, 50, 255)))
            .with_computed_normals()
            .set_shader(0)
        )
        wall = (
            Batch3D.from_box(-2.5, -1.1, -2.7, 5.0, 2.8, 0.2)
            .set_source(PixelSource.pixel((245, 245, 245, 255)))
            .with_computed_normals()
        )
        blocker = (
            Batch3D.from_box(-1.0, -0.8, -1.3, 2.0, 1.6, 0.2)
            .set_source(PixelSource.pixel((60, 60, 60, 255)))
            .with_computed_normals()
        )
        scene = Scene.from_static([], [floor, wall, blocker])
        scene.add_shader(
            "fn shade() { color = vec3(0.3, 0.3, 0.35); roughness = 0.08;"
            " metallic = 0.95; }"
        )
        scene.set_lights(
            [Light(LightType.Point).with_position([0.0, 0.5, 2.0])
             .with_intensity(2.0).with_range(0.5, 30.0).compile()]
        )
        cam = D3OrbitCamera()
        cam.azimuth = 0.0
        cam.set_parameter_f32("distance", 4.5)
        rast = Rasterizer.setup(
            None, cam.view_matrix(), cam.projection_matrix(W, H)
        )
        rast.ambient((0.1, 0.1, 0.1, 1.0))
        rast.background((90, 120, 160, 255))
        rast.set_brdf("ggx")
        return rast, scene

    def refl_gain(shadows: bool):
        gains = []
        for samples in (0, 2):
            rast, scene = build()
            rast.set_shadows(shadows, res=128)
            rast.set_reflections(samples)
            gains.append(
                rast.rasterize(scene, W, H, 40, Assets.default())
                .astype(np.float32)[..., :3].mean(axis=-1)
            )
        return gains[1] - gains[0]

    g_off = refl_gain(False)
    g_on = refl_gain(True)
    drop = g_off - g_on
    # NOTE: no global pointwise monotonicity in u8 space — the display
    # transfer's slope depends on the primary level, which the shadow
    # setting also changes; the REGIONAL claim is the contract:
    # the shadowed wall's mirrored image must visibly darken
    assert drop.max() > 10.0, f"max reflected-shadow drop {drop.max()}"
    assert (drop > 5.0).sum() > 30, f"only {(drop > 5.0).sum()} px darkened"
    # and in aggregate the reflection term loses energy
    assert drop.sum() > 0.0, f"net reflected energy rose: {drop.sum()}"


def test_reflections_on_transparency_layers():
    """The WGSL runs its reflection loop inside the peeled
    transparency-layer loop (3d_shader.wgsl:760-826); the repo now does
    too (ops/raster.py opacity loop): a mirror-material transparent pane
    floating against the sky must gain reflection radiance when samples
    turn on, with its rays traced against the OPAQUE scene (scene_d3).
    Background (z-miss) pixels stay bit-identical."""
    from rusterix_tpu import Batch3D, CullMode

    def build():
        rast, scene = _mirror_scene()
        # pane high above the floor, seen against the background sky, with
        # the same near-mirror shader material as the floor (shader 0)
        v = np.array(
            [[-1.2, 1.2, 0.0, 1], [1.2, 1.2, 0.0, 1],
             [1.2, 2.4, 0.0, 1], [-1.2, 2.4, 0.0, 1]], np.float32,
        )
        t = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        scene.d3_dynamic_opacity.append(
            Batch3D.new(v, t, uv)
            .set_cull_mode(CullMode.Off)
            .set_source(PixelSource.pixel((200, 120, 220, 130)))
            .with_computed_normals()
            .set_shader(0)
        )
        return rast, scene

    rast, scene = build()
    off = _frame(rast, scene, 0)
    rast, scene = build()
    on = _frame(rast, scene, 2)

    diff = np.abs(on.astype(np.int32) - off.astype(np.int32)).max(axis=-1)
    # locate pane pixels: they differ from the pure-background frame
    rast, scene_nopane = _mirror_scene()
    base = _frame(rast, scene_nopane, 0)
    pane_px = (np.abs(off.astype(np.int32) - base.astype(np.int32)).max(axis=-1) > 8)
    sky_backed_pane = pane_px[: int(H * 0.45)]  # upper region: sky behind
    assert sky_backed_pane.sum() > 50, "pane not visible against sky"
    assert (diff[: int(H * 0.45)][sky_backed_pane] > 0).mean() > 0.5, (
        "reflections did not reach the transparency layer"
    )
    # pure background pixels stay untouched
    assert np.array_equal(on[0, 0], off[0, 0])
    # and the mirror floor still gains its reflections
    assert diff[int(H * 0.55):].max() > 10
