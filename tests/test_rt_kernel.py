"""Secondary-ray Pallas kernel vs the XLA wavefront Möller-Trumbore.

The kernel (ops/rt_kernel.py) must agree with reflect.intersect_rays on
every ray: same hit triangle, same t (exact ties may legitimately pick a
different coplanar triangle — the scenes here avoid exact ties).
Interpret mode on the CPU mesh, same convention as the other Pallas
parity suites (tests/test_shade_pallas.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rusterix_tpu.ops import rt_kernel
from rusterix_tpu.ops.reflect import intersect_rays
from rusterix_tpu.ops.rt_kernel import intersect_rays_pallas


def _random_scene(rng, tcount, spread=10.0, tri_size=1.5):
    a = rng.uniform(-spread, spread, (tcount, 3)).astype(np.float32)
    e1 = rng.uniform(-tri_size, tri_size, (tcount, 3)).astype(np.float32)
    e2 = rng.uniform(-tri_size, tri_size, (tcount, 3)).astype(np.float32)
    pos = np.stack([a, a + e1, a + e2], axis=1)  # (T, 3, 3)
    pos = np.concatenate(
        [pos, np.ones((tcount, 3, 1), np.float32)], axis=2
    )  # (T, 3, 4) like the d3 pack
    return pos


def _random_rays(rng, h, w, spread=8.0):
    o = rng.uniform(-spread, spread, (3, h, w)).astype(np.float32)
    d = rng.normal(size=(3, h, w)).astype(np.float32)
    d /= np.maximum(np.linalg.norm(d, axis=0, keepdims=True), 1e-9)
    return o, d


def _compare(pos, valid, o, d, t_cap, h, w):
    p = h * w
    t_ref, i_ref = intersect_rays(
        jnp.asarray(pos), jnp.asarray(valid),
        *(jnp.asarray(o[k]).reshape(p) for k in range(3)),
        *(jnp.asarray(d[k]).reshape(p) for k in range(3)),
        t_cap,
    )
    t_k, i_k = intersect_rays_pallas(
        jnp.asarray(pos), jnp.asarray(valid),
        *(jnp.asarray(o[k]) for k in range(3)),
        *(jnp.asarray(d[k]) for k in range(3)),
        jnp.float32(t_cap), h, w, interpret=True,
    )
    t_ref = np.asarray(t_ref).reshape(h, w)
    i_ref = np.asarray(i_ref).reshape(h, w)
    t_k, i_k = np.asarray(t_k), np.asarray(i_k)
    np.testing.assert_array_equal(i_k, i_ref)
    hit = i_ref >= 0
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=1e-6)
    assert np.all(np.isinf(t_k[~hit]))


def test_rt_kernel_matches_xla_random_scene():
    rng = np.random.default_rng(7)
    tcount = 300  # pads to 5 cells, exercises the dead-slot tail
    pos = _random_scene(rng, tcount)
    valid = np.ones(tcount, np.float32)
    valid[rng.uniform(size=tcount) < 0.3] = 0.0  # scattered dead slots
    o, d = _random_rays(rng, 24, 40)
    _compare(pos, valid, o, d, 25.0, 24, 40)


def test_rt_kernel_range_cap_and_misses():
    rng = np.random.default_rng(11)
    pos = _random_scene(rng, 64, spread=4.0)
    valid = np.ones(64, np.float32)
    o, d = _random_rays(rng, 16, 16, spread=3.0)
    # tight cap: many in-range tris become misses; both paths must agree
    _compare(pos, valid, o, d, 2.0, 16, 16)


def test_rt_kernel_parked_rays_stay_dead():
    """Parked rays (origin 1e8 — the reflect.py convention) must return
    miss AND not poison the block's early-exit bound for live rays."""
    rng = np.random.default_rng(3)
    pos = _random_scene(rng, 128, spread=5.0)
    valid = np.ones(128, np.float32)
    o, d = _random_rays(rng, 16, 128, spread=4.0)
    dead = rng.uniform(size=(16, 128)) < 0.5
    for k in range(3):
        o[k][dead] = 1e8
    d[0][dead] = 0.0
    d[1][dead] = -1.0
    d[2][dead] = 0.0
    _compare(pos, valid, o, d, 30.0, 16, 128)


def test_rt_kernel_all_dead_block():
    rng = np.random.default_rng(5)
    pos = _random_scene(rng, 64)
    valid = np.ones(64, np.float32)
    h, w = 32, 128  # two (16,128) blocks; the lower one is fully parked
    o, d = _random_rays(rng, h, w)
    for k in range(3):
        o[k][16:] = 1e8
    t_k, i_k = intersect_rays_pallas(
        jnp.asarray(pos), jnp.asarray(valid),
        *(jnp.asarray(o[k]) for k in range(3)),
        *(jnp.asarray(d[k]) for k in range(3)),
        jnp.float32(20.0), h, w, interpret=True,
    )
    assert np.all(np.asarray(i_k)[16:] == -1)


def test_rt_kernel_nonaligned_frame():
    """Frame sizes off the (16,128) block grid pad internally and slice
    back; padded rays must not leak hits into the real frame."""
    rng = np.random.default_rng(13)
    pos = _random_scene(rng, 200)
    valid = np.ones(200, np.float32)
    o, d = _random_rays(rng, 19, 70)
    _compare(pos, valid, o, d, 25.0, 19, 70)


def test_rt_kernel_direction_cull_keeps_hits():
    """Coherent up-facing rays under a ceiling: the per-axis direction
    cull must not drop the cells the rays actually hit."""
    # ceiling quad split into two triangles at y=5, floor at y=-5
    quad = np.array(
        [
            [[-20, 5, -20], [20, 5, -20], [-20, 5, 20]],
            [[20, 5, -20], [20, 5, 20], [-20, 5, 20]],
            [[-20, -5, -20], [20, -5, -20], [-20, -5, 20]],
            [[20, -5, -20], [20, -5, 20], [-20, -5, 20]],
        ],
        np.float32,
    )
    pos = np.concatenate([quad, np.ones((4, 3, 1), np.float32)], axis=2)
    valid = np.ones(4, np.float32)
    h, w = 16, 128
    o = np.zeros((3, h, w), np.float32)
    d = np.zeros((3, h, w), np.float32)
    d[1] = 1.0  # all rays straight up
    t_k, i_k = intersect_rays_pallas(
        jnp.asarray(pos), jnp.asarray(valid),
        *(jnp.asarray(o[k]) for k in range(3)),
        *(jnp.asarray(d[k]) for k in range(3)),
        jnp.float32(50.0), h, w, interpret=True,
    )
    i_k = np.asarray(i_k)
    assert np.all((i_k == 0) | (i_k == 1))  # ceiling, never the floor
    np.testing.assert_allclose(np.asarray(t_k), 5.0, rtol=1e-6)


def test_rt_kernel_slot_limit_gate():
    assert not rt_kernel.rt_kernel_supported(rt_kernel.RT_SLOT_LIMIT + 1)


def test_reflection_pass_rt_pallas_matches_xla():
    """Full reflection_pass through the rt kernel (interpret) must match
    the XLA wavefront path bit-for-bit on a textured mirror scene (same
    MT epsilon chain; no exact t ties in this scene)."""
    import jax.numpy as jnp
    from rusterix_tpu import (
        Assets, Batch3D, D3OrbitCamera, Light, LightType, PixelSource,
        Scene, Texture, Tile,
    )
    from rusterix_tpu.ops.raster import Rasterizer
    from rusterix_tpu.ops.reflect import reflection_pass
    from rusterix_tpu.ops.setup_pass import setup_pass
    from rusterix_tpu.ops.visibility import visibility_pass

    W, H = 160, 120
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
    rast.set_reflections(2)
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
    ref, mref = reflection_pass(
        z, idx, hit, attr, tri_id, d3, atlas, lights, uniforms, W, H, 0, 2,
    )
    ker, mker = reflection_pass(
        z, idx, hit, attr, tri_id, d3, atlas, lights, uniforms, W, H, 0, 2,
        rt_pallas=True,
    )
    np.testing.assert_array_equal(np.asarray(mker), np.asarray(mref))
    np.testing.assert_allclose(
        np.asarray(ker), np.asarray(ref), atol=1e-6, rtol=0
    )
