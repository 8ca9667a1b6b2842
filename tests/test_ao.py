"""Screen-space ambient occlusion (ops/ao.py) vs the reference's traced AO.

The reference's live game 3D path computes hemisphere-sampled AO in SceneVM
(embedded/shader/3d_shader.wgsl:519-560 `compute_ao`: ao_samples
cosine-weighted rays, each hit within ao_radius contributing
(1 - t/radius) * opacity, modulating only the ambient term). The TPU
realization is a screen-space pass on the visibility depth; these tests
assert (a) the pass geometry on synthetic depth, (b) ordering agreement
with a Möller-Trumbore hemisphere-ray oracle on a real scene (corners
darker than open floor, in the same order), (c) XLA/megakernel parity, and
(d) that the ao_samples/ao_radius RenderSettings keys are live.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from rusterix_tpu import (
    Assets,
    Batch3D,
    CullMode,
    PixelSource,
    Scene,
)
from rusterix_tpu.models.render_settings import RenderSettings
from rusterix_tpu.ops.ao import ssao_pass, tap_offsets
from rusterix_tpu.ops.matrices import look_at_rh, perspective_fov_rh_zo
from rusterix_tpu.ops.raster import Rasterizer

W, H = 128, 96


# ---------------------------------------------------------------------------
# unit: pass geometry on synthetic depth images
# ---------------------------------------------------------------------------


def _ndc_from_depth(d, near=0.1, far=100.0):
    """Invert ops/shadow.depth_const: view depth -> z_ndc for RH-ZO."""
    a = far / (near - far)
    b = near * far / (near - far)
    return b / d - a, np.float32(a), np.float32(b)


def test_ssao_step_edge_synthetic():
    """A raised slab on the right half occludes the floor pixels next to
    its edge; pixels far from the edge and miss pixels stay at ao == 1."""
    h, w = 64, 96
    d = np.full((h, w), 10.0, np.float32)
    d[:, 48:] = 9.7  # slab 0.3 world units closer than the floor
    hit = np.ones((h, w), bool)
    hit[:4, :] = False  # a miss strip: must come back exactly 1
    z, a, b = _ndc_from_depth(d)

    taps = tap_offsets(8, max_px=12)
    # px_scale 0.002 at depth 10: lateral reach <= 12*0.002*10 = 0.24 < 1.0
    ao = np.asarray(
        ssao_pass(jnp.asarray(z), jnp.asarray(hit), a, b, 1.0, 0.002, taps)
    )

    assert np.allclose(ao[:4, :], 1.0)  # misses never receive
    # floor right next to the step edge is occluded by the slab
    assert ao[20:44, 36:47].min() < 0.85
    # floor far from the edge (outside the 12px tap radius) is untouched
    assert np.allclose(ao[20:44, 4:20], 1.0, atol=1e-5)
    # the slab's own surface far from the edge is untouched (nothing above)
    assert np.allclose(ao[20:44, 70:90], 1.0, atol=1e-5)


def test_ssao_slanted_plane_is_unoccluded():
    """The classic SSAO slope artifact: a flat slanted surface must NOT
    self-occlude (plane-prediction correction in ssao_pass)."""
    h, w = 64, 96
    rows = np.arange(h, dtype=np.float32)[:, None]
    d = 6.0 + 0.12 * rows * np.ones((1, w), np.float32)  # steady slope
    hit = np.ones((h, w), bool)
    z, a, b = _ndc_from_depth(d)
    taps = tap_offsets(8, max_px=12)
    ao = np.asarray(
        ssao_pass(jnp.asarray(z), jnp.asarray(hit), a, b, 1.0, 0.002, taps)
    )
    assert ao[16:48, 16:80].min() > 0.999, ao[16:48, 16:80].min()


# ---------------------------------------------------------------------------
# end-to-end: ambient-only render + traced hemisphere oracle
# ---------------------------------------------------------------------------


def _scene():
    """Floor plane + a wall box; concave corner along the wall base."""
    floor = (
        Batch3D.from_box(-5.0, -0.1, -5.0, 10.0, 0.1, 10.0)
        .set_source(PixelSource.pixel((200, 200, 200, 255)))
        .set_cull_mode(CullMode.Off)
        .with_computed_normals()
    )
    wall = (
        Batch3D.from_box(2.0, 0.0, -2.0, 0.2, 2.0, 4.0)
        .set_source(PixelSource.pixel((150, 100, 80, 255)))
        .set_cull_mode(CullMode.Off)
        .with_computed_normals()
    )
    return Scene.from_static([], [floor, wall]).set_lights([])


def _rast(use_pallas: bool):
    view = look_at_rh(
        np.array([0.0, 9.0, 5.0], np.float32),
        np.array([1.5, 0.0, 0.0], np.float32),
        np.array([0.0, 1.0, 0.0], np.float32),
    )
    proj = perspective_fov_rh_zo(1.2, float(W), float(H), 0.1, 100.0)
    r = Rasterizer.setup(None, view, proj)
    r.use_pallas = use_pallas
    r.background((10, 10, 10, 255))
    r.ambient([0.6, 0.6, 0.6, 1.0])  # ambient-only: luminance ratio == ao
    return r, view, proj


def _project(view, proj, p):
    """world (3,) -> (px, py) pixel centre coords."""
    v = view @ np.array([p[0], p[1], p[2], 1.0], np.float32)
    c = proj @ v
    ndc = c[:3] / c[3]
    px = (ndc[0] * 0.5 + 0.5) * W
    py = (1.0 - (ndc[1] * 0.5 + 0.5)) * H
    return px, py


def _ratio_at(on, off, view, proj, p, rad=2):
    """mean(on)/mean(off) luminance in a small window around world p."""
    px, py = _project(view, proj, p)
    x, y = int(round(px)), int(round(py))
    w_on = on[y - rad : y + rad + 1, x - rad : x + rad + 1, :3].astype(np.float64)
    w_off = off[y - rad : y + rad + 1, x - rad : x + rad + 1, :3].astype(np.float64)
    return float(w_on.mean() / max(w_off.mean(), 1e-6))


# Möller-Trumbore hemisphere oracle — the WGSL compute_ao semantics
# (3d_shader.wgsl:519-560): cosine-sampled rays, hits within ao_radius add
# (1 - t/radius); ao = 1 - occ/samples.


def _box_tris(x, y, z, sx, sy, sz):
    lo = np.array([x, y, z], np.float64)
    hi = lo + np.array([sx, sy, sz], np.float64)
    v = np.array(
        [
            [lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
            [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
            [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
            [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]],
        ]
    )
    quads = [
        (0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4),
        (3, 2, 6, 7), (0, 3, 7, 4), (1, 2, 6, 5),
    ]
    tris = []
    for a, b, c, dd in quads:
        tris.append(np.stack([v[a], v[b], v[c]]))
        tris.append(np.stack([v[a], v[c], v[dd]]))
    return tris


def _traced_ao(tris, p, n, radius, samples=256, seed=7):
    rng = np.random.default_rng(seed)
    # orthonormal basis around n
    n = np.asarray(n, np.float64)
    t = np.cross(n, [0.0, 0.0, 1.0] if abs(n[2]) < 0.9 else [1.0, 0.0, 0.0])
    t /= np.linalg.norm(t)
    bt = np.cross(n, t)
    occ = 0.0
    for _ in range(samples):
        u1, u2 = rng.random(), rng.random()
        r = np.sqrt(u1)
        phi = 2.0 * np.pi * u2
        local = np.array(
            [r * np.cos(phi), r * np.sin(phi), np.sqrt(max(1.0 - u1, 0.0))]
        )
        d = local[0] * t + local[1] * bt + local[2] * n
        best = np.inf
        for tri in tris:
            v0, v1, v2 = tri
            e1, e2 = v1 - v0, v2 - v0
            pv = np.cross(d, e2)
            det = e1 @ pv
            if abs(det) < 1e-12:
                continue
            inv = 1.0 / det
            tv = np.asarray(p, np.float64) - v0
            u = (tv @ pv) * inv
            if u < 0.0 or u > 1.0:
                continue
            qv = np.cross(tv, e1)
            v = (d @ qv) * inv
            if v < 0.0 or u + v > 1.0:
                continue
            tt = (e2 @ qv) * inv
            if 1e-4 < tt < best:
                best = tt
        if best < radius:
            occ += 1.0 - best / radius
    return 1.0 - occ / samples


def test_ao_corner_ordering_matches_traced_oracle():
    """SSAO darkens the wall-base corner more than open floor, in the same
    order (and comparable direction) as the traced hemisphere oracle.

    Runs at 512x384: screen-space AO needs the occluder to cover real
    pixels; at thumbnail sizes the wall is a couple of pixels wide and the
    tap spiral can't see it (same reason the reference renders SceneVM at
    the framebuffer size, not a preview)."""
    BW, BH = 512, 384
    scene = _scene()
    assets = Assets.default()
    view = look_at_rh(
        np.array([0.0, 9.0, 5.0], np.float32),
        np.array([1.5, 0.0, 0.0], np.float32),
        np.array([0.0, 1.0, 0.0], np.float32),
    )
    proj = perspective_fov_rh_zo(1.2, float(BW), float(BH), 0.1, 100.0)
    r = Rasterizer.setup(None, view, proj)
    r.use_pallas = False
    r.background((10, 10, 10, 255))
    r.ambient([0.6, 0.6, 0.6, 1.0])
    off = r.rasterize(scene, BW, BH, 32, assets)
    r.set_ambient_occlusion(True, samples=24, radius=2.5)
    on = r.rasterize(scene, BW, BH, 32, assets)

    def ratio(p, rad=4):
        v = view @ np.array([p[0], p[1], p[2], 1.0], np.float32)
        c = proj @ v
        ndc = c[:3] / c[3]
        x = int(round((ndc[0] * 0.5 + 0.5) * BW))
        y = int(round((1.0 - (ndc[1] * 0.5 + 0.5)) * BH))
        a = on[y - rad : y + rad + 1, x - rad : x + rad + 1, :3].astype(float)
        b = off[y - rad : y + rad + 1, x - rad : x + rad + 1, :3].astype(float)
        return float(a.mean() / max(b.mean(), 1e-6))

    r_corner = ratio((1.8, 0.0, 0.0))  # floor hugging the wall base (x=2)
    r_open = ratio((-2.5, 0.0, 0.0))  # open floor, > radius from anything

    tris = _box_tris(-5.0, -0.1, -5.0, 10.0, 0.1, 10.0) + _box_tris(
        2.0, 0.0, -2.0, 0.2, 2.0, 4.0
    )
    up = (0.0, 1.0, 0.0)
    t_corner = _traced_ao(tris, (1.8, 0.001, 0.0), up, 2.5)
    t_open = _traced_ao(tris, (-2.5, 0.001, 0.0), up, 2.5)

    # the oracle itself sees a darker corner
    assert t_corner < t_open - 0.05, (t_corner, t_open)
    # SSAO agrees in ordering and actually darkens the corner
    # (measured 0.917 vs 1.0; sRGB-u8 ratios understate the linear ao)
    assert r_corner < r_open - 0.04, (r_corner, r_open)
    assert r_corner < 0.95, r_corner
    # open floor essentially untouched (the slope correction at work)
    assert r_open > 0.995, r_open


def test_ao_mega_matches_xla():
    scene = _scene()
    assets = Assets.default()
    r, _, _ = _rast(use_pallas=True)
    r.set_ambient_occlusion(True, samples=8, radius=2.0)
    mega = r.rasterize(scene, W, H, 32, assets)
    r.use_pallas = False
    xla = r.rasterize(scene, W, H, 32, assets)
    diff = np.abs(mega.astype(np.int32) - xla.astype(np.int32))
    bad = (diff > 2).any(axis=-1)
    assert bad.mean() < 0.01, (bad.mean(), diff.max())


def test_ao_settings_live():
    """ao_samples == 0 disables the pass (compute_ao early return); a
    bigger ao_radius changes output — the RenderSettings keys are live."""
    scene = _scene()
    assets = Assets.default()

    def render(samples, radius, enable=True):
        r, _, _ = _rast(use_pallas=False)
        rs = RenderSettings()
        rs.ao_samples = samples
        rs.ao_radius = radius
        r.apply_render_settings(rs)
        if enable:
            r.set_ambient_occlusion(True)  # defaults from the settings
        return r.rasterize(scene, W, H, 32, assets)

    base = render(8.0, 0.5, enable=False)
    zero = render(0.0, 0.5)
    assert np.array_equal(base, zero)

    small = render(8.0, 0.5)
    big = render(8.0, 2.5)
    assert np.abs(small.astype(int) - big.astype(int)).max() > 3
