"""Shadow-map bake + lookup vs a brute-force shadow-ray oracle.

The oracle is the reference's trace_shadow semantics
(reference embedded/shader/3d_shader.wgsl:436-517): segment from the shaded
point to the light, Möller-Trumbore against every triangle, blocked if any
occluder lies within max_shadow_distance of the point. The shadow maps are a
rasterized discretization, so agreement is asserted on interior points (away
from geometric shadow boundaries) plus a high overall match rate.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from rusterix_tpu.ops import shadow as sh


# ---------------------------------------------------------------------------
# scene helpers: packed-triangle dicts straight in setup_pass layout
# ---------------------------------------------------------------------------


def _quad(p0, p1, p2, p3):
    """Two CCW triangles for the quad p0..p3 (each (3,) world xyz)."""
    p0, p1, p2, p3 = (np.asarray(p, np.float32) for p in (p0, p1, p2, p3))
    return [np.stack([p0, p1, p2]), np.stack([p0, p2, p3])]


def _pack(tris, cap=None):
    """list of (3,3) triangles -> packed d3 dict (pos/uv/nrm/valid/cull)."""
    t = len(tris)
    cap = cap or max(t, 1)
    pos = np.zeros((cap, 3, 4), np.float32)
    pos[:, :, 3] = 1.0
    uv = np.zeros((cap, 3, 2), np.float32)
    nrm = np.zeros((cap, 3, 3), np.float32)
    valid = np.zeros(cap, np.float32)
    for i, tri in enumerate(tris):
        pos[i, :, :3] = tri
        e1 = tri[1] - tri[0]
        e2 = tri[2] - tri[0]
        n = np.cross(e1, e2)
        n = n / max(np.linalg.norm(n), 1e-20)
        nrm[i, :] = n
        valid[i] = 1.0
    return {
        "pos": pos,
        "uv": uv,
        "nrm": nrm,
        "valid": valid,
        "cull": np.zeros(cap, np.int32),
        "opacity": np.ones(cap, np.float32),
    }


def _room():
    """Floor 10x10 at y=0, wall x=[2..2.01] (thin box slab) spanning
    z=[-2..2], y=[0..2]."""
    tris = []
    tris += _quad([-5, 0, -5], [5, 0, -5], [5, 0, 5], [-5, 0, 5])  # floor
    # wall as a thin double-sided slab (two coincident one-sided quads)
    tris += _quad([2, 0, -2], [2, 0, 2], [2, 2, 2], [2, 2, -2])
    tris += _quad([2, 0, -2], [2, 2, -2], [2, 2, 2], [2, 0, 2])
    return tris


def _oracle_blocked(tris, p, lpos, msd, eps=1e-4):
    """Möller-Trumbore segment test: any triangle strictly between p and
    lpos with occluder-to-point distance <= msd (3d_shader.wgsl:463-476)."""
    p = np.asarray(p, np.float64)
    lpos = np.asarray(lpos, np.float64)
    d = lpos - p
    seg = np.linalg.norm(d)
    d = d / seg
    for tri in tris:
        v0, v1, v2 = (np.asarray(v, np.float64) for v in tri)
        e1, e2 = v1 - v0, v2 - v0
        h = np.cross(d, e2)
        a = np.dot(e1, h)
        if abs(a) < 1e-12:
            continue
        f = 1.0 / a
        s = p - v0
        u = f * np.dot(s, h)
        if u < 0.0 or u > 1.0:
            continue
        q = np.cross(s, e1)
        v = f * np.dot(d, q)
        if v < 0.0 or u + v > 1.0:
            continue
        t = f * np.dot(e2, q)
        if eps < t < seg - eps and t <= msd:
            return True
    return False


def _factors_point(tris, lpos, pts, msd=50.0, res=128, end=30.0):
    """Bake a cube map for a point light at lpos and evaluate the shadow
    factor at world points pts (N,3)."""
    d3 = _pack(tris)
    lights = {
        "position": np.asarray([lpos], np.float32),
        "end": np.asarray([end], np.float32),
    }
    rows, params, (sun_entry, cubes) = sh.bake_shadow_pack(
        d3, None, lights, [0], sun_dir=None, res=res,
        max_shadow_distance=msd,
    )
    rows_flat = rows.reshape(-1)
    pts = np.asarray(pts, np.float32)
    ones = jnp.ones(pts.shape[0], jnp.float32)
    f = sh.shadow_factor_xla(
        rows_flat, jnp.asarray(params), cubes[0],
        jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.asarray(pts[:, 2]),
        0.0 * ones, ones, 0.0 * ones,
        lpos=np.asarray(lpos, np.float32),
    )
    return np.asarray(f)


# ---------------------------------------------------------------------------


def test_cube_face_uv_inverse():
    """cube_face_uv must be the exact inverse of FACE_BASES' projection:
    project random directions through each face camera, then recover the
    same texel from the analytic mapping."""
    rng = np.random.default_rng(7)
    res = 64
    proj = None
    from rusterix_tpu.ops.matrices import perspective_fov_rh_zo

    proj = perspective_fov_rh_zo(np.pi / 2.0, 1.0, 1.0, 0.1, 100.0)
    lpos = np.zeros(3, np.float32)
    for face in range(6):
        view = sh.face_view_matrix(lpos, face)
        fwd = np.asarray(sh.FACE_BASES[face][0], np.float64)
        # directions well inside this face's frustum (|off-axis| < 0.9*major)
        for _ in range(200):
            off = rng.uniform(-0.89, 0.89, size=3)
            d = fwd * 1.0
            basis = [v for v in np.eye(3) if abs(np.dot(v, fwd)) < 0.5]
            d = fwd + basis[0] * off[0] + basis[1] * off[1]
            d = d * rng.uniform(0.5, 20.0)
            # rasterizer side: view -> clip -> screen texel
            vv = view @ np.concatenate([d, [1.0]])
            clip = proj @ vv
            sx = int(np.clip((clip[0] / clip[3] * 0.5 + 0.5) * res, 0, res - 1))
            sy = int(np.clip((-clip[1] / clip[3] * 0.5 + 0.5) * res, 0, res - 1))
            # lookup side
            flat, ma = sh.cube_shadow_texel(
                np.float32(d[0]), np.float32(d[1]), np.float32(d[2]),
                0, res, xp=np,
            )
            lface = int(flat) // (res * res)
            ly, lx = divmod(int(flat) % (res * res), res)
            assert lface == face, (face, d)
            assert (lx, ly) == (sx, sy), (face, d, (lx, ly), (sx, sy))
            assert np.isclose(float(ma), np.abs(d[np.argmax(np.abs(fwd))]))


def test_point_light_wall_shadow_matches_oracle():
    """Floor points behind the wall (x>2) are shadowed from a light at
    x<2; open floor is lit — against the Möller-Trumbore oracle."""
    tris = _room()
    lpos = [0.0, 1.0, 0.0]
    xs = np.linspace(-4.5, 4.5, 31)
    zs = np.linspace(-4.5, 4.5, 31)
    pts = np.array([[x, 0.0, z] for x in xs for z in zs], np.float32)
    # lift the sample points slightly off the floor plane (the megakernel
    # applies the same normal offset before lookup)
    pts[:, 1] = 0.02
    f = _factors_point(tris, lpos, pts)
    oracle = np.array(
        [0.0 if _oracle_blocked(tris, p, lpos, 50.0) else 1.0 for p in pts]
    )
    match = (f == oracle).mean()
    assert match > 0.97, match
    # interior certainty: deep shadow and open regions must be exact
    deep = (pts[:, 0] > 2.5) & (np.abs(pts[:, 2]) < np.abs(pts[:, 0] - 0.0) * 0.8)
    for p, fv, ov in zip(pts, f, oracle):
        if p[0] < 1.5:  # strictly light side of the wall
            assert fv == 1.0, p
        if p[0] > 2.6 and abs(p[2]) < 1.0:  # deep in the umbra
            assert fv == 0.0, p


def test_max_shadow_distance_unblocks_far_occluders():
    """With the occluder-to-point cap below the wall distance, the umbra
    opens back up (trace_shadow's ray-length cap)."""
    tris = _room()
    lpos = [0.0, 1.0, 0.0]
    pts = np.array([[4.0, 0.02, 0.0]], np.float32)
    f_far = _factors_point(tris, lpos, pts, msd=50.0)
    f_near = _factors_point(tris, lpos, pts, msd=1.0)  # wall is ~2 away
    assert f_far[0] == 0.0
    assert f_near[0] == 1.0


def test_sun_shadow_strip():
    """A sun shining down +x casts the wall's shadow strip onto x>2 floor."""
    tris = _room()
    d3 = _pack(tris)
    sun_dir = np.array([0.6, -1.0, 0.0], np.float32)
    sun_dir /= np.linalg.norm(sun_dir)
    rows, params, (sun_entry, cubes) = sh.bake_shadow_pack(
        d3, None, {"position": np.zeros((0, 3), np.float32),
                   "end": np.zeros(0, np.float32)},
        [], sun_dir=sun_dir, sun_res=256, max_shadow_distance=50.0,
    )
    rows_flat = rows.reshape(-1)
    xs = np.linspace(-4.5, 4.5, 41)
    pts = np.array([[x, 0.02, 0.0] for x in xs], np.float32)
    ones = jnp.ones(pts.shape[0], jnp.float32)
    f = np.asarray(
        sh.shadow_factor_xla(
            rows_flat, jnp.asarray(params), sun_entry,
            jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
            jnp.asarray(pts[:, 2]),
            0.0 * ones, ones, 0.0 * ones,
        )
    )
    # wall top at y=2, sun slope dy/dx = -1/0.6: shadow spans x in
    # [2, 2 + 2*0.6] = [2, 3.2]
    lit = (pts[:, 0] < 1.8) | (pts[:, 0] > 3.5)
    shadowed = (pts[:, 0] > 2.2) & (pts[:, 0] < 3.0)
    assert (f[lit] == 1.0).all(), f[lit]
    assert (f[shadowed] == 0.0).all(), f[shadowed]


def test_transmittance_scales_factor():
    """A transparent pane between light and floor multiplies the factor by
    (1 - alpha) instead of hard-blocking (trace_shadow_unified,
    3d_shader.wgsl:479-515)."""
    tris = _room()
    pane = _quad([-1, 0, -2], [-1, 0, 2], [-1, 2, 2], [-1, 2, -2])
    pane += _quad([-1, 0, -2], [-1, 2, -2], [-1, 2, 2], [-1, 0, 2])
    d3 = _pack(tris)
    d3_op = _pack(pane)
    d3_op["opacity"] = np.full(len(pane), 0.25, np.float32)
    lights = {
        "position": np.asarray([[0.0, 1.0, 0.0]], np.float32),
        "end": np.asarray([30.0], np.float32),
    }
    rows, params, (sun_entry, cubes) = sh.bake_shadow_pack(
        d3, d3_op, lights, [0], with_trans=True, max_shadow_distance=50.0,
    )
    rows_flat = rows.reshape(-1)

    def factor(pt):
        pt = np.asarray(pt, np.float32)
        return float(
            np.asarray(
                sh.shadow_factor_xla(
                    rows_flat, jnp.asarray(params), cubes[0],
                    jnp.asarray(pt[0:1]), jnp.asarray(pt[1:2]),
                    jnp.asarray(pt[2:3]),
                    jnp.zeros(1), jnp.ones(1), jnp.zeros(1),
                    lpos=np.asarray([0.0, 1.0, 0.0], np.float32),
                )
            )[0]
        )

    # behind the pane (x < -1): exactly ONE attenuation of (1-0.25) even
    # though the pane is two coincident one-sided quads — the depth peel's
    # strict-beyond ordering + PEEL_MERGE_EPS merges them, matching the
    # reference stepper's bias advance (3d_shader.wgsl:509)
    f_pane = factor([-3.0, 0.02, 0.0])
    assert abs(f_pane - 0.75) < 1e-5, f_pane
    # a receiver BETWEEN the light and the pane is NOT dimmed: only
    # surfaces strictly inside the light->receiver segment attenuate
    # (3d_shader.wgsl:479-515). The texel ray crosses the pane BEYOND
    # this receiver (light (0,1,0) -> (-0.8,0.55,0) extended hits the
    # pane plane x=-1 at y~0.44 inside the pane)
    assert factor([-0.8, 0.55, 0.0]) == 1.0
    # behind the opaque wall stays 0
    assert factor([4.0, 0.02, 0.0]) == 0.0
    # open floor stays 1
    assert factor([0.5, 0.02, 0.5]) == 1.0


def test_no_maps_requested_returns_neutral():
    rows, params, (sun_entry, cubes) = sh.bake_shadow_pack(
        _pack(_room()), None,
        {"position": np.zeros((0, 3), np.float32),
         "end": np.zeros(0, np.float32)},
        [], sun_dir=None,
    )
    assert sun_entry is None and cubes == ()
    assert rows.shape == (1, 128)
