"""Device setup pass: view transform, cull, near-plane clip, projection,
edge/interpolation-plane precompute.

TPU-native replacement for `Batch3D::clip_and_project`
(reference src/batch/batch3d.rs:482-740). The reference walks triangles on
CPU threads and appends clip output to Vecs; here every input triangle maps
to a **fixed two output slots** (a triangle clipped by one plane yields at
most 2 triangles), so the whole pass is one vmapped jitted function over
padded SoA arrays — no dynamic shapes.

Output: for each of the 2*T candidate triangles
  vis_planes : (2T, 12) f32 — 3 edge line equations (a,b,c each) in the
               reference's canonicalized winding (batch3d.rs:706-739) plus
               the affine plane of interpolated 1/z_ndc. An impossible edge
               (0,0,-1) is stored for invalid/culled slots so the coverage
               test rejects them with zero extra branching.
  attr_planes: (2T, 21) f32 — affine planes of 1/w, u/w, v/w, nx, ny, nz,
               b/w (vertex blend weight).
               Perspective-correct attributes are affine in screen space
               after the /w fold, so per-pixel evaluation is 2 FMAs per
               attribute (the TPU replacement for per-pixel barycentrics,
               rasterizer.rs:1049-1076).
  bbox       : (2T, 4) f32 — screen bbox (min_x, min_y, max_x, max_y).
  tri_id     : (2T,) i32 — source triangle index (for meta gather).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEAR_PLANE = 0.1  # reference batch3d.rs:566

CULL_OFF = 0
CULL_FRONT = 1
CULL_BACK = 2


def _lambda_planes(p0, p1, p2):
    """Affine plane coefficients (a, b, c) of the three barycentric weights
    for screen triangle p0,p1,p2 (matches barycentric_weights_3d,
    rasterizer.rs:1755-1775, expanded to plane form)."""
    ax, ay = p0[0], p0[1]
    bx, by = p1[0], p1[1]
    cx, cy = p2[0], p2[1]
    area = (cx - ax) * (by - ay) - (cy - ay) * (bx - ax)
    inv_area = jnp.where(jnp.abs(area) > 1e-20, 1.0 / area, 0.0)
    # alpha = ((cx-px)(by-py) - (cy-py)(bx-px)) / area
    a_a = (cy - by) * inv_area
    a_b = (bx - cx) * inv_area
    a_c = (cx * by - cy * bx) * inv_area
    # beta = ((cx-ax)(py-ay) - (cy-ay)(px-ax)) / area
    b_a = (ay - cy) * inv_area
    b_b = (cx - ax) * inv_area
    b_c = (cy * ax - cx * ay) * inv_area
    # gamma = 1 - alpha - beta
    g_a = -(a_a + b_a)
    g_b = -(a_b + b_b)
    g_c = 1.0 - (a_c + b_c)
    lam = jnp.stack(
        [
            jnp.stack([a_a, a_b, a_c]),
            jnp.stack([b_a, b_b, b_c]),
            jnp.stack([g_a, g_b, g_c]),
        ]
    )  # (3 weights, 3 coeffs)
    degenerate = jnp.abs(area) <= 1e-20
    return lam, degenerate


def _edge_coeffs(v0, v1):
    """Line equation of edge v0->v1 (reference src/edge.rs:12-24)."""
    a = v1[1] - v0[1]
    b = v0[0] - v1[0]
    c = v1[0] * v0[1] - v1[1] * v0[0]
    return jnp.stack([a, b, c])


def _clip_triangle(vv, uv, nn, bw):
    """Sutherland-Hodgman near-plane clip of one view-space triangle.

    vv: (3,4) view-space; uv: (3,2); nn: (3,3); bw: (3,) vertex blend weight.
    Returns poly (4, 4+2+3+1), count — emission order matches
    batch3d.rs:628-681 exactly (current-inside emit, crossing emit).
    """
    inside = vv[:, 2] < -NEAR_PLANE  # (3,)

    attrs = jnp.concatenate([vv, uv, nn, bw[:, None]], axis=1)  # (3, 10)

    flags = []
    values = []
    for i in range(3):
        j = (i + 1) % 3
        cur, nxt = attrs[i], attrs[j]
        # current-inside emission
        flags.append(inside[i])
        values.append(cur)
        # crossing emission
        dz = vv[j, 2] - vv[i, 2]
        t = jnp.where(jnp.abs(dz) > 1e-30, (-NEAR_PLANE - vv[i, 2]) / dz, 0.0)
        inter = cur + t * (nxt - cur)
        # the reference normalizes the interpolated normal (batch3d.rs:651)
        n_lerp = nn[i] * (1.0 - t) + nn[j] * t
        n_len = jnp.linalg.norm(n_lerp)
        n_norm = jnp.where(n_len > 0, n_lerp / jnp.maximum(n_len, 1e-30), n_lerp)
        inter = inter.at[6:9].set(n_norm)
        flags.append(inside[i] != inside[j])
        values.append(inter)

    flags = jnp.stack(flags)  # (6,)
    values = jnp.stack(values)  # (6, 10)
    pos = jnp.cumsum(flags) - flags.astype(jnp.int32)  # exclusive prefix sum
    # scatter into 4 polygon slots with masked accumulation (a tiny one-hot
    # matmul here costs ~2x in batched-small-matmul overhead under vmap)
    sel = (pos[:, None] == jnp.arange(4)[None, :]) & flags[:, None]  # (6,4)
    poly = jnp.sum(
        jnp.where(sel[:, :, None], values[:, None, :], 0.0), axis=0
    )  # (4, 10)
    count = jnp.sum(flags.astype(jnp.int32))
    return poly, count


def _project(v, proj, width, height):
    """Perspective divide + viewport map (reference batch3d.rs:689-700)."""
    clip = jnp.matmul(proj, v, precision=jax.lax.Precision.HIGHEST)
    w = clip[3]
    inv_w = 1.0 / w
    sx = (clip[0] * inv_w * 0.5 + 0.5) * width
    sy = (-clip[1] * inv_w * 0.5 + 0.5) * height
    sz = clip[2] * inv_w
    return jnp.stack([sx, sy, sz, w])


def _slot_planes(tri10, slot_valid, cull, has_n, proj, width, height):
    """Build vis/attr planes for one candidate (clipped) triangle.

    tri10: (3, 10) view-space vertex attrs [xyzw, uv, n, blend_w]."""
    p = jax.vmap(lambda v: _project(v, proj, width, height))(tri10[:, :4])  # (3,4)
    uv = tri10[:, 4:6]
    nn = tri10[:, 6:9]
    bw = tri10[:, 9]

    v0, v1, v2 = p[0], p[1], p[2]

    # screen-space front-facing test (batch3d.rs:742-747)
    orient = (v1[0] - v0[0]) * (v2[1] - v0[1]) - (v1[1] - v0[1]) * (v2[0] - v0[0])
    is_front = orient > 0.0

    # winding canonicalization per cull mode (batch3d.rs:713-731)
    swap = jnp.where(
        cull == CULL_FRONT,
        jnp.zeros_like(is_front),
        is_front,
    )
    visible = jnp.where(
        cull == CULL_OFF,
        jnp.ones_like(is_front),
        jnp.where(cull == CULL_BACK, is_front, ~is_front),
    )
    e1 = jnp.where(swap, v2[:2], v1[:2])
    e2 = jnp.where(swap, v1[:2], v2[:2])

    edge0 = _edge_coeffs(v0[:2], e1)
    edge1 = _edge_coeffs(e1, e2)
    edge2 = _edge_coeffs(e2, v0[:2])

    lam, degenerate = _lambda_planes(p[0], p[1], p[2])  # (3,3)

    # attribute planes: plane(f) = sum_i f_i * lambda_i
    inv_z = 1.0 / p[:, 2]  # 1/z_ndc per vertex (rasterizer.rs:1051-1053)
    inv_w = 1.0 / p[:, 3]
    u_over_w = uv[:, 0] * inv_w
    v_over_w = uv[:, 1] * inv_w

    def plane(fvals):
        return jnp.matmul(fvals, lam, precision=jax.lax.Precision.HIGHEST)  # (3,)

    invz_p = plane(inv_z)
    invw_p = plane(inv_w)
    uw_p = plane(u_over_w)
    vw_p = plane(v_over_w)
    nx_p = plane(nn[:, 0])
    ny_p = plane(nn[:, 1])
    nz_p = plane(nn[:, 2])
    # vertex blend weight is perspective-correct like uv: plane of b/w
    bw_p = plane(bw * inv_w)

    ok = slot_valid & visible.astype(bool) & (~degenerate)
    dead_edge = jnp.array([0.0, 0.0, -1.0], jnp.float32)
    edge0 = jnp.where(ok, edge0, dead_edge)
    edge1 = jnp.where(ok, edge1, dead_edge)
    edge2 = jnp.where(ok, edge2, dead_edge)

    vis = jnp.concatenate([edge0, edge1, edge2, invz_p])  # (12,)
    attr = jnp.concatenate([invw_p, uw_p, vw_p, nx_p, ny_p, nz_p, bw_p])  # (21,)

    bbox = jnp.stack(
        [
            jnp.min(p[:, 0]),
            jnp.min(p[:, 1]),
            jnp.max(p[:, 0]),
            jnp.max(p[:, 1]),
        ]
    )
    bbox = jnp.where(ok, bbox, jnp.array([1e9, 1e9, -1e9, -1e9], jnp.float32))
    return vis, attr, bbox, ok


def _setup_one(pos, uv, nrm, bw, valid, cull, view, proj, width, height):
    """Full setup for one input triangle -> 2 candidate slots."""
    # full-f32 matmul: default TPU MXU precision is bf16, which shifts
    # projected vertices by ~0.1px and breaks edge-test parity
    vv = jnp.matmul(pos, view.T, precision=jax.lax.Precision.HIGHEST)  # (3,4)

    # early backface cull in view space (batch3d.rs:590-600)
    orient = (vv[1, 0] - vv[0, 0]) * (vv[2, 1] - vv[0, 1]) - (
        vv[1, 1] - vv[0, 1]
    ) * (vv[2, 0] - vv[0, 0])
    is_front = orient > 0.0
    early_culled = jnp.where(
        cull == CULL_BACK, is_front, jnp.where(cull == CULL_FRONT, ~is_front, False)
    )

    poly, count = _clip_triangle(vv, uv, nrm, bw)

    tri0 = poly[jnp.array([0, 1, 2])]
    tri1 = poly[jnp.array([0, 2, 3])]

    # The reference's view-space early cull only skips the CLIPPING WORK —
    # the triangle stays in clipped_indices unclipped and the screen-space
    # test at edge build decides final visibility (batch3d.rs:592-600 vs
    # :706-739). Perspective division can flip orientation between the two
    # tests, so early-culled triangles must still reach the screen test.
    unclipped = jnp.concatenate([vv, uv, nrm, bw[:, None]], axis=1)  # (3, 10)
    tri0 = jnp.where(early_culled, unclipped, tri0)

    alive = valid > 0.5
    ok0 = alive & jnp.where(early_culled, True, count >= 3)
    ok1 = alive & (~early_culled) & (count == 4)

    vis0, attr0, bbox0, final0 = _slot_planes(tri0, ok0, cull, None, proj, width, height)
    vis1, attr1, bbox1, final1 = _slot_planes(tri1, ok1, cull, None, proj, width, height)

    return (
        jnp.stack([vis0, vis1]),
        jnp.stack([attr0, attr1]),
        jnp.stack([bbox0, bbox1]),
        jnp.stack([final0, final1]),
    )


@partial(jax.jit, static_argnames=("width", "height"))
def setup_pass(pos, uv, nrm, valid, cull, view, proj, width: int, height: int,
               bw=None):
    """vmapped setup over all packed triangles.

    pos (T,3,4), uv (T,3,2), nrm (T,3,3), valid (T,), cull (T,),
    bw (T,3) per-vertex blend weight (optional) ->
    vis_planes (2T,12), attr_planes (2T,21), bbox (2T,4), alive (2T,),
    tri_id (2T,).
    """
    if bw is None:
        bw = jnp.zeros(pos.shape[:2], jnp.float32)
    f = jax.vmap(
        lambda p, u, n, b, va, c: _setup_one(
            p, u, n, b, va, c, view, proj, jnp.float32(width), jnp.float32(height)
        )
    )
    vis, attr, bbox, ok = f(pos, uv, nrm, bw, valid, cull)
    t = pos.shape[0]
    tri_id = jnp.repeat(jnp.arange(t, dtype=jnp.int32), 2)
    return (
        vis.reshape(2 * t, 12),
        attr.reshape(2 * t, 21),
        bbox.reshape(2 * t, 4),
        ok.reshape(2 * t),
        tri_id,
    )
