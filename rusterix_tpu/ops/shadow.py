"""Shadow maps for the 3D pass — per-light geometry shadows.

TPU realization of the reference's SceneVM ray-traced shadows
(reference embedded/shader/3d_shader.wgsl:436-517 `trace_shadow` /
`trace_shadow_unified`, uniforms packed at src/render_settings.rs:423-429).
Instead of per-pixel shadow rays against a triangle grid (divergent scalar
loops the TPU hates), each shadow-casting light renders a small depth map
with the SAME setup + visibility passes the main pipeline uses — a
rasterizer owns a rasterizer-shaped shadow solution — and the shading side
does one depth-compare lookup per pixel per shadow light, the same
lane-gather access pattern as the in-kernel texel fetch.

Layout:
- Point/spot lights get 6-face cube maps storing LINEAR distance along each
  face's major axis; the lookup needs no per-face matrices, just the
  analytic cube mapping (`FACE_BASES` below is its exact inverse).
- The sun gets one pseudo-directional map: a perspective camera placed
  behind the scene along sun_dir at ~2.2x the scene radius (ray divergence
  inside the scene stays under a texel at the default resolution).
- `max_shadow_distance` caps the occluder distance from the shaded point —
  exactly trace_shadow's ray-length cap (3d_shader.wgsl:463-476).
- `max_shadow_steps > 0` switches binary shadows to transparency-aware
  ones: each map bakes up to min(max_shadow_steps, 4) DEPTH-PEELED
  transparent layers (depth + alpha planes) from the opacity batches, and
  the lookup composes (1 - alpha) over exactly the layers strictly
  between light and receiver — the reference's trace_shadow stepping
  semantics (3d_shader.wgsl:479-515), including its bias-advance
  de-duplication of coincident two-sided panes (PEEL_MERGE_EPS).

Depth is stored as f32 view-space distance; empty texels carry NO_OCCLUDER.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .matrices import perspective_fov_rh_zo
from .setup_pass import setup_pass
from .visibility import visibility_pass

#: depth value meaning "no occluder along this texel"
NO_OCCLUDER = 1e30

#: near plane of every shadow camera — must match setup_pass.NEAR_PLANE
#: (the Sutherland-Hodgman clip is hard-coded to it)
SHADOW_NEAR = 0.1

#: (fwd, right, up) per cube face. The kernel's analytic face/uv selection
#: (`cube_face_uv` here; megakernel._cube_shadow mirrors it) is the exact
#: inverse of the view matrices these produce.
FACE_BASES = (
    ((1, 0, 0), (0, 0, -1), (0, 1, 0)),   # +X
    ((-1, 0, 0), (0, 0, 1), (0, 1, 0)),   # -X
    ((0, 1, 0), (1, 0, 0), (0, 0, -1)),   # +Y
    ((0, -1, 0), (1, 0, 0), (0, 0, 1)),   # -Y
    ((0, 0, 1), (-1, 0, 0), (0, 1, 0)),   # +Z
    ((0, 0, -1), (1, 0, 0), (0, 1, 0)),   # -Z
)


def face_view_matrix(light_pos, face: int) -> np.ndarray:
    """View matrix of cube `face` at `light_pos` (rows [right; up; -fwd],
    standard RH camera: view z is negative in front)."""
    fwd, right, up = (np.asarray(v, np.float32) for v in FACE_BASES[face])
    eye = np.asarray(light_pos, np.float32)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = right
    m[1, :3] = up
    m[2, :3] = -fwd
    m[0, 3] = -np.dot(right, eye)
    m[1, 3] = -np.dot(up, eye)
    m[2, 3] = np.dot(fwd, eye)
    return m


def depth_const(near: float, far: float):
    """(A, B) of the zo depth mapping: view distance d = B / (z_ndc + A)
    (perspective_fov_rh_zo rows m[2,2], m[2,3] with w = d)."""
    a = far / (near - far)
    b = -(far * near) / (far - near)
    return float(a), float(b)


@partial(jax.jit, static_argnames=("res",))
def _depth_face(pos, uv, nrm, valid, view, proj, a, b, res: int):
    """One shadow-camera depth render -> (res, res) linear view distance.

    Culling is forced OFF: one-sided walls must occlude from either side
    (the reference's shadow trace tests geometry regardless of facing,
    3d_shader.wgsl:436-460)."""
    cull = jnp.zeros(pos.shape[0], jnp.int32)
    vis, _attr, _bbox, alive, _tid = setup_pass(
        pos, uv, nrm, valid, cull, view, proj, res, res
    )
    z, _idx, hit = visibility_pass(vis, alive.astype(jnp.float32), res, res)
    return jnp.where(hit, b / (z + a), NO_OCCLUDER)


#: transparent layers closer together than this (along the shadow camera's
#: depth metric) merge into one — the reference's stepper advances past
#: each hit by shadow_bias = 0.01 before tracing again
#: (3d_shader.wgsl:464,509), so coincident two-sided panes count ONCE
PEEL_MERGE_EPS = 0.01


@partial(jax.jit, static_argnames=("res", "steps"))
def _trans_face(pos, uv, nrm, valid, opac_cols, view, proj, a, b, res: int,
                steps: int):
    """Depth-peeled transparent layers for one shadow camera ->
    (steps, 2, res, res) f32: [k, 0] = layer-k depth (linear view
    distance; NO_OCCLUDER where absent), [k, 1] = layer-k alpha.

    The reference's trace_shadow attenuates only through surfaces it
    steps THROUGH strictly between the receiver and the light
    (3d_shader.wgsl:479-515). Storing the nearest `steps` transparent
    layers per texel WITH their depths lets the lookup compose
    (1 - alpha) over exactly the layers in the light→receiver segment —
    a pane behind the receiver no longer dims it — and the peel's
    strict-beyond ordering plus PEEL_MERGE_EPS de-duplicates coincident
    two-sided panes (they attenuate once, like the reference's
    bias-advancing stepper). alpha is the batch-constant opacity column.
    """
    cull = jnp.zeros(pos.shape[0], jnp.int32)
    vis, _attr, _bbox, alive, tri_id = setup_pass(
        pos, uv, nrm, valid, cull, view, proj, res, res
    )
    alive_f = alive.astype(jnp.float32)
    alpha_tri = jnp.take(opac_cols, tri_id)  # (T2,)
    outs = []
    ceil = None
    prev_d = None
    for _k in range(steps):
        z, idx, hit, invz = visibility_pass(
            vis, alive_f, res, res, z_ceil=ceil, return_invz=True
        )
        d = jnp.where(hit, b / (z + a), NO_OCCLUDER)
        al = jnp.where(hit, jnp.take(alpha_tri, jnp.maximum(idx, 0)), 0.0)
        if prev_d is None:
            prev_d = d
        else:
            keep = d > prev_d + PEEL_MERGE_EPS
            al = jnp.where(keep, al, 0.0)
            prev_d = jnp.where(keep, d, prev_d)
        outs.append(jnp.stack([d, al]))
        ceil = invz
    return jnp.stack(outs)


def scene_bounds(pos: np.ndarray, valid: np.ndarray):
    """(center (3,), radius) of the valid packed triangles (host numpy)."""
    v = valid > 0.5
    if not v.any():
        return np.zeros(3, np.float32), 1.0
    p = pos[v][:, :, :3].reshape(-1, 3)
    lo = p.min(axis=0)
    hi = p.max(axis=0)
    center = (lo + hi) * 0.5
    radius = float(np.linalg.norm(hi - center))
    return center.astype(np.float32), max(radius, 1e-3)


def sun_camera(sun_dir, center, radius):
    """Pseudo-directional sun camera: perspective from 2.2*radius behind the
    scene along sun_dir. Returns (view, proj, params) with params =
    dict(pos, right, up, fwd, f, near, far)."""
    d = np.asarray(sun_dir, np.float32)
    d = d / max(np.linalg.norm(d), 1e-20)
    dist = 2.2 * radius
    eye = np.asarray(center, np.float32) - d * dist
    # basis around fwd = d
    up_pick = (
        np.array([0, 0, 1], np.float32)
        if abs(d[1]) > 0.999
        else np.array([0, 1, 0], np.float32)
    )
    right = np.cross(d, up_pick)
    right = right / max(np.linalg.norm(right), 1e-20)
    up = np.cross(right, d)
    near = max(0.25 * radius, SHADOW_NEAR)
    far = dist + 1.5 * radius
    # cover the bounding sphere from the eye, 5% margin
    half = np.arctan2(radius, max(dist - radius, 1e-3)) * 1.05
    fov = 2.0 * half
    view = np.eye(4, dtype=np.float32)
    view[0, :3] = right
    view[1, :3] = up
    view[2, :3] = -d
    view[0, 3] = -np.dot(right, eye)
    view[1, 3] = -np.dot(up, eye)
    view[2, 3] = np.dot(d, eye)
    proj = perspective_fov_rh_zo(fov, 1.0, 1.0, near, far)
    f = float(1.0 / np.tan(half))
    return view, proj, dict(
        pos=eye.astype(np.float32),
        right=right.astype(np.float32),
        up=up.astype(np.float32),
        fwd=d.astype(np.float32),
        f=f,
        near=float(near),
        far=float(far),
    )


def bake_shadow_pack(
    d3,
    d3_op,
    lights: dict,
    cast_rows,
    sun_dir=None,
    *,
    res: int = 128,
    sun_res: int = 256,
    with_trans: bool = False,
    trans_steps: int = 2,
    max_shadow_distance: float = 50.0,
    bias: float = 0.05,
    bounds=None,
):
    """Render every shadow map and pack them into one lane-aligned table.

    d3 / d3_op: packed static batch dicts (device or numpy arrays with
    pos/uv/nrm/valid keys). lights: the SoA dict from pack_lights (numpy).
    cast_rows: light rows that get cube maps (point/spot). sun_dir: world
    sun direction (None = no sun map).

    Returns (rows (S,128) f32 jnp array, params (40,) np.float32,
    spec) where spec is the STATIC layout tuple
    (sun_entry, cube_entries):
      sun_entry    = (base_texel, sun_res, trans_base|-1, trans_steps) or None
      cube_entries = ((light_row, base_texel, res, trans_base|-1,
                       trans_steps), ...)
    Base offsets are flat texel indices, multiples of 128. The trans
    region holds `trans_steps` depth-peeled layers, laid out k-major as
    [k0 depth, k0 alpha, k1 depth, k1 alpha, ...] with one map-sized
    plane each (map size = sun_res² / 6*res²), face-major inside a plane
    so `flat - base` indexes every plane directly.
    """
    pos, uv, nrm, valid = d3["pos"], d3["uv"], d3["nrm"], d3["valid"]
    has_op = with_trans and d3_op is not None and bool(
        np.asarray(d3_op["valid"]).any()
    )

    if bounds is None:
        bounds = scene_bounds(np.asarray(pos), np.asarray(valid))
    center, radius = bounds

    maps = []  # list of (res*res,)-multiple flat f32 jnp arrays
    offset = 0

    def push(flat):
        nonlocal offset
        base = offset
        maps.append(flat)
        offset += flat.shape[0]
        return base

    positions = np.asarray(lights["position"])
    ends = np.asarray(lights["end"])

    sun_entry = None
    params = np.zeros(40, np.float32)
    params[0] = max_shadow_distance
    params[1] = bias
    if sun_dir is not None:
        view, proj, sp = sun_camera(sun_dir, center, radius)
        a, b = depth_const(sp["near"], sp["far"])
        depth = _depth_face(pos, uv, nrm, valid, view, proj, a, b, sun_res)
        sun_base = push(depth.reshape(-1))
        sun_trans_base = -1
        if has_op:
            trans = _trans_face(
                d3_op["pos"], d3_op["uv"], d3_op["nrm"], d3_op["valid"],
                jnp.asarray(d3_op["opacity"], jnp.float32),
                view, proj, a, b, sun_res, trans_steps,
            )
            sun_trans_base = push(trans.reshape(-1))
        sun_entry = (sun_base, sun_res, sun_trans_base, trans_steps)
        params[2:5] = sp["pos"]
        params[5:8] = sp["right"]
        params[8:11] = sp["up"]
        params[11:14] = sp["fwd"]
        params[14] = sp["f"]
        params[15] = sp["near"]

    cube_entries = []
    for li in cast_rows:
        far = float(max(ends[li], SHADOW_NEAR * 2.0))
        a, b = depth_const(SHADOW_NEAR, far)
        proj = perspective_fov_rh_zo(np.pi / 2.0, 1.0, 1.0, SHADOW_NEAR, far)
        faces = []
        tfaces = []
        for face in range(6):
            view = face_view_matrix(positions[li], face)
            faces.append(
                _depth_face(pos, uv, nrm, valid, view, proj, a, b, res)
            )
            if has_op:
                tfaces.append(
                    _trans_face(
                        d3_op["pos"], d3_op["uv"], d3_op["nrm"],
                        d3_op["valid"],
                        jnp.asarray(d3_op["opacity"], jnp.float32),
                        view, proj, a, b, res, trans_steps,
                    )
                )
        base = push(jnp.stack(faces).reshape(-1))
        # (steps, 2, 6, res, res): k-major, kind (depth/alpha), face —
        # reshape(-1) yields the documented plane layout
        tbase = (
            push(jnp.stack(tfaces, axis=2).reshape(-1)) if has_op else -1
        )
        cube_entries.append((int(li), base, res, tbase, trans_steps))

    if not maps:
        rows = jnp.full((1, 128), NO_OCCLUDER, jnp.float32)
        return rows, params, (None, ())

    flat = jnp.concatenate(maps)
    pad = (-flat.shape[0]) % 128
    if pad:
        flat = jnp.pad(flat, (0, pad), constant_values=NO_OCCLUDER)
    rows = flat.reshape(-1, 128)
    return rows, params, (sun_entry, tuple(cube_entries))


def bake_shadow_cams(lights, spec, sun_dir=None, bounds=None):
    """(n_entries, 8, 4, 4) f32 camera pack for the per-frame DYNAMIC
    caster composite (composite_dynamic_depth below) — rebuilt from the
    same inputs bake_shadow_pack used, so the dynamic layer renders with
    bit-identical cameras to the cached static maps.

    Entry order mirrors the spec walk (sun first if present, then cube
    entries). Sun rows: [view, proj, consts, 0...]; cube rows:
    [view0..view5, proj, consts]; consts[0, :2] = the (A, B) depth
    constants. Returns None when the spec is empty."""
    sun_entry, cube_entries = spec
    n = (1 if sun_entry is not None else 0) + len(cube_entries)
    if n == 0:
        return None
    cams = np.zeros((n, 8, 4, 4), np.float32)
    ei = 0
    if sun_entry is not None:
        center, radius = bounds
        view, proj, sp = sun_camera(sun_dir, center, radius)
        a, b = depth_const(sp["near"], sp["far"])
        cams[0, 0] = view
        cams[0, 1] = proj
        cams[0, 2, 0, 0] = a
        cams[0, 2, 0, 1] = b
        ei = 1
    positions = np.asarray(lights["position"])
    ends = np.asarray(lights["end"])
    for li, _base, _res, _tb, _st in cube_entries:
        far = float(max(ends[li], SHADOW_NEAR * 2.0))
        a, b = depth_const(SHADOW_NEAR, far)
        proj = perspective_fov_rh_zo(np.pi / 2.0, 1.0, 1.0, SHADOW_NEAR, far)
        for face in range(6):
            cams[ei, face] = face_view_matrix(positions[li], face)
        cams[ei, 6] = proj
        cams[ei, 7, 0, 0] = a
        cams[ei, 7, 0, 1] = b
        ei += 1
    return cams


def composite_dynamic_depth(rows_flat, spec, cams, pos, uv, nrm, valid):
    """Min-composite the per-frame DYNAMIC pack's depth into every baked
    shadow map — dynamic geometry casts shadows like the static world.

    The reference's shadow trace goes through trace_shadow_unified ->
    trace_billboards, so entities/items occlude light exactly like static
    geometry (3d_shader.wgsl:436-460, 297-327). Here the cached static
    maps stay cached; only the (small) dynamic pack re-renders per frame
    through the SAME _depth_face camera/visibility path, and an
    elementwise min folds it in (a closer occluder wins either way).
    Dead dyn slots produce no coverage, so an idle frame is a no-op.

    Documented divergence: dynamic TRANSPARENT batches do not attenuate
    (the transmittance maps stay static-only) — they occlude fully if
    packed opaque, not at all if packed transparent.

    rows_flat: the flattened (S*128,) table; spec/cams from
    bake_shadow_pack/bake_shadow_cams; pos/uv/nrm/valid: the dynamic d3
    pack. Returns the composited flat table."""
    sun_entry, cube_entries = spec
    ei = 0
    if sun_entry is not None:
        base, res, _tb, _st = sun_entry
        d = _depth_face(
            pos, uv, nrm, valid, cams[0, 0], cams[0, 1],
            cams[0, 2, 0, 0], cams[0, 2, 0, 1], res,
        )
        rows_flat = rows_flat.at[base : base + res * res].min(d.reshape(-1))
        ei = 1
    for _li, base, res, _tb, _st in cube_entries:
        proj = cams[ei, 6]
        a = cams[ei, 7, 0, 0]
        b = cams[ei, 7, 0, 1]
        for face in range(6):
            d = _depth_face(
                pos, uv, nrm, valid, cams[ei, face], proj, a, b, res
            )
            off = base + face * res * res
            rows_flat = rows_flat.at[off : off + res * res].min(
                d.reshape(-1)
            )
        ei += 1
    return rows_flat


# ---------------------------------------------------------------------------
# lookup side (XLA / numpy-oracle formulation; the megakernel mirrors this
# with in-tile lane gathers — tests assert all three agree bit-for-bit)
# ---------------------------------------------------------------------------


def cube_face_uv(tpx, tpy, tpz, xp=jnp):
    """Analytic cube mapping: (face, u_num, v_num, ma) for direction
    tp = P - light_pos. Exact inverse of FACE_BASES (ties break x > y > z,
    positive before negative — a seam texel reads the neighbouring face's
    depth, which bounds the same occluders)."""
    ax, ay, az = xp.abs(tpx), xp.abs(tpy), xp.abs(tpz)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    ma = xp.maximum(ax, xp.maximum(ay, az))
    sgn_x = xp.where(tpx >= 0, 1.0, -1.0)
    sgn_y = xp.where(tpy >= 0, 1.0, -1.0)
    sgn_z = xp.where(tpz >= 0, 1.0, -1.0)
    u_num = xp.where(
        is_x, -sgn_x * tpz, xp.where(is_y, tpx, -sgn_z * tpx)
    )
    v_num = xp.where(is_x, tpy, xp.where(is_y, -sgn_y * tpz, tpy))
    face = xp.where(
        is_x,
        xp.where(tpx < 0, 1, 0),
        xp.where(is_y, xp.where(tpy < 0, 3, 2), xp.where(tpz < 0, 5, 4)),
    )
    return face, u_num, v_num, ma


def cube_shadow_texel(tpx, tpy, tpz, base: int, res: int, xp=jnp):
    """Flat texel index + compare distance for a cube lookup."""
    face, u_num, v_num, ma = cube_face_uv(tpx, tpy, tpz, xp)
    ma_safe = xp.maximum(ma, 1e-20)
    half = res * 0.5
    sx = xp.clip(xp.floor(u_num / ma_safe * half + half), 0, res - 1)
    sy = xp.clip(xp.floor(-v_num / ma_safe * half + half), 0, res - 1)
    flat = (
        base
        + face.astype(xp.int32) * (res * res)
        + sy.astype(xp.int32) * res
        + sx.astype(xp.int32)
    )
    return flat, ma


def sun_shadow_texel(wx, wy, wz, params, base: int, res: int, xp=jnp):
    """Flat texel index + compare distance + in-range mask for the sun map.

    params: the (40,) array from bake_shadow_pack (slots 2..16)."""
    dx = wx - params[2]
    dy = wy - params[3]
    dz = wz - params[4]
    vx = dx * params[5] + dy * params[6] + dz * params[7]
    vy = dx * params[8] + dy * params[9] + dz * params[10]
    vz = dx * params[11] + dy * params[12] + dz * params[13]
    f = params[14]
    vz_safe = xp.maximum(vz, 1e-20)
    half = res * 0.5
    sx = xp.floor(f * vx / vz_safe * half + half)
    sy = xp.floor(-f * vy / vz_safe * half + half)
    in_range = (
        (vz > params[15]) & (sx >= 0) & (sx < res) & (sy >= 0) & (sy < res)
    )
    sxc = xp.clip(sx, 0, res - 1)
    syc = xp.clip(sy, 0, res - 1)
    flat = base + syc.astype(xp.int32) * res + sxc.astype(xp.int32)
    return flat, vz, in_range


#: normal-offset strength in TEXELS of the shadow map — the receiver moves
#: along its shading normal by K * projected-texel-footprint before the
#: lookup, which kills self-shadow acne at grazing light angles (the
#: reference's ray tracer starts its shadow ray at hit + normal*0.01,
#: 3d_shader.wgsl:463 `ray_origin = hit_pos + normal * 0.01` — a fixed
#: offset is enough for rays; a rasterized map needs the footprint term)
NORMAL_OFFSET_TEXELS = 2.0


def shadow_factor_xla(
    rows_flat, params, spec_entry, wx, wy, wz, nx, ny, nz, lpos=None
):
    """Shadow factor in [0,1] for every pixel — XLA formulation.

    rows_flat: the (S*128,) flattened table. spec_entry: a cube entry
    (li, base, res, tbase, steps) with lpos = light position (3,), or the
    sun entry (base, res, tbase, steps) with lpos=None. nx/ny/nz: the
    shading normal (zeros allowed: no offset). The megakernel mirrors this
    expression order exactly (tests/test_shadow.py asserts both agree).

    Transparency: `steps` depth-peeled layers attenuate the factor by
    (1 - alpha) — but ONLY layers strictly between the light and the
    receiver and within the max_shadow_distance cap, the reference's
    trace_shadow stepping semantics (3d_shader.wgsl:479-515)."""
    msd = params[0]
    bias = params[1]
    if lpos is None:
        base, res, tbase, steps = spec_entry
        # texel footprint at the receiver: depth * 2 / (f * res)
        dx = wx - params[2]
        dy = wy - params[3]
        dz = wz - params[4]
        vz0 = dx * params[11] + dy * params[12] + dz * params[13]
        offs = bias + jnp.maximum(vz0, 0.0) * (
            2.0 * NORMAL_OFFSET_TEXELS / (params[14] * res)
        )
        flat, d, in_range = sun_shadow_texel(
            wx + nx * offs, wy + ny * offs, wz + nz * offs, params, base, res
        )
        stored = jnp.take(rows_flat, flat)
        blocked = in_range & (stored < d - bias) & (d - stored <= msd)
        in_map = in_range
        msize = res * res
    else:
        _li, base, res, tbase, steps = spec_entry
        tpx = wx - lpos[0]
        tpy = wy - lpos[1]
        tpz = wz - lpos[2]
        # cube texel footprint: ma * 2 / res (f == 1 at 90° faces)
        ma0 = jnp.maximum(
            jnp.abs(tpx), jnp.maximum(jnp.abs(tpy), jnp.abs(tpz))
        )
        offs = bias + ma0 * (2.0 * NORMAL_OFFSET_TEXELS / res)
        flat, d = cube_shadow_texel(
            tpx + nx * offs, tpy + ny * offs, tpz + nz * offs, base, res
        )
        stored = jnp.take(rows_flat, flat)
        blocked = (stored < d - bias) & (d - stored <= msd)
        in_map = True
        msize = 6 * res * res
    factor = jnp.where(blocked, 0.0, 1.0)
    if tbase >= 0:
        rel = flat - base
        for k in range(steps):
            dk = jnp.take(rows_flat, tbase + (2 * k) * msize + rel)
            ak = jnp.take(rows_flat, tbase + (2 * k + 1) * msize + rel)
            between = in_map & (dk < d - bias) & (d - dk <= msd)
            factor = factor * jnp.where(between, 1.0 - ak, 1.0)
    return factor
