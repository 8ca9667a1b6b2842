"""GGX importance-sampled reflections: a deferred ray pass over the frame.

The reference's live game path spawns `reflection_samples` GGX PBR
reflection rays per pixel inside its SceneVM compute shader
(embedded/shader/3d_shader.wgsl:764-826: sample_ggx half-vector, trace,
shade the hit with pbr_lighting, Fresnel-weighted accumulate), driven by
the RenderSettings `reflection_samples` knob and range-capped by
`max_sky_distance` (gp6.y — the same cap its sky-visibility rays use,
3d_shader.wgsl:772). Uniform packing: src/render_settings.rs:423-429.

TPU realization: the rasterizer stays a rasterizer — this pass runs AFTER
visibility, reconstructs the G-buffer from the winning triangles
(ops.shade.gbuffer_pass — recompute-over-store), then traces the
reflection rays wavefront-style with the tracer's lane-major SoA
Möller-Trumbore (see tracer/tracer.py intersect_all: (P,) component
arrays, chunked scan with per-chunk AABB slab gating — (P,3) AoS vectors
measured 18x slower on the VPU). Randomness is the WGSL's own hash33
(3d_shader.wgsl:35-39), so frames are deterministic functions of the
scene exactly like the reference's.

Divergences (documented intent):
  * the reference's build_onb degenerates (normalize of a zero cross) for
    normals exactly parallel to its up-pick (walls facing +-Z with
    |N.y| <= 0.999, 3d_shader.wgsl:51-57); the tangent pick here is
    robust. Only the sampling frame's azimuth differs — the GGX
    distribution is isotropic around N.
  * reflection hits shade with the same sun/light set as primaries but
    skip the hit-side shadow ray the WGSL nests inside pbr_lighting
    (one-bounce radiance cache behavior); primaries keep their shadow
    maps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.color import srgb_to_linear_fast
from .shade import (
    _normalize,
    light_radiance,
    resolve_texel,
    shade_brdf_ggx,
    take_iso,
)

#: triangles per Möller-Trumbore chunk (matches tracer.TRACER_CHUNK scale)
REFLECT_CHUNK = 512


def _hash33(px, py, pz):
    """WGSL hash33 (3d_shader.wgsl:35-39), component form.

    Returns two decorrelated uniforms in [0,1) per input point (the
    reference consumes rand.x / rand.y the same way)."""
    hx = px * 0.1031
    hy = py * 0.1030
    hz = pz * 0.0973
    hx = hx - jnp.floor(hx)
    hy = hy - jnp.floor(hy)
    hz = hz - jnp.floor(hz)
    d = hx * (hy + 33.33) + hy * (hx + 33.33) + hz * (hz + 33.33)
    hx = hx + d
    hy = hy + d
    hz = hz + d
    o1 = (hx + hy) * hz
    o2 = (hx + hx) * hy
    return o1 - jnp.floor(o1), o2 - jnp.floor(o2)


def intersect_rays(pos, valid, ox, oy, oz, dx, dy, dz, t_max):
    """Möller-Trumbore of (P,) rays against all scene triangles.

    pos: (T,3,4) world-space vertices (the raster d3 pack); valid: (T,).
    Chunked lax.scan carrying only (best_t, best_i); per-chunk AABBs are
    computed on the fly and slab-gate whole chunks wavefront-style
    (tracer/tracer.py intersect_all — the TPU analogue of a 2-level BVH).
    Returns (t, tri_index) with tri_index -1 for misses/over-range."""
    t_ax, t_ay, t_az = pos[:, 0, 0], pos[:, 0, 1], pos[:, 0, 2]
    t_e1x = pos[:, 1, 0] - t_ax
    t_e1y = pos[:, 1, 1] - t_ay
    t_e1z = pos[:, 1, 2] - t_az
    t_e2x = pos[:, 2, 0] - t_ax
    t_e2y = pos[:, 2, 1] - t_ay
    t_e2z = pos[:, 2, 2] - t_az
    tri_valid = valid > 0.5

    tcount = t_ax.shape[0]
    chunk = min(REFLECT_CHUNK, tcount)
    nchunks = (tcount + chunk - 1) // chunk
    pad = nchunks * chunk - tcount
    if pad:
        t_ax = jnp.pad(t_ax, (0, pad))
        t_ay = jnp.pad(t_ay, (0, pad))
        t_az = jnp.pad(t_az, (0, pad))
        t_e1x = jnp.pad(t_e1x, (0, pad))
        t_e1y = jnp.pad(t_e1y, (0, pad))
        t_e1z = jnp.pad(t_e1z, (0, pad))
        t_e2x = jnp.pad(t_e2x, (0, pad))
        t_e2y = jnp.pad(t_e2y, (0, pad))
        t_e2z = jnp.pad(t_e2z, (0, pad))
        tri_valid = jnp.pad(tri_valid, (0, pad))

    # per-chunk AABBs over the valid triangles (dead tris collapse to an
    # impossible box): one (T,) pass, hoisted out of the ray scan by jit
    vx0 = jnp.minimum(jnp.minimum(t_ax, t_ax + t_e1x), t_ax + t_e2x)
    vy0 = jnp.minimum(jnp.minimum(t_ay, t_ay + t_e1y), t_ay + t_e2y)
    vz0 = jnp.minimum(jnp.minimum(t_az, t_az + t_e1z), t_az + t_e2z)
    vx1 = jnp.maximum(jnp.maximum(t_ax, t_ax + t_e1x), t_ax + t_e2x)
    vy1 = jnp.maximum(jnp.maximum(t_ay, t_ay + t_e1y), t_ay + t_e2y)
    vz1 = jnp.maximum(jnp.maximum(t_az, t_az + t_e1z), t_az + t_e2z)
    big = jnp.float32(1e30)
    vx0 = jnp.where(tri_valid, vx0, big).reshape(nchunks, chunk).min(axis=1)
    vy0 = jnp.where(tri_valid, vy0, big).reshape(nchunks, chunk).min(axis=1)
    vz0 = jnp.where(tri_valid, vz0, big).reshape(nchunks, chunk).min(axis=1)
    vx1 = jnp.where(tri_valid, vx1, -big).reshape(nchunks, chunk).max(axis=1)
    vy1 = jnp.where(tri_valid, vy1, -big).reshape(nchunks, chunk).max(axis=1)
    vz1 = jnp.where(tri_valid, vz1, -big).reshape(nchunks, chunk).max(axis=1)

    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, 1e-20, dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, 1e-20, dz)

    def _mt_chunk(carry, ci):
        best_t, best_i = carry
        s = ci * chunk

        def row(arr):
            return jax.lax.dynamic_slice(arr, (s,), (chunk,))[None, :]

        ax_, ay_, az_ = row(t_ax), row(t_ay), row(t_az)
        e1x, e1y, e1z = row(t_e1x), row(t_e1y), row(t_e1z)
        e2x, e2y, e2z = row(t_e2x), row(t_e2y), row(t_e2z)
        vmask = jax.lax.dynamic_slice(tri_valid, (s,), (chunk,))

        dxc, dyc, dzc = dx[:, None], dy[:, None], dz[:, None]
        hx = dyc * e2z - dzc * e2y
        hy = dzc * e2x - dxc * e2z
        hz = dxc * e2y - dyc * e2x
        det = e1x * hx + e1y * hy + e1z * hz
        ok = (jnp.abs(det) >= 1e-6) & vmask[None, :]
        f = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        svx = ox[:, None] - ax_
        svy = oy[:, None] - ay_
        svz = oz[:, None] - az_
        uu = f * (svx * hx + svy * hy + svz * hz)
        ok &= (uu >= 0.0) & (uu <= 1.0)
        qx = svy * e1z - svz * e1y
        qy = svz * e1x - svx * e1z
        qz = svx * e1y - svy * e1x
        vv = f * (dxc * qx + dyc * qy + dzc * qz)
        ok &= (vv >= 0.0) & (uu + vv <= 1.0)
        tt = f * (e2x * qx + e2y * qy + e2z * qz)
        ok &= (tt > 1e-4) & (tt < t_max)
        tt = jnp.where(ok, tt, jnp.inf)
        local = jnp.argmin(tt, axis=-1)
        tmin = jnp.min(tt, axis=-1)
        better = tmin < best_t
        best_t = jnp.where(better, tmin, best_t)
        best_i = jnp.where(better, s + local, best_i)
        return (best_t, best_i)

    def step(carry, ci):
        best_t = carry[0]
        t0x = (vx0[ci] - ox) * inv_dx
        t1x = (vx1[ci] - ox) * inv_dx
        t0y = (vy0[ci] - oy) * inv_dy
        t1y = (vy1[ci] - oy) * inv_dy
        t0z = (vz0[ci] - oz) * inv_dz
        t1z = (vz1[ci] - oz) * inv_dz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        enters = (tfar >= jnp.maximum(tnear, 0.0)) & (tnear < best_t)
        return (
            jax.lax.cond(
                jnp.any(enters), lambda c: _mt_chunk(c, ci), lambda c: c, carry
            ),
            None,
        )

    p = ox.shape[0]
    init = (jnp.full((p,), jnp.inf), jnp.full((p,), -1, jnp.int32))
    (bt, bi), _ = jax.lax.scan(step, init, jnp.arange(nchunks, dtype=jnp.int32))
    return bt, bi


def _shade_reflection_hits(
    t, tri, ox, oy, oz, dx, dy, dz, d3, atlas, lights, uniforms,
    sample_mode: int, sky_rgb,
):
    """Radiance arriving along each reflection ray -> (H,W,3) linear.

    Hits shade like the WGSL's reflection branch (3d_shader.wgsl:797-815):
    fullbright surfaces return their raw texel (the reference's
    emissive-billboard `albedo*2` analogue for its emissive>0.99 class),
    everything else gets Cook-Torrance direct light (sun + point lights)
    plus the uniform ambient; misses return the sky color.

    All per-triangle attributes ride ONE fused row-gather (31 columns) —
    ~30 separate (P,) element gathers measured ~8ns/element each, i.e.
    hundreds of ms at 1080p (the same lesson as shade_pass's fused
    meta gather); shapes stay (H,W) so the trailing 3-axis helpers tile
    the VPU lanes like the shade pass does (a flat (P,3) layout puts the
    3-axis on the 128-lane minor dim — the tracer's measured 18x AoS
    penalty)."""
    hit = tri >= 0
    ti = jnp.maximum(tri, 0)
    pos = d3["pos"]

    # fused per-tri table: vertex A (3) | e1 (3) | e2 (3) | uv a/b/c (6) |
    # nrm a/b/c (9) | has_n | kind | tex_slot | rgba (4) | repeat |
    # receives_light | rough | metal  == 31 cols
    ax_, ay_, az_ = pos[:, 0, 0], pos[:, 0, 1], pos[:, 0, 2]
    cols = [
        ax_, ay_, az_,
        pos[:, 1, 0] - ax_, pos[:, 1, 1] - ay_, pos[:, 1, 2] - az_,
        pos[:, 2, 0] - ax_, pos[:, 2, 1] - ay_, pos[:, 2, 2] - az_,
        d3["uv"][:, 0, 0], d3["uv"][:, 1, 0], d3["uv"][:, 2, 0],
        d3["uv"][:, 0, 1], d3["uv"][:, 1, 1], d3["uv"][:, 2, 1],
        d3["nrm"][:, 0, 0], d3["nrm"][:, 1, 0], d3["nrm"][:, 2, 0],
        d3["nrm"][:, 0, 1], d3["nrm"][:, 1, 1], d3["nrm"][:, 2, 1],
        d3["nrm"][:, 0, 2], d3["nrm"][:, 1, 2], d3["nrm"][:, 2, 2],
        d3["has_normals"],
        d3["kind"].astype(jnp.float32),
        d3["tex_slot"].astype(jnp.float32),
        d3["rgba"][:, 0], d3["rgba"][:, 1], d3["rgba"][:, 2], d3["rgba"][:, 3],
        d3["repeat"].astype(jnp.float32),
        d3["receives_light"],
        d3["rough"], d3["metal"],
    ]
    fused = jnp.stack(cols, axis=1)  # (T, 35)
    g = take_iso(fused, ti)  # (H,W,35)

    w_ax, w_ay, w_az = g[..., 0], g[..., 1], g[..., 2]
    w_e1x, w_e1y, w_e1z = g[..., 3], g[..., 4], g[..., 5]
    w_e2x, w_e2y, w_e2z = g[..., 6], g[..., 7], g[..., 8]

    # winner u/v: single-triangle MT per ray on the gathered components
    whx = dy * w_e2z - dz * w_e2y
    why = dz * w_e2x - dx * w_e2z
    whz = dx * w_e2y - dy * w_e2x
    wdet = w_e1x * whx + w_e1y * why + w_e1z * whz
    wf = jnp.where(
        jnp.abs(wdet) >= 1e-6,
        1.0 / jnp.where(wdet == 0.0, 1.0, wdet),
        0.0,
    )
    wsx, wsy, wsz = ox - w_ax, oy - w_ay, oz - w_az
    uu = wf * (wsx * whx + wsy * why + wsz * whz)
    wqx = wsy * w_e1z - wsz * w_e1y
    wqy = wsz * w_e1x - wsx * w_e1z
    wqz = wsx * w_e1y - wsy * w_e1x
    vv = wf * (dx * wqx + dy * wqy + dz * wqz)
    w0 = 1.0 - uu - vv

    uv_u = g[..., 9] * w0 + g[..., 10] * uu + g[..., 11] * vv
    uv_v = g[..., 12] * w0 + g[..., 13] * uu + g[..., 14] * vv

    # shading normal: interpolated when present, geometric otherwise;
    # face the incoming ray
    has_n = g[..., 24] > 0.5
    nx = jnp.where(
        has_n,
        g[..., 15] * w0 + g[..., 16] * uu + g[..., 17] * vv,
        w_e1y * w_e2z - w_e1z * w_e2y,
    )
    ny = jnp.where(
        has_n,
        g[..., 18] * w0 + g[..., 19] * uu + g[..., 20] * vv,
        w_e1z * w_e2x - w_e1x * w_e2z,
    )
    nz = jnp.where(
        has_n,
        g[..., 21] * w0 + g[..., 22] * uu + g[..., 23] * vv,
        w_e1x * w_e2y - w_e1y * w_e2x,
    )
    inv_nl = 1.0 / jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-20)
    nx, ny, nz = nx * inv_nl, ny * inv_nl, nz * inv_nl
    flip = jnp.where(nx * dx + ny * dy + nz * dz > 0.0, -1.0, 1.0)
    nx, ny, nz = nx * flip, ny * flip, nz * flip

    texel = resolve_texel(
        g[..., 25].astype(jnp.int32), g[..., 26].astype(jnp.int32),
        g[..., 27:31], g[..., 31].astype(jnp.int32),
        uv_u, uv_v, atlas, uniforms["anim_frame"], sample_mode,
    )
    albedo = srgb_to_linear_fast(texel[..., :3])

    world = jnp.stack([ox + dx * t, oy + dy * t, oz + dz * t], axis=-1)
    normal = jnp.stack([nx, ny, nz], axis=-1)
    vdir = jnp.stack([-dx, -dy, -dz], axis=-1)

    rough = jnp.clip(g[..., 33], 0.0, 1.0)
    metal = jnp.clip(g[..., 34], 0.0, 1.0)

    # sun (same radiance chain as shade_pass)
    sun_radiance = uniforms["day_factor"] * uniforms.get(
        "sun_color", jnp.ones(3, jnp.float32)
    )
    lit = shade_brdf_ggx(
        albedo, rough, metal, jnp.zeros_like(albedo), normal, vdir,
        _normalize(-uniforms["sun_dir"])[None, None, :] * jnp.ones_like(world),
        sun_radiance, spec_ndotl=True,
    )
    lit = jnp.where(uniforms["has_sun"] > 0.5, lit, 0.0)

    # point/spot/area lights
    radiance = light_radiance(lights, world, normal)  # (H,W,L,3)
    ldir = _normalize(lights["position"] - world[..., None, :])
    contrib = shade_brdf_ggx(
        albedo[..., None, :], rough[..., None], metal[..., None],
        jnp.zeros_like(albedo[..., None, :]), normal[..., None, :],
        vdir[..., None, :], ldir, radiance, spec_ndotl=True,
    )
    has_rad = jnp.any(radiance != 0.0, axis=-1, keepdims=True)
    lit = lit + jnp.sum(jnp.where(has_rad, contrib, 0.0), axis=-2)

    # uniform ambient on the hit (WGSL refl_ambient; the raster's ambient
    # uniform already carries ambient_color * strength)
    amb = uniforms["ambient"][:3] * uniforms["has_ambient"]
    lit = lit + amb[None, None, :] * albedo

    # fullbright hits: raw texel, the reference's emissive-class shortcut
    fullbright = g[..., 32] < 0.5
    lit = jnp.where(fullbright[..., None], albedo, lit)

    return jnp.where(hit[..., None], lit, sky_rgb[None, None, :])


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sample_mode", "samples",
                     "has_blend", "has_material", "has_matmap", "shaders"),
)
def reflection_pass(
    z, idx, hit, attr_planes, tri_id, d3, atlas, lights, uniforms,
    width: int, height: int, sample_mode: int = 0, samples: int = 1,
    shaders: tuple = (), has_blend: bool = False,
    has_material: bool = False, has_matmap: bool = False,
):
    """GGX reflection radiance for every covered pixel -> (H,W,3) linear
    plus a (H,W) applied-mask (pixels whose samples all faced away keep 0).

    The sample loop is a static Python unroll (`samples` is tiny and the
    reference's loop is equally static per dispatch); each sample hashes
    its own WGSL-hash33 uniforms, importance-samples the GGX half-vector
    around the pixel normal, reflects the view ray, traces it against the
    full scene, shades the hit, and Fresnel-weights the accumulate
    (3d_shader.wgsl:764-826). Range cap: uniforms["refl_dist"]
    (max_sky_distance — the same gp6.y the WGSL uses).

    Everything stays (H,W)-shaped: component math on 2D fields tiles the
    VPU like the shade pass; only the Möller-Trumbore wavefront flattens
    to (P,) for its (P, chunk) scan."""
    from .shade import gbuffer_pass

    g = gbuffer_pass(
        z, idx, hit, attr_planes, tri_id, d3, atlas, uniforms, width,
        height, sample_mode, 0, height, shaders, has_blend, has_material,
        has_matmap,
    )
    world = g["world"]
    normal = g["normal"]
    vdir = g["view_dir"]
    base = g["base"]
    rough = jnp.clip(g["roughness"], 0.045, 1.0)
    metal = g["metallic"]
    live = (
        hit
        & (jnp.sum(normal * normal, axis=-1) > 0.5)
        & ~g["fullbright"]
    )

    nxg, nyg, nzg = normal[..., 0], normal[..., 1], normal[..., 2]
    vx, vy, vz = vdir[..., 0], vdir[..., 1], vdir[..., 2]
    wx, wy, wz = world[..., 0], world[..., 1], world[..., 2]

    # robust ONB around N (see module docstring for the build_onb note)
    picky = jnp.abs(nyg) < 0.9
    upx = jnp.where(picky, 0.0, 1.0)
    upy = jnp.where(picky, 1.0, 0.0)
    tx = upy * nzg
    ty = -upx * nzg
    tz = upx * nyg - upy * nxg
    inv_tl = 1.0 / jnp.maximum(jnp.sqrt(tx * tx + ty * ty + tz * tz), 1e-20)
    tx, ty, tz = tx * inv_tl, ty * inv_tl, tz * inv_tl
    bx = nyg * tz - nzg * ty
    by = nzg * tx - nxg * tz
    bz = nxg * ty - nyg * tx

    f0 = 0.04 + (base - 0.04) * metal[..., None]
    a_r = rough * rough
    a2 = a_r * a_r

    xs = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.float32)[None, :], (height, width)
    )
    ys = jnp.broadcast_to(
        jnp.arange(height, dtype=jnp.float32)[:, None], (height, width)
    )

    max_dist = uniforms["refl_dist"]
    sky_rgb = uniforms["refl_sky"]

    # parked dead rays: collapse to one point with a down-facing ray so the
    # chunk AABB gates skip them wherever geometry allows
    o_x = jnp.where(live, wx + nxg * 0.01, 1e8)
    o_y = jnp.where(live, wy + nyg * 0.01, 1e8)
    o_z = jnp.where(live, wz + nzg * 0.01, 1e8)

    p = width * height
    accum = jnp.zeros((height, width, 3), jnp.float32)
    wsum = jnp.zeros((height, width), jnp.float32)
    for s in range(samples):
        u1, u2 = _hash33(
            wx + (xs * 0.5 + s), wy + ys * 0.5, wz + s * 7.31
        )
        # sample_ggx (3d_shader.wgsl:61-74): tangent-space half vector
        phi = (2.0 * jnp.pi) * u1
        cos_t = jnp.sqrt((1.0 - u2) / (1.0 + (a2 - 1.0) * u2))
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        hx_t = jnp.cos(phi) * sin_t
        hy_t = jnp.sin(phi) * sin_t
        hhx = tx * hx_t + bx * hy_t + nxg * cos_t
        hhy = ty * hx_t + by * hy_t + nyg * cos_t
        hhz = tz * hx_t + bz * hy_t + nzg * cos_t
        # L = reflect(-V, H) = 2 (V.H) H - V
        vdh = vx * hhx + vy * hhy + vz * hhz
        lx = 2.0 * vdh * hhx - vx
        ly = 2.0 * vdh * hhy - vy
        lz = 2.0 * vdh * hhz - vz
        ndl = jnp.maximum(nxg * lx + nyg * ly + nzg * lz, 0.0)
        ok = live & (ndl > 0.0)

        d_x = jnp.where(ok, lx, 0.0)
        d_y = jnp.where(ok, ly, -1.0)
        d_z = jnp.where(ok, lz, 0.0)
        t, tri = intersect_rays(
            d3["pos"], d3["valid"],
            o_x.reshape(p), o_y.reshape(p), o_z.reshape(p),
            d_x.reshape(p), d_y.reshape(p), d_z.reshape(p), max_dist,
        )
        t = t.reshape(height, width)
        tri = jnp.where(ok, tri.reshape(height, width), -1)
        color = _shade_reflection_hits(
            t, tri, o_x, o_y, o_z, d_x, d_y, d_z, d3, atlas, lights,
            uniforms, sample_mode, sky_rgb,
        )
        x5 = jnp.clip(1.0 - jnp.maximum(vdh, 0.0), 0.0, 1.0) ** 5
        fres = f0 + (1.0 - f0) * x5[..., None]
        w = jnp.where(ok, ndl, 0.0)
        accum = accum + color * fres * w[..., None]
        wsum = wsum + w

    refl = jnp.where(
        (wsum > 0.0)[..., None],
        accum / jnp.maximum(wsum, 1e-20)[..., None],
        0.0,
    )
    return refl, wsum > 0.0


def apply_reflections(frame_rgba_f32, refl, rmask):
    """Composite reflection radiance onto an already-encoded opaque frame.

    The frame is sRGB-encoded f32 (the megakernel/compose output); decode,
    add the linear reflection term, re-encode — only on pixels the pass
    actually touched, so untouched pixels keep their exact bytes (u8
    parity surfaces stay intact when reflections are off or miss)."""
    from ..utils.color import linear_to_srgb_fast

    rgb = frame_rgba_f32[..., :3]
    lin = srgb_to_linear_fast(rgb) + refl
    new = jnp.clip(linear_to_srgb_fast(lin), 0.0, 1.0)
    out = jnp.where(rmask[..., None], new, rgb)
    return jnp.concatenate([out, frame_rgba_f32[..., 3:]], axis=-1)
