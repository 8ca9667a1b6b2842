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
  * reflection hits sample the same BAKED shadow maps as primaries
    where the WGSL traces a fresh shadow ray per hit inside pbr_lighting
    (3d_shader.wgsl:578-580): identical occluder set, map-resolution
    depth quantization instead of exact ray hits.
  * the WGSL adds `refl_albedo * mat.emissive * 2.0` for LIT emissive
    hits (3d_shader.wgsl:812, emissive <= 0.99). Emissive here is a
    per-PIXEL matmap channel (no per-triangle scalar exists in the d3
    pack), so hit shading keeps only the fullbright>0.99-class shortcut
    (raw texel); partially-emissive matmap surfaces read as non-emissive
    in reflections.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.color import srgb_to_linear_fast
from .shade import _normalize, resolve_texel, take_iso

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


def intersect_rays(pos, valid, ox, oy, oz, dx, dy, dz, t_max,
                   live_ranges: tuple = None):
    """Möller-Trumbore of (P,) rays against all scene triangles.

    pos: (T,3,4) world-space vertices (the raster d3 pack); valid: (T,).
    Chunked lax.scan carrying only (best_t, best_i); per-chunk AABBs are
    computed on the fly and slab-gate whole chunks wavefront-style
    (tracer/tracer.py intersect_all — the TPU analogue of a 2-level BVH).
    Returns (t, tri_index) with tri_index -1 for misses/over-range.

    `live_ranges` (static (start, end) tuples in slot space): chunks fully
    outside every range are dropped from the scan STATICALLY — the pack's
    power-of-two padding is ~40% dead slots on typical scenes, and the
    wavefront AABB gate can't skip them for scattered (rough-surface GGX)
    rays where every chunk has some entering ray."""
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

    if live_ranges:
        chunk_ids = [
            ci for ci in range(nchunks)
            if any(ci * chunk < e and (ci + 1) * chunk > s0
                   for (s0, e) in live_ranges)
        ]
    else:
        chunk_ids = list(range(nchunks))
    p = ox.shape[0]
    init = (jnp.full((p,), jnp.inf), jnp.full((p,), -1, jnp.int32))
    (bt, bi), _ = jax.lax.scan(
        step, init, jnp.asarray(chunk_ids, dtype=jnp.int32)
    )
    return bt, bi


def _shade_reflection_hits(
    t, tri, ox, oy, oz, dx, dy, dz, d3, atlas, lights, uniforms,
    sample_mode: int, sky_rgb, shadow=None,
):
    """Radiance arriving along each reflection ray -> (H,W,3) linear.

    Hits shade like the WGSL's reflection branch (3d_shader.wgsl:797-815):
    fullbright surfaces return their raw texel (the reference's
    emissive-billboard `albedo*2` analogue for its emissive>0.99 class),
    everything else gets Cook-Torrance direct light (sun + point lights)
    plus the uniform ambient; misses return the sky color.

    All per-triangle attributes ride ONE fused row-gather (35 columns) —
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
    # receives_light | rough | metal  == 35 cols
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

    wxh = ox + dx * t
    wyh = oy + dy * t
    wzh = oz + dz * t
    vhx, vhy, vhz = -dx, -dy, -dz

    rough = jnp.clip(g[..., 33], 0.045, 1.0)
    metal = jnp.clip(g[..., 34], 0.0, 1.0)
    alb_r, alb_g, alb_b = albedo[..., 0], albedo[..., 1], albedo[..., 2]

    # Cook-Torrance at the hit, COMPONENT form with a static unroll over
    # the padded light rows: the (H,W,L,3) broadcast chain materializes
    # ~100 MB intermediates per op at 1080p and measured 33 ms for this
    # stage alone; the unrolled component chain is pure fused elementwise
    f0_r = 0.04 + (alb_r - 0.04) * metal
    f0_g = 0.04 + (alb_g - 0.04) * metal
    f0_b = 0.04 + (alb_b - 0.04) * metal
    a_h = rough * rough
    a2_h = a_h * a_h
    k_h = (rough + 1.0) * (rough + 1.0) * 0.125
    inv_pi = 0.31830988618379
    n_dot_v = jnp.maximum(nx * vhx + ny * vhy + nz * vhz, 0.0)
    gv = n_dot_v / (n_dot_v * (1.0 - k_h) + k_h + 1e-7)

    def ggx(ldx, ldy, ldz, rad_r, rad_g, rad_b, clamp_spec=False):
        # same chain as the megakernel brdf_ggx closure (pbr_lighting,
        # 3d_shader.wgsl:585-650), per-pixel roughness/metallic
        n_dot_l = jnp.maximum(nx * ldx + ny * ldy + nz * ldz, 0.0)
        hx = ldx + vhx
        hy = ldy + vhy
        hz = ldz + vhz
        hl = jnp.sqrt(hx * hx + hy * hy + hz * hz)
        inv_hl = 1.0 / jnp.maximum(hl, 1e-30)
        n_dot_h = jnp.maximum((nx * hx + ny * hy + nz * hz) * inv_hl, 0.0)
        denom_d = n_dot_h * n_dot_h * (a2_h - 1.0) + 1.0
        dist = a2_h / (3.14159265358979 * denom_d * denom_d + 1e-7)
        gl = n_dot_l / (n_dot_l * (1.0 - k_h) + k_h + 1e-7)
        spec = dist * gv * gl / (4.0 * n_dot_l * n_dot_v + 1e-7)
        h_dot_v = jnp.maximum((hx * vhx + hy * vhy + hz * vhz) * inv_hl, 0.0)
        x1 = 1.0 - jnp.clip(h_dot_v, 0.0, 1.0)
        x2 = x1 * x1
        x5 = x2 * x2 * x1
        fr = f0_r + (1.0 - f0_r) * x5
        fg = f0_g + (1.0 - f0_g) * x5
        fb = f0_b + (1.0 - f0_b) * x5
        dd = (1.0 - metal) * n_dot_l * inv_pi
        # Fresnel-weighted specular; point lights clamp it per component
        # to kill the grazing-angle explosion (3d_shader.wgsl:652
        # `specular = min(specular, vec3(1.0))` — the sun branch has no
        # such clamp, so it stays optional here)
        sp_r, sp_g, sp_b = fr * spec, fg * spec, fb * spec
        if clamp_spec:
            sp_r = jnp.minimum(sp_r, 1.0)
            sp_g = jnp.minimum(sp_g, 1.0)
            sp_b = jnp.minimum(sp_b, 1.0)
        dead = (n_dot_l <= 0.0) | (n_dot_v <= 0.0)
        return (
            jnp.where(
                dead, 0.0,
                ((1.0 - fr) * dd * alb_r + sp_r * n_dot_l) * rad_r,
            ),
            jnp.where(
                dead, 0.0,
                ((1.0 - fg) * dd * alb_g + sp_g * n_dot_l) * rad_g,
            ),
            jnp.where(
                dead, 0.0,
                ((1.0 - fb) * dd * alb_b + sp_b * n_dot_l) * rad_b,
            ),
        )

    # per-light geometry shadows at the HIT: the WGSL nests trace_shadow
    # inside the pbr_lighting it calls on every reflection hit
    # (3d_shader.wgsl:578-580 via the hit shading at :846-852). The maps
    # are already baked — each shadowed light costs one rows_flat element
    # gather at the hit position.
    sun_f = 1.0
    cube_by_li = {}
    sh_rows = sh_params = None
    if shadow is not None:
        from .shadow import shadow_factor_xla

        sh_rows, sh_params, (sun_entry, cube_entries) = shadow
        if sun_entry is not None:
            sun_f = shadow_factor_xla(
                sh_rows, sh_params, sun_entry, wxh, wyh, wzh, nx, ny, nz
            )
        cube_by_li = {e[0]: e for e in (cube_entries or ())}

    # sun
    sun_c = uniforms.get("sun_color", jnp.ones(3, jnp.float32))
    day = uniforms["day_factor"] * uniforms["has_sun"]
    sd = _normalize(-uniforms["sun_dir"])
    sr, sg, sb = ggx(sd[0], sd[1], sd[2], day * sun_c[0] * sun_f,
                     day * sun_c[1] * sun_f, day * sun_c[2] * sun_f)
    lit_r, lit_g, lit_b = sr, sg, sb

    # light rows (light_radiance semantics, component form — the lambert
    # factor rides the radiance exactly like radiance_at, light.rs:504-533)
    n_rows = lights["valid"].shape[0]
    for i in range(n_rows):
        lt = lights["type"][i]
        start = lights["start"][i]
        end = lights["end"][i]
        inten_raw = lights["intensity"][i]
        inten = inten_raw * lights["flicker_factor"][i]
        tpx = wxh - lights["position"][i, 0]
        tpy = wyh - lights["position"][i, 1]
        tpz = wzh - lights["position"][i, 2]
        dist = jnp.sqrt(tpx * tpx + tpy * tpy + tpz * tpz)
        in_range = dist < end
        st = jnp.clip((dist - end) / (start - end), 0.0, 1.0)
        smooth_att = jnp.where(dist <= start, 1.0, st * st * (3.0 - 2.0 * st))
        point_c = inten * smooth_att
        ambient_c = inten
        lin_att = jnp.where(
            dist <= start,
            1.0,
            1.0 - (dist - start) / jnp.maximum(end - start, 1e-20),
        )
        inv_dist = 1.0 / jnp.maximum(dist, 1e-20)
        dpx, dpy, dpz = tpx * inv_dist, tpy * inv_dist, tpz * inv_dist
        cosang = jnp.clip(
            lights["direction"][i, 0] * dpx
            + lights["direction"][i, 1] * dpy
            + lights["direction"][i, 2] * dpz,
            -1.0, 1.0,
        )
        spot_ok = jnp.arccos(cosang) <= lights["cone_angle"][i]
        spot_c = jnp.where(spot_ok, inten * lin_att, 0.0)
        area = lights["width"][i] * lights["height"][i]
        angle_att = jnp.maximum(
            lights["normal"][i, 0] * dpx
            + lights["normal"][i, 1] * dpy
            + lights["normal"][i, 2] * dpz,
            0.0,
        )
        area_main = angle_att * smooth_att * area * inten_raw
        area_linedef = smooth_att * area * inten_raw
        area_c = jnp.where(
            lights["from_linedef"][i] > 0.5, area_linedef, area_main
        )
        area_c = jnp.where(dist < 0.1, 1.0, area_c)
        day_c = angle_att * smooth_att * inten_raw
        is_amb = (lt == 1) | (lt == 2)
        scale = jnp.where(
            lt == 0, point_c,
            jnp.where(
                is_amb, ambient_c,
                jnp.where(lt == 3, spot_c, jnp.where(lt == 4, area_c, day_c)),
            ),
        )
        valid = (lights["valid"][i] > 0.5) & in_range
        valid = jnp.where(is_amb, lights["valid"][i] > 0.5, valid)
        valid = valid & jnp.where(lt == 3, spot_ok, True)
        lambert = jnp.maximum(-(nx * dpx + ny * dpy + nz * dpz), 0.0)
        needs_lambert = ~(is_amb | (lt == 5))
        sc = scale * jnp.where(needs_lambert, lambert, 1.0)
        sc = jnp.where(valid, sc, 0.0)
        if i in cube_by_li:
            from .shadow import shadow_factor_xla

            sc = sc * shadow_factor_xla(
                sh_rows, sh_params, cube_by_li[i], wxh, wyh, wzh,
                nx, ny, nz, lpos=lights["position"][i],
            )
        cr, cg, cb = ggx(
            -dpx, -dpy, -dpz,
            lights["color"][i, 0] * sc,
            lights["color"][i, 1] * sc,
            lights["color"][i, 2] * sc,
            clamp_spec=True,
        )
        lit_r = lit_r + cr
        lit_g = lit_g + cg
        lit_b = lit_b + cb

    # uniform ambient on the hit (WGSL refl_ambient; the raster's ambient
    # uniform already carries ambient_color * strength)
    amb = uniforms["ambient"][:3] * uniforms["has_ambient"]
    lit_r = lit_r + amb[0] * alb_r
    lit_g = lit_g + amb[1] * alb_g
    lit_b = lit_b + amb[2] * alb_b

    # fullbright hits: raw texel, the reference's emissive-class shortcut
    fullbright = g[..., 32] < 0.5
    lit_r = jnp.where(fullbright, alb_r, lit_r)
    lit_g = jnp.where(fullbright, alb_g, lit_g)
    lit_b = jnp.where(fullbright, alb_b, lit_b)

    lit = jnp.stack([lit_r, lit_g, lit_b], axis=-1)
    return jnp.where(hit[..., None], lit, sky_rgb[None, None, :])


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sample_mode", "samples",
                     "has_blend", "has_material", "has_matmap", "shaders",
                     "live_ranges", "stride", "rt_pallas", "shadow_spec",
                     "full_height"),
)
def reflection_pass(
    z, idx, hit, attr_planes, tri_id, d3, atlas, lights, uniforms,
    width: int, height: int, sample_mode: int = 0, samples: int = 1,
    shaders: tuple = (), has_blend: bool = False,
    has_material: bool = False, has_matmap: bool = False,
    live_ranges: tuple = None, stride: int = 1, rt_pallas: bool = False,
    shadow_rows=None, shadow_params=None, shadow_spec: tuple = None,
    y0=0, full_height: int = None, scene_d3=None,
):
    """GGX reflection radiance for every covered pixel -> (H,W,3) linear
    plus a (H,W) applied-mask (pixels whose samples all faced away keep 0).

    `scene_d3`: the pack reflection rays intersect and shade against.
    Defaults to `d3` (the G-buffer pack). The transparency-layer pass
    splits them — G-buffer from the layer's own (opacity) surfaces, rays
    traced against the opaque scene (the WGSL's per-layer reflection loop,
    3d_shader.wgsl:760-826, traces its unified scene; transparent
    geometry not self-reflecting is the documented divergence).

    The sample loop is a static Python unroll (`samples` is tiny and the
    reference's loop is equally static per dispatch); each sample hashes
    its own WGSL-hash33 uniforms, importance-samples the GGX half-vector
    around the pixel normal, reflects the view ray, traces it against the
    full scene, shades the hit, and Fresnel-weights the accumulate
    (3d_shader.wgsl:764-826). Range cap: uniforms["refl_dist"]
    (max_sky_distance — the same gp6.y the WGSL uses).

    Everything stays (H,W)-shaped: component math on 2D fields tiles the
    VPU like the shade pass; only the Möller-Trumbore wavefront flattens
    to (P,) for its (P, chunk) scan.

    `stride` > 1: inputs are every stride-th pixel of a full-res frame
    (reflection_pass_scaled). The G-buffer evaluates its full-res-space
    attribute planes at the TRUE pixel centers (x*stride + 0.5) and the
    hash seeds use full-res pixel coordinates, so the strided pass is
    bit-equal to the full-res pass subsampled at the same pixels."""
    from .shade import gbuffer_pass

    sd3 = d3 if scene_d3 is None else scene_d3

    fh = full_height if full_height is not None else height * stride
    g = gbuffer_pass(
        z, idx, hit, attr_planes, tri_id, d3, atlas, uniforms, width,
        height, sample_mode, y0, fh, shaders, has_blend,
        has_material, has_matmap, stride=stride,
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

    # hash seeds in FULL-res pixel coordinates (f32(px) in the WGSL): the
    # strided pass seeds each surviving pixel identically to full-res
    xs = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.float32)[None, :] * stride,
        (height, width),
    )
    ys = jnp.broadcast_to(
        (jnp.arange(height, dtype=jnp.float32)[:, None] + jnp.float32(y0))
        * stride,
        (height, width),
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
        if rt_pallas:
            # spatial-index kernel (ops/rt_kernel.py — the reference's
            # sv_trace_grid slot): distance-ordered cell shortlists +
            # per-block early exit instead of the brute-force chunk scan
            from .rt_kernel import intersect_rays_pallas

            t, tri = intersect_rays_pallas(
                sd3["pos"], sd3["valid"], o_x, o_y, o_z, d_x, d_y, d_z,
                max_dist, height, width,
                interpret=jax.devices()[0].platform not in ("tpu", "axon"),
            )
            tri = jnp.where(ok, tri, -1)
        else:
            t, tri = intersect_rays(
                sd3["pos"], sd3["valid"],
                o_x.reshape(p), o_y.reshape(p), o_z.reshape(p),
                d_x.reshape(p), d_y.reshape(p), d_z.reshape(p), max_dist,
                live_ranges=live_ranges,
            )
            t = t.reshape(height, width)
            tri = jnp.where(ok, tri.reshape(height, width), -1)
        color = _shade_reflection_hits(
            t, tri, o_x, o_y, o_z, d_x, d_y, d_z, sd3, atlas, lights,
            uniforms, sample_mode, sky_rgb,
            shadow=(
                (shadow_rows, shadow_params, shadow_spec)
                if shadow_spec is not None
                else None
            ),
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


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sample_mode", "has_blend",
                     "has_material", "has_matmap", "shaders", "live_ranges",
                     "rt_pallas", "full_height"),
)
def sky_light_pass(
    z, idx, hit, attr_planes, tri_id, d3, atlas, uniforms,
    width: int, height: int, sample_mode: int = 0, shaders: tuple = (),
    has_blend: bool = False, has_material: bool = False,
    has_matmap: bool = False, live_ranges: tuple = None,
    rt_pallas: bool = False, y0=0, full_height: int = None,
):
    """Directional sky-bounce ambient (the WGSL `sky_contribution`,
    embedded/shader/3d_shader.wgsl:744-758): per pixel, ONE deterministic
    ray along reflect(rd, N); if it reaches the sky within
    max_sky_distance (gp6.y — uniforms["refl_dist"]) and both the normal
    and the ray point upward, the pixel gains
    sky_rgb * max(N.up, 0) * albedo of sky-tinted ambient (the caller
    scales by AO, exactly where the WGSL multiplies `* ao`).

    Returns (radiance (H,W,3) linear, applied-mask (H,W)). Rides the same
    G-buffer + wavefront Möller-Trumbore as the reflection pass; a miss
    IS the visibility hit here, so only (t, tri) is needed — no hit
    shading."""
    from .shade import gbuffer_pass

    g = gbuffer_pass(
        z, idx, hit, attr_planes, tri_id, d3, atlas, uniforms, width,
        height, sample_mode, y0,
        full_height if full_height is not None else height,
        shaders, has_blend, has_material, has_matmap,
    )
    world = g["world"]
    normal = g["normal"]
    vdir = g["view_dir"]
    nxg, nyg, nzg = normal[..., 0], normal[..., 1], normal[..., 2]
    vx, vy, vz = vdir[..., 0], vdir[..., 1], vdir[..., 2]
    sky_factor = jnp.maximum(nyg, 0.0)

    # sky_dir = reflect(rd, N) with rd = -V: r = -V + 2 (N.V) N
    ndv = nxg * vx + nyg * vy + nzg * vz
    rx = 2.0 * ndv * nxg - vx
    ry = 2.0 * ndv * nyg - vy
    rz = 2.0 * ndv * nzg - vz

    live = (
        hit
        & ~g["fullbright"]
        & (jnp.sum(normal * normal, axis=-1) > 0.5)
        & (sky_factor > 0.0)
        & (ry > 0.0)  # WGSL sky_dir_up > 0 gate
    )

    wx, wy, wz = world[..., 0], world[..., 1], world[..., 2]
    o_x = jnp.where(live, wx + nxg * 0.01, 1e8)
    o_y = jnp.where(live, wy + nyg * 0.01, 1e8)
    o_z = jnp.where(live, wz + nzg * 0.01, 1e8)
    d_x = jnp.where(live, rx, 0.0)
    d_y = jnp.where(live, ry, -1.0)
    d_z = jnp.where(live, rz, 0.0)

    if rt_pallas:
        from .rt_kernel import intersect_rays_pallas

        _t, tri2 = intersect_rays_pallas(
            d3["pos"], d3["valid"], o_x, o_y, o_z, d_x, d_y, d_z,
            uniforms["refl_dist"], height, width,
            interpret=jax.devices()[0].platform not in ("tpu", "axon"),
        )
    else:
        p = width * height
        _t, tri = intersect_rays(
            d3["pos"], d3["valid"],
            o_x.reshape(p), o_y.reshape(p), o_z.reshape(p),
            d_x.reshape(p), d_y.reshape(p), d_z.reshape(p),
            uniforms["refl_dist"], live_ranges=live_ranges,
        )
        tri2 = tri.reshape(height, width)
    vis = live & (tri2 < 0)
    term = (
        uniforms["refl_sky"][None, None, :]
        * sky_factor[..., None]
        * g["base"]
    )
    return jnp.where(vis[..., None], term, 0.0), vis


def reflection_pass_scaled(
    z, idx, hit, attr_planes, tri_id, d3, atlas, lights, uniforms,
    width: int, height: int, sample_mode: int = 0, samples: int = 1,
    shaders: tuple = (), has_blend: bool = False,
    has_material: bool = False, has_matmap: bool = False,
    live_ranges: tuple = None, scale: int = 1, rt_pallas: bool = False,
    shadow_rows=None, shadow_params=None, shadow_spec: tuple = None,
    scene_d3=None,
):
    """reflection_pass at 1/scale resolution, bilinearly upsampled.

    Beyond-reference quality/perf knob (Rasterizer.set_reflections(...,
    scale=2)): reflections from rough GGX lobes are low-frequency, and the
    ray count is the pass's cost floor — scale=2 quarters it. scale=1 is
    the reference-exact full-res path."""
    if scale <= 1:
        return reflection_pass(
            z, idx, hit, attr_planes, tri_id, d3, atlas, lights, uniforms,
            width, height, sample_mode, samples, shaders, has_blend,
            has_material, has_matmap, live_ranges, rt_pallas=rt_pallas,
            shadow_rows=shadow_rows, shadow_params=shadow_params,
            shadow_spec=shadow_spec, scene_d3=scene_d3,
        )
    hs, ws = height // scale, width // scale
    sl = (slice(0, hs * scale, scale), slice(0, ws * scale, scale))
    refl_lo, mask_lo = reflection_pass(
        z[sl], idx[sl], hit[sl], attr_planes, tri_id, d3, atlas, lights,
        uniforms, ws, hs, sample_mode, samples, shaders, has_blend,
        has_material, has_matmap, live_ranges, stride=scale,
        rt_pallas=rt_pallas, shadow_rows=shadow_rows,
        shadow_params=shadow_params, shadow_spec=shadow_spec,
        scene_d3=scene_d3,
    )
    refl_lo = jnp.where(mask_lo[..., None], refl_lo, 0.0)
    up = jax.image.resize(refl_lo, (height, width, 3), "bilinear")
    mask_up = (
        jax.image.resize(
            mask_lo.astype(jnp.float32), (height, width), "bilinear"
        )
        > 0.5
    )
    # only pixels the full-res G-buffer actually covers take the upsample
    return up, mask_up & hit


def apply_reflections(frame_rgba_f32, refl, rmask, tonemap: bool = False):
    """Composite reflection radiance onto an already-encoded opaque frame.

    The frame is display-encoded f32 (the megakernel/compose output);
    decode with the SAME transfer the shade path used (`tonemap` False =
    the fast sRGB polynomial pair, True = the SceneVM Reinhard+gamma and
    its numerical inverse — the WGSL adds reflections to layer_color
    before tone mapping, 3d_shader.wgsl:826,871), add the linear
    reflection term, re-encode — only on pixels the pass actually
    touched, so untouched pixels keep their exact bytes (u8 parity
    surfaces stay intact when reflections are off or miss)."""
    from ..utils.color import (
        linear_to_srgb_fast,
        tonemap_scenevm,
        tonemap_scenevm_inverse,
    )

    rgb = frame_rgba_f32[..., :3]
    if tonemap:
        lin = tonemap_scenevm_inverse(rgb) + refl
        new = jnp.clip(tonemap_scenevm(lin), 0.0, 1.0)
    else:
        lin = srgb_to_linear_fast(rgb) + refl
        new = jnp.clip(linear_to_srgb_fast(lin), 0.0, 1.0)
    out = jnp.where(rmask[..., None], new, rgb)
    return jnp.concatenate([out, frame_rgba_f32[..., 3:]], axis=-1)
