"""Deferred shading pass.

Consumes the visibility result (per-pixel winning triangle) and evaluates the
reference's per-pixel shading pipeline (src/rasterizer.rs:1062-1412) as fused
whole-frame tensor ops: perspective-correct UV, world-position
reconstruction, normal interpolation, texture-atlas sampling, the fast
Blinn-Phong BRDF (rasterizer.rs:1874-1951) and the per-type light falloffs
(src/map/light.rs:491-653) vectorized over a padded light array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.color import linear_to_srgb_fast, srgb_to_linear_fast
from .scene_pack import SRC_OFF, SRC_PIXEL, SRC_TEXTURE

# light type codes (models/light.py LightType)
LT_POINT = 0
LT_AMBIENT = 1
LT_AMBIENT_DAYLIGHT = 2
LT_SPOT = 3
LT_AREA = 4
LT_DAYLIGHT = 5

REPEAT_CLAMP = 0
REPEAT_XY = 1
REPEAT_X = 2
REPEAT_Y = 3


def take_iso(table, idx, axis=0):
    """jnp.take isolated from consumer fusions.

    XLA-TPU's standalone gather emitter runs at HBM bandwidth, but a gather
    FUSED into a consuming loop fusion degrades to element-at-a-time
    (measured 16.2ms vs 0.025ms for 2M texels from a 2048-entry atlas on
    v5e). The optimization_barrier pins the gather as a fusion root; the
    materialized result is a few MB of HBM traffic — noise by comparison."""
    return jax.lax.optimization_barrier(jnp.take(table, idx, axis=axis))


def _round_half_away(x):
    """Rust f32::round (half away from zero) for non-negative inputs."""
    return jnp.floor(x + 0.5)


def apply_repeat(u, v, repeat):
    """reference src/texture.rs:203-232 (vectorized select)."""
    u_clamp = jnp.clip(u, 0.0, 1.0)
    v_clamp = jnp.clip(v, 0.0, 1.0)
    u_rep = u - jnp.floor(u)
    v_rep = v - jnp.floor(v)
    u_out = jnp.where(
        (repeat == REPEAT_XY) | (repeat == REPEAT_X), u_rep, u_clamp
    )
    v_out = jnp.where(
        (repeat == REPEAT_XY) | (repeat == REPEAT_Y), v_rep, v_clamp
    )
    return u_out, v_out


def sample_atlas_nearest(atlas_flat, atlas_w, rects, tex_id, u, v):
    """Nearest texel (reference src/texture.rs:307-324): round(u*(w-1)), clamp.

    atlas_flat: (AH*AW, 4) uint8; rects: (N,4) int32 (x,y,w,h)."""
    r = take_iso(rects, tex_id)  # (..., 4)
    rx, ry, rw, rh = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    tx = jnp.clip(
        _round_half_away(u * (rw.astype(jnp.float32) - 1.0)).astype(jnp.int32), 0, rw - 1
    )
    ty = jnp.clip(
        _round_half_away(v * (rh.astype(jnp.float32) - 1.0)).astype(jnp.int32), 0, rh - 1
    )
    flat = (ry + ty) * atlas_w + (rx + tx)
    texel = take_iso(atlas_flat, flat)
    return texel.astype(jnp.float32)  # 0..255


def sample_atlas_linear(atlas_flat, atlas_w, rects, tex_id, u, v):
    """Bilinear (reference src/texture.rs:414-460)."""
    r = take_iso(rects, tex_id)
    rx, ry, rw, rh = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    x = u * (rw.astype(jnp.float32) - 1.0)
    y = v * (rh.astype(jnp.float32) - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, rw - 1)
    y1 = jnp.minimum(y0 + 1, rh - 1)
    x0 = jnp.clip(x0, 0, rw - 1)
    y0 = jnp.clip(y0, 0, rh - 1)
    dx = (x - jnp.floor(x))[..., None]
    dy = (y - jnp.floor(y))[..., None]

    def tex(xx, yy):
        return take_iso(atlas_flat, (ry + yy) * atlas_w + (rx + xx)).astype(
            jnp.float32
        )

    c00 = tex(x0, y0)
    c10 = tex(x1, y0)
    c01 = tex(x0, y1)
    c11 = tex(x1, y1)
    c = (
        c00 * (1 - dx) * (1 - dy)
        + c10 * dx * (1 - dy)
        + c01 * (1 - dx) * dy
        + c11 * dx * dy
    )
    return _round_half_away(c)


def resolve_texel(
    kind, tex_slot, rgba, repeat, u, v, atlas, anim_frame, sample_mode: int,
    default_alpha: float = 1.0,
):
    """Per-pixel texel resolve for all source kinds at once -> RGBA in 0..1.

    atlas: dict with 'flat' (AH*AW,4) u8, 'w' int, 'rects' (N,4),
    'tile_first' (K,), 'tile_count' (K,)."""
    uu, vv = apply_repeat(u, v, repeat)
    slot = jnp.maximum(tex_slot, 0)
    tex_id = take_iso(atlas["tile_first"], slot) + jnp.remainder(
        anim_frame, jnp.maximum(take_iso(atlas["tile_count"], slot), 1)
    )
    if sample_mode == 0:
        tx = sample_atlas_nearest(atlas["flat"], atlas["w"], atlas["rects"], tex_id, uu, vv)
    else:
        tx = sample_atlas_linear(atlas["flat"], atlas["w"], atlas["rects"], tex_id, uu, vv)
    tx = tx * (1.0 / 255.0)

    texel = jnp.where((kind == SRC_TEXTURE)[..., None], tx, 0.0)
    texel = jnp.where((kind == SRC_PIXEL)[..., None], rgba, texel)
    # SRC_OFF / unsupported -> opaque black in 3D (rasterizer.rs:1222),
    # transparent in 2D (rasterizer.rs:758 `_ => [0, 0, 0, 0]`).
    is_other = (kind != SRC_TEXTURE) & (kind != SRC_PIXEL)
    black = jnp.zeros_like(rgba).at[..., 3].set(default_alpha)
    texel = jnp.where(is_other[..., None], black, texel)
    return texel


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v, eps=1e-30):
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.maximum(n, eps)


def _smoothstep(edge0, edge1, x):
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def shade_fast_brdf(base, roughness, metallic, emissive, n, v, l, radiance,
                    static_shininess: int = None):
    """Blinn-Phong with Schlick Fresnel (reference rasterizer.rs:1906-1951).

    base/emissive/n/v/l/radiance carry a trailing 3-axis; roughness/metallic
    are scalar fields (no trailing axis). When roughness is a known compile
    time constant, pass `static_shininess` to replace the exp2/log2
    transcendental pair with an integer-power multiply chain (the dominant
    per-light cost at 1080p)."""
    n_dot_l = jnp.maximum(_dot(n, l), 0.0)

    f0 = 0.04 + (base - 0.04) * metallic[..., None]
    kd = base * (1.0 - metallic[..., None])
    kd = kd * (1.0 - jnp.max(f0, axis=-1, keepdims=True))

    h = _normalize(l + v)
    n_dot_h = jnp.maximum(_dot(n, h), 0.0)
    if static_shininess is not None:
        spec_b = jax.lax.integer_pow(n_dot_h, int(static_shininess))
    else:
        a = jnp.maximum(roughness * roughness, 1e-4)
        shininess = jnp.clip(2.0 / a - 2.0, 1.0, 2048.0)
        # pow32_fast: exp2(y*log2(x)), 0 for x<=0 (rasterizer.rs:1887-1894)
        spec_b = jnp.where(
            n_dot_h > 0.0,
            jnp.exp2(shininess * jnp.log2(jnp.maximum(n_dot_h, 1e-38))),
            0.0,
        )

    n_dot_v = jnp.maximum(_dot(n, v), 0.0)
    x5 = (1.0 - jnp.clip(n_dot_v, 0.0, 1.0)) ** 5
    f = f0 + (1.0 - f0) * x5[..., None]

    diffuse = kd * n_dot_l[..., None]
    specular = f * (spec_b * n_dot_l)[..., None]
    lit = (diffuse + specular) * radiance + emissive
    return jnp.where((n_dot_l <= 0.0)[..., None], emissive, lit)


def shade_brdf_ggx(base, roughness, metallic, emissive, n, v, l, radiance,
                   spec_ndotl: bool = False):
    """Full GGX/Trowbridge-Reitz BRDF with height-correlated Smith G and
    Schlick Fresnel (reference rasterizer.rs:1954-2009 `_shade_brdf` —
    dormant there behind the fast Blinn-Phong path, available here the same
    way). Shapes follow shade_fast_brdf: trailing 3-axis on vectors,
    roughness/metallic scalar fields.

    The reference ships TWO GGX variants that disagree by one cosine: the
    dormant Rust `_shade_brdf` leaves the specular term un-weighted, while
    the live SceneVM compute shader multiplies the WHOLE BRDF by NdotL
    (`(kD*albedo/PI + specular) * radiance * NdotL`,
    embedded/shader/3d_shader.wgsl:598,650). `spec_ndotl=True` selects the
    WGSL/rendering-equation form — the one the pipeline's `brdf="ggx"`
    mode uses."""
    n = _normalize(n)
    v = _normalize(v)
    l = _normalize(l)
    h = _normalize(v + l)

    ndotl = jnp.maximum(_dot(n, l), 0.0)
    ndotv = jnp.maximum(_dot(n, v), 0.0)

    f0 = 0.04 + (base - 0.04) * metallic[..., None]

    r = jnp.clip(roughness, 0.045, 1.0)
    a = r * r
    a2 = a * a

    ndoth = jnp.maximum(_dot(n, h), 0.0)
    denom_d = ndoth * ndoth * (a2 - 1.0) + 1.0
    dist = a2 / (jnp.pi * denom_d * denom_d + 1e-7)

    k = (r + 1.0) * (r + 1.0) * 0.125
    gv = ndotv / (ndotv * (1.0 - k) + k + 1e-7)
    gl = ndotl / (ndotl * (1.0 - k) + k + 1e-7)
    g = gv * gl

    x = 1.0 - jnp.maximum(_dot(h, v), 0.0)
    x5 = x * x * x * x * x
    f = f0 + (1.0 - f0) * x5[..., None]

    spec = f * ((dist * g) / (4.0 * ndotl * ndotv + 1e-7))[..., None]
    if spec_ndotl:
        spec = spec * ndotl[..., None]
    kd = (1.0 - f) * (1.0 - metallic[..., None])
    diffuse = kd * base * (ndotl / jnp.pi)[..., None]
    lit = (diffuse + spec) * radiance + emissive
    return jnp.where(((ndotl <= 0.0) | (ndotv <= 0.0))[..., None], emissive, lit)


def light_radiance(lights, world, normal, d2: bool = False):
    """Vectorized `CompiledLight::radiance_at` over all pixels × lights.

    lights: SoA dict with (L,) / (L,3) arrays + 'flicker_factor' (L,)
    world: (..., 3); normal: (..., 3) or None.
    Returns radiance (..., L, 3) with invalid/None contributions zeroed.
    """
    lp = lights["position"]  # (L,3)
    lt = lights["type"]  # (L,)
    w = world[..., None, :]  # (...,1,3)
    to_point = w - lp  # (...,L,3)
    dist = jnp.sqrt(jnp.sum(to_point * to_point, axis=-1))  # (...,L)

    start = lights["start"]
    end = lights["end"]
    intensity = lights["intensity"] * lights["flicker_factor"]
    color = lights["color"]  # (L,3)

    in_range = dist < end
    smooth_att = jnp.where(dist <= start, 1.0, _smoothstep(end, start, dist))

    # Point (light.rs:535-552)
    point_c = intensity * smooth_att

    # Ambient / AmbientDaylight (light.rs:554-557)
    ambient_c = jnp.broadcast_to(intensity, dist.shape)

    # Spot (light.rs:559-580)
    lin_att = jnp.where(
        dist <= start,
        1.0,
        1.0 - (dist - start) / jnp.maximum(end - start, 1e-20),
    )
    dir_to_point = to_point / jnp.maximum(dist, 1e-20)[..., None]
    cosang = jnp.clip(_dot(jnp.broadcast_to(lights["direction"], dir_to_point.shape), dir_to_point), -1.0, 1.0)
    angle = jnp.arccos(cosang)
    spot_ok = angle <= lights["cone_angle"]
    spot_c = jnp.where(spot_ok, intensity * lin_att, 0.0)

    # Area (light.rs:582-628)
    area = lights["width"] * lights["height"]
    nrm_l = jnp.broadcast_to(lights["normal"], dir_to_point.shape)
    angle_att = jnp.maximum(_dot(nrm_l, dir_to_point), 0.0)
    if d2:
        ax = jnp.maximum(0.0, 1.0 - jnp.abs(to_point[..., 0] / (lights["width"] * 0.5)))
        ay = jnp.maximum(0.0, 1.0 - jnp.abs(to_point[..., 1] / (lights["height"] * 0.5)))
        area_main = ax * ay * smooth_att * lights["intensity"]
    else:
        area_main = angle_att * smooth_att * area * lights["intensity"]
    area_linedef = smooth_att * area * lights["intensity"]
    area_c = jnp.where(lights["from_linedef"] > 0.5, area_linedef, area_main)
    # inside 0.1 radius: raw color (light.rs:590-592)
    area_c = jnp.where(dist < 0.1, 1.0, area_c)

    # Daylight (light.rs:630-653)
    day_c = angle_att * smooth_att * lights["intensity"]

    scale = jnp.where(
        lt == LT_POINT,
        point_c,
        jnp.where(
            (lt == LT_AMBIENT) | (lt == LT_AMBIENT_DAYLIGHT),
            ambient_c,
            jnp.where(
                lt == LT_SPOT,
                spot_c,
                jnp.where(lt == LT_AREA, area_c, day_c),
            ),
        ),
    )

    valid = (lights["valid"] > 0.5) & in_range
    # ambient types ignore the range check? No: ambient has no distance check
    # (light.rs:554-557) — they always contribute.
    valid = jnp.where((lt == LT_AMBIENT) | (lt == LT_AMBIENT_DAYLIGHT), lights["valid"] > 0.5, valid)
    # spot adds the cone check; point/area/daylight use in_range (already).
    valid = valid & jnp.where(lt == LT_SPOT, spot_ok, True)

    incoming = color * scale[..., None]  # (...,L,3)

    # Lambert for point/spot/area (radiance_at, light.rs:504-533)
    if normal is not None:
        ldir = _normalize(lp - w)
        lambert = jnp.maximum(_dot(normal[..., None, :], ldir), 0.0)
        needs_lambert = ~(
            (lt == LT_AMBIENT) | (lt == LT_AMBIENT_DAYLIGHT) | (lt == LT_DAYLIGHT)
        )
        incoming = incoming * jnp.where(needs_lambert, lambert, 1.0)[..., None]

    return jnp.where(valid[..., None], incoming, 0.0)


def screen_to_world(px, py, z_ndc, inv_proj, inv_view, width, height):
    """reference rasterizer.rs:1707-1728."""
    x_ndc = 2.0 * (px / width) - 1.0
    y_ndc = 1.0 - 2.0 * (py / height)
    ndc = jnp.stack([x_ndc, y_ndc, z_ndc, jnp.ones_like(px)], axis=-1)
    view = jnp.einsum("ij,...j->...i", inv_proj, ndc, precision=jax.lax.Precision.HIGHEST)
    view = view / view[..., 3:4]
    world = jnp.einsum("ij,...j->...i", inv_view, view, precision=jax.lax.Precision.HIGHEST)
    return world[..., :3]


def gbuffer_pass(
    z,
    idx,
    hit,
    attr_planes,
    tri_id,
    meta,
    atlas,
    uniforms,
    width: int,
    height: int,
    sample_mode: int = 0,
    y0=0,
    full_height: int = None,
    shaders: tuple = (),
    has_blend: bool = False,
    has_material: bool = False,
    has_matmap: bool = False,
    stride: int = 1,
):
    """Reconstruct the per-pixel G-buffer from the winning triangles:
    world position, shading normal, linear albedo, roughness/metallic,
    emissive, opacity (the deferred-attribute half of shade_pass, shared
    with the reflection pass — ops/reflect.py). Recompute-over-store: the
    TPU re-derives these from the tiny plane tables instead of carrying a
    fat G-buffer through HBM.

    `stride` > 1: the (height, width) inputs are every stride-th pixel of
    a full-res frame (the half-res reflection knob). The attribute-plane
    coefficients (setup_pass _slot_planes) are in FULL-res screen pixel
    space, so pixel centers evaluate at x*stride + 0.5 and the NDC
    unproject uses the full-res frame dimensions."""
    if full_height is None:
        full_height = height * stride
    slot = jnp.maximum(idx, 0)
    t = take_iso(tri_id, slot)  # (H,W) source triangle index

    # single fused row-gather: plane floats + meta fields per winning
    # triangle (separate jnp.take per field costs ~2x in gather traffic).
    # Unblended scenes drop the b/w plane + source2 meta from the gather.
    # receives_light=False rides the repeat column (+4) so the gather width
    # stays put; 3D fullbright batches (e.g. the sky plane) write the raw
    # texel like the reference 2D pass does for unlit batches
    repeat_enc = meta["repeat"].astype(jnp.float32) + 4.0 * (
        meta["receives_light"] < 0.5
    )
    meta_cols = [
        meta["kind"].astype(jnp.float32)[:, None],
        meta["tex_slot"].astype(jnp.float32)[:, None],
        repeat_enc[:, None],
        meta["has_normals"][:, None],
        meta["shader"].astype(jnp.float32)[:, None],
        meta["rgba"],
        meta["ambient"],
    ]
    if has_material:
        meta_cols += [meta["rough"][:, None], meta["metal"][:, None]]
    if has_matmap:
        meta_cols += [
            meta["m1_slot"].astype(jnp.float32)[:, None],
            meta["m2_slot"].astype(jnp.float32)[:, None],
            meta["em_scale"][:, None],
            meta["nmap"][:, None],
        ]
    if has_blend:
        meta_cols += [
            meta["kind2"].astype(jnp.float32)[:, None],
            meta["tex_slot2"].astype(jnp.float32)[:, None],
            meta["rgba2"],
        ]
    meta_mat = jnp.concatenate(meta_cols, axis=1)  # (T, 12 + 2? + 6?)
    n_planes = 21 if has_blend else 18
    fused = jnp.concatenate(
        [attr_planes[..., :n_planes], jnp.take(meta_mat, tri_id, axis=0)], axis=1
    )  # (T2, 30 or 39)
    gathered = take_iso(fused, slot)  # (H,W,30|39)
    planes = gathered[..., :n_planes]
    kind = gathered[..., n_planes + 0].astype(jnp.int32)
    tex_slot = gathered[..., n_planes + 1].astype(jnp.int32)
    repeat = gathered[..., n_planes + 2].astype(jnp.int32)
    fullbright = repeat >= 4
    repeat = repeat & 3
    has_n = gathered[..., n_planes + 3]
    shader_px = gathered[..., n_planes + 4].astype(jnp.int32)
    rgba = gathered[..., n_planes + 5 : n_planes + 9]
    batch_ambient = gathered[..., n_planes + 9 : n_planes + 12]
    # blend meta offset: material (+matmap) cols sit between ambient and
    # source2
    mb = n_planes + 12 + (2 if has_material else 0) + (4 if has_matmap else 0)

    px = jnp.arange(width, dtype=jnp.float32)[None, :] * stride + 0.5
    py = (
        jnp.arange(height, dtype=jnp.float32)[:, None] * stride
        + jnp.float32(y0)
        + 0.5
    )
    px = jnp.broadcast_to(px, (height, width))
    py = jnp.broadcast_to(py, (height, width))

    def interp(i):
        return planes[..., 3 * i] * px + planes[..., 3 * i + 1] * py + planes[..., 3 * i + 2]

    inv_w = interp(0)
    u = interp(1) / inv_w
    v = interp(2) / inv_w
    nx, ny, nz = interp(3), interp(4), interp(5)

    world = screen_to_world(
        px, py, z, uniforms["inv_proj"], uniforms["inv_view"],
        jnp.float32(width * stride), jnp.float32(full_height),
    )

    # normal: interpolate + flip toward viewer (rasterizer.rs:1083-1099)
    n_raw = jnp.stack([nx, ny, nz], axis=-1)
    n_unit = _normalize(n_raw)
    view_dir = _normalize(uniforms["camera_pos"] - world)
    n_flip = jnp.where((_dot(n_unit, view_dir) < 0.0)[..., None], -n_unit, n_unit)
    normal = jnp.where(has_n[..., None] > 0.5, n_flip, 0.0)

    # texel
    texel = resolve_texel(
        kind, tex_slot, rgba, repeat, u, v, atlas, uniforms["anim_frame"], sample_mode
    )
    if has_blend:
        # vertex-blended batches: mix toward the secondary source by the
        # perspective-correct interpolated weight (texel-space src-over of
        # the reference's add_poly_3d_blended consumption)
        kind2 = gathered[..., mb].astype(jnp.int32)
        tex_slot2 = gathered[..., mb + 1].astype(jnp.int32)
        rgba2 = gathered[..., mb + 2 : mb + 6]
        b_w = jnp.clip(interp(6) / inv_w, 0.0, 1.0)
        texel2 = resolve_texel(
            kind2, tex_slot2, rgba2, repeat, u, v, atlas,
            uniforms["anim_frame"], sample_mode,
        )
        blended = texel * (1.0 - b_w[..., None]) + texel2 * b_w[..., None]
        texel = jnp.where((kind2 >= 0)[..., None], blended, texel)

    base = srgb_to_linear_fast(texel[..., :3])
    opacity = texel[..., 3]
    if has_material:
        # per-batch constant material captured from baked shaders
        roughness = jnp.clip(gathered[..., n_planes + 12], 0.0, 1.0)
        metallic = jnp.clip(gathered[..., n_planes + 13], 0.0, 1.0)
    else:
        roughness = jnp.full_like(opacity, 0.5)
        metallic = jnp.zeros_like(opacity)
    emissive = jnp.zeros_like(base)

    if has_matmap:
        # per-PIXEL material from baked M1/M2 sidecar tiles (scene_pack
        # matmap bake; reference shaders write these registers per pixel in
        # the hot loop, rasterizer.rs:1284-1303):
        #   M1 = emissive rgb (x em_scale) | roughness
        #   M2 = encoded normal (n+1)/2   | metallic
        m1s = gathered[..., n_planes + 14].astype(jnp.int32)
        m2s = gathered[..., n_planes + 15].astype(jnp.int32)
        em_s = gathered[..., n_planes + 16]
        nm = gathered[..., n_planes + 17]
        m_on = m1s >= 0
        kindm = jnp.where(m_on, SRC_TEXTURE, SRC_OFF)
        zeros4 = jnp.zeros(rgba.shape, rgba.dtype)
        m1 = resolve_texel(
            kindm, m1s, zeros4, repeat, u, v, atlas,
            uniforms["anim_frame"], sample_mode,
        )
        m2 = resolve_texel(
            kindm, m2s, zeros4, repeat, u, v, atlas,
            uniforms["anim_frame"], sample_mode,
        )
        roughness = jnp.where(m_on, m1[..., 3], roughness)
        metallic = jnp.where(m_on, m2[..., 3], metallic)
        emissive = jnp.where(
            m_on[..., None], m1[..., :3] * em_s[..., None], emissive
        )
        # normal override only for shaders that wrote normals (per-tri nmap
        # flag); byte-127 "zero" texels decode to |n| < 0.02 and keep the
        # written-zero semantics (no normal -> hemi-only lighting)
        n_dec = m2[..., :3] * 2.0 - 1.0
        dlen = jnp.sqrt(jnp.sum(n_dec * n_dec, axis=-1, keepdims=True))
        n_dir = jnp.where(
            dlen > 0.02, n_dec / jnp.maximum(dlen, 1e-30), 0.0
        )
        # bump strength (RenderSettings bump_strength): blend the written
        # normal into the geometric one and renormalize — the SceneVM's
        # N = normalize(mix(N, N_written, bump)), 3d_shader.wgsl:398-404;
        # bump=1 == the raster path's full replacement (megakernel parity).
        bump_k = uniforms.get("bump_strength", jnp.float32(1.0))
        mixed = n_dir * bump_k + normal * (1.0 - bump_k)
        mlen = jnp.sqrt(jnp.sum(mixed * mixed, axis=-1, keepdims=True))
        mixed = jnp.where(
            (dlen > 0.02) & (mlen > 1e-20),
            mixed / jnp.maximum(mlen, 1e-30),
            0.0,
        )
        # bump >= 1 takes the EXACT replacement branch (megakernel parity /
        # pre-bump bit-compat); 0 < bump < 1 takes the renormalized mix
        use_full = (m_on & (nm > 0.5) & (bump_k >= 1.0))[..., None]
        use_mix = (
            m_on & (nm > 0.5) & (bump_k > 0.0) & (bump_k < 1.0)
        )[..., None]
        normal = jnp.where(
            use_full, n_dir, jnp.where(use_mix, mixed, normal)
        )

    # per-batch rusteria shaders (rasterizer.rs:1224-1310): each compiled
    # program evaluates over the full frame; results merge where the pixel's
    # winning triangle carries that shader index
    if shaders:
        zero3 = jnp.zeros_like(base)

        def r3(x):
            return jnp.stack([x, x, x], axis=-1)

        for si, prog in enumerate(shaders):
            if prog is None or not prog.shade_index:
                continue
            state = {
                "uv": jnp.stack([u / 4.0, v / 4.0, jnp.zeros_like(u)], axis=-1),
                "color": base,
                "roughness": r3(roughness),
                "metallic": r3(metallic),
                "emissive": emissive,
                "opacity": r3(opacity),
                "bump": zero3,
                "normal": normal,
                "hitpoint": world,
                "time": r3(jnp.broadcast_to(uniforms["time"], u.shape)),
            }
            out = prog.shade(state, uniforms.get("palette"))
            m = (shader_px == si)[..., None]

            def bc(x):
                return jnp.broadcast_to(x, base.shape)

            base = jnp.where(m, bc(out["color"]), base)
            roughness = jnp.where(m[..., 0], bc(out["roughness"])[..., 0], roughness)
            metallic = jnp.where(m[..., 0], bc(out["metallic"])[..., 0], metallic)
            emissive = jnp.where(m, bc(out["emissive"]), emissive)
            opacity = jnp.where(m[..., 0], bc(out["opacity"])[..., 0], opacity)
            normal = jnp.where(m, bc(out["normal"]), normal)
        roughness = jnp.clip(roughness, 0.0, 1.0)
        metallic = jnp.clip(metallic, 0.0, 1.0)
        # re-normalize shader-written normals (rasterizer.rs:1313)
        nlen = jnp.sqrt(jnp.sum(normal * normal, axis=-1, keepdims=True))
        normal = jnp.where(nlen > 0, normal / jnp.maximum(nlen, 1e-30), normal)

    return {
        "world": world,
        "view_dir": view_dir,
        "normal": normal,
        "base": base,
        "roughness": roughness,
        "metallic": metallic,
        "emissive": emissive,
        "opacity": opacity,
        "texel": texel,
        "fullbright": fullbright,
        "batch_ambient": batch_ambient,
    }


def shade_pass(
    z,
    idx,
    hit,
    attr_planes,
    tri_id,
    meta,
    atlas,
    lights,
    uniforms,
    width: int,
    height: int,
    sample_mode: int = 0,
    y0=0,
    full_height: int = None,
    shaders: tuple = (),
    has_fog: bool = False,
    has_blend: bool = False,
    has_material: bool = False,
    has_matmap: bool = False,
    shadow: tuple = None,
    ao=None,
    brdf_ggx: bool = False,
    tonemap: bool = False,
):
    """Shade every pixel from its winning triangle.

    Returns (rgba_f32 (H,W,4) in 0..1, wrote (H,W) bool).
    `wrote` is hit AND final alpha == 255 — the reference's opaque-pass write
    condition (rasterizer.rs:1404-1409). `y0`/`full_height` support
    row-sharded framebuffers (height = local rows, full_height = screen).

    `shadow`: optional (rows_flat (N,), params (40,), spec) from
    ops.shadow.bake_shadow_pack — per-light geometry shadows (the
    reference's SceneVM trace_shadow family, 3d_shader.wgsl:436-517):
    the sun entry gates the sun BRDF, cube entries gate their light row's
    radiance.

    `ao`: optional (H,W) ambient-occlusion factor (ops.ao.ssao_pass) —
    scales ONLY the ambient terms (WGSL `ambient * ao`,
    3d_shader.wgsl:746).

    `brdf_ggx`: replace the fast Blinn-Phong direct-light BRDF with the
    full Cook-Torrance GGX chain the reference's live SceneVM path shades
    with (`pbr_lighting`, 3d_shader.wgsl:559-650; the dormant Rust
    `_shade_brdf`, rasterizer.rs:1954-2009). Ambient/hemisphere terms are
    unchanged — the selection swaps only the sun + per-light BRDF, exactly
    the scope of the reference's two shading models."""
    assert not has_matmap or has_material, (
        "has_matmap implies has_material (the matmap gather offsets at "
        "n_planes+14.. assume the material columns precede them — same "
        "layout contract as pack_mega_table)"
    )
    if full_height is None:
        full_height = height
    g = gbuffer_pass(
        z, idx, hit, attr_planes, tri_id, meta, atlas, uniforms, width,
        height, sample_mode, y0, full_height, shaders, has_blend,
        has_material, has_matmap,
    )
    world = g["world"]
    view_dir = g["view_dir"]
    normal = g["normal"]
    base = g["base"]
    roughness = g["roughness"]
    metallic = g["metallic"]
    emissive = g["emissive"]
    opacity = g["opacity"]
    texel = g["texel"]
    fullbright = g["fullbright"]
    batch_ambient = g["batch_ambient"]

    # --- lighting (rasterizer.rs:1319-1398) ---
    lit = jnp.zeros_like(base)
    # sector occlusion from occluded boxes (mini.rs:57; gates sky/sun)
    if "occ_box" in uniforms:
        ob = uniforms["occ_box"]  # (B,4)
        ov = uniforms["occ_val"]  # (B,)
        wx = world[..., 0:1]
        wz = world[..., 2:3]
        inside = (
            (wx >= ob[:, 0]) & (wz >= ob[:, 1]) & (wx <= ob[:, 2]) & (wz <= ob[:, 3])
        )  # (H,W,B)
        occlusion = jnp.min(jnp.where(inside, ov, 1.0), axis=-1)
    else:
        occlusion = jnp.ones_like(opacity)

    hemi = 0.5 * (normal[..., 1] + 1.0)
    if ao is not None:
        # hemi appears exactly in the two ambient terms — scaling it here
        # IS the reference's `ambient * ao` (megakernel does the same)
        hemi = hemi * ao
    kd = base * (1.0 - metallic[..., None]) * (1.0 - 0.04)

    # per-light geometry shadows (SceneVM trace_shadow parity)
    sun_factor = None
    light_factors = None
    if shadow is not None:
        from .shadow import shadow_factor_xla

        sh_rows, sh_params, (sun_entry, cube_entries) = shadow
        nx_s, ny_s, nz_s = normal[..., 0], normal[..., 1], normal[..., 2]
        if sun_entry is not None:
            sun_factor = shadow_factor_xla(
                sh_rows, sh_params, sun_entry,
                world[..., 0], world[..., 1], world[..., 2],
                nx_s, ny_s, nz_s,
            )
        if cube_entries:
            light_factors = jnp.ones(
                normal.shape[:-1] + (lights["position"].shape[0],), jnp.float32
            )
            for entry in cube_entries:
                li = entry[0]
                f = shadow_factor_xla(
                    sh_rows, sh_params, entry,
                    world[..., 0], world[..., 1], world[..., 2],
                    nx_s, ny_s, nz_s, lpos=lights["position"][li],
                )
                light_factors = light_factors.at[..., li].set(f)

    has_ambient = uniforms["has_ambient"]
    sky = uniforms["ambient"][:3]
    lit = lit + has_ambient * sky * kd * hemi[..., None]

    # roughness fixed at 0.5 only when neither per-pixel shaders nor baked
    # per-batch materials are in play
    shin6 = 6 if not (shaders or has_material or has_matmap) else None
    if brdf_ggx:
        brdf_fn = functools.partial(shade_brdf_ggx, spec_ndotl=True)
    else:
        brdf_fn = functools.partial(shade_fast_brdf, static_shininess=shin6)
    sun_radiance = uniforms["day_factor"] * uniforms.get(
        "sun_color", jnp.ones(3, jnp.float32)
    )
    if sun_factor is not None:
        sun_radiance = sun_radiance[None, None, :] * sun_factor[..., None]
    sun = brdf_fn(
        base,
        roughness,
        metallic,
        jnp.zeros_like(base),
        normal,
        view_dir,
        _normalize(-uniforms["sun_dir"][None, None, :]),
        sun_radiance,
    )
    lit = lit + jnp.where(uniforms["has_sun"] > 0.5, sun, 0.0)
    lit = lit * occlusion[..., None]

    # batch ambient (rasterizer.rs:1368-1371)
    lit = lit + batch_ambient * kd * hemi[..., None]

    # direct lights
    # broadcast over the padded light axis: XLA fuses the (H,W,L,3) chain
    # into the reduction (measured faster than a lax.scan over lights)
    radiance = light_radiance(lights, world, normal)  # (H,W,L,3)
    if light_factors is not None:
        radiance = radiance * light_factors[..., None]
    ldir = _normalize(lights["position"] - world[..., None, :])
    contrib = brdf_fn(
        base[..., None, :],
        roughness[..., None],
        metallic[..., None],
        jnp.zeros_like(base[..., None, :]),
        normal[..., None, :],
        view_dir[..., None, :],
        ldir,
        radiance,
    )
    has_radiance = jnp.any(radiance != 0.0, axis=-1, keepdims=True)
    lit = lit + jnp.sum(jnp.where(has_radiance, contrib, 0.0), axis=-2)

    lit = lit + emissive

    if tonemap:
        # the SceneVM display transform (Reinhard + gamma 2.2,
        # 3d_shader.wgsl:871-873) instead of the Rust renderer's fast
        # sRGB polynomial — selected by Rasterizer.set_tonemap("scenevm")
        from ..utils.color import tonemap_scenevm

        out_rgb = tonemap_scenevm(lit)
    else:
        out_rgb = linear_to_srgb_fast(lit)
    # fullbright batches bypass lighting entirely (raw sRGB texel)
    out_rgb = jnp.where(fullbright[..., None], texel[..., :3], out_rgb)

    # distance fog on hit geometry (Fog render node, shapefx.rs:1071-1083)
    if has_fog:
        from ..shapefx.render import fog_apply

        out_rgb = fog_apply(
            out_rgb, world, uniforms["camera_pos"],
            uniforms["fog_color"], uniforms["fog_end"], uniforms["fog_fade"],
            uniforms["fog_mode"], uniforms["fog_density"],
        )

    out = jnp.concatenate([out_rgb, opacity[..., None]], axis=-1)

    # u8 quantization decides the alpha==255 write test (rasterizer.rs:1404)
    a_u8 = jnp.floor(jnp.clip(opacity, 0.0, 1.0) * 255.0 + 0.5)
    wrote = hit & (a_u8 >= 255.0)
    return out, wrote
