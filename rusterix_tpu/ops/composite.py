"""Frame composition: background, miss pass, opacity blend, ordered 2D pass.

Keeps the reference's pass ordering (src/rasterizer.rs:273-553):
background fill -> opacity prepass -> opaque 3D -> miss/sky -> opacity blend
-> 2D painter's-order pass. The 2D pass is a `lax.scan` over triangles in
draw order (order-dependent alpha blending has a real sequential dependency;
everything per-step is vectorized over the whole frame).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .shade import (
    _dot,
    _normalize,
    apply_repeat,
    light_radiance,
    resolve_texel,
)


def compose_opaque(shaded, wrote, z, background):
    """Select shaded pixels over the background; z_eff=1 where not written.

    background: (H,W,4) f32 0..1."""
    frame = jnp.where(wrote[..., None], shaded, background)
    z_eff = jnp.where(wrote, z, 1.0)
    return frame, z_eff


def blend_opacity(frame, z_eff, op_color, op_z, preserve_transparency: bool = False):
    """Src-over blend of the opacity layer (reference rasterizer.rs:464-495).

    op_color: (H,W,4) f32 0..1 — the opacity-pass color; op_z its z buffer."""
    do = (op_z < 1.0) & (z_eff > op_z)
    src_a = op_color[..., 3:4]
    inv_a = 1.0 - src_a
    out_rgb = op_color[..., :3] * src_a + frame[..., :3] * inv_a
    if preserve_transparency:
        out_a = jnp.clip(src_a + frame[..., 3:4] * inv_a, 0.0, 1.0)
    else:
        out_a = jnp.ones_like(src_a)
    blended = jnp.concatenate([out_rgb, out_a], axis=-1)
    return jnp.where(do[..., None], blended, frame)


def d2_pass(
    frame,
    tris,
    atlas,
    lights,
    uniforms,
    width: int,
    height: int,
    sample_mode: int = 0,
    preserve_transparency: bool = False,
    has_lights: bool = False,
    has_ambient: bool = False,
    y0=0,
    shaders: tuple = (),
):
    """Ordered 2D rasterization (reference rasterizer.rs:584-899).

    tris: device dict of the PackedTriangles2D arrays.
    frame: (H,W,4) f32 0..1 working buffer. Returns updated frame.
    `y0` offsets pixel rows for row-sharded framebuffers."""
    t2 = tris["pos"].shape[0]
    if t2 == 0:
        return frame

    # project with the optional 2D matrix (batch2d.rs:373-404)
    m = uniforms["proj2d"]  # (3,3)
    pos = tris["pos"]  # (T,3,2)
    ones = jnp.ones(pos.shape[:-1] + (1,), pos.dtype)
    ph = jnp.concatenate([pos, ones], axis=-1)  # (T,3,3)
    proj = jnp.einsum(
        "ij,tvj->tvi", m, ph, precision=jax.lax.Precision.HIGHEST
    )[..., :2]  # (T,3,2)

    px = jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(height, dtype=jnp.float32)[:, None] + jnp.float32(y0) + 0.5
    px = jnp.broadcast_to(px, (height, width))
    py = jnp.broadcast_to(py, (height, width))
    # integer pixel coords used for 2D world/grid mapping (rasterizer.rs:666)
    ix = px - 0.5
    iy = py - 0.5

    # grid-space world position (rasterizer.rs:664-670)
    world_x = (ix - uniforms["translationd2"][0]) / uniforms["scaled2"]
    world_y = (iy - uniforms["translationd2"][1]) / uniforms["scaled2"]
    world2 = jnp.stack([world_x, world_y], axis=-1)
    world3 = jnp.stack([world_x, jnp.zeros_like(world_x), world_y], axis=-1)

    if has_lights:
        # 2D lights: color_at(world3, d2=true) summed (rasterizer.rs:806-876)
        rad = light_radiance(lights, world3, None, d2=True)  # (H,W,L,3)
        # wall-segment visibility (mapmini.is_visible, rasterizer.rs:841-860):
        # a non-ambient light is dropped when the pixel->light segment
        # crosses any wall segment
        if "seg_a" in uniforms:
            seg_a = uniforms["seg_a"]  # (S,2)
            seg_b = uniforms["seg_b"]
            seg_valid = uniforms["seg_valid"] > 0.5
            lp2 = jnp.stack(
                [lights["position"][:, 0], lights["position"][:, 2]], axis=-1
            )  # (L,2)
            p = world2[..., None, :]  # (H,W,1,2)
            q = lp2[None, None, :, :]  # (1,1,L,2)

            def ccw(ax, ay, bx, by, cx, cy):
                return (cy - ay) * (bx - ax) > (by - ay) * (cx - ax)

            blocked = jnp.zeros(world2.shape[:2] + (lp2.shape[0],), bool)
            s_chunk = 8
            ns = seg_a.shape[0]
            for s0 in range(0, ns, s_chunk):
                sa = seg_a[s0 : s0 + s_chunk]  # (C,2)
                sb = seg_b[s0 : s0 + s_chunk]
                sv = seg_valid[s0 : s0 + s_chunk]
                # broadcast to (H,W,L,C)
                A_x = p[..., 0][..., None]
                A_y = p[..., 1][..., None]
                B_x = q[..., 0][..., None]
                B_y = q[..., 1][..., None]
                C_x = sa[:, 0][None, None, None, :]
                C_y = sa[:, 1][None, None, None, :]
                D_x = sb[:, 0][None, None, None, :]
                D_y = sb[:, 1][None, None, None, :]
                cross = (
                    ccw(A_x, A_y, C_x, C_y, D_x, D_y)
                    != ccw(B_x, B_y, C_x, C_y, D_x, D_y)
                ) & (
                    ccw(A_x, A_y, B_x, B_y, C_x, C_y)
                    != ccw(A_x, A_y, B_x, B_y, D_x, D_y)
                )
                blocked = blocked | jnp.any(cross & sv[None, None, None, :], axis=-1)
            lt = lights["type"]
            needs_vis = ~((lt == 1) | (lt == 2))  # not Ambient/AmbientDaylight
            rad = jnp.where(
                (blocked & needs_vis[None, None, :])[..., None], 0.0, rad
            )
        acc_lights = jnp.sum(rad, axis=-2)
    else:
        acc_lights = jnp.zeros((height, width, 3), jnp.float32)

    amb = uniforms["ambient"][:3]
    acc_with_ambient = jnp.clip(acc_lights + amb, 0.0, 1.0)
    acc_plain = jnp.clip(acc_lights, 0.0, 1.0)

    def step(buf, tri):
        v = tri["proj"]  # (3,2)
        v0, v1, v2 = v[0], v[1], v[2]

        def edge(a, b):
            return (
                (b[1] - a[1]) * px + (a[0] - b[0]) * py + (b[0] * a[1] - b[1] * a[0])
            )

        e0 = edge(v0, v1)
        e1 = edge(v1, v2)
        e2 = edge(v2, v0)
        cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (tri["valid"] > 0.5)

        # barycentric (rasterizer.rs:1731-1752)
        ac = v2 - v0
        ab = v1 - v0
        area = ac[0] * ab[1] - ac[1] * ab[0]
        inv_area = jnp.where(jnp.abs(area) > 1e-20, 1.0 / area, 0.0)
        pcx, pcy = v2[0] - px, v2[1] - py
        pbx, pby = v1[0] - px, v1[1] - py
        alpha = (pcx * pby - pcy * pbx) * inv_area
        beta = (ac[0] * (py - v0[1]) - ac[1] * (px - v0[0])) * inv_area
        gamma = 1.0 - alpha - beta
        cov = cov & (jnp.abs(area) > 1e-20)

        uv = tri["uv"]  # (3,2)
        u = uv[0, 0] * alpha + uv[1, 0] * beta + uv[2, 0] * gamma
        vv_ = uv[0, 1] * alpha + uv[1, 1] * beta + uv[2, 1] * gamma

        texel = resolve_texel(
            jnp.broadcast_to(tri["kind"], cov.shape),
            jnp.broadcast_to(tri["tex_slot"], cov.shape),
            jnp.broadcast_to(tri["rgba"], cov.shape + (4,)),
            jnp.broadcast_to(tri["repeat"], cov.shape),
            u,
            vv_,
            atlas,
            uniforms["anim_frame"],
            sample_mode,
            default_alpha=0.0,
        )

        # 2D batch shader (rasterizer.rs:763-805): color from the program,
        # alpha forced opaque
        if shaders:
            for si, prog in enumerate(shaders):
                if prog is None or not prog.shade_index:
                    continue
                zeros = jnp.zeros_like(u)

                def r3(x):
                    return jnp.stack([x, x, x], axis=-1)

                state = {
                    "uv": jnp.stack([u / 4.0, vv_ / 4.0, zeros], axis=-1),
                    "color": texel[..., :3],
                    "roughness": r3(zeros + 0.5),
                    "metallic": r3(zeros),
                    "emissive": r3(zeros),
                    "opacity": r3(texel[..., 3]),
                    "bump": r3(zeros),
                    "normal": r3(zeros),
                    "hitpoint": jnp.stack([world_x, world_y, zeros], axis=-1),
                    "time": r3(jnp.broadcast_to(uniforms["time"], u.shape)),
                }
                out_s = prog.shade(state, uniforms.get("palette"))
                m = (tri["shader"] == si) & (tri["shader"] >= 0)
                mm = jnp.broadcast_to(m, cov.shape)[..., None]
                rgb_s = jnp.broadcast_to(out_s["color"], texel[..., :3].shape)
                texel = jnp.where(
                    mm,
                    jnp.concatenate([rgb_s, jnp.ones_like(texel[..., 3:4])], axis=-1),
                    texel,
                )

        # lighting block (rasterizer.rs:806-880): active when
        # (receives_light && lights) || ambient present
        rl = tri["receives_light"] > 0.5
        if has_ambient:
            # reference: (receives_light && lights) || ambient — with ambient
            # present every 2D batch is lit (rasterizer.rs:799-803)
            active = jnp.ones(cov.shape, bool)
            acc = acc_with_ambient
        elif has_lights:
            active = jnp.broadcast_to(rl, cov.shape)
            acc = acc_plain
        else:
            active = jnp.zeros_like(cov)
            acc = acc_plain
        # u8-space modulation with truncation (rasterizer.rs:871-876)
        lit_rgb = jnp.floor(
            jnp.floor(texel[..., :3] * 255.0 + 0.5) * acc
        ) * (1.0 / 255.0)
        rgb = jnp.where(active[..., None], lit_rgb, texel[..., :3])

        a = texel[..., 3:4]
        a_u8 = jnp.floor(jnp.clip(a, 0.0, 1.0) * 255.0 + 0.5)
        opaque = a_u8 >= 255.0

        # blend (rasterizer.rs:884-897)
        blended_rgb = rgb * a + buf[..., :3] * (1.0 - a)
        if preserve_transparency:
            blended_a = jnp.maximum(buf[..., 3:4], a)
        else:
            blended_a = jnp.ones_like(a)
        new_rgb = jnp.where(opaque, rgb, blended_rgb)
        new_a = jnp.where(opaque, a, blended_a)
        new = jnp.concatenate([new_rgb, new_a], axis=-1)
        return jnp.where(cov[..., None], new, buf), None

    xs = {
        "proj": proj,
        "uv": tris["uv"],
        "valid": tris["valid"],
        "kind": tris["kind"],
        "tex_slot": tris["tex_slot"],
        "rgba": tris["rgba"],
        "repeat": tris["repeat"],
        "receives_light": tris["receives_light"],
        "shader": tris["shader"],
    }
    frame, _ = jax.lax.scan(step, frame, xs)
    return frame


def sky_miss_pass(frame, z_eff, sky_pre, uniforms, width: int, height: int, y0=0):
    """Procedural-sky miss pass: overwrite pixels no opaque geometry wrote
    (z == 1.0) with the Sky node color (reference rasterizer.rs:409-443;
    the ray construction ports screen_ray, rasterizer.rs:1844-1871)."""
    from ..shapefx.render import sky_miss

    px = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.float32)[None, :], (frame.shape[0], width)
    )
    py = jnp.broadcast_to(
        jnp.arange(frame.shape[0], dtype=jnp.float32)[:, None] + jnp.float32(y0),
        (frame.shape[0], width),
    )
    ndc_x = 2.0 * (px / width) - 1.0
    ndc_y = 1.0 - 2.0 * (py / height)

    def unproject(zv):
        ndc = jnp.stack([ndc_x, ndc_y, jnp.full_like(ndc_x, zv), jnp.ones_like(ndc_x)], axis=-1)
        view = jnp.einsum(
            "ij,...j->...i", uniforms["inv_proj"], ndc,
            precision=jax.lax.Precision.HIGHEST,
        )
        view = view / view[..., 3:4]
        world = jnp.einsum(
            "ij,...j->...i", uniforms["inv_view"], view,
            precision=jax.lax.Precision.HIGHEST,
        )
        return world[..., :3]

    near = unproject(-1.0)
    far = unproject(1.0)
    d = far - near
    d = d / jnp.maximum(jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True)), 1e-20)

    color = sky_miss(sky_pre, d, uniforms["camera_pos"])
    miss = z_eff >= 1.0
    return jnp.where(miss[..., None], jnp.clip(color, 0.0, 1.0), frame)


def brush_preview_pass(frame, z_eff, uniforms, width: int, height: int, y0=0):
    """Editor brush-circle highlight on miss pixels (reference
    rasterizer.rs:434-457): intersect the screen ray with the y=0 plane and
    brighten inside the brush radius with the falloff fade."""
    hh = frame.shape[0]
    px = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.float32)[None, :], (hh, width)
    )
    py = jnp.broadcast_to(
        jnp.arange(hh, dtype=jnp.float32)[:, None] + jnp.float32(y0), (hh, width)
    )
    ndc_x = 2.0 * (px / width) - 1.0
    ndc_y = 1.0 - 2.0 * (py / height)

    def unproject(zv):
        ndc = jnp.stack(
            [ndc_x, ndc_y, jnp.full_like(ndc_x, zv), jnp.ones_like(ndc_x)], axis=-1
        )
        view = jnp.einsum(
            "ij,...j->...i", uniforms["inv_proj"], ndc,
            precision=jax.lax.Precision.HIGHEST,
        )
        view = view / view[..., 3:4]
        world = jnp.einsum(
            "ij,...j->...i", uniforms["inv_view"], view,
            precision=jax.lax.Precision.HIGHEST,
        )
        return world[..., :3]

    near = unproject(-1.0)
    far = unproject(1.0)
    d = far - near
    d = d / jnp.maximum(
        jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True)), 1e-20
    )

    dy = d[..., 1]
    t = -near[..., 1] / jnp.where(jnp.abs(dy) > 1e-5, dy, 1e-5)
    world = near + d * t[..., None]
    dist = jnp.sqrt(jnp.sum((world - uniforms["brush_pos"]) ** 2, axis=-1))

    radius = uniforms["brush_radius"]
    falloff = jnp.clip(uniforms["brush_falloff"], 0.001, 1.0)
    fade = jnp.clip((1.0 - dist / radius) / falloff, 0.0, 1.0)
    blend = 0.2 + 0.6 * fade

    hit_plane = (jnp.abs(dy) > 1e-5) & (t > 0.0) & (dist < radius)
    active = hit_plane & (z_eff >= 1.0)
    rgb = jnp.minimum(frame[..., :3] * (1.0 - blend[..., None]) + blend[..., None], 1.0)
    out_rgb = jnp.where(active[..., None], rgb, frame[..., :3])
    return jnp.concatenate([out_rgb, frame[..., 3:4]], axis=-1)


def frame_to_u8(frame):
    """f32 0..1 -> RGBA8 with the reference's rounding (src/lib.rs:63-68)."""
    return jnp.floor(jnp.clip(frame, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
