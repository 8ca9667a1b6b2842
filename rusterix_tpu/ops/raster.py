"""Rasterizer facade — the public render API.

Mirrors the reference's `Rasterizer::setup(...).rasterize(scene, ...)`
(src/rasterizer.rs:92-185) but compiles the whole frame into one jitted
device function: setup pass -> visibility -> deferred shade -> compose ->
opacity blend -> ordered 2D pass -> RGBA8 pack. Host work per frame is scene
packing (numpy) and the final Bresenham line overlay.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.batch import SampleMode
from ..utils.color import hash_u32
from .composite import blend_opacity, compose_opaque, d2_pass, frame_to_u8
from .matrices import invert
from .scene_pack import PackedScene
from .setup_pass import setup_pass
from .shade import (
    linear_to_srgb_fast,
    resolve_texel,
    shade_pass,
    srgb_to_linear_fast,
    take_iso,
)
from .visibility import visibility_pass


@partial(jax.jit, static_argnames=("ss",))
def _ssaa_downsample(frame_u8, ss: int):
    """Box-filter an (H*ss, W*ss, 4) u8 frame down to (H, W, 4) on device
    (supersampled antialiasing — see Rasterizer.set_supersample)."""
    f = frame_u8.astype(jnp.float32)
    h, w, c = f.shape
    f = f.reshape(h // ss, ss, w // ss, ss, c).mean(axis=(1, 3))
    return jnp.floor(f + 0.5).astype(jnp.uint8)


def _shade_opacity(z, idx, hit, attr_planes, tri_id, meta, atlas, uniforms, width, height, sample_mode, shaders=(), y0=0):
    """Opacity-pass shading: texel only, no lighting
    (reference d3_rasterize_opacity, src/rasterizer.rs:1425-1690).
    `y0` offsets the pixel rows (row-sharded framebuffer)."""
    slot = jnp.maximum(idx, 0)
    t = take_iso(tri_id, slot)
    planes = take_iso(attr_planes, slot)

    px = jnp.broadcast_to(jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5, (height, width))
    py = jnp.broadcast_to(
        jnp.arange(height, dtype=jnp.float32)[:, None] + jnp.float32(y0) + 0.5,
        (height, width),
    )

    def interp(i):
        return planes[..., 3 * i] * px + planes[..., 3 * i + 1] * py + planes[..., 3 * i + 2]

    inv_w = interp(0)
    u = interp(1) / inv_w
    v = interp(2) / inv_w

    kind = take_iso(meta["kind"], t)
    tex_slot = take_iso(meta["tex_slot"], t)
    rgba = take_iso(meta["rgba"], t)
    repeat = take_iso(meta["repeat"], t)
    texel = resolve_texel(kind, tex_slot, rgba, repeat, u, v, atlas, uniforms["anim_frame"], sample_mode)

    lin = srgb_to_linear_fast(texel[..., :3])
    # whole-batch alpha multiplier (fading door billboards,
    # scene_handler.rs:703-728 DynamicObject::with_opacity)
    opac = texel[..., 3] * take_iso(meta["opacity"], t)

    if shaders:
        shader_px = take_iso(meta["shader"], t)

        def r3(x):
            return jnp.stack([x, x, x], axis=-1)

        for si, prog in enumerate(shaders):
            if prog is None or not prog.shade_index:
                continue
            zeros = jnp.zeros_like(u)
            state = {
                "uv": jnp.stack([u / 4.0, v / 4.0, zeros], axis=-1),
                "color": lin,
                "roughness": r3(zeros + 0.5),
                "metallic": r3(zeros),
                "emissive": r3(zeros),
                "opacity": r3(opac),
                "bump": r3(zeros),
                "normal": r3(zeros),
                "hitpoint": r3(zeros),
                "time": r3(jnp.broadcast_to(uniforms["time"], u.shape)),
            }
            out_s = prog.shade(state, uniforms.get("palette"))
            m = (shader_px == si)[..., None]
            lin = jnp.where(m, jnp.broadcast_to(out_s["color"], lin.shape), lin)
            opac = jnp.where(
                m[..., 0], jnp.broadcast_to(out_s["opacity"], lin.shape)[..., 0], opac
            )

    # srgb->linear then linear->srgb round trip through the fast polynomials,
    # matching the reference's pipeline (rasterizer.rs:1634-1676).
    rgb = linear_to_srgb_fast(lin)
    out = jnp.concatenate([rgb, opac[..., None]], axis=-1)
    z_eff = jnp.where(hit, z, 1.0)
    color = jnp.where(hit[..., None], out, 0.0)
    return color, z_eff, t


@partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "sample_mode",
        "preserve_transparency",
        "has_ambient",
        "has_lights",
        "has_opacity",
        "has_d2",
        "shaders",
        "use_pallas",
        "has_sky",
        "has_fog",
        "has_blend",
        "has_brush",
        "has_dyn",
        "has_material",
        "has_matmap",
        "light_spec",
        "sun_off",
        "shadow_spec",
        "shadow_dyn",
        "ao_taps",
        "brdf_ggx",
        "tonemap",
        "refl_samples",
        "refl_ranges",
        "refl_scale",
        "sky_light",
        "transparency_layers",
    ),
)
def render_frame(
    d3,
    d3_op,
    d2,
    lights,
    atlas,
    uniforms,
    background,
    width: int,
    height: int,
    sample_mode: int = 0,
    preserve_transparency: bool = False,
    has_ambient: bool = False,
    has_lights: bool = False,
    has_opacity: bool = False,
    has_d2: bool = False,
    shaders: tuple = (),
    use_pallas: bool = False,
    has_sky: bool = False,
    has_fog: bool = False,
    sky_pre: dict = None,
    has_blend: bool = False,
    has_brush: bool = False,
    has_dyn: bool = False,
    d3_dyn=None,
    d3_op_dyn=None,
    d2_dyn=None,
    has_material: bool = False,
    has_matmap: bool = False,
    light_spec: tuple = None,
    sun_off: bool = False,
    shadow_rows=None,
    shadow_params=None,
    shadow_spec: tuple = None,
    shadow_dyn: bool = False,
    shadow_cams=None,
    ao_taps: tuple = None,
    brdf_ggx: bool = False,
    tonemap: bool = False,
    refl_samples: int = 0,
    refl_ranges: tuple = None,
    refl_scale: int = 1,
    sky_light: bool = False,
    transparency_layers: int = 1,
):
    """One full frame on device -> (H, W, 4) uint8.

    shadow_rows/shadow_params/shadow_spec: baked shadow maps from
    ops.shadow.bake_shadow_pack (None = shadows off) — per-light geometry
    shadows in both the megakernel and the XLA shade path.
    ao_taps: static pixel-offset tuple (ops.ao.tap_offsets) — enables the
    screen-space ambient-occlusion pass, world radius from
    uniforms["ao_radius"].
    brdf_ggx: shade direct light with the Cook-Torrance GGX chain (the
    reference's SceneVM pbr_lighting / dormant _shade_brdf) instead of the
    fast Blinn-Phong model — Rasterizer.set_brdf("ggx")."""
    view = uniforms["view"]
    proj = uniforms["proj"]

    if has_dyn:
        # dynamic batches (entity billboards, floating 2D) pack separately
        # per frame and concatenate here — entity motion re-uploads a few KB
        # instead of the whole static world
        d3 = {k: jnp.concatenate([d3[k], d3_dyn[k]], axis=0) for k in d3}
        d3_op = {
            k: jnp.concatenate([d3_op[k], d3_op_dyn[k]], axis=0) for k in d3_op
        }
        d2 = {k: jnp.concatenate([d2[k], d2_dyn[k]], axis=0) for k in d2}

    if shadow_dyn and shadow_spec is not None:
        # dynamic casters: min-composite the per-frame dynamic pack's depth
        # into every baked shadow map (the reference's trace_shadow_unified
        # -> trace_billboards occludes dynamics too, 3d_shader.wgsl:436-460,
        # 297-327). Static maps stay cached; only the (small) dyn pack
        # re-renders per frame with bit-identical cameras (bake_shadow_cams).
        from .shadow import composite_dynamic_depth

        shadow_rows = composite_dynamic_depth(
            shadow_rows, shadow_spec, shadow_cams,
            d3_dyn["pos"], d3_dyn["uv"], d3_dyn["nrm"], d3_dyn["valid"],
        )

    vis, attr, bbox, alive, tri_id = setup_pass(
        d3["pos"], d3["uv"], d3["nrm"], d3["valid"], d3["cull"], view, proj,
        width, height, bw=d3["bw"] if has_blend else None,
    )
    mega = use_pallas and not shaders
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    if mega:
        # the whole opaque pass (visibility + attr resolve + texel + lighting
        # + fog + compose + RGBA8 pack) in ONE tile megakernel — no per-pixel
        # HBM gathers, no (32,H,W) attribute image (see ops/megakernel.py)
        from .megakernel import (
            atlas_rows_i32,
            mega_render,
            morton_ftb_sort,
            pack_background_u32,
            pack_light_params,
            pack_mega_params,
            pack_mega_table,
            pack_occ_params,
            unpack_frame_u32,
        )

        table = pack_mega_table(
            attr, tri_id, d3, atlas, uniforms["anim_frame"], has_blend,
            has_material, has_matmap,
        )
        vis_s, bbox_s, alive_s, table_s, s_near, sort_perm = morton_ftb_sort(
            vis, bbox, alive.astype(jnp.float32), table, width, height,
            return_perm=True,
        )
        ao_img = None
        z_pre = idx_pre = hit_pre = None
        if ao_taps or refl_samples or sky_light:
            # AO and the reflection G-buffer both need (z, idx, hit)
            # BEFORE shading: ONE extra visibility-only kernel pass
            # (~0.35ms @1080p; the XLA visibility scan costs 46ms at the
            # same size). Winner indices map back to original candidate
            # slots through the sort permutation.
            from .visibility_pallas import visibility_pass_pallas

            z_pre, i_s, hit_pre = visibility_pass_pallas(
                vis_s, alive_s, bbox_s, width, height, interpret=interpret
            )
            idx_pre = jnp.where(
                hit_pre, take_iso(sort_perm, jnp.maximum(i_s, 0)), -1
            )
        if ao_taps:
            from .ao import ssao_pass

            ao_img = ssao_pass(
                z_pre, hit_pre, proj[2, 2], proj[2, 3],
                uniforms["ao_radius"], 2.0 / (proj[1, 1] * height), ao_taps,
            )
        rgba_u32, z_eff = mega_render(
            vis_s, alive_s, bbox_s, table_s,
            atlas_rows_i32(atlas["flat_u32"]),
            pack_background_u32(background),
            pack_mega_params(
                uniforms, width, height, atlas["w"], has_fog,
                shadow_params=shadow_params,
            ),
            pack_light_params(lights),
            pack_occ_params(uniforms),
            width, height, sample_mode, has_blend, has_material,
            has_matmap=has_matmap,
            interpret=interpret, light_spec=light_spec, sun_off=sun_off,
            s_near=s_near,
            # the bake is cached flat (the XLA lookup wants (N,)); the
            # kernel's lane gathers want (S, 128) rows — reshape is free
            shadow_rows=(
                shadow_rows.reshape(-1, 128) if shadow_rows is not None else None
            ),
            shadow_spec=shadow_spec,
            ao_img=ao_img,
            brdf_ggx=brdf_ggx,
            tonemap=tonemap,
        )
        if not (has_sky or has_opacity or has_d2 or has_brush
                or refl_samples or sky_light):
            return unpack_frame_u32(rgba_u32)
        # downstream passes blend in f32 over the already-quantized opaque
        # result — exactly the reference's u8 tile-buffer behavior
        # (rasterizer.rs:464-495 reads back written u8 pixels)
        frame = unpack_frame_u32(rgba_u32).astype(jnp.float32) * (1.0 / 255.0)
    elif use_pallas:
        from .visibility_pallas import morton_sort, visibility_pass_pallas

        alive_f = alive.astype(jnp.float32)
        # attr planes ride along via tri_id indirection: sort a slot
        # permutation and remap both tri_id and the attr gather index
        slot_id = jnp.arange(vis.shape[0], dtype=jnp.int32)
        vis_s, bbox_s, alive_s, slot_s = morton_sort(
            vis, bbox, alive_f, slot_id, width, height
        )
        z, idx, hit = visibility_pass_pallas(
            vis_s, alive_s, bbox_s, width, height, interpret=interpret
        )
        # map sorted-slot winner back to original slot for attr/meta gathers
        idx = jnp.where(hit, take_iso(slot_s, jnp.maximum(idx, 0)), -1)
    else:
        z, idx, hit = visibility_pass(vis, alive.astype(jnp.float32), width, height)
    if not mega:
        ao_img = None
        if ao_taps:
            from .ao import ssao_pass

            ao_img = ssao_pass(
                z, hit, proj[2, 2], proj[2, 3], uniforms["ao_radius"],
                2.0 / (proj[1, 1] * height), ao_taps,
            )
        shaded, wrote = shade_pass(
            z, idx, hit, attr, tri_id, d3, atlas, lights, uniforms, width, height,
            sample_mode, shaders=shaders, has_fog=has_fog, has_blend=has_blend,
            has_material=has_material, has_matmap=has_matmap,
            shadow=(
                (shadow_rows, shadow_params, shadow_spec)
                if shadow_spec is not None
                else None
            ),
            ao=ao_img,
            brdf_ggx=brdf_ggx,
            tonemap=tonemap,
        )
        frame, z_eff = compose_opaque(shaded, wrote, z, background)

    if refl_samples > 0:
        # GGX reflection rays (the reference's reflection_samples knob,
        # SceneVM 3d_shader.wgsl:764-826) — deferred wavefront pass over
        # the covered pixels, composited in linear space on the opaque
        # layer here; the transparency loop below runs the same pass per
        # peeled layer (the WGSL reflection loop executes inside its layer
        # loop, 3d_shader.wgsl:760-826)
        from .reflect import apply_reflections, reflection_pass_scaled
        from .rt_kernel import RT_SLOT_LIMIT

        # spatial-index secondary-ray kernel: VMEM-table size gate is a
        # STATIC shape check inside the trace (no new caller plumbing)
        rt_pallas = use_pallas and d3["pos"].shape[0] <= RT_SLOT_LIMIT

        if mega:
            # the megakernel keeps its winner in-kernel; the pre-pass
            # Pallas visibility (shared with AO) rebuilt (z, idx, hit)
            # and mapped the winners back through the sort permutation
            z_r, i_r, hit_r = z_pre, idx_pre, hit_pre
        else:
            z_r, i_r, hit_r = z, idx, hit
        refl, rmask = reflection_pass_scaled(
            z_r, i_r, hit_r, attr, tri_id, d3, atlas, lights, uniforms,
            width, height, sample_mode, refl_samples, shaders,
            has_blend, has_material, has_matmap,
            live_ranges=refl_ranges, scale=refl_scale, rt_pallas=rt_pallas,
            shadow_rows=shadow_rows, shadow_params=shadow_params,
            shadow_spec=shadow_spec,
        )
        frame = apply_reflections(frame, refl, rmask, tonemap=tonemap)

    if sky_light:
        # directional sky-bounce ambient (WGSL sky_contribution,
        # 3d_shader.wgsl:744-758): one mirror-direction visibility ray per
        # pixel adds sky-tinted ambient on upward-facing, sky-seeing
        # surfaces, scaled by AO exactly where the WGSL multiplies * ao
        from .reflect import apply_reflections as _apply_term
        from .reflect import sky_light_pass

        from .rt_kernel import RT_SLOT_LIMIT

        if mega:
            z_s, i_sky, hit_s = z_pre, idx_pre, hit_pre
        else:
            z_s, i_sky, hit_s = z, idx, hit
        sky_term, sky_mask = sky_light_pass(
            z_s, i_sky, hit_s, attr, tri_id, d3, atlas, uniforms,
            width, height, sample_mode, shaders, has_blend, has_material,
            has_matmap, live_ranges=refl_ranges,
            rt_pallas=use_pallas and d3["pos"].shape[0] <= RT_SLOT_LIMIT,
        )
        if ao_taps:
            sky_term = sky_term * ao_img[..., None]
        frame = _apply_term(frame, sky_term, sky_mask, tonemap=tonemap)

    if has_sky:
        from .composite import sky_miss_pass

        frame = sky_miss_pass(frame, z_eff, sky_pre, uniforms, width, height)

    if has_brush:
        from .composite import brush_preview_pass

        frame = brush_preview_pass(frame, z_eff, uniforms, width, height)

    if has_opacity:
        vis_o, attr_o, bbox_o, alive_o, tri_id_o = setup_pass(
            d3_op["pos"], d3_op["uv"], d3_op["nrm"], d3_op["valid"], d3_op["cull"],
            view, proj, width, height,
        )
        # depth-peeled transparency: layer k is the k-th nearest transparent
        # surface (strictly farther than layer k-1 via the raw-invz ceiling),
        # composited back-to-front over the opaque frame. Layer count is the
        # SceneVM's max_transparency_bounces (its front-to-back loop,
        # 3d_shader.wgsl:692-846); 1 == the reference rasterizer's single
        # opacity buffer (rasterizer.rs:1425, 464-495).
        alive_of = alive_o.astype(jnp.float32)
        layers = []
        ceil_o = None
        for _layer in range(transparency_layers):
            z_o, idx_o, hit_o, inv_o = visibility_pass(
                vis_o, alive_of, width, height, z_ceil=ceil_o,
                return_invz=True,
            )
            color_o, zeff_o, _ = _shade_opacity(
                z_o, idx_o, hit_o, attr_o, tri_id_o, d3_op, atlas, uniforms,
                width, height, sample_mode, shaders,
            )
            if refl_samples > 0:
                # per-layer GGX reflections (the WGSL runs its reflection
                # loop inside the transparency layer loop,
                # 3d_shader.wgsl:760-826): the G-buffer comes from the
                # layer's own surfaces, rays trace + shade against the
                # OPAQUE scene pack (transparent geometry not
                # self-reflecting is the documented divergence — the
                # shipped content has no metallic glass)
                from .reflect import (
                    apply_reflections as _apply_refl_o,
                    reflection_pass_scaled as _refl_scaled_o,
                )
                from .rt_kernel import RT_SLOT_LIMIT as _RT_LIM

                refl_o, rmask_o = _refl_scaled_o(
                    z_o, idx_o, hit_o, attr_o, tri_id_o, d3_op, atlas,
                    lights, uniforms, width, height, sample_mode,
                    refl_samples, shaders, has_blend, has_material,
                    has_matmap, live_ranges=refl_ranges, scale=refl_scale,
                    rt_pallas=(
                        use_pallas and d3["pos"].shape[0] <= _RT_LIM
                    ),
                    shadow_rows=shadow_rows, shadow_params=shadow_params,
                    shadow_spec=shadow_spec, scene_d3=d3,
                )
                # the layer color is display-encoded with the fast sRGB
                # pair (_shade_opacity) regardless of the frame tonemap —
                # decode/re-encode with that same transfer
                color_o = _apply_refl_o(
                    color_o, refl_o, rmask_o, tonemap=False
                )
            layers.append((color_o, zeff_o))
            ceil_o = inv_o
        for color_o, zeff_o in reversed(layers):
            frame = blend_opacity(
                frame, z_eff, color_o, zeff_o, preserve_transparency
            )

    if has_d2:
        frame = d2_pass(
            frame,
            d2,
            atlas,
            lights,
            uniforms,
            width,
            height,
            sample_mode,
            preserve_transparency,
            has_lights=has_lights,
            has_ambient=has_ambient,
            shaders=shaders,
        )

    return frame_to_u8(frame)


@partial(
    jax.jit,
    static_argnames=(
        "arena_layout",
        "width",
        "height",
        "sample_mode",
        "preserve_transparency",
        "has_ambient",
        "has_lights",
        "has_opacity",
        "has_d2",
        "shaders",
        "use_pallas",
        "has_sky",
        "has_fog",
        "has_blend",
        "has_brush",
        "has_dyn",
        "has_material",
        "has_matmap",
        "light_spec",
        "sun_off",
        "shadow_spec",
        "shadow_dyn",
        "ao_taps",
        "brdf_ggx",
        "tonemap",
        "refl_samples",
        "refl_ranges",
        "refl_scale",
        "sky_light",
        "transparency_layers",
    ),
)
def render_frame_arena(
    d3,
    d3_op,
    d2,
    atlas,
    background,
    arena,
    arena_layout,
    width: int,
    height: int,
    sample_mode: int = 0,
    preserve_transparency: bool = False,
    has_ambient: bool = False,
    has_lights: bool = False,
    has_opacity: bool = False,
    has_d2: bool = False,
    shaders: tuple = (),
    use_pallas: bool = False,
    has_sky: bool = False,
    has_fog: bool = False,
    sky_pre: dict = None,
    has_blend: bool = False,
    has_brush: bool = False,
    has_dyn: bool = False,
    has_material: bool = False,
    has_matmap: bool = False,
    light_spec: tuple = None,
    sun_off: bool = False,
    shadow_rows=None,
    shadow_params=None,
    shadow_spec: tuple = None,
    shadow_dyn: bool = False,
    shadow_cams=None,
    ao_taps: tuple = None,
    brdf_ggx: bool = False,
    tonemap: bool = False,
    refl_samples: int = 0,
    refl_ranges: tuple = None,
    refl_scale: int = 1,
    sky_light: bool = False,
    transparency_layers: int = 1,
):
    """render_frame behind ONE per-frame upload: the dynamic packs, lights
    and uniforms arrive as a single uint32 arena (see ops/arena.py) and are
    sliced back out here, inside the trace, where it costs nothing. ~90
    per-leaf transfers x ~0.05 ms tunnel latency was most of the engine
    loop's frame time."""
    from .arena import unpack_arena

    d3_dyn, d3_op_dyn, d2_dyn, lights, uniforms = unpack_arena(
        arena, arena_layout
    )
    return render_frame(
        d3, d3_op, d2, lights, atlas, uniforms, background, width, height,
        sample_mode, preserve_transparency, has_ambient, has_lights,
        has_opacity, has_d2, shaders, use_pallas, has_sky, has_fog, sky_pre,
        has_blend, has_brush, has_dyn, d3_dyn, d3_op_dyn, d2_dyn,
        has_material, has_matmap, light_spec, sun_off,
        shadow_rows, shadow_params, shadow_spec, shadow_dyn, shadow_cams,
        ao_taps, brdf_ggx, tonemap, refl_samples, refl_ranges, refl_scale,
        sky_light, transparency_layers,
    )


def draw_lines_bresenham(pixels: np.ndarray, segments: np.ndarray, colors: np.ndarray):
    """Exact port of rasterize_line_bresenham (src/rasterizer.rs:1777-1841)
    over the full frame (tile union ≡ full frame). Mutates `pixels` (H,W,4)."""
    from ..native import draw_lines_native

    if len(segments) and draw_lines_native(pixels, segments, colors):
        return
    h, w = pixels.shape[:2]
    for (x0f, y0f, x1f, y1f), color in zip(segments, colors):
        x0, y0, x1, y1 = int(x0f), int(y0f), int(x1f), int(y1f)
        dx = abs(x1 - x0)
        dy = abs(y1 - y0)
        sx = 1 if x0 < x1 else -1
        sy = 1 if y0 < y1 else -1
        err = dx - dy
        x, y = x0, y0
        while x != x1 or y != y1:
            if 0 <= x < w and 0 <= y < h:
                pixels[y, x] = color
            e2 = err * 2
            if e2 > -dy:
                err -= dy
                x += sx
            if e2 < dx:
                err += dx
                y += sy


@dataclass
class BrushPreview:
    """Editor brush highlight (reference rasterizer.rs:13-17)."""

    position: np.ndarray
    radius: float = 1.0
    falloff: float = 0.5


#: process-wide device-resident scene cache (survives Rasterizer instances —
#: the reference constructs a fresh Rasterizer::setup every frame)
_SCENE_CACHE: dict = {}
_BG_CACHE: dict = {}
# id(host bg array) -> device copy; host arrays are kept alive by _BG_CACHE
# so their ids are stable while cached
_BG_DEV_CACHE: dict = {}
# (id(sky node), hour) -> device sky params; sky_device_params uploads 7
# arrays, which over the tunnel would otherwise cost per-frame latency
_SKY_DEV_CACHE: dict = {}
# shadow-map bakes: (scene uid, revision, assets uid, config, cast-light
# snapshot, sun snapshot) -> (rows_dev, params_dev, params_np, spec).
# Static scenes with static lights bake once; a moving shadow light re-bakes
# only when its rounded position/range changes.
_SHADOW_CACHE: dict = {}


class Rasterizer:
    """Public API mirroring the reference (src/rasterizer.rs:92-185)."""

    def __init__(self, projection_matrix_2d, view_matrix, projection_matrix):
        self.projection_matrix_2d = projection_matrix_2d
        self.view_matrix = np.asarray(view_matrix, np.float32)
        self.projection_matrix = np.asarray(projection_matrix, np.float32)
        self.inverse_view_matrix = invert(self.view_matrix)
        self.inverse_projection_matrix = invert(self.projection_matrix)
        self.camera_pos = self.inverse_view_matrix[:3, 3].copy()

        if projection_matrix_2d is not None:
            m = np.asarray(projection_matrix_2d, np.float32)
            self.translationd2 = np.array([m[0, 2], m[1, 2]], np.float32)
            self.scaled2 = float(m[0, 0])
            self.proj2d = m
        else:
            self.translationd2 = np.zeros(2, np.float32)
            self.scaled2 = 1.0
            self.proj2d = np.eye(3, dtype=np.float32)

        from ..models.blend import RenderMode

        self.render_mode = RenderMode.render_all()
        self.sample_mode = SampleMode.Nearest
        self.background_color: Optional[tuple] = None
        self.ambient_color: Optional[np.ndarray] = None
        self.preserve_transparency = False
        self.hour = 12.0
        self.time = 0.0
        self.sun_dir: Optional[np.ndarray] = None
        self.sun_color: Optional[np.ndarray] = None
        self.day_factor = 0.0
        self._rs_has_fog = False
        self._rs_shadow_distance = 50.0
        self._rs_shadow_steps = 16.0
        self._rs_ao_samples = 4.0
        self._rs_ao_radius = 0.5
        self._rs_sky_distance = 50.0
        self._rs_bump_strength = 1.0
        #: GGX reflection rays per pixel (0 = off; the reference's
        #: RenderSettings reflection_samples, consumed by its SceneVM loop
        #: 3d_shader.wgsl:764-826) — set_reflections() / apply_render_settings
        self.reflection_samples = 0
        #: reflection resolution divisor (1 = reference-exact full res;
        #: 2 = quarter the rays + bilinear upsample — rough-lobe
        #: reflections are low-frequency) — set_reflections(scale=...)
        self.reflection_scale = 1
        #: directional sky-bounce ambient (the WGSL sky_contribution,
        #: 3d_shader.wgsl:744-758) — one mirror-direction visibility ray
        #: per pixel; see set_sky_light()
        self.sky_light_enabled = False
        #: depth-peeled transparency layers (1 = the reference rasterizer's
        #: single opacity buffer; >1 = the SceneVM front-to-back layer loop
        #: bounded by max_transparency_bounces, 3d_shader.wgsl:692)
        self.transparency_layers = 1
        #: per-light geometry shadows (None = off) — see set_shadows()
        self.shadow_settings = None
        #: screen-space ambient occlusion (None = off) — see
        #: set_ambient_occlusion()
        self.ao_settings = None
        self.hash_anim = 0
        self.render_graph = None
        self.mapmini = None
        self.brush_preview = None

        from .visibility_pallas import pallas_supported

        #: tile-kernel visibility (Pallas) on real TPUs; XLA elsewhere
        self.use_pallas = pallas_supported()

        self._fog_color = np.zeros(4, np.float32)
        self._fog_end = 1e9
        self._fog_fade = 1.0
        #: fog falloff: 0 = the ShapeFX Fog node's linear fade
        #: (shapefx.rs:1071-1083), 1 = the SceneVM exp^2 fog that
        #: RenderSettings fog_density drives (3d_shader.wgsl:857-868)
        self._fog_mode = 0.0
        self._fog_density = 0.0
        self._sky_node = None

        self._palette = np.zeros((1, 3), np.float32)
        self._last_size = (1, 1)
        #: supersampled antialiasing: render at n x the requested
        #: resolution and box-filter down ON DEVICE (beyond-reference
        #: feature — the reference has no AA; the TPU has the pixel rate:
        #: map@1080p ssaa=2 renders the same 4K frame the 4K bench does)
        self.supersample = 1
        #: direct-light shading model: "fast" (Blinn-Phong, the reference
        #: rasterizer's live path) or "ggx" (Cook-Torrance, the SceneVM
        #: pbr_lighting / dormant _shade_brdf) — set_brdf()
        self.brdf = "fast"
        #: display transform: "srgb" = the Rust renderer's fast sRGB
        #: polynomial (rasterizer.rs:27-33); "scenevm" = Reinhard + gamma
        #: 2.2, the transfer the reference's live game path applies
        #: (3d_shader.wgsl:871-873) — see set_tonemap()
        self.tonemap = "srgb"

    @staticmethod
    def setup(projection_matrix_2d, view_matrix, projection_matrix) -> "Rasterizer":
        return Rasterizer(projection_matrix_2d, view_matrix, projection_matrix)

    def set_supersample(self, n: int) -> "Rasterizer":
        """Render at n x n samples per pixel (box filter). n=1 disables."""
        self.supersample = max(1, int(n))
        return self

    def set_brdf(self, model: str) -> "Rasterizer":
        """Select the direct-light shading model for the 3D pass.

        "fast": Blinn-Phong with Schlick Fresnel — the reference
        rasterizer's live path (rasterizer.rs:1906-1951).
        "ggx": full Cook-Torrance (GGX NDF, height-correlated Smith G,
        Schlick Fresnel) — the model the reference's live SceneVM game path
        shades every pixel with (embedded/shader/3d_shader.wgsl:559-650)
        and its Rust side keeps dormant (`_shade_brdf`,
        rasterizer.rs:1954-2009). Applies to both the megakernel and the
        XLA shade path; ambient/hemisphere terms are shared."""
        model = str(model).lower()
        if model not in ("fast", "ggx"):
            raise ValueError(f"unknown brdf model '{model}' (fast|ggx)")
        self.brdf = model
        return self

    def set_tonemap(self, mode: str) -> "Rasterizer":
        """Select the display transform for lit 3D pixels.

        "srgb" (default): the Rust renderer's fast sRGB polynomial
        (rasterizer.rs:27-33) — matches the reference's rasterizer path
        and all golden screenshots.
        "scenevm": Reinhard tone mapping + gamma 2.2
        (c/(c+1), pow 1/2.2 — embedded/shader/3d_shader.wgsl:871-873),
        the transfer the reference's live SceneVM game path displays
        through. Applies to megakernel + XLA shading and the reflection
        composite; fullbright texels and the unlit opacity/2D passes keep
        their raw sRGB bytes (our documented fullbright semantics)."""
        mode = str(mode).lower()
        if mode not in ("srgb", "scenevm"):
            raise ValueError(f"unknown tonemap '{mode}' (srgb|scenevm)")
        self.tonemap = mode
        return self

    def set_reflections(self, samples: int, scale: int = None) -> "Rasterizer":
        """GGX importance-sampled reflection rays per pixel (0 disables)
        — the reference's `reflection_samples` RenderSettings knob, whose
        SceneVM loop traces per-pixel GGX rays and Fresnel-blends the
        result (embedded/shader/3d_shader.wgsl:764-826). Range-capped by
        max_sky_distance, exactly like the WGSL (gp6.y). See
        ops/reflect.py for the deferred wavefront realization. `scale`
        (beyond-reference knob): render reflections at 1/scale resolution
        and upsample — the ray count is the cost floor."""
        self.reflection_samples = max(0, int(samples))
        if scale is not None:
            self.reflection_scale = max(1, int(scale))
        return self

    def set_sky_light(self, enabled: bool = True) -> "Rasterizer":
        """Directional sky-bounce ambient: per pixel, trace ONE ray along
        reflect(view, N) up to max_sky_distance; if it reaches the sky,
        add sky_rgb * max(N.up, 0) * albedo (* AO when AO is on) — the
        reference SceneVM's `sky_contribution`
        (embedded/shader/3d_shader.wgsl:744-758, always on there when
        max_sky_distance > 0). Opt-in here because it costs a wavefront
        intersect per frame (~the reflection pass's intersect floor);
        rides the same G-buffer/visibility pre-pass and live-range chunk
        skipping as reflections."""
        self.sky_light_enabled = bool(enabled)
        return self

    def set_shadows(
        self,
        enabled: bool = True,
        *,
        res: int = 128,
        sun_res: int = 256,
        max_lights: int = 4,
        bias: float = 0.05,
        dynamic_casters: bool = True,
    ) -> "Rasterizer":
        """Per-light geometry shadows for the 3D pass (the reference's
        SceneVM trace_shadow family, embedded/shader/3d_shader.wgsl:436-517).

        Point/spot lights render 6-face cube depth maps at `res`^2, the sun
        one `sun_res`^2 pseudo-directional map (ops/shadow.py); up to
        `max_lights` brightest point/spot lights cast. Static maps bake
        from the STATIC scene geometry and cache until the scene revision
        or a casting light's position changes; with `dynamic_casters` (the
        default) the per-frame dynamic pack (entity/item billboards)
        min-composites its depth into every map each frame, so dynamics
        occlude light like the reference's trace_shadow_unified ->
        trace_billboards (3d_shader.wgsl:436-460, 297-327).
        `max_shadow_distance` / `max_shadow_steps` from
        apply_render_settings control the occluder range cap and
        transparency-aware shadows (steps > 0 + opacity batches present)."""
        if enabled:
            self.shadow_settings = {
                "res": int(res),
                "sun_res": int(sun_res),
                "max_lights": int(max_lights),
                "bias": float(bias),
                "dynamic_casters": bool(dynamic_casters),
            }
        else:
            self.shadow_settings = None
        return self

    def set_ambient_occlusion(
        self, enabled: bool = True, samples: int = None, radius: float = None
    ) -> "Rasterizer":
        """Hemisphere ambient occlusion for the 3D pass (the reference's
        SceneVM compute_ao, embedded/shader/3d_shader.wgsl:519-560; samples/
        radius default to RenderSettings ao_samples/ao_radius via
        apply_render_settings). TPU realization is a screen-space pass on
        the visibility depth (ops/ao.py) that scales only the ambient
        terms, exactly where the reference applies `ao`. samples == 0 or
        radius <= 0 disables the pass (compute_ao's early return)."""
        if enabled:
            self.ao_settings = {
                "samples": None if samples is None else int(samples),
                "radius": None if radius is None else float(radius),
            }
        else:
            self.ao_settings = None
        return self

    # builder-style setters (rasterizer.rs:155-182)
    def set_render_mode(self, mode) -> "Rasterizer":
        self.render_mode = mode
        return self

    def background(self, pixel) -> "Rasterizer":
        self.background_color = tuple(int(c) for c in pixel)
        return self

    def ambient(self, rgba) -> "Rasterizer":
        self.ambient_color = np.asarray(rgba, np.float32)
        return self

    def set_sample_mode(self, mode) -> "Rasterizer":
        self.sample_mode = mode
        return self

    def set_time(self, t: float) -> "Rasterizer":
        self.time = t
        return self

    def apply_render_settings(self, rs, hour: float = None) -> "Rasterizer":
        """Plumb a RenderSettings block into the renderer uniforms
        (reference src/render_settings.rs:10-120 + apply_hour :282).

        sky_color -> background fill; sun -> directional sun radiance;
        ambient_color*strength -> hemisphere ambient; fog_density -> the
        distance-fog blend (density d == fog factor clip(dist*d))."""
        if hour is not None:
            self.hour = hour
        if rs.simulation.enabled:
            rs.apply_hour(self.hour)
        self.background_color = tuple(
            int(round(c * 255.0)) for c in rs.sky_color
        ) + (255,)
        if rs.sun_enabled:
            self.sun_dir = np.asarray(rs.sun_direction, np.float32)
            self.sun_color = np.asarray(rs.sun_color, np.float32)
            self.day_factor = float(rs.sun_intensity)
        else:
            self.sun_dir = None
            self.day_factor = 0.0
        amb = np.asarray(rs.ambient_color, np.float32) * float(rs.ambient_strength)
        self.ambient_color = np.concatenate([amb, [1.0]]).astype(np.float32)
        self._rs_shadow_distance = float(rs.max_shadow_distance)
        self._rs_shadow_steps = float(rs.max_shadow_steps)
        self._rs_ao_samples = float(rs.ao_samples)
        self._rs_ao_radius = float(rs.ao_radius)
        self._rs_sky_distance = float(rs.max_sky_distance)
        self.reflection_samples = max(0, int(rs.reflection_samples))
        self.transparency_layers = int(np.clip(rs.max_transparency_bounces, 1, 8))
        self._rs_bump_strength = float(np.clip(rs.bump_strength, 0.0, 1.0))
        if rs.fog_density > 0.0:
            self._rs_has_fog = True
            self._fog_color = np.asarray(
                tuple(rs.fog_color) + (1.0,), np.float32
            )
            # the RenderSettings block IS the SceneVM uniform block: its
            # consumer fogs exp^2 (1 - exp(-density*d^2), 3d_shader.wgsl:
            # 857-868); the linear end/fade stay populated as a fallback
            self._fog_mode = 1.0
            self._fog_density = float(rs.fog_density)
            self._fog_end = 0.0
            self._fog_fade = 1.0 / max(float(rs.fog_density), 1e-6)
        else:
            self._rs_has_fog = False
            self._fog_mode = 0.0
        return self

    # -- helpers --

    def _background_array(self, scene, width, height) -> np.ndarray:
        """Background fill + optional background shader bake
        (rasterizer.rs:277-308). Returns (H,W,4) f32 0..1."""
        key = (
            getattr(scene, "_cache_uid", None),
            scene.background is not None,
            width,
            height,
            self.background_color,
        )
        cached = _BG_CACHE.get(key)
        if cached is not None:
            return cached
        if scene.background is not None:
            bg_u8 = np.asarray(scene.background.shade_grid(width, height, np))
            bg = bg_u8.astype(np.float32) / 255.0
        elif self.background_color is not None:
            bg = np.broadcast_to(
                np.asarray(self.background_color, np.float32) / 255.0, (height, width, 4)
            ).copy()
        else:
            bg = np.zeros((height, width, 4), np.float32)
        if len(_BG_CACHE) > 8:
            # evict both caches together: _BG_DEV_CACHE keys on id() of
            # these host arrays, which is only stable while they're alive
            _BG_CACHE.clear()
            _BG_DEV_CACHE.clear()
        _BG_CACHE[key] = bg
        return bg

    def _flicker_factors(self, lights) -> np.ndarray:
        """Per-light flicker factor for this frame
        (reference light.rs:656-672 — constant per light per frame)."""
        out = np.ones(len(lights["valid"]), np.float32)
        for i in range(len(out)):
            fl = float(lights["flicker"][i])
            if fl > 0.0:
                x, y, z = lights["position"][i]

                def as_u32(val):
                    if not np.isfinite(val) or val <= 0.0:
                        return 0
                    return min(int(val), 0xFFFFFFFF)

                combined = (
                    self.hash_anim + (as_u32(x) + as_u32(y) + as_u32(z)) * 100
                ) & 0xFFFFFFFF
                out[i] = 1.0 - min(1.0, combined / 0xFFFFFFFF) * fl
        return out

    def _uniforms(self, scene) -> dict:
        amb = (
            self.ambient_color
            if self.ambient_color is not None
            else np.zeros(4, np.float32)
        )
        sun = self.sun_dir if self.sun_dir is not None else np.array([0, -1, 0], np.float32)
        sun_c = (
            self.sun_color if self.sun_color is not None else np.ones(3, np.float32)
        )
        # numpy leaves on purpose: rasterize() device_puts the whole
        # per-frame pytree in ONE batched transfer (82 individual
        # device_puts/frame dominated the engine loop over the dev tunnel)
        return {
            "view": np.asarray(self.view_matrix, np.float32),
            "proj": np.asarray(self.projection_matrix, np.float32),
            "inv_view": np.asarray(self.inverse_view_matrix, np.float32),
            "inv_proj": np.asarray(self.inverse_projection_matrix, np.float32),
            "camera_pos": np.asarray(self.camera_pos, np.float32),
            "ambient": np.asarray(amb, np.float32),
            "has_ambient": np.float32(1.0 if self.ambient_color is not None else 0.0),
            "sun_dir": np.asarray(sun, np.float32),
            "sun_color": np.asarray(sun_c, np.float32),
            "day_factor": np.float32(self.day_factor),
            "has_sun": np.float32(1.0 if (self.sun_dir is not None and self.day_factor > 0) else 0.0),
            "anim_frame": np.int32(scene.animation_frame),
            "proj2d": np.asarray(self.proj2d, np.float32),
            "translationd2": np.asarray(self.translationd2, np.float32),
            "scaled2": np.float32(self.scaled2),
            "time": np.float32(self.time),
            "palette": np.asarray(self._palette, np.float32),
            "fog_color": np.asarray(self._fog_color, np.float32),
            "fog_end": np.float32(self._fog_end),
            "fog_fade": np.float32(self._fog_fade),
            "fog_mode": np.float32(self._fog_mode),
            "fog_density": np.float32(self._fog_density),
            "ao_radius": np.float32(self._ao_radius_eff()),
            "refl_dist": np.float32(self._rs_sky_distance),
            "refl_sky": self._refl_sky_linear(),
            "bump_strength": np.float32(self._rs_bump_strength),
        }

    def _refl_live_ranges(self, packed, d3_dyn) -> tuple:
        """Static (start, end) live-slot ranges in the CONCATENATED d3
        space, rounded up to the reflect chunk size — lets the reflection
        intersect drop the pack's dead-padding chunks from its scan
        statically (ops/reflect.py intersect_rays live_ranges). Falls back
        to None (scan everything) if the static pack ever violates the
        live-slots-are-a-prefix invariant.

        MUST be called with the HOST-side (numpy) dynamic pack, BEFORE the
        per-frame device_put: reading a device `valid` back would be a
        per-frame D2H sync on the hot loop. The dynamic range covers the
        pack's FULL capacity (not the live count): the returned tuple is a
        jit static, and a live count wobbling across a chunk boundary
        frame-to-frame would silently retrigger a full render_frame
        compile mid-run. Capacity is stable (stable_dynamic_caps); dead
        dyn slots inside the range are masked by their valid flag."""
        if self.reflection_samples <= 0 and not self.sky_light_enabled:
            return None
        from .reflect import REFLECT_CHUNK as _RC

        ranges = []
        v = np.asarray(packed.d3.valid)
        n_static = int((v > 0.5).sum())
        if n_static and not (v[:n_static] > 0.5).all():
            return None
        cap_static = v.shape[0]
        if n_static:
            ranges.append((0, min(cap_static, -(-n_static // _RC) * _RC)))
        if d3_dyn is not None:
            cap_dyn = int(d3_dyn["valid"].shape[0])  # shape only: no D2H
            if cap_dyn:
                ranges.append((cap_static, cap_static + cap_dyn))
        return tuple(ranges) if ranges else None

    def _refl_sky_linear(self) -> np.ndarray:
        """Linear sky color reflected by rays that miss (the WGSL picks
        gp0 = sky_color when set, else the background, 3d_shader.wgsl:797).
        Our background fill IS the sky color after apply_render_settings."""
        from ..utils.color import srgb_to_linear_fast as _s2l

        bg = self.background_color
        if bg is None:
            return np.zeros(3, np.float32)
        return np.asarray(
            _s2l(np.asarray(bg[:3], np.float32) / 255.0), np.float32
        )

    def _ao_radius_eff(self) -> float:
        if self.ao_settings is None:
            return 0.0
        r = self.ao_settings["radius"]
        return float(self._rs_ao_radius if r is None else r)

    def _ao_taps(self):
        """Static tap tuple for this frame's AO config (None = AO off)."""
        if self.ao_settings is None:
            return None
        n = self.ao_settings["samples"]
        n = int(self._rs_ao_samples if n is None else n)
        if n <= 0 or self._ao_radius_eff() <= 0.0:
            return None  # compute_ao early-return semantics
        from .ao import tap_offsets

        return tap_offsets(n)

    def _shadow_pack(self, cache, packed, lights, scene_key):
        """Bake (or fetch cached) shadow maps for this frame's casting
        lights -> (rows_dev, params_dev, params_np, spec, cams_dev) or
        Nones. cams_dev: the per-entry camera pack the per-frame dynamic
        caster composite re-renders with (ops/shadow.py bake_shadow_cams)."""
        cfg = self.shadow_settings
        types = np.asarray(lights["type"])
        valid = np.asarray(lights["valid"])
        inten = np.asarray(lights["intensity"])
        rows_idx = [
            i
            for i in range(len(types))
            if valid[i] > 0.5 and int(types[i]) in (0, 3)  # point / spot
        ]
        rows_idx.sort(key=lambda i: -float(inten[i]))
        cast = sorted(rows_idx[: cfg["max_lights"]])
        sun_dir = (
            self.sun_dir
            if (self.sun_dir is not None and self.day_factor > 0)
            else None
        )
        if not cast and sun_dir is None:
            return None, None, None, None, None
        with_trans = self._rs_shadow_steps > 0 and bool(
            packed.d3_opacity.valid.any()
        )
        # depth-peeled transmittance layers per map: the reference walks
        # up to max_shadow_steps transparent surfaces per shadow ray
        # (3d_shader.wgsl:484); 4 peels cover any shipped content while
        # bounding map storage at 8 extra planes
        trans_steps = int(np.clip(self._rs_shadow_steps, 1, 4))
        light_key = tuple(
            (
                i,
                tuple(np.round(lights["position"][i], 4).tolist()),
                round(float(lights["end"][i]), 4),
            )
            for i in cast
        )
        sun_key = (
            tuple(np.round(sun_dir, 4).tolist()) if sun_dir is not None else None
        )
        key = (
            scene_key,
            tuple(sorted(cfg.items())),
            light_key,
            sun_key,
            round(self._rs_shadow_distance, 4),
            with_trans,
            trans_steps,
        )
        hit = _SHADOW_CACHE.get(key)
        if hit is not None:
            return hit
        from .shadow import bake_shadow_cams, bake_shadow_pack, scene_bounds

        bounds = scene_bounds(packed.d3.pos, packed.d3.valid)
        rows, params_np, spec = bake_shadow_pack(
            cache["d3"],
            cache["d3_op"] if with_trans else None,
            lights,
            cast,
            sun_dir,
            res=cfg["res"],
            sun_res=cfg["sun_res"],
            with_trans=with_trans,
            trans_steps=trans_steps,
            max_shadow_distance=self._rs_shadow_distance,
            bias=cfg["bias"],
            bounds=bounds,
        )
        cams = bake_shadow_cams(lights, spec, sun_dir, bounds)
        entry = (
            rows.reshape(-1),
            jax.device_put(params_np),
            params_np,
            spec,
            jax.device_put(cams) if cams is not None else None,
        )
        if len(_SHADOW_CACHE) > 8:
            _SHADOW_CACHE.clear()
        _SHADOW_CACHE[key] = entry
        return entry

    def screen_to_world(self, x: float, y: float, z_ndc: float) -> np.ndarray:
        """reference rasterizer.rs:1707-1728 (host-side picking)."""
        w, h = self._last_size
        ndc = np.array(
            [2.0 * (x / w) - 1.0, 1.0 - 2.0 * (y / h), z_ndc, 1.0], np.float32
        )
        view = self.inverse_projection_matrix @ ndc
        view = view / view[3]
        world = self.inverse_view_matrix @ view
        return world[:3]

    def screen_ray(self, x: float, y: float):
        """reference rasterizer.rs:1844-1871."""
        from ..models.camera import Ray

        near = self.screen_to_world(x, y, -1.0)
        far = self.screen_to_world(x, y, 1.0)
        d = far - near
        d = d / max(np.linalg.norm(d), 1e-20)
        return Ray(near, d.astype(np.float32))

    def rasterize(
        self,
        scene,
        width: int,
        height: int,
        tile_size: int = 128,
        assets=None,
        packed: Optional[PackedScene] = None,
        readback: bool = True,
        mesh=None,
    ) -> np.ndarray:
        """Render the scene -> (H, W, 4) uint8 numpy frame.

        `tile_size` is accepted for API parity; device tiling is chosen by
        the kernels. `readback=False` returns the jax device array instead
        (no D2H transfer — for pipelines that keep consuming on device);
        host-side 2D line overlays are skipped in that mode.

        `mesh`: a jax.sharding.Mesh (parallel.mesh.make_mesh) renders the
        frame MULTI-CHIP — triangles dp-sharded through setup, the
        framebuffer row-sharded through every downstream pass, with the
        full feature family (shadows/AO/GGX/reflections/sky light/fog/
        transparency/2D) riding along; parity with the single-chip frame
        is byte-exact (tests/test_multichip.py). Reflections render
        full-res on this path (the half-res knob stays single-chip)."""
        from ..models.assets import Assets

        if assets is None:
            assets = Assets.default()

        self.hash_anim = hash_u32(scene.animation_frame & 0xFFFFFFFF)
        self._palette = assets.palette
        self._last_size = (width, height)
        # SSAA: the whole pipeline below renders at the scaled resolution
        # (projection matrices are aspect-only, so they hold); the frame
        # box-filters back down on device just before the exit paths
        ss = max(1, int(self.supersample))
        width, height = width * ss, height * ss

        # render graph hit/miss hooks (reference rasterizer.rs:227-253):
        # Sky contributes sun_dir/day_factor/ambient + the miss pass;
        # Fog contributes the distance blend on hit geometry.
        has_sky = False
        has_fog = self._rs_has_fog
        sky_pre = None
        self._sky_node = None
        if self.render_graph is not None:
            from ..shapefx import ShapeFXRole
            from ..shapefx.render import sky_device_params

            hit_nodes = self.render_graph.collect_nodes_from(0, 0)
            miss_nodes = self.render_graph.collect_nodes_from(0, 1)
            for ni in hit_nodes + miss_nodes:
                node = self.render_graph.nodes[ni]
                result = node.render_setup(self.hour)
                if node.role == ShapeFXRole.Sky:
                    self._sky_node = node
                    if result is not None:
                        self.sun_dir, self.day_factor = result
                    amb = node.render_ambient_color(self.hour)
                    if amb is not None:
                        self.ambient_color = amb
                    if ni in miss_nodes:
                        has_sky = True
                        # the device copy is keyed on the precomputed
                        # CONTENT (6 vec4s, ~100 bytes): hour alone is not
                        # enough — sky_setup also reads node.values (palette
                        # edits change precomputed at a fixed hour)
                        snap = tuple(a.tobytes() for a in node.precomputed)
                        hit = _SKY_DEV_CACHE.get(id(node))
                        # the cached node rides along so its id() can't be
                        # GC-recycled onto a different node (same pitfall as
                        # the scene cache above)
                        if hit is not None and hit[0] is node and hit[2] == snap:
                            sky_pre = hit[1]
                        else:
                            if len(_SKY_DEV_CACHE) > 32:
                                _SKY_DEV_CACHE.clear()
                            sky_pre = sky_device_params(node)
                            _SKY_DEV_CACHE[id(node)] = (node, sky_pre, snap)
                elif node.role == ShapeFXRole.Fog and ni in hit_nodes:
                    has_fog = True
                    self._fog_color = node.precomputed[0]
                    self._fog_end = float(node.precomputed[1][0])
                    self._fog_fade = float(node.precomputed[1][1])
                    self._fog_mode = 0.0  # the node's linear fade

        # Device-resident scene cache: packing + upload happen only when the
        # scene content changes (scene.touch()); per-frame re-uploads are the
        # tunnel-latency killer the reference never had to think about.
        # NOTE: keyed by uuid tokens, not id() — CPython reuses object ids
        # after GC, which made a fresh scene hit a stale cache.
        import uuid as _uuid

        if not hasattr(scene, "_cache_uid"):
            scene._cache_uid = _uuid.uuid4().hex
        if not hasattr(assets, "_cache_uid"):
            assets._cache_uid = _uuid.uuid4().hex
        key = (scene._cache_uid, scene.revision, assets._cache_uid)
        cache = _SCENE_CACHE.get(key)
        if cache is None or packed is not None:
            if packed is None:
                packed = PackedScene.from_scene(scene, assets, static_only=True)
            atlas_np = packed.atlas_index.atlas
            cache = {
                "packed": packed,
                "atlas": {
                    "flat": jnp.asarray(atlas_np.data.reshape(-1, 4)),
                    "flat_u32": jnp.asarray(
                        np.ascontiguousarray(atlas_np.data.reshape(-1, 4))
                        .view(np.uint32)
                        .reshape(-1)
                    ),
                    "w": jnp.int32(atlas_np.data.shape[1]),
                    "rects": jnp.asarray(atlas_np.rects),
                    "tile_first": jnp.asarray(atlas_np.tile_first),
                    "tile_count": jnp.asarray(atlas_np.tile_count),
                },
                "d3": {k: jnp.asarray(v) for k, v in vars(packed.d3).items()},
                "d3_op": {
                    k: jnp.asarray(v) for k, v in vars(packed.d3_opacity).items()
                },
                "d2": {k: jnp.asarray(v) for k, v in vars(packed.d2).items()},
            }
            _SCENE_CACHE.clear()  # one live packed scene per process is enough
            _SCENE_CACHE[key] = cache
        self._scene_cache = cache
        packed = cache["packed"]
        atlas = cache["atlas"]
        d3 = cache["d3"]
        d3_op = cache["d3_op"]
        d2 = cache["d2"]

        # dynamic batches: packed fresh per frame into stable-capacity
        # buffers, concatenated on device — entity motion uploads a few KB
        has_dyn = bool(
            scene.d3_dynamic or scene.d3_dynamic_opacity or scene.d2_dynamic
        )
        d3_dyn = d3_op_dyn = d2_dyn = None
        dyn_lines = None
        if has_dyn:
            from .scene_pack import pack_dynamic, stable_dynamic_caps

            caps = stable_dynamic_caps(scene, cache.get("dyn_caps"))
            cache["dyn_caps"] = caps
            p3, p3op, p2, dyn_lines = pack_dynamic(
                scene, packed.atlas_index, *caps
            )
            # numpy until the single batched device_put below
            d3_dyn = dict(vars(p3))
            d3_op_dyn = dict(vars(p3op))
            d2_dyn = dict(vars(p2))

        if not self.render_mode.d3_active:
            d3 = dict(d3)
            d3["valid"] = jnp.zeros_like(d3["valid"])
            if d3_dyn is not None:
                d3_dyn = dict(d3_dyn)
                d3_dyn["valid"] = np.zeros_like(d3_dyn["valid"])
                d3_op_dyn = dict(d3_op_dyn)
                d3_op_dyn["valid"] = np.zeros_like(d3_op_dyn["valid"])

        # lights repack EVERY frame (they're tiny): the reference reads light
        # positions fresh per frame — examples animate scene.lights[0]
        # without touching the scene revision (examples/cube.rs:72-73)
        from ..models.light import pack_lights

        live_lights = scene.all_lights()
        cap = packed.lights["valid"].shape[0]
        if len(live_lights) > cap:
            from .scene_pack import next_pow2

            cap = next_pow2(len(live_lights), lo=4)
        lights = pack_lights(live_lights, cap)
        lights["flicker_factor"] = self._flicker_factors(lights)
        lights_dev = lights  # numpy until the batched device_put below
        light_count = len(live_lights)

        shadow_rows = shadow_params_dev = shadow_spec = shadow_cams = None
        if self.shadow_settings is not None and self.render_mode.d3_active:
            shadow_rows, shadow_params_dev, _sp_np, shadow_spec, shadow_cams = (
                self._shadow_pack(cache, packed, lights, key)
            )

        uniforms = self._uniforms(scene)
        if ss > 1:
            # 2D geometry lives in OUTPUT pixel coordinates; at the scaled
            # internal resolution the 2D projection's affine rows scale by
            # ss (x_int = ss*(scale*x + t)); grid-space world mapping uses
            # the scaled translation/scale pair the same way
            p2 = uniforms["proj2d"].copy()
            p2[:2, :] *= np.float32(ss)
            uniforms["proj2d"] = p2
            uniforms["translationd2"] = uniforms["translationd2"] * np.float32(ss)
            uniforms["scaled2"] = np.float32(uniforms["scaled2"] * ss)
        if self.brush_preview is not None:
            uniforms["brush_pos"] = np.asarray(
                self.brush_preview.position, np.float32
            )
            uniforms["brush_radius"] = np.float32(self.brush_preview.radius)
            uniforms["brush_falloff"] = np.float32(self.brush_preview.falloff)
        if packed.occlusion is not None:
            uniforms["occ_box"] = packed.occlusion["occ_box"]
            uniforms["occ_val"] = packed.occlusion["occ_val"]
        mini = scene.mapmini if scene.mapmini is not None else self.mapmini
        if mini is not None and getattr(mini, "all_linedefs", None):
            segs = mini.pack_device()
            uniforms["seg_a"] = segs["seg_a"]
            uniforms["seg_b"] = segs["seg_b"]
            uniforms["seg_valid"] = segs["seg_valid"]

        # ONE host->device transfer for every per-frame leaf. Even a single
        # batched device_put pytree issues one transfer per leaf (~0.05 ms
        # tunnel latency x ~90 leaves = most of the engine-loop frame), so
        # the leaves pack into ONE uint32 arena and are bitcast-sliced back
        # out inside the jit (ops/arena.py).
        from .arena import pack_arena
        from .megakernel import light_spec_from

        per_frame = (d3_dyn, d3_op_dyn, d2_dyn, lights_dev, uniforms)
        arena_np, arena_layout = pack_arena(per_frame)
        if arena_np is None:
            # non-4-byte leaf snuck in: per-leaf batched put still works
            arena_dev = None
            d3_dyn, d3_op_dyn, d2_dyn, lights_dev, uniforms = jax.device_put(
                per_frame
            )
        else:
            arena_dev = jax.device_put(arena_np)

        if self.render_mode.ignore_background_shader and scene.background is not None:
            import copy as _copy

            scene_bg = scene.background
            scene.background = None
            bg_np = self._background_array(scene, width, height)
            scene.background = scene_bg
        else:
            bg_np = self._background_array(scene, width, height)
        # module-level device cache: clients build a fresh Rasterizer per
        # frame (client/mod.rs does too), so an instance cache would
        # re-upload the (H,W,4) background every frame
        background = _BG_DEV_CACHE.get(id(bg_np))
        if background is None:
            if len(_BG_DEV_CACHE) > 8:
                _BG_DEV_CACHE.clear()
            background = jnp.asarray(bg_np)
            _BG_DEV_CACHE[id(bg_np)] = background

        frame_args = dict(
            d3=d3,
            d3_op=d3_op,
            d2=d2,
            lights=lights_dev,
            atlas=atlas,
            uniforms=uniforms,
            background=background,
            width=width,
            height=height,
            sample_mode=int(self.sample_mode),
            preserve_transparency=self.preserve_transparency,
            has_ambient=self.ambient_color is not None,
            has_lights=light_count > 0,
            has_opacity=self.render_mode.d3_active
            and bool(
                packed.d3_opacity.valid.any()
                or (has_dyn and len(scene.d3_dynamic_opacity))
            ),
            has_d2=self.render_mode.d2_active
            and bool(packed.d2.valid.any() or (has_dyn and len(scene.d2_dynamic))),
            shaders=packed.runtime_shaders,
            use_pallas=self.use_pallas,
            has_sky=has_sky,
            has_fog=has_fog,
            sky_pre=sky_pre,
            has_blend=bool((packed.d3.kind2 >= 0).any()),
            has_brush=self.brush_preview is not None,
            has_dyn=has_dyn,
            d3_dyn=d3_dyn,
            d3_op_dyn=d3_op_dyn,
            d2_dyn=d2_dyn,
            has_material=bool(
                (packed.d3.rough != 0.5).any()
                or packed.d3.metal.any()
                or (packed.d3.m1_slot >= 0).any()  # matmap implies material
            ),
            has_matmap=bool((packed.d3.m1_slot >= 0).any()),
            # static per-light (row, type) of the VALID rows (types are
            # host numpy here; the kernel can't inspect them at trace time)
            light_spec=light_spec_from(lights),
            sun_off=not (self.sun_dir is not None and self.day_factor > 0),
            shadow_rows=shadow_rows,
            shadow_params=shadow_params_dev,
            shadow_spec=shadow_spec,
            shadow_dyn=bool(
                shadow_cams is not None
                and has_dyn
                and d3_dyn is not None
                and d3_dyn["pos"].shape[0] > 0
                and self.shadow_settings.get("dynamic_casters", True)
            ),
            shadow_cams=shadow_cams,
            ao_taps=self._ao_taps() if self.render_mode.d3_active else None,
            brdf_ggx=self.brdf == "ggx",
            tonemap=self.tonemap == "scenevm",
            refl_samples=(
                self.reflection_samples if self.render_mode.d3_active else 0
            ),
            refl_ranges=self._refl_live_ranges(packed, d3_dyn),
            refl_scale=self.reflection_scale,
            sky_light=self.sky_light_enabled and self.render_mode.d3_active,
            transparency_layers=self.transparency_layers,
        )
        #: exact args of the last frame — consumed by profiling's
        #: full-frame phase ablations (numpy leaves are fine there: the
        #: breakdown jits its own chained loop around render_frame). Only
        #: stashed on request: unconditionally pinning every frame's
        #: dynamic packs/uniforms (plus the scene-cache device tables) for
        #: the rasterizer's lifetime is a retention cost the hot engine
        #: loop shouldn't pay for a profiling convenience.
        if getattr(self, "keep_frame_args", False):
            self._frame_args = frame_args
        if mesh is not None:
            # multi-chip dispatch (parallel/mesh.py): the sharded entry
            # takes pre-concatenated packs, so render_frame's in-graph
            # dynamic concat and shadow composite happen here instead
            from ..parallel.mesh import render_frame_sharded

            fa = frame_args
            d3_in, d3_op_in, d2_in = fa["d3"], fa["d3_op"], fa["d2"]
            sh_rows = fa["shadow_rows"]
            if fa["has_dyn"]:
                d3_in = {
                    k: jnp.concatenate(
                        [jnp.asarray(d3_in[k]), jnp.asarray(fa["d3_dyn"][k])]
                    )
                    for k in d3_in
                }
                d3_op_in = {
                    k: jnp.concatenate(
                        [jnp.asarray(d3_op_in[k]),
                         jnp.asarray(fa["d3_op_dyn"][k])]
                    )
                    for k in d3_op_in
                }
                d2_in = {
                    k: jnp.concatenate(
                        [jnp.asarray(d2_in[k]), jnp.asarray(fa["d2_dyn"][k])]
                    )
                    for k in d2_in
                }
                if fa["shadow_dyn"]:
                    from .shadow import composite_dynamic_depth

                    dd = fa["d3_dyn"]
                    sh_rows = composite_dynamic_depth(
                        sh_rows, fa["shadow_spec"], jnp.asarray(fa["shadow_cams"]),
                        jnp.asarray(dd["pos"]), jnp.asarray(dd["uv"]),
                        jnp.asarray(dd["nrm"]), jnp.asarray(dd["valid"]),
                    )
            frame = render_frame_sharded(
                mesh, d3_in, d2_in, fa["lights"], fa["atlas"],
                fa["uniforms"], fa["background"], width, height,
                sample_mode=fa["sample_mode"],
                has_ambient=fa["has_ambient"], has_lights=fa["has_lights"],
                has_d2=fa["has_d2"], use_pallas=fa["use_pallas"],
                has_material=fa["has_material"],
                light_spec=fa["light_spec"], sun_off=fa["sun_off"],
                brdf_ggx=fa["brdf_ggx"], tonemap=fa["tonemap"],
                d3_op=d3_op_in, has_opacity=fa["has_opacity"],
                transparency_layers=fa["transparency_layers"],
                preserve_transparency=fa["preserve_transparency"],
                has_fog=fa["has_fog"], has_sky=fa["has_sky"],
                sky_pre=fa["sky_pre"],
                shadow_rows=sh_rows, shadow_params=fa["shadow_params"],
                shadow_spec=fa["shadow_spec"],
                ao_taps=fa["ao_taps"], refl_samples=fa["refl_samples"],
                sky_light=fa["sky_light"],
                shaders=fa["shaders"], has_blend=fa["has_blend"],
                has_matmap=fa["has_matmap"],
            )
        elif arena_dev is not None:
            passthru = {
                k: v
                for k, v in frame_args.items()
                if k not in ("lights", "uniforms", "d3_dyn", "d3_op_dyn", "d2_dyn")
            }
            frame = render_frame_arena(
                arena=arena_dev, arena_layout=arena_layout, **passthru
            )
        else:
            frame = render_frame(**frame_args)
        if ss > 1:
            frame = _ssaa_downsample(frame, ss)
        if not readback:
            return frame
        out = np.asarray(frame)

        line_segs = [packed.d2_lines.segments]
        line_cols = [packed.d2_lines.colors]
        if dyn_lines is not None and len(dyn_lines.segments):
            line_segs.append(dyn_lines.segments)
            line_cols.append(dyn_lines.colors)
        all_segs = np.concatenate([s_ for s_ in line_segs if len(s_)]) if any(
            len(s_) for s_ in line_segs
        ) else packed.d2_lines.segments
        if len(all_segs):
            segs = all_segs
            packed_colors = np.concatenate([c for c in line_cols if len(c)])
            ones = np.ones((len(segs), 1), np.float32)
            p0 = np.concatenate([segs[:, 0:2], ones], axis=1) @ self.proj2d.T
            p1 = np.concatenate([segs[:, 2:4], ones], axis=1) @ self.proj2d.T
            projected = np.concatenate([p0[:, :2], p1[:, :2]], axis=1)
            out = out.copy()
            draw_lines_bresenham(out, projected, packed_colors)

        return out
