"""Multi-chip rendering over a jax.sharding.Mesh.

The reference scales with rayon threads over framebuffer tiles inside one
process (src/rasterizer.rs:273, SURVEY.md §2.5 P1). The TPU-native scaling
levers are:

  * geometry parallelism ("dp" over triangles): the setup pass
    (clip/project/plane build) runs on a 1/N shard of the triangles per
    device, then one tiled `all_gather` over ICI replicates the tiny plane
    buffers to every chip;
  * framebuffer parallelism ("sp" over pixel rows): visibility, shading,
    AO, shadow lookups, GGX reflections, sky light, fog, sky misses,
    depth-peeled transparency and the 2D pass each run on a 1/N row-slab
    of the screen, fully local — pixel ownership is disjoint exactly like
    the reference's tile buffers, so no collective rides the output path.
    (AO is the one screen-space pass whose taps cross slab edges; its
    (z, hit) inputs are all_gathered once and the factor computed
    replicated, then sliced — taps reach ±24 px, which can exceed a thin
    slab, and the pass is ~1% of frame cost.)

Both are expressed with `shard_map` over a 1-D mesh; the same code runs on a
virtual CPU mesh (tests / driver dry-run) and a real TPU pod slice.

Feature coverage matches the single-chip `render_frame` for the whole
SceneVM family (shadows + AO + GGX + reflections + sky light + fog + sky +
depth-peeled transparency + 2D), on both the XLA and megakernel backends;
per-frame dynamic-pack concatenation and runtime shaders stay single-chip
(engine-loop features — concatenate before calling, or render locally).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.composite import (
    blend_opacity,
    compose_opaque,
    d2_pass,
    frame_to_u8,
    sky_miss_pass,
)
from ..ops.setup_pass import setup_pass
from ..ops.shade import shade_pass, take_iso
from ..ops.visibility import visibility_pass

AXIS = "px"


def make_mesh(n_devices: int = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def render_frame_sharded(
    mesh: Mesh,
    d3,
    d2,
    lights,
    atlas,
    uniforms,
    background,
    width: int,
    height: int,
    sample_mode: int = 0,
    has_ambient: bool = False,
    has_lights: bool = False,
    has_d2: bool = False,
    use_pallas: bool = False,
    has_material: bool = False,
    light_spec: tuple = None,
    sun_off: bool = False,
    brdf_ggx: bool = False,
    tonemap: bool = False,
    d3_op=None,
    has_opacity: bool = False,
    transparency_layers: int = 1,
    preserve_transparency: bool = False,
    has_fog: bool = False,
    has_sky: bool = False,
    sky_pre: dict = None,
    shadow_rows=None,
    shadow_params=None,
    shadow_spec: tuple = None,
    ao_taps: tuple = None,
    refl_samples: int = 0,
    sky_light: bool = False,
    shaders: tuple = (),
    has_blend: bool = False,
    has_matmap: bool = False,
):
    """Render one frame with triangles+rows sharded over `mesh`.

    light_spec / sun_off are the megakernel's static lighting
    specialization (ops/megakernel.py) — callers that hold the packed
    lights host-side (tests, the driver dryrun, an engine host loop)
    can pass them; None keeps the generic runtime one-hot loop.

    shadow_rows/params/spec: the baked maps from ops.shadow
    (replicated — lookups are world-space and row-local). ao_taps /
    refl_samples / sky_light / fog / sky / opacity mirror render_frame's
    flags; see the module docstring for how each one shards.

    Heights / triangle capacities that don't divide the mesh size are
    auto-padded: each device owns ceil(height/n) rows (the overhang renders
    sky and is cropped), and the candidate table pads with dead slots.
    """
    # runtime shaders force the XLA backend, like render_frame's
    # `mega = use_pallas and not shaders`
    use_pallas = use_pallas and not shaders
    n = mesh.devices.size
    rows_per_dev = -(-height // n)
    hp = rows_per_dev * n
    cap = int(d3["valid"].shape[0])
    cap_pad = (-cap) % n
    if cap_pad:
        d3 = {
            k: jnp.pad(
                jnp.asarray(v),
                ((0, cap_pad),) + ((0, 0),) * (jnp.asarray(v).ndim - 1),
            )
            for k, v in d3.items()
        }
    if hp != height:
        background = jnp.pad(
            jnp.asarray(background), ((0, hp - height), (0, 0), (0, 0))
        )

    proj_np = uniforms["proj"]

    def shard_fn(d3_l, d2_r, lights_r, atlas_r, uniforms_r, background_l,
                 d3_op_r, shadow_rows_r, shadow_params_r, sky_pre_r):
        row = jax.lax.axis_index(AXIS)
        rows_local = rows_per_dev
        y0 = row * rows_local
        proj = uniforms_r["proj"]

        # --- setup on the local triangle shard, then all_gather planes ---
        vis_l, attr_l, bbox_l, ok_l, _ = setup_pass(
            d3_l["pos"], d3_l["uv"], d3_l["nrm"], d3_l["valid"], d3_l["cull"],
            uniforms_r["view"], proj, width, height,
            bw=d3_l["bw"] if has_blend else None,
        )
        vis = jax.lax.all_gather(vis_l, AXIS, axis=0, tiled=True)
        attr = jax.lax.all_gather(attr_l, AXIS, axis=0, tiled=True)
        bbox = jax.lax.all_gather(bbox_l, AXIS, axis=0, tiled=True)
        ok = jax.lax.all_gather(ok_l, AXIS, axis=0, tiled=True)
        t_total = vis.shape[0] // 2
        tri_id = jnp.repeat(jnp.arange(t_total, dtype=jnp.int32), 2)

        # but meta arrays live in original order: slots of shard k map to
        # triangles [k*T/n, (k+1)*T/n) — tiled all_gather preserves order.

        d3_full = {
            k: jax.lax.all_gather(v, AXIS, axis=0, tiled=True)
            for k, v in d3_l.items()
        }

        shadow = (
            (shadow_rows_r, shadow_params_r, shadow_spec)
            if shadow_spec is not None
            else None
        )

        # (z, idx, hit) of the local slab: the XLA backend shades from it;
        # AO / reflections / sky light / opacity blending need it on the
        # megakernel backend too
        need_zih = (
            (not use_pallas) or bool(ao_taps) or refl_samples > 0
            or sky_light
        )
        z = idx = hit = None
        if need_zih:
            z, idx, hit = visibility_pass(
                vis, ok.astype(jnp.float32), width, rows_local, y0=y0
            )

        ao_img = None
        if ao_taps:
            # screen-space taps cross slab boundaries (±24 px > a thin
            # slab): gather the (H, W) depth/hit once and compute the
            # factor replicated — bit-equal to the single-chip pass
            from ..ops.ao import ssao_pass

            z_full = jax.lax.all_gather(z, AXIS, axis=0, tiled=True)
            hit_full = jax.lax.all_gather(hit, AXIS, axis=0, tiled=True)
            ao_full = ssao_pass(
                z_full[:height], hit_full[:height], proj[2, 2], proj[2, 3],
                uniforms_r["ao_radius"], 2.0 / (proj[1, 1] * height),
                ao_taps,
            )
            ao_full = jnp.pad(ao_full, ((0, hp - height), (0, 0)),
                              constant_values=1.0)
            ao_img = jax.lax.dynamic_slice_in_dim(ao_full, y0, rows_local, 0)

        if use_pallas:
            # each device runs the megakernel over its row slab; edge planes
            # and lighting live in global screen coords via the y0 offset
            from ..ops.megakernel import (
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

            interpret = jax.devices()[0].platform not in ("tpu", "axon")
            table = pack_mega_table(
                attr, tri_id, d3_full, atlas_r, uniforms_r["anim_frame"],
                has_blend, has_material, has_matmap,
            )
            # near bounds clip to THIS shard's rows (y0 is traced here)
            vis_s, bbox_s, alive_s, table_s, s_near = morton_ftb_sort(
                vis, bbox, ok.astype(jnp.float32), table, width, height,
                y0g=y0.astype(jnp.float32), rows_local=rows_local,
            )
            rgba_u32, z_eff = mega_render(
                vis_s, alive_s, bbox_s, table_s,
                atlas_rows_i32(atlas_r["flat_u32"]),
                pack_background_u32(background_l),
                pack_mega_params(
                    uniforms_r, width, height, atlas_r["w"], has_fog,
                    y0=y0, shadow_params=shadow_params_r,
                ),
                pack_light_params(lights_r),
                pack_occ_params(uniforms_r),
                width, rows_local, sample_mode, has_blend, has_material,
                has_matmap=has_matmap,
                interpret=interpret, full_height=height,
                light_spec=light_spec, sun_off=sun_off, s_near=s_near,
                shadow_rows=(
                    shadow_rows_r.reshape(-1, 128)
                    if shadow_spec is not None
                    else None
                ),
                shadow_spec=shadow_spec,
                ao_img=ao_img,
                brdf_ggx=brdf_ggx, tonemap=tonemap,
            )
            frame = unpack_frame_u32(rgba_u32).astype(jnp.float32) * (1.0 / 255.0)
        else:
            shaded, wrote = shade_pass(
                z, idx, hit, attr, tri_id, d3_full, atlas_r, lights_r,
                uniforms_r, width, rows_local, sample_mode,
                y0=y0, full_height=height, has_material=has_material,
                has_fog=has_fog, shadow=shadow, ao=ao_img,
                shaders=shaders, has_blend=has_blend, has_matmap=has_matmap,
                brdf_ggx=brdf_ggx, tonemap=tonemap,
            )
            frame, z_eff = compose_opaque(shaded, wrote, z, background_l)

        if refl_samples > 0:
            from ..ops.reflect import apply_reflections, reflection_pass
            from ..ops.rt_kernel import RT_SLOT_LIMIT

            refl, rmask = reflection_pass(
                z, idx, hit, attr, tri_id, d3_full, atlas_r, lights_r,
                uniforms_r, width, rows_local, sample_mode, refl_samples,
                shaders=shaders, has_blend=has_blend, has_matmap=has_matmap,
                has_material=has_material,
                rt_pallas=(
                    use_pallas and d3_full["pos"].shape[0] <= RT_SLOT_LIMIT
                ),
                shadow_rows=shadow_rows_r, shadow_params=shadow_params_r,
                shadow_spec=shadow_spec, y0=y0, full_height=height,
            )
            frame = apply_reflections(frame, refl, rmask, tonemap=tonemap)

        if sky_light:
            from ..ops.reflect import apply_reflections, sky_light_pass
            from ..ops.rt_kernel import RT_SLOT_LIMIT

            sky_term, sky_mask = sky_light_pass(
                z, idx, hit, attr, tri_id, d3_full, atlas_r, uniforms_r,
                width, rows_local, sample_mode, has_material=has_material,
                shaders=shaders, has_blend=has_blend, has_matmap=has_matmap,
                rt_pallas=(
                    use_pallas and d3_full["pos"].shape[0] <= RT_SLOT_LIMIT
                ),
                y0=y0, full_height=height,
            )
            if ao_taps:
                sky_term = sky_term * ao_img[..., None]
            frame = apply_reflections(frame, sky_term, sky_mask,
                                      tonemap=tonemap)

        if has_sky:
            frame = sky_miss_pass(
                frame, z_eff, sky_pre_r, uniforms_r, width, rows_local,
                y0=y0,
            )

        if has_opacity:
            # transparent batches: setup runs replicated (the opacity pack
            # is small), the peel + blend is row-local
            from ..ops.raster import _shade_opacity

            vis_o, attr_o, _bbox_o, alive_o, tri_id_o = setup_pass(
                d3_op_r["pos"], d3_op_r["uv"], d3_op_r["nrm"],
                d3_op_r["valid"], d3_op_r["cull"],
                uniforms_r["view"], proj, width, height,
            )
            alive_of = alive_o.astype(jnp.float32)
            layers = []
            ceil_o = None
            for _layer in range(transparency_layers):
                z_o, idx_o, hit_o, inv_o = visibility_pass(
                    vis_o, alive_of, width, rows_local, y0=y0,
                    z_ceil=ceil_o, return_invz=True,
                )
                color_o, zeff_o, _ = _shade_opacity(
                    z_o, idx_o, hit_o, attr_o, tri_id_o, d3_op_r, atlas_r,
                    uniforms_r, width, rows_local, sample_mode,
                    shaders=shaders, y0=y0,
                )
                if refl_samples > 0:
                    # per-layer GGX reflections (WGSL layer loop,
                    # 3d_shader.wgsl:760-826): layer G-buffer is row-local,
                    # rays trace against the replicated opaque scene pack —
                    # matches the single-chip opacity loop byte-for-byte
                    from ..ops.reflect import (
                        apply_reflections as _apply_o,
                        reflection_pass as _refl_o,
                    )
                    from ..ops.rt_kernel import RT_SLOT_LIMIT as _RT_LIM

                    refl_o, rmask_o = _refl_o(
                        z_o, idx_o, hit_o, attr_o, tri_id_o, d3_op_r,
                        atlas_r, lights_r, uniforms_r, width, rows_local,
                        sample_mode, refl_samples, shaders=shaders,
                        has_blend=has_blend, has_matmap=has_matmap,
                        has_material=has_material,
                        rt_pallas=(
                            use_pallas
                            and d3_full["pos"].shape[0] <= _RT_LIM
                        ),
                        shadow_rows=shadow_rows_r,
                        shadow_params=shadow_params_r,
                        shadow_spec=shadow_spec, y0=y0, full_height=height,
                        scene_d3=d3_full,
                    )
                    # layer colors are fast-sRGB encoded (_shade_opacity)
                    # regardless of the frame tonemap
                    color_o = _apply_o(color_o, refl_o, rmask_o,
                                       tonemap=False)
                layers.append((color_o, zeff_o))
                ceil_o = inv_o
            for color_o, zeff_o in reversed(layers):
                frame = blend_opacity(
                    frame, z_eff, color_o, zeff_o, preserve_transparency
                )

        if has_d2:
            frame = d2_pass(
                frame, d2_r, atlas_r, lights_r, uniforms_r, width, rows_local,
                sample_mode, preserve_transparency,
                has_lights=has_lights,
                has_ambient=has_ambient, y0=y0, shaders=shaders,
            )
        return frame_to_u8(frame)

    # replicated feature operands ride as explicit args so shard_map's
    # pytree specs stay simple; absent features pass neutral placeholders
    d3_op_in = d3_op if has_opacity else {
        k: jnp.zeros((0,) + jnp.asarray(v).shape[1:], jnp.asarray(v).dtype)
        for k, v in d3.items()
    }
    rows_in = (
        shadow_rows if shadow_rows is not None else jnp.zeros(0, jnp.float32)
    )
    params_in = (
        shadow_params
        if shadow_params is not None
        else jnp.zeros(40, jnp.float32)
    )
    sky_in = sky_pre if sky_pre is not None else {}

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(AXIS),      # d3 triangle shard (leading axis)
            P(),          # d2 replicated
            P(),          # lights replicated
            P(),          # atlas replicated
            P(),          # uniforms replicated
            P(AXIS),      # background rows
            P(),          # d3_op replicated
            P(),          # shadow rows replicated
            P(),          # shadow params replicated
            P(),          # sky precompute replicated
        ),
        out_specs=P(AXIS),
        check_vma=False,
    )
    return fn(
        d3, d2, lights, atlas, uniforms, background,
        d3_op_in, rows_in, params_in, sky_in,
    )[:height]


def render_sharded_jit(mesh, width, height, sample_mode, has_ambient,
                       has_lights, has_d2, use_pallas=False,
                       light_spec=None, sun_off=False, brdf_ggx=False,
                       tonemap=False, has_opacity=False,
                       transparency_layers=1, preserve_transparency=False,
                       has_fog=False, has_sky=False, shadow_spec=None,
                       ao_taps=None, refl_samples=0, sky_light=False):
    """jitted closure for a fixed config."""

    @partial(jax.jit, static_argnames=())
    def run(d3, d2, lights, atlas, uniforms, background, d3_op=None,
            shadow_rows=None, shadow_params=None, sky_pre=None):
        return render_frame_sharded(
            mesh, d3, d2, lights, atlas, uniforms, background,
            width, height, sample_mode, has_ambient, has_lights, has_d2,
            use_pallas, light_spec=light_spec, sun_off=sun_off,
            brdf_ggx=brdf_ggx, tonemap=tonemap,
            d3_op=d3_op, has_opacity=has_opacity,
            transparency_layers=transparency_layers,
            preserve_transparency=preserve_transparency,
            has_fog=has_fog, has_sky=has_sky, sky_pre=sky_pre,
            shadow_rows=shadow_rows, shadow_params=shadow_params,
            shadow_spec=shadow_spec, ao_taps=ao_taps,
            refl_samples=refl_samples, sky_light=sky_light,
        )

    return run
