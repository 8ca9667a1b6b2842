"""Multi-chip rendering over a jax.sharding.Mesh.

The reference scales with rayon threads over framebuffer tiles inside one
process (src/rasterizer.rs:273, SURVEY.md §2.5 P1). The TPU-native scaling
levers are:

  * geometry parallelism ("dp" over triangles): the setup pass
    (clip/project/plane build) runs on a 1/N shard of the triangles per
    device, then one tiled `all_gather` over ICI replicates the tiny plane
    buffers to every chip;
  * framebuffer parallelism ("sp" over pixel rows): visibility, shading,
    opacity blend and the 2D pass each run on a 1/N row-slab of the screen,
    fully local — pixel ownership is disjoint exactly like the reference's
    tile buffers, so no collective is needed on the output path.

Both are expressed with `shard_map` over a 1-D mesh; the same code runs on a
virtual CPU mesh (tests / driver dry-run) and a real TPU pod slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.composite import compose_opaque, d2_pass, frame_to_u8
from ..ops.setup_pass import setup_pass
from ..ops.shade import shade_pass
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
):
    """Render one frame with triangles+rows sharded over `mesh`.

    light_spec / sun_off are the megakernel's static lighting
    specialization (ops/megakernel.py) — callers that hold the packed
    lights host-side (tests, the driver dryrun, an engine host loop)
    can pass them; None keeps the generic runtime one-hot loop.

    Heights / triangle capacities that don't divide the mesh size are
    auto-padded: each device owns ceil(height/n) rows (the overhang renders
    sky and is cropped), and the candidate table pads with dead slots.
    """
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

    def shard_fn(d3_l, d2_r, lights_r, atlas_r, uniforms_r, background_l):
        row = jax.lax.axis_index(AXIS)
        rows_local = rows_per_dev
        y0 = row * rows_local

        # --- setup on the local triangle shard, then all_gather planes ---
        vis_l, attr_l, bbox_l, ok_l, _ = setup_pass(
            d3_l["pos"], d3_l["uv"], d3_l["nrm"], d3_l["valid"], d3_l["cull"],
            uniforms_r["view"], uniforms_r["proj"], width, height,
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
                False, has_material,
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
                    uniforms_r, width, height, atlas_r["w"], False, y0=y0
                ),
                pack_light_params(lights_r),
                pack_occ_params(uniforms_r),
                width, rows_local, sample_mode, False, has_material,
                interpret=interpret, full_height=height,
                light_spec=light_spec, sun_off=sun_off, s_near=s_near,
                brdf_ggx=brdf_ggx, tonemap=tonemap,
            )
            frame = unpack_frame_u32(rgba_u32).astype(jnp.float32) * (1.0 / 255.0)
        else:
            z, idx, hit = visibility_pass(
                vis, ok.astype(jnp.float32), width, rows_local, y0=y0
            )
            shaded, wrote = shade_pass(
                z, idx, hit, attr, tri_id, d3_full, atlas_r, lights_r,
                uniforms_r, width, rows_local, sample_mode,
                y0=y0, full_height=height, has_material=has_material,
                brdf_ggx=brdf_ggx, tonemap=tonemap,
            )
            frame, z_eff = compose_opaque(shaded, wrote, z, background_l)
        if has_d2:
            frame = d2_pass(
                frame, d2_r, atlas_r, lights_r, uniforms_r, width, rows_local,
                sample_mode, False,
                has_lights=has_lights,
                has_ambient=has_ambient, y0=y0,
            )
        return frame_to_u8(frame)

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
        ),
        out_specs=P(AXIS),
        check_vma=False,
    )
    return fn(d3, d2, lights, atlas, uniforms, background)[:height]


def render_sharded_jit(mesh, width, height, sample_mode, has_ambient,
                       has_lights, has_d2, use_pallas=False,
                       light_spec=None, sun_off=False, brdf_ggx=False,
                       tonemap=False):
    """jitted closure for a fixed config."""

    @jax.jit
    def run(d3, d2, lights, atlas, uniforms, background):
        return render_frame_sharded(
            mesh, d3, d2, lights, atlas, uniforms, background,
            width, height, sample_mode, has_ambient, has_lights, has_d2,
            use_pallas, light_spec=light_spec, sun_off=sun_off,
            brdf_ggx=brdf_ggx, tonemap=tonemap,
        )

    return run
