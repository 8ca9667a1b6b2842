"""Per-phase device profiling (SURVEY §5: per-phase timers from day one).

`frame_breakdown(rast, scene, assets, w, h)` times each render phase with
the chained-fori methodology (a data dependency serializes iterations inside
ONE dispatch), the only timing that is trustworthy over the dev tunnel —
see bench.py:measure_chained and .claude/skills/verify/SKILL.md.

Enable in bench.py with RUSTERIX_TPU_PROFILE=1 (adds a "profile" dict to the
JSON line). The reference's analogue is the ad-hoc get_time() prints
(reference src/lib.rs:82-94, examples/cube_shaded.rs:146).
"""

from __future__ import annotations

import time

import numpy as np


def _chain(fn, perturb, n=200):
    """ms per call of `fn(x)` with x perturbed per iteration by the f32
    accumulator (defeats loop-invariant hoisting). n=200 amortizes the
    ~25 ms fixed dispatch+sync cost per call (see bench.measure_chained)
    to ~0.13 ms — phase DELTAS cancel it, absolute values carry it."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many():
        def body(i, acc):
            r = fn(perturb(acc))
            leaf = jax.tree_util.tree_leaves(r)[0]
            return acc + leaf.reshape(-1)[0].astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, n, body, 0.0)

    many().block_until_ready()
    t0 = time.perf_counter()
    many().block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


def frame_breakdown(rast, scene, assets, width: int, height: int) -> dict:
    """Phase times (ms) for one frame of `scene` through `rast`'s active
    path. Renders once first to populate the device scene cache.

    Two layers: the fine-grained opaque pipeline (setup/sort/megakernel or
    setup/visibility/shade), then full-frame ablations — the complete frame
    with sky/opacity/2D/dynamic-concat/brush each toggled off once, the
    delta localizing that phase's cost (keys sky_ms/opacity_ms/d2_ms/
    dyn_concat_ms/brush_ms, present only when the scene uses the phase)."""
    import jax.numpy as jnp

    from .ops.setup_pass import setup_pass
    # device-resident warmup (no D2H — the dev tunnel's download path can
    # degrade to minutes per MB and must not gate profiling); ask the
    # rasterizer to stash its exact frame args for the ablations below
    rast.keep_frame_args = True
    rast.rasterize(scene, width, height, 40, assets, readback=False)
    cache = rast._scene_cache
    packed = cache["packed"]
    d3, atlas = cache["d3"], cache["atlas"]
    lights = dict(packed.lights)
    lights["flicker_factor"] = rast._flicker_factors(lights)
    ld = {k: jnp.asarray(v) for k, v in lights.items()}
    uni = rast._uniforms(scene)
    if packed.occlusion is not None:
        uni["occ_box"] = jnp.asarray(packed.occlusion["occ_box"])
        uni["occ_val"] = jnp.asarray(packed.occlusion["occ_val"])
    uni = {k: jnp.asarray(v) for k, v in uni.items()}
    bg_dev = jnp.asarray(rast._background_array(scene, width, height))
    view = uni["view"]

    out = {}

    def perturb_view(acc):
        return view + acc

    def run_setup(v):
        return setup_pass(
            d3["pos"], d3["uv"], d3["nrm"], d3["valid"], d3["cull"],
            v, uni["proj"], width, height,
        )

    out["setup_ms"] = round(_chain(run_setup, perturb_view), 3)

    vis, attr, bbox, alive, tri_id = run_setup(view)
    alive_f = alive.astype(jnp.float32)

    if rast.use_pallas and not packed.runtime_shaders:
        from .ops.megakernel import (
            atlas_rows_i32,
            light_spec_from,
            mega_render,
            morton_ftb_sort,
            pack_background_u32,
            pack_light_params,
            pack_mega_params,
            pack_mega_table,
            pack_occ_params,
        )

        table = pack_mega_table(attr, tri_id, d3, atlas, uni["anim_frame"], False)

        def run_sort(v):
            return morton_ftb_sort(
                vis + v[0, 0] * 0, bbox, alive_f, table, width, height,
            )

        out["pack_morton_ms"] = round(_chain(run_sort, perturb_view), 3)
        vis_s, bbox_s, alive_s, table_s, s_near = run_sort(view)

        bg = pack_background_u32(bg_dev)
        params = pack_mega_params(uni, width, height, atlas["w"], False)
        lp = pack_light_params(ld)
        occ = pack_occ_params(uni)

        # mirror the production call's static light specialization — the
        # generic light loop is measurably slower than the per-type paths
        # and would overstate megakernel_ms vs the real frame
        light_spec = light_spec_from(packed.lights)
        sun_off = not (rast.sun_dir is not None and rast.day_factor > 0)

        def run_mega(v):
            return mega_render(
                vis_s + v[0, 0] * 0, alive_s, bbox_s, table_s,
                atlas_rows_i32(atlas["flat_u32"]), bg, params, lp, occ,
                width, height, int(rast.sample_mode), False,
                s_near=s_near, light_spec=light_spec, sun_off=sun_off,
            )

        out["megakernel_ms"] = round(_chain(run_mega, perturb_view), 3)
    else:
        from .ops.shade import shade_pass
        from .ops.visibility import visibility_pass

        def run_vis(v):
            return visibility_pass(vis + v[0, 0] * 0, alive_f, width, height)

        out["visibility_ms"] = round(_chain(run_vis, perturb_view), 3)
        z, idx, hit = run_vis(view)

        def run_shade(v):
            return shade_pass(
                z + v[0, 0] * 0, idx, hit, attr, tri_id, d3, atlas, ld, uni,
                width, height, int(rast.sample_mode),
                shaders=packed.runtime_shaders,
            )

        out["shade_ms"] = round(_chain(run_shade, perturb_view), 3)

    dt = _chain(
        lambda v: _full_frame(
            rast, cache, packed, ld, uni, bg_dev, v, width, height
        ),
        perturb_view,
    )
    out["frame_ms"] = round(dt, 3)
    out["fps"] = round(1e3 / dt, 1)

    # ---- full-frame phase ablations (round-2 verdict weak #5) ----
    # rasterize() stashed its exact device args: re-time the COMPLETE frame
    # (sky/opacity/2D/dynamic-concat included), then once per optional phase
    # with that phase toggled off — the delta localizes that phase's cost.
    args = getattr(rast, "_frame_args", None)
    if args is not None:
        from .ops.raster import render_frame

        def run_full(v, overrides):
            a = dict(args)
            a.update(overrides)
            u2 = dict(a["uniforms"])
            u2["view"] = v
            a["uniforms"] = u2
            return render_frame(**a)

        full = _chain(lambda v: run_full(v, {}), perturb_view)
        out["full_frame_ms"] = round(full, 3)
        ablations = {
            "sky_ms": {"has_sky": False, "sky_pre": None},
            "opacity_ms": {"has_opacity": False},
            "d2_ms": {"has_d2": False},
            "dyn_concat_ms": {
                "has_dyn": False,
                "d3_dyn": None,
                "d3_op_dyn": None,
                "d2_dyn": None,
            },
            "brush_ms": {"has_brush": False},
        }
        enabled = {
            "sky_ms": args["has_sky"],
            "opacity_ms": args["has_opacity"],
            "d2_ms": args["has_d2"],
            "dyn_concat_ms": args["has_dyn"],
            "brush_ms": args["has_brush"],
        }
        for name, overrides in ablations.items():
            if not enabled[name]:
                continue
            without = _chain(lambda v: run_full(v, overrides), perturb_view)
            out[name] = round(max(0.0, full - without), 3)
    return out


def _full_frame(rast, cache, packed, ld, uni, bg_dev, view, width, height):
    from .ops.raster import render_frame

    u = dict(uni)
    u["view"] = view
    return render_frame(
        cache["d3"], cache["d3_op"], cache["d2"], ld, cache["atlas"], u,
        bg_dev, width, height, int(rast.sample_mode), False,
        rast.ambient_color is not None, packed.light_count > 0,
        bool(packed.d3_opacity.valid.any()), bool(packed.d2.valid.any()),
        packed.runtime_shaders, rast.use_pallas,
    )
