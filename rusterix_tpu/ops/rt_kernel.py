"""Secondary-ray intersect — Pallas TPU kernel with a spatial index.

The reference routes every secondary ray (GGX reflections, sky-visibility,
shadow and AO rays) through `sv_trace_grid`, a uniform-grid/DDA traversal
injected by its SceneVM host (referenced from
embedded/shader/3d_shader.wgsl:332,437,492,545; its CPU tracer at least
slab-tests per-batch AABBs, src/tracer/trace.rs:88-103). The repo's XLA
wavefront Möller-Trumbore (ops/reflect.py intersect_rays) brute-forces
every ray against every packed chunk — measured floor ~106 ms at 2M rays
x 2048 slots @1080p, VPU compute-bound.

TPU-shaped equivalent (a per-ray DDA walk is scalar poison on a vector
machine; this keeps the whole-warp wavefront shape and moves the skipping
into *per-ray-block* scalar control flow, the same pattern as the raster
megakernel's tmask gating):

  * rays stay in their natural (H, W) screen layout and are tiled into
    (RT_BH x RT_BW) blocks — one Pallas program per block. Reflection /
    sky rays originate from the G-buffer, so a screen tile's origins are
    world-space compact; that coherence is the whole trick. SMALL blocks
    matter: the tighter the origin box, the truer the distance ordering
    and the earlier the early-exit (measured 64.5 -> sub-40 ms @1080p
    going 16x256 -> 8x128 on the map scene).
  * triangles are grouped into CELLs of RT_CELL Morton-contiguous pack
    slots (the pack is already Morton-sorted —
    ops/visibility_pallas.morton_sort) with device-computed world AABBs;
    dead slots collapse to empty boxes, which subsumes reflect.py's
    static live_ranges machinery.
  * an XLA prep pass computes, per block: the live-ray origin AABB, a
    direction interval box, and a DISTANCE-ORDERED shortlist of cells —
    keyed by the box-to-box euclidean gap, a lower bound on any ray's t
    into that cell — culling cells beyond the range cap and cells no ray
    can point toward (per-axis sign test on the direction interval).
  * the kernel walks the shortlist with a while_loop and EARLY-EXITS the
    whole block once every live ray's min(best_t, t_cap) beats the next
    cell's t lower bound (closest-hit semantics; the bound refresh is one
    vector->scalar reduction per visited cell, skipped after the last
    entry — the megakernel's minb lesson).

Memory plan: the (T,16) triangle table lives whole in VMEM (scalar-read
per triangle, static lane / dynamic sublane — the megakernel's legal-read
pattern); the per-block (ncells, 1) tnear/shortlist rows ride ordinary
VMEM BlockSpecs sliced by program id (dynamic sublane, static lane), so
there is NO SMEM table and no entry budget — block and cell sizes are
free tuning knobs. The VMEM triangle table is the only size gate
(RT_SLOT_LIMIT).

Semantics match intersect_rays exactly (same epsilon chain; strict-<
winner), except cross-cell t ties may resolve to a different triangle
because cells are visited in per-block distance order, not slot order
(exact ties are measure-zero in real scenes — morton_sort carries the
same caveat).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: pack slots per spatial cell (Morton-contiguous -> tight AABBs)
RT_CELL = int(os.environ.get("RUSTERIX_TPU_RT_CELL", "64"))
#: ray-block tile (sublanes x lanes) — small blocks = tight origin boxes
RT_BH = int(os.environ.get("RUSTERIX_TPU_RT_BH", "8"))
RT_BW = int(os.environ.get("RUSTERIX_TPU_RT_BW", "128"))
#: largest pack (slots) the VMEM-resident table supports; callers fall
#: back to the XLA wavefront scan above this
RT_SLOT_LIMIT = 16384

#: origins >= this are parked dead rays (reflect.py parks at 1e8)
_PARKED = 1e7
_BIG = 3e37


def _rt_kernel(tnear_ref, slist_ref, tab_ref, cbox_ref, tcap_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_ref, idx_ref, maxt_scr, *, cell: int, ncells: int):
    """One program per ray block: walk the block's distance-ordered cell
    shortlist, Möller-Trumbore each cell's `cell` triangles against the
    whole (RT_BH, RT_BW) ray tile, early-exit on the t lower bound.

    tnear/slist: this block's (1, ncells, 1) VMEM rows (dynamic-sublane
    scalar reads). cbox: (ncells, 8) world AABBs — before a cell's MT
    scan (~40 vector ops x `cell` tris) the whole ray tile slab-tests the
    cell box (~25 vector ops): the prep's box-to-box shortlist is
    conservative for divergent (rough-lobe) direction intervals, and the
    exact per-ray test skips most surviving cells outright."""
    tcap = tcap_ref[0, 0]
    oxv = ox_ref[:]
    oyv = oy_ref[:]
    ozv = oz_ref[:]
    dxv = dx_ref[:]
    dyv = dy_ref[:]
    dzv = dz_ref[:]
    live_v = oxv < _PARKED
    inv_dx = 1.0 / jnp.where(jnp.abs(dxv) < 1e-20, 1e-20, dxv)
    inv_dy = 1.0 / jnp.where(jnp.abs(dyv) < 1e-20, 1e-20, dyv)
    inv_dz = 1.0 / jnp.where(jnp.abs(dzv) < 1e-20, 1e-20, dzv)

    # per-ray SCENE-EXIT cap: no hit can lie beyond the ray's exit from
    # the global scene AABB, so sky-bound miss rays stop bounding the
    # block at t_cap (=refl_dist, often far beyond the scene) and the
    # whole-block early exit fires almost immediately on sky-heavy tiles
    e0 = (tcap_ref[0, 1] - oxv) * inv_dx
    e1 = (tcap_ref[0, 4] - oxv) * inv_dx
    t_exit = jnp.maximum(e0, e1)
    e0 = (tcap_ref[0, 2] - oyv) * inv_dy
    e1 = (tcap_ref[0, 5] - oyv) * inv_dy
    t_exit = jnp.minimum(t_exit, jnp.maximum(e0, e1))
    e0 = (tcap_ref[0, 3] - ozv) * inv_dz
    e1 = (tcap_ref[0, 6] - ozv) * inv_dz
    t_exit = jnp.minimum(t_exit, jnp.maximum(e0, e1))
    tcap_v = jnp.minimum(tcap, jnp.maximum(t_exit, 0.0) + 1e-3)

    t_ref[:] = jnp.full((RT_BH, RT_BW), jnp.inf, jnp.float32)
    idx_ref[:] = jnp.full((RT_BH, RT_BW), -1, jnp.int32)
    # block-open bound: dead rays contribute 0 so a partially-dead block
    # can still early-exit; an all-dead block never enters the loop
    maxt_scr[0] = jnp.max(jnp.where(live_v, tcap_v, 0.0))

    nc = ncells

    def cond(i):
        ii = jnp.minimum(i, nc - 1)
        return (i < nc) & (tnear_ref[0, ii, 0] < maxt_scr[0])

    def body(i):
        c = slist_ref[0, i, 0]
        base = c * cell

        # whole-tile slab test against this cell's AABB: any live ray
        # entering the box closer than its current best (and the cap)?
        t0x = (cbox_ref[c, 0] - oxv) * inv_dx
        t1x = (cbox_ref[c, 3] - oxv) * inv_dx
        t0y = (cbox_ref[c, 1] - oyv) * inv_dy
        t1y = (cbox_ref[c, 4] - oyv) * inv_dy
        t0z = (cbox_ref[c, 2] - ozv) * inv_dz
        t1z = (cbox_ref[c, 5] - ozv) * inv_dz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        enters = (
            live_v
            & (tf >= jnp.maximum(tn, 0.0))
            & (tn < jnp.minimum(t_ref[:], tcap_v))
        )

        def tri_group(gk, _):
            best = t_ref[:]
            idx = idx_ref[:]
            for k in range(8):
                r = base + gk * 8 + k
                ax = tab_ref[r, 0]
                ay = tab_ref[r, 1]
                az = tab_ref[r, 2]
                e1x = tab_ref[r, 3]
                e1y = tab_ref[r, 4]
                e1z = tab_ref[r, 5]
                e2x = tab_ref[r, 6]
                e2y = tab_ref[r, 7]
                e2z = tab_ref[r, 8]
                hx = dyv * e2z - dzv * e2y
                hy = dzv * e2x - dxv * e2z
                hz = dxv * e2y - dyv * e2x
                det = e1x * hx + e1y * hy + e1z * hz
                okd = jnp.abs(det) >= 1e-6
                f = jnp.where(okd, 1.0 / jnp.where(okd, det, 1.0), 0.0)
                svx = oxv - ax
                svy = oyv - ay
                svz = ozv - az
                uu = f * (svx * hx + svy * hy + svz * hz)
                ok = okd & (uu >= 0.0) & (uu <= 1.0)
                qx = svy * e1z - svz * e1y
                qy = svz * e1x - svx * e1z
                qz = svx * e1y - svy * e1x
                vv = f * (dxv * qx + dyv * qy + dzv * qz)
                ok &= (vv >= 0.0) & (uu + vv <= 1.0)
                tt = f * (e2x * qx + e2y * qy + e2z * qz)
                ok &= (tt > 1e-4) & (tt < tcap)
                better = ok & (tt < best)
                best = jnp.where(better, tt, best)
                idx = jnp.where(better, r, idx)
            t_ref[:] = best
            idx_ref[:] = idx
            return 0

        @pl.when(jnp.any(enters))
        def _():
            jax.lax.fori_loop(0, cell // 8, tri_group, 0)

        # refresh the early-exit bound only while entries remain (the
        # vector->scalar max is the scan's most expensive scalar op)
        @pl.when(tnear_ref[0, jnp.minimum(i + 1, nc - 1), 0] < _BIG)
        def _():
            maxt_scr[0] = jnp.max(
                jnp.where(live_v, jnp.minimum(t_ref[:], tcap_v), 0.0)
            )

        return i + 1

    jax.lax.while_loop(cond, body, 0)


def _cell_boxes(pos, valid, ncells: int, cell: int):
    """(NC, 6) world AABBs over `cell`-slot groups; dead slots collapse
    to an empty box (x0 > x1) so empty cells sort to the shortlist tail."""
    t_ax, t_ay, t_az = pos[:, 0, 0], pos[:, 0, 1], pos[:, 0, 2]
    bx = pos[:, 1, 0]
    by = pos[:, 1, 1]
    bz = pos[:, 1, 2]
    cx = pos[:, 2, 0]
    cy = pos[:, 2, 1]
    cz = pos[:, 2, 2]
    alive = valid > 0.5

    def mm(a, b, c, lo):
        v = jnp.minimum(jnp.minimum(a, b), c) if lo else jnp.maximum(
            jnp.maximum(a, b), c
        )
        v = jnp.where(alive, v, _BIG if lo else -_BIG)
        v = v.reshape(ncells, cell)
        return v.min(axis=1) if lo else v.max(axis=1)

    return (
        mm(t_ax, bx, cx, True), mm(t_ay, by, cy, True),
        mm(t_az, bz, cz, True),
        mm(t_ax, bx, cx, False), mm(t_ay, by, cy, False),
        mm(t_az, bz, cz, False),
    )


def _block_reduce(field, nby, nbx, lo: bool, neutral):
    v = field.reshape(nby, RT_BH, nbx, RT_BW)
    v = jnp.where(jnp.isnan(v), neutral, v)
    return v.min(axis=(1, 3)) if lo else v.max(axis=(1, 3))


@functools.partial(
    jax.jit, static_argnames=("height", "width", "interpret")
)
def intersect_rays_pallas(
    pos, valid, ox, oy, oz, dx, dy, dz, t_cap,
    height: int, width: int, interpret: bool = False,
):
    """Closest-hit of (H, W) ray fields against the packed scene.

    pos: (T, 3, >=3) world vertices (raster d3 pack); valid: (T,).
    ox..dz: (H, W) f32 component fields; parked dead rays carry origin
    >= 1e7 (the reflect.py convention). t_cap: traced scalar range cap
    (uniforms["refl_dist"]); hits at or beyond it are misses.

    Returns (t, idx) at (H, W): t=inf and idx=-1 for misses — same
    contract as reflect.intersect_rays reshaped.
    """
    tcount = pos.shape[0]

    hp = -(-height // RT_BH) * RT_BH
    wp = -(-width // RT_BW) * RT_BW
    nby, nbx = hp // RT_BH, wp // RT_BW

    cell = -(-RT_CELL // 8) * 8
    ncells = -(-tcount // cell)
    tp = ncells * cell

    a3 = pos[:, 0, :3]
    tab = jnp.concatenate(
        [a3, pos[:, 1, :3] - a3, pos[:, 2, :3] - a3], axis=1
    )
    tab = jnp.where((valid > 0.5)[:, None], tab, 0.0)
    tab = jnp.pad(tab, ((0, tp - tcount), (0, 7)))  # (Tp, 16) lane pad

    cx0, cy0, cz0, cx1, cy1, cz1 = _cell_boxes(
        jnp.pad(pos, ((0, tp - tcount), (0, 0), (0, 0))),
        jnp.pad(valid, (0, tp - tcount)), ncells, cell,
    )

    def padr(f, fill):
        return jnp.pad(
            f, ((0, hp - height), (0, wp - width)), constant_values=fill
        )

    oxp = padr(ox, 1e8)
    oyp = padr(oy, 1e8)
    ozp = padr(oz, 1e8)
    dxp = padr(dx, 0.0)
    dyp = padr(dy, 0.0)
    dzp = padr(dz, 0.0)

    live = oxp < _PARKED
    obx0 = _block_reduce(jnp.where(live, oxp, _BIG), nby, nbx, True, _BIG)
    oby0 = _block_reduce(jnp.where(live, oyp, _BIG), nby, nbx, True, _BIG)
    obz0 = _block_reduce(jnp.where(live, ozp, _BIG), nby, nbx, True, _BIG)
    obx1 = _block_reduce(jnp.where(live, oxp, -_BIG), nby, nbx, False, -_BIG)
    oby1 = _block_reduce(jnp.where(live, oyp, -_BIG), nby, nbx, False, -_BIG)
    obz1 = _block_reduce(jnp.where(live, ozp, -_BIG), nby, nbx, False, -_BIG)
    # direction interval over live rays (parked rays carry (0,-1,0) /
    # (0,0,0) fillers that would wrongly widen the box)
    dbx0 = _block_reduce(jnp.where(live, dxp, _BIG), nby, nbx, True, _BIG)
    dby0 = _block_reduce(jnp.where(live, dyp, _BIG), nby, nbx, True, _BIG)
    dbz0 = _block_reduce(jnp.where(live, dzp, _BIG), nby, nbx, True, _BIG)
    dbx1 = _block_reduce(jnp.where(live, dxp, -_BIG), nby, nbx, False, -_BIG)
    dby1 = _block_reduce(jnp.where(live, dyp, -_BIG), nby, nbx, False, -_BIG)
    dbz1 = _block_reduce(jnp.where(live, dzp, -_BIG), nby, nbx, False, -_BIG)

    # per-(block, cell) t lower bound: euclidean gap between the origin
    # box and the cell box (any ray needs at least that much t to arrive)
    def gap(c0, c1, b0, b1):
        return jnp.maximum(
            jnp.maximum(c0[None, None, :] - b1[:, :, None],
                        b0[:, :, None] - c1[None, None, :]),
            0.0,
        )

    gx = gap(cx0, cx1, obx0, obx1)
    gy = gap(cy0, cy1, oby0, oby1)
    gz = gap(cz0, cz1, obz0, obz1)
    dist = jnp.sqrt(gx * gx + gy * gy + gz * gz)

    # direction cull, per axis: a cell strictly on the +x side of every
    # origin is unreachable when no live ray has dx > 0 (and mirrored)
    def reachable(c0, c1, b0, b1, d0, d1):
        pos_side = c0[None, None, :] > b1[:, :, None]
        neg_side = c1[None, None, :] < b0[:, :, None]
        return ~((pos_side & (d1[:, :, None] <= 0.0))
                 | (neg_side & (d0[:, :, None] >= 0.0)))

    reach = (
        reachable(cx0, cx1, obx0, obx1, dbx0, dbx1)
        & reachable(cy0, cy1, oby0, oby1, dby0, dby1)
        & reachable(cz0, cz1, obz0, obz1, dbz0, dbz1)
    )

    # kernel-side slab-gate table: (ncells, 8) lane-padded AABBs (dead
    # cells carry inverted boxes, so their slab test never passes)
    cboxtab = jnp.stack(
        [cx0, cy0, cz0, cx1, cy1, cz1,
         jnp.zeros_like(cx0), jnp.zeros_like(cx0)], axis=1
    )

    cell_alive = (cx0 <= cx1)[None, None, :]
    key = jnp.where(
        cell_alive & reach & (dist < t_cap), dist, _BIG
    ).astype(jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, key.shape, 2)
    tnear, slist = jax.lax.sort([key, iota], num_keys=1, dimension=2)

    # scalar row: [t_cap | global scene AABB] — the kernel derives each
    # ray's scene-exit cap from the box (sky rays stop bounding the block)
    alive_c = cx0 <= cx1
    tcap_arr = jnp.stack([
        t_cap.astype(jnp.float32),
        jnp.min(jnp.where(alive_c, cx0, _BIG)),
        jnp.min(jnp.where(alive_c, cy0, _BIG)),
        jnp.min(jnp.where(alive_c, cz0, _BIG)),
        jnp.max(jnp.where(alive_c, cx1, -_BIG)),
        jnp.max(jnp.where(alive_c, cy1, -_BIG)),
        jnp.max(jnp.where(alive_c, cz1, -_BIG)),
        jnp.float32(0.0),
    ]).reshape(1, 8)

    ray_spec = pl.BlockSpec((RT_BH, RT_BW), lambda i, j: (i, j))
    # per-block shortlist rows: dynamic-sublane/static-lane VMEM reads in
    # the kernel, one (ncells, 1) row per program
    list_spec = pl.BlockSpec((1, ncells, 1), lambda i, j: (i * nbx + j, 0, 0))
    out = pl.pallas_call(
        functools.partial(_rt_kernel, cell=cell, ncells=ncells),
        grid=(nby, nbx),
        in_specs=[
            list_spec,
            list_spec,
            pl.BlockSpec(
                (tp, 16), lambda i, j: (0, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ncells, 8), lambda i, j: (0, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec((1, 8), lambda i, j: (0, 0)),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
        ],
        out_specs=[
            pl.BlockSpec((RT_BH, RT_BW), lambda i, j: (i, j)),
            pl.BlockSpec((RT_BH, RT_BW), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(
        tnear.reshape(nby * nbx, ncells, 1),
        slist.reshape(nby * nbx, ncells, 1),
        tab, cboxtab, tcap_arr, oxp, oyp, ozp, dxp, dyp, dzp,
    )

    t, idx = out
    return t[:height, :width], idx[:height, :width]


def rt_kernel_supported(tcount: int) -> bool:
    """True when the VMEM-resident table fits and a real TPU is present."""
    from .visibility_pallas import pallas_supported

    return tcount <= RT_SLOT_LIMIT and pallas_supported()
