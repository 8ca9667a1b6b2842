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
    world-space compact; that coherence is the whole trick.
  * triangles are grouped into CELLs of 64 Morton-contiguous pack slots
    (the pack is already Morton-sorted — ops/visibility_pallas.morton_sort)
    with device-computed world AABBs; dead slots collapse to empty boxes,
    which subsumes reflect.py's static live_ranges machinery.
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

Memory plan: the (T,16) triangle table and per-block shortlists live in
VMEM (scalar-read per triangle, static lane / dynamic sublane — the
megakernel's legal-read pattern); no SMEM tables, so there is no 64K-slot
cliff here — the VMEM table is the only size gate (RT_SLOT_LIMIT).

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

#: pack slots per spatial cell (Morton-contiguous -> tight AABBs); grows
#: automatically when the per-block SMEM shortlists would exceed budget
RT_CELL = int(os.environ.get("RUSTERIX_TPU_RT_CELL", "64"))
#: ray-block tile (sublanes x lanes)
RT_BH = int(os.environ.get("RUSTERIX_TPU_RT_BH", "16"))
RT_BW = int(os.environ.get("RUSTERIX_TPU_RT_BW", "256"))
#: largest pack (slots) the VMEM-resident table supports; callers fall
#: back to the XLA wavefront scan above this
RT_SLOT_LIMIT = 16384
#: cap on n_blocks * n_cells: the tnear/slist shortlists are SMEM scalar
#: prefetch (4+4 bytes per entry; the megakernel's cbox prefetch survives
#: to ~256KB — stay well under)
RT_SMEM_ENTRIES = 24576

#: origins >= this are parked dead rays (reflect.py parks at 1e8)
_PARKED = 1e7
_BIG = 3e37


def _rt_kernel(tnear_ref, slist_ref, tab_ref, tcap_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_ref, idx_ref, maxt_scr, *, cell: int, ncells: int):
    """One program per ray block: walk the block's distance-ordered cell
    shortlist, Möller-Trumbore each cell's `cell` triangles against the
    whole (RT_BH, RT_BW) ray tile, early-exit on the t lower bound.

    tnear/slist: flat (NB*ncells,) SMEM scalar-prefetch tables (the
    megakernel's tmask delivery pattern)."""
    tcap = tcap_ref[0, 0]
    oxv = ox_ref[:]
    oyv = oy_ref[:]
    ozv = oz_ref[:]
    dxv = dx_ref[:]
    dyv = dy_ref[:]
    dzv = dz_ref[:]
    live_v = oxv < _PARKED
    lbase = (pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)) * ncells

    t_ref[:] = jnp.full((RT_BH, RT_BW), jnp.inf, jnp.float32)
    idx_ref[:] = jnp.full((RT_BH, RT_BW), -1, jnp.int32)
    # block-open bound: dead rays contribute 0 so a partially-dead block
    # can still early-exit; an all-dead block never enters the loop
    maxt_scr[0] = jnp.max(jnp.where(live_v, tcap, 0.0))

    nc = ncells

    def cond(i):
        ii = jnp.minimum(i, nc - 1)
        return (i < nc) & (tnear_ref[lbase + ii] < maxt_scr[0])

    def body(i):
        c = slist_ref[lbase + i]
        base = c * cell

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

        jax.lax.fori_loop(0, cell // 8, tri_group, 0)

        # refresh the early-exit bound only while entries remain (the
        # vector->scalar max is the scan's most expensive scalar op)
        @pl.when(tnear_ref[lbase + jnp.minimum(i + 1, nc - 1)] < _BIG)
        def _():
            maxt_scr[0] = jnp.max(
                jnp.where(live_v, jnp.minimum(t_ref[:], tcap), 0.0)
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
    nb = nby * nbx

    # adaptive cell size: per-block SMEM shortlists hold nb*ncells
    # entries; coarsen cells (multiple of the 8-wide inner unroll) until
    # the tables fit the budget
    max_nc = max(RT_SMEM_ENTRIES // nb, 1)
    cell = max(RT_CELL, -(-tcount // max_nc))
    cell = -(-cell // 8) * 8
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

    cell_alive = (cx0 <= cx1)[None, None, :]
    key = jnp.where(
        cell_alive & reach & (dist < t_cap), dist, _BIG
    ).astype(jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, key.shape, 2)
    tnear, slist = jax.lax.sort([key, iota], num_keys=1, dimension=2)

    tcap_arr = jnp.reshape(t_cap.astype(jnp.float32), (1, 1))

    ray_spec = pl.BlockSpec((RT_BH, RT_BW), lambda i, j, tn, sl: (i, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nby, nbx),
        in_specs=[
            pl.BlockSpec(
                (tp, 16), lambda i, j, tn, sl: (0, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1), lambda i, j, tn, sl: (0, 0)),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
        ],
        out_specs=[
            pl.BlockSpec((RT_BH, RT_BW), lambda i, j, tn, sl: (i, j)),
            pl.BlockSpec((RT_BH, RT_BW), lambda i, j, tn, sl: (i, j)),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_rt_kernel, cell=cell, ncells=ncells),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        ],
        interpret=interpret,
    )(
        tnear.reshape(-1), slist.reshape(-1),
        tab, tcap_arr, oxp, oyp, ozp, dxp, dyp, dzp,
    )

    t, idx = out
    return t[:height, :width], idx[:height, :width]


def rt_kernel_supported(tcount: int) -> bool:
    """True when the VMEM-resident table fits and a real TPU is present."""
    from .visibility_pallas import pallas_supported

    return tcount <= RT_SLOT_LIMIT and pallas_supported()
