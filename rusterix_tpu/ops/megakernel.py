"""Single-pass tile megakernel: visibility + attributes + texel + lighting
+ compose in ONE Pallas program per 64x128 framebuffer tile.

This is the TPU realization of the reference's whole per-tile loop
(src/rasterizer.rs:273-579: each rayon tile task rasterizes, samples and
shades every pixel it owns before the sequential copy-back). Round-1 split
the work into a visibility kernel + XLA texel resolve + lighting kernel; the
XLA texel stage alone cost ~16ms @1080p because XLA-TPU lowers an (H,W)
element gather to ~8ns/element regardless of table size. In-kernel the same
lookup is a handful of 8x128 lane-shuffles per atlas row
(`jnp.take_along_axis(..., axis=1)` lowers to Mosaic dynamic-gather), so the
texel fetch rides the VPU with everything else and the intermediate
(32,H,W) attribute image + its HBM round trip disappear.

Stages inside one grid step (one VMEM-resident tile):
  1. hierarchical visibility scan (super-chunk/chunk bbox skip, same
     semantics as visibility_pallas._kernel): z + winner attr channels
  2. plane-form attribute interpolation (inv_w, u, v, normal)
  3. texel resolve from the atlas: per-pixel flat index -> (row, lane) split;
     fori_loop over the tile's [min_row, max_row] with one lane-gather +
     select per row (nearest) or four (bilinear)   [texture.rs:203-460]
  4. the full per-pixel lighting chain (ambient hemisphere, sun BRDF,
     occlusion boxes, unrolled light loop)           [rasterizer.rs:1319-1412]
  5. optional distance fog on hit pixels            [shapefx.rs:1071-1083]
  6. compose over the packed-u32 background + RGBA8 quantize
     [rasterizer.rs:1400-1412 write + lib.rs:63-68 rounding]

Outputs: packed RGBA8-in-u32 frame (little-endian r|g<<8|b<<16|a<<24) and
the effective z buffer (1.0 where the opaque pass did not write), feeding
the optional sky-miss / opacity / 2D passes unchanged.

Parity note: selection is max-1/z with strict `>`, identical to the XLA
path, so results are order-independent and match bit-for-bit — EXCEPT at
pixels where two distinct triangles interpolate to a bitwise-equal invz
(duplicated coplanar walls, or far-distance tris whose invz quantizes
together). There the winner depends on scan order (Morton here, slot order
in XLA) and either choice is valid; measured at 5/307200 px on a 128K
random-triangle stress scene, 0 on the minigame map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scene_pack import SRC_OFF, SRC_PIXEL, SRC_TEXTURE
from .visibility_pallas import (
    CHUNK,
    SUPER,
    TILE_H,
    TILE_W,
    _group_boxes,
    morton_perm,
)

# mega attr-table layout (f32 columns)
#   0-17  attribute planes (inv_w, u, v, nx, ny, nz) x (a, b, c)
#   18 kind | 19 repeat | 20 has_normals
#   21-24 rgba (SRC_PIXEL color)
#   25-27 batch ambient rgb
#   28-31 anim-resolved atlas rect (rx, ry, rw, rh)
# material extension (has_material; baked-shader constant material):
#   32 roughness | 33 metallic
# matmap extension (has_matmap; per-pixel material sidecar tiles, starts
# at 34 — has_matmap implies has_material):
#   34-37 M1 rect (emissive rgb | roughness texels)
#   38-41 M2 rect (encoded normal | metallic texels)
#   42 em_scale | 43 writes_normal | 44 matmap_on
# blend extension (starts at mb = 45 if has_matmap else 34 if has_material
# else 32):
#   mb+0..2 bw plane | mb+3 kind2 | mb+4..7 rgba2 | mb+8..11 rect2 | pad
# (column counts come from pack_mega_table's concatenation; the kernel reads
# n_attr = attr.shape[1] — there is no fixed-width constant)

_BIG = 1 << 30  # python int: jnp constants would be captured as kernel consts

#: SMEM byte budget for the prefetched per-chunk bbox table; past it the
#: kernel drops the chunk gate (use_cbox=False) so huge scenes still compile
_CBOX_SMEM_LIMIT = 512 << 10

#: SMEM byte budget for the PER-TILE gate scratch of the HBM-streaming
#: path (tmask_hbm): two (ns,) i32 rows DMA'd per tile. ns = supers, so
#: 128K slots is 8KB and even 2M slots fits — the limit exists only as a
#: compile-safety backstop before the scalar skip-ahead fallback.
_TMASK_HBM_SMEM_LIMIT = 128 << 10


def _pack_boxes16(boxes_flat: jnp.ndarray) -> jnp.ndarray:
    """Pack (n*4,) integer boxes into (n,) i32 at 16-px granularity,
    conservatively grown (floor mins, ceil maxes) — 4x less SMEM than the
    flat table, which compile-OOMs past ~64K candidate slots. Valid for
    screens up to 4080 px; callers gate on that."""
    b = boxes_flat.reshape(-1, 4)
    x0 = jnp.clip(b[:, 0] >> 4, 0, 255)
    y0 = jnp.clip(b[:, 1] >> 4, 0, 255)
    x1 = jnp.clip((b[:, 2] + 15) >> 4, 0, 255)
    y1 = jnp.clip((b[:, 3] + 15) >> 4, 0, 255)
    return x0 | (y0 << 8) | (x1 << 16) | (y1 << 24)


def _srgb_to_linear(x):
    return (0.6975 * x * x + 0.3025) * x


def _linear_to_srgb(x):
    sq = jnp.sqrt(jnp.maximum(x, 0.0))
    return 1.055 * sq - 0.055 * (sq * sq)


def _smoothstep(edge0, edge1, x):
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _apply_repeat(u, v, repeat):
    """texture.rs:203-232 select form (repeat codes from ops.shade)."""
    u_rep = u - jnp.floor(u)
    v_rep = v - jnp.floor(v)
    u_clamp = jnp.clip(u, 0.0, 1.0)
    v_clamp = jnp.clip(v, 0.0, 1.0)
    ur = (repeat == 1.0) | (repeat == 2.0)
    vr = (repeat == 1.0) | (repeat == 3.0)
    return jnp.where(ur, u_rep, u_clamp), jnp.where(vr, v_rep, v_clamp)


def _texel_lookup(atlas_ref, u, v, rect, kind, rgba_cols, repeat, sample_mode,
                  atlas_w):
    """In-tile texel resolve -> (r, g, b, a) f32 0..1 tiles.

    atlas_ref: (R, 128) i32 rows of the packed-u32 atlas. Per pixel the flat
    texel index splits into (row, lane); a fori_loop over the tile's live row
    range does one 8x128 dynamic lane-gather per row and selects the winners.
    Miss / non-texture pixels park at row 2^30 so they never extend the loop.
    """
    is_tex = kind == float(SRC_TEXTURE)
    is_pix = kind == float(SRC_PIXEL)

    uu, vv = _apply_repeat(u, v, repeat)
    uu = jnp.where(is_tex, uu, 0.0)  # NaN-safe for miss pixels
    vv = jnp.where(is_tex, vv, 0.0)
    rx, ry, rw, rh = rect

    def tap_rc(x, y):
        flat = (ry + y).astype(jnp.int32) * atlas_w + (rx + x).astype(jnp.int32)
        return flat >> 7, flat & 127  # 128 lanes per atlas row

    if sample_mode == 0:
        tx = jnp.clip(jnp.floor(uu * (rw - 1.0) + 0.5), 0.0, rw - 1.0)
        ty = jnp.clip(jnp.floor(vv * (rh - 1.0) + 0.5), 0.0, rh - 1.0)
        taps = [(tap_rc(tx, ty), None)]
    else:
        x = uu * (rw - 1.0)
        y = vv * (rh - 1.0)
        x0 = jnp.clip(jnp.floor(x), 0.0, rw - 1.0)
        y0 = jnp.clip(jnp.floor(y), 0.0, rh - 1.0)
        x1 = jnp.minimum(x0 + 1.0, rw - 1.0)
        y1 = jnp.minimum(y0 + 1.0, rh - 1.0)
        dx = x - jnp.floor(x)
        dy = y - jnp.floor(y)
        taps = [
            (tap_rc(x0, y0), (1 - dx) * (1 - dy)),
            (tap_rc(x1, y0), dx * (1 - dy)),
            (tap_rc(x0, y1), (1 - dx) * dy),
            (tap_rc(x1, y1), dx * dy),
        ]

    shape = u.shape
    rows = [jnp.where(is_tex, r, _BIG) for (r, _c), _w in taps]
    cols = [jnp.clip(c, 0, 127) for (_r, c), _w in taps]
    rmin = jnp.min(jnp.stack([jnp.min(r) for r in rows]))
    rmax = jnp.max(jnp.stack([jnp.max(jnp.where(r == _BIG, -1, r)) for r in rows]))

    accs = [jnp.zeros(shape, jnp.int32) for _ in taps]

    def body(r, accs):
        vec = atlas_ref[r, :]
        vb = jnp.broadcast_to(vec[None, :], shape)
        out = []
        for t in range(len(taps)):
            g = jnp.take_along_axis(vb, cols[t], axis=1)
            out.append(jnp.where(rows[t] == r, g, accs[t]))
        return tuple(out)

    accs = jax.lax.fori_loop(
        jnp.maximum(rmin, 0), jnp.minimum(rmax, atlas_ref.shape[0] - 1) + 1,
        body, tuple(accs),
    )

    def unpack(t32):
        return (
            (t32 & 0xFF).astype(jnp.float32),
            ((t32 >> 8) & 0xFF).astype(jnp.float32),
            ((t32 >> 16) & 0xFF).astype(jnp.float32),
            ((t32 >> 24) & 0xFF).astype(jnp.float32),
        )

    if sample_mode == 0:
        tex = unpack(accs[0])
    else:
        chans = [unpack(a) for a in accs]
        tex = tuple(
            jnp.floor(sum(chans[t][c] * taps[t][1] for t in range(4)) + 0.5)
            for c in range(4)
        )

    is_tex_f = is_tex.astype(jnp.float32)
    is_pix_f = is_pix.astype(jnp.float32)
    other = 1.0 - is_tex_f - is_pix_f
    out = []
    for c in range(4):
        val = is_tex_f * tex[c] * (1.0 / 255.0) + is_pix_f * rgba_cols[c]
        if c == 3:
            val = val + other  # SRC_OFF -> opaque black (rasterizer.rs:1222)
        out.append(val)
    return out


def _row_gather_f32(table_ref, row, lane, mask=None):
    """(H,W) element gather from a VMEM-resident (R,128) f32 table: loop the
    tile's live row range, one 8x128 dynamic lane-gather + select per row —
    the exact access pattern of _texel_lookup (atlas) applied to f32 rows.

    `mask` parks excluded pixels at row 2^30 (the _texel_lookup idiom) so
    they never extend the loop; a tile whose pixels are ALL parked runs
    ZERO iterations (rmin=2^30 > rmax=-1). Parked pixels return 0.0 —
    callers select their own neutral value. Without parking, one sky pixel
    or one out-of-range light inflated the loop to hundreds of rows per
    tile (measured 11.5 ms/frame at 1080p; parked + face-split: see
    bench map_1920x1080_shadow_fps)."""
    if mask is not None:
        row = jnp.where(mask, row, _BIG)
    rmin = jnp.min(row)
    rmax = jnp.max(jnp.where(row == _BIG, -1, row))
    acc = jnp.zeros(row.shape, jnp.float32)

    def body(r, acc):
        vec = table_ref[r, :]
        vb = jnp.broadcast_to(vec[None, :], row.shape)
        g = jnp.take_along_axis(vb, lane, axis=1)
        return jnp.where(row == r, g, acc)

    return jax.lax.fori_loop(rmin, rmax + 1, body, acc)


def _mega_kernel(
    n_attr, sample_mode, has_blend, has_material, has_matmap, hbm_tables,
    use_cbox, use_tmask, use_tmask_hbm, light_spec, sun_off, stage_cut,
    shadow_spec, has_ao, brdf_ggx, tonemap,
    sbox_ref, cbox_ref, snear_ref, slist_ref, cmask_ref,
    params_ref, lights_ref, occ_ref,
    planes_ref, attr_ref, atlas_ref, bg_ref, shadow_ref, ao_ref,
    slist_hbm_ref, cmask_hbm_ref,
    rgba_ref, zeff_ref,
    a_scr, idx_scr, minb_scr, *dma_scratch,
):
    if use_tmask_hbm:
        planes_buf, dma_sems, slist_s, cmask_s, gate_sems = dma_scratch
    elif hbm_tables:
        planes_buf, dma_sems = dma_scratch
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    y0 = ti * TILE_H
    x0 = tj * TILE_W

    if use_tmask_hbm:
        # this tile's precomputed gate rows: start the two tiny (ns,) DMAs
        # first so they overlap the framebuffer init below
        ns_g = slist_s.shape[0]
        gbase = (ti * pl.num_programs(1) + tj) * ns_g
        gate_cp_s = pltpu.make_async_copy(
            slist_hbm_ref.at[pl.ds(gbase, ns_g)], slist_s, gate_sems.at[0]
        )
        gate_cp_c = pltpu.make_async_copy(
            cmask_hbm_ref.at[pl.ds(gbase, ns_g)], cmask_s, gate_sems.at[1]
        )
        gate_cp_s.start()
        gate_cp_c.start()

    # row-sharded framebuffers offset every pixel row by params[58]
    # (edge planes and lighting both live in GLOBAL screen coordinates)
    y_base = params_ref[58].astype(jnp.int32) + y0
    rows_f = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
    cols_f = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
    yg = rows_f + (y_base.astype(jnp.float32) + 0.5)
    xg = cols_f + (x0.astype(jnp.float32) + 0.5)
    # separable plane factors for the scan: a*x+b*y+c == (a*xs+c) + b*ys
    # evaluated on a (1, W) row and an (H, 1) column — one broadcast-add
    # over the tile per plane instead of two FMAs (same expression order as
    # visibility.py, so edge decisions stay bit-equal across paths)
    xs_row = (
        jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1).astype(jnp.float32)
        + (x0.astype(jnp.float32) + 0.5)
    )
    ys_col = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, 1), 0).astype(jnp.float32)
        + (y_base.astype(jnp.float32) + 0.5)
    )

    # ---- stage 1: visibility scan (hierarchy of visibility_pallas) ----
    zeff_ref[:] = jnp.ones((TILE_H, TILE_W), jnp.float32)
    idx_scr[:] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
    a_scr[:] = jnp.zeros((n_attr, TILE_H, TILE_W), jnp.float32)
    # front-to-back early-out state: the tile's min winning 1/z. Supers are
    # sorted nearest-first (mega_render), so once snear[s] <= min(best) no
    # remaining super can beat any pixel and the scan stops for good.
    minb_scr[0] = 1.0

    group = CHUNK * SUPER
    ns = planes_ref.shape[0] // group

    def _scan_super(s, planes_at, attr_at, cmask_word=None):
        """Scan one super-chunk; planes_at/attr_at map LOCAL row index ->
        the row data (VMEM direct or the DMA slot buffer).

        cmask_word (tmask path): i32 word whose bit k flags chunk
        s*SUPER + k as tile-intersecting — iterate set bits only instead
        of gate-testing all SUPER chunks on the scalar core."""

        def chunk_body(c, _2):
            def scan_chunk():
                if stage_cut == 4:  # profiling: gates only, no scan body
                    # SMEM side effect so the gated body isn't DCE'd (reset
                    # by the per-super min(zeff) before anyone reads it)
                    minb_scr[0] = minb_scr[0] + 1.0
                    return
                # winner tracked as MAX 1/z: strictly monotonic in z, so
                # the per-triangle reciprocal disappears from the scan
                # (one 1/x at the end instead of one per tri per pixel)
                best = zeff_ref[:]
                idx = idx_scr[:]
                won = False
                local_c = (c - s * SUPER) * CHUNK
                for k in range(CHUNK):
                    t = c * CHUNK + k
                    row = [planes_at(local_c + k, cf) for cf in range(12)]
                    e0 = (row[0] * xs_row + row[2]) + row[1] * ys_col
                    e1 = (row[3] * xs_row + row[5]) + row[4] * ys_col
                    e2 = (row[6] * xs_row + row[8]) + row[7] * ys_col
                    invz = (row[9] * xs_row + row[11]) + row[10] * ys_col
                    cov = jnp.minimum(jnp.minimum(e0, e1), e2) >= 0
                    better = cov & (invz > best)
                    best = jnp.where(better, invz, best)
                    idx = jnp.where(better, t, idx)
                    won = better if won is False else (won | better)
                zeff_ref[:] = best
                idx_scr[:] = idx

                if stage_cut == 3:  # profiling: scan without attr pull-in
                    return

                # chunks that won nothing skip the n_attr*CHUNK-select
                # attribute pull-in (common under heavy overlap)
                @pl.when(jnp.any(won))
                def _():
                    masks = [idx == (c * CHUNK + k) for k in range(CHUNK)]
                    for ch in range(n_attr):
                        acc = a_scr[ch]
                        for k in range(CHUNK):
                            acc = jnp.where(
                                masks[k], attr_at(local_c + k, ch), acc
                            )
                        a_scr[ch] = acc

            if use_cbox:
                # 16-px packed box: x0 | y0<<8 | x1<<16 | y1<<24, grown
                # conservatively at pack time (_pack_boxes16)
                v = cbox_ref[c]
                c_hit = (
                    ((v & 0xFF) * 16 < x0 + TILE_W)
                    & (((v >> 16) & 0xFF) * 16 > x0)
                    & (((v >> 8) & 0xFF) * 16 < y_base + TILE_H)
                    & (((v >> 24) & 0xFF) * 16 > y_base)
                )
                pl.when(c_hit)(scan_chunk)
            else:
                # huge scenes: chunk boxes exceed SMEM — the super test
                # already passed, scan every chunk (see mega_render)
                scan_chunk()
            return 0

        if cmask_word is None:
            jax.lax.fori_loop(s * SUPER, (s + 1) * SUPER, chunk_body, 0)
        else:
            # iterate only the SET bits. Branchless binary-search ctz —
            # Mosaic's scalar core has no popcount/clz/bitcast, but
            # and/shift/select are native (arith ops)
            def bit_body(w):
                x, k = w, jnp.int32(0)
                for bits, mask in (
                    (16, 0xFFFF), (8, 0xFF), (4, 0xF), (2, 0x3), (1, 0x1),
                ):
                    z = (x & mask) == 0
                    x = jnp.where(z, x >> bits, x)
                    k = jnp.where(z, k + bits, k)
                chunk_body(s * SUPER + k, 0)
                return w & (w - 1)

            jax.lax.while_loop(lambda w: w != 0, bit_body, cmask_word)

    def _s_hit(s):
        # clamp: the HBM skip-ahead loop evaluates the bbox test at s == ns
        # under a non-short-circuit `&` (the result is masked by s < ns, but
        # the read itself must stay in bounds)
        s = jnp.minimum(s, ns - 1)
        return (
            (sbox_ref[s * 4 + 0] < x0 + TILE_W)
            & (sbox_ref[s * 4 + 2] > x0)
            & (sbox_ref[s * 4 + 1] < y_base + TILE_H)
            & (sbox_ref[s * 4 + 3] > y_base)
        )

    def _not_done(s):
        # strict >: a super at exactly min(best) cannot win (`invz > best`)
        return (s < ns) & (snear_ref[jnp.minimum(s, ns - 1)] > minb_scr[0])

    if use_tmask:
        # per-tile precomputed gating (mega_render): slist holds this tile's
        # bbox-passing supers compacted in front-to-back order (sentinel ns),
        # cmask the matching chunk-hit bit words — the scalar core only ever
        # touches supers/chunks that actually intersect the tile, instead of
        # box-testing all of them
        base = (ti * pl.num_programs(1) + tj) * ns

        def _not_done_t(i):
            s = slist_ref[base + jnp.minimum(i, ns - 1)]
            return (
                (i < ns)
                & (s < ns)
                & (snear_ref[jnp.minimum(s, ns - 1)] > minb_scr[0])
            )

        def super_body_t(i):
            s = slist_ref[base + i]
            _scan_super(
                s,
                lambda r, cf, s=s: planes_ref[s * group + r, cf],
                lambda r, ch, s=s: attr_ref[s * group + r, ch],
                cmask_word=cmask_ref[base + i],
            )
            # the early-out bound only matters while supers REMAIN for this
            # tile — the full-tile min is a vector->scalar sync (the scan's
            # most expensive scalar op; ~560 of these/frame on the 1080p map
            # vs ~2 supers/tile), so skip it after the last listed super.
            # (The clamped peek can read the NEXT tile's first entry: worst
            # case one pointless reduction, never an incorrect skip.)
            nxt = slist_ref[jnp.minimum(base + i + 1, slist_ref.shape[0] - 1)]

            @pl.when(nxt < ns)
            def _():
                minb_scr[0] = jnp.min(zeff_ref[:])

            return i + 1

        jax.lax.while_loop(_not_done_t, super_body_t, 0)
    elif not hbm_tables:
        # small scenes: whole candidate tables live in VMEM
        def super_body(s):
            @pl.when(_s_hit(s))
            def _():
                _scan_super(
                    s,
                    lambda i, cf, s=s: planes_ref[s * group + i, cf],
                    lambda i, ch, s=s: attr_ref[s * group + i, ch],
                )
                minb_scr[0] = jnp.min(zeff_ref[:])

            return s + 1

        jax.lax.while_loop(_not_done, super_body, 0)
    else:
        # big scenes: tables stay in HBM; each super-chunk's `group` rows DMA
        # into a double-buffered VMEM slot while the previous one computes
        # (pallas-guide double-buffering pattern). Only bbox-PASSING supers
        # are fetched (`next_hit` skip-ahead) — at 128K random tris this is
        # 65.6ms vs 95ms for fetch-everything.
        # HBM mode: planes_ref is the COMBINED (T2, 128) table
        # [planes 0:12 | attr 12:12+n_attr | pad] (mega_render) so each
        # super-chunk DMAs one full-width, lane-aligned (group, 128) slice;
        # reads index the static lane, dynamic sublane — both legal
        def dma_super(s, slot):
            return pltpu.make_async_copy(
                planes_ref.at[pl.ds(s * group, group), :],
                planes_buf.at[slot],
                dma_sems.at[slot, 0],
            )

        if use_tmask_hbm:
            # per-tile precomputed gating at HBM scale: the tile's compacted
            # front-to-back super list + chunk bit words were DMA'd into
            # SMEM scratch in the prologue. The scalar core never box-tests
            # anything — it walks the list (prefetching the next entry's
            # table rows) and scans only the chunks whose bits are set.
            gate_cp_s.wait()
            gate_cp_c.wait()

            s0 = slist_s[0]

            @pl.when(s0 < ns)
            def _():
                dma_super(s0, 0).start()

            def _not_done_th(carry):
                i, _k = carry
                s = slist_s[jnp.minimum(i, ns - 1)]
                return (
                    (i < ns)
                    & (s < ns)
                    & (snear_ref[jnp.minimum(s, ns - 1)] > minb_scr[0])
                )

            def super_body_th(carry):
                i, k = carry
                slot = jax.lax.rem(k, 2)
                s = slist_s[i]
                nxt = slist_s[jnp.minimum(i + 1, ns - 1)]
                more = (i + 1 < ns) & (nxt < ns)

                @pl.when(more)
                def _():
                    dma_super(nxt, jax.lax.rem(k + 1, 2)).start()

                dma_super(s, slot).wait()
                _scan_super(
                    s,
                    lambda r, cf: planes_buf[slot, r, cf],
                    lambda r, ch: planes_buf[slot, r, 12 + ch],
                    cmask_word=cmask_s[i],
                )
                # the early-out bound only matters while supers remain
                # (same skip as the SMEM tmask path)
                @pl.when(more)
                def _():
                    minb_scr[0] = jnp.min(zeff_ref[:])

                return i + 1, k + 1

            i_end, k_end = jax.lax.while_loop(
                _not_done_th, super_body_th, (jnp.int32(0), jnp.int32(0))
            )
            # depth early-out can exit with entry i_end's prefetch in
            # flight (started by the previous iteration, or the prologue
            # when i_end == 0) — drain it so no DMA is left pending
            s_end = slist_s[jnp.minimum(i_end, ns - 1)]

            @pl.when((i_end < ns) & (s_end < ns))
            def _():
                dma_super(s_end, jax.lax.rem(k_end, 2)).wait()
        else:
            # only bbox-passing supers are fetched; the NEXT passing super
            # prefetches while the current one computes (slot parity
            # tracked by the count of passing supers seen so far)
            def next_hit(s0):
                def cond(s):
                    return (s < ns) & ~_s_hit(s)

                return jax.lax.while_loop(cond, lambda s: s + 1, s0)

            first = next_hit(0)

            @pl.when(first < ns)
            def _():
                dma_super(first, 0).start()

            def super_body(carry):
                s, k = carry  # s = current passing super, k = slot parity
                slot = jax.lax.rem(k, 2)
                nxt = next_hit(s + 1)

                @pl.when(nxt < ns)
                def _():
                    dma_super(nxt, jax.lax.rem(k + 1, 2)).start()

                dma_super(s, slot).wait()
                _scan_super(
                    s,
                    lambda i, cf: planes_buf[slot, i, cf],
                    lambda i, ch: planes_buf[slot, i, 12 + ch],
                )
                minb_scr[0] = jnp.min(zeff_ref[:])
                return nxt, k + 1

            s_end, k_end = jax.lax.while_loop(
                lambda c: _not_done(c[0]), super_body, (first, jnp.int32(0))
            )

            # depth early-out can exit with s_end's prefetch in flight
            # (started by the previous iteration) — drain it so no DMA is
            # left pending
            @pl.when(s_end < ns)
            def _():
                dma_super(s_end, jax.lax.rem(k_end, 2)).wait()

    # tiles with no winner at all (pure sky/background — ~40% of the
    # 1080p map frame) skip the ENTIRE per-pixel pipeline below
    # (interp + texel + lighting + fog + compose) and just copy the
    # background through; the scan above already exited cheaply via the
    # super bbox gate.
    tile_hit = idx_scr[:] >= 0

    if stage_cut in (1, 3, 4):  # profiling: visibility scan only
        rgba_ref[:] = idx_scr[:]
        return

    @pl.when(jnp.any(tile_hit))
    def _shade_tile():
        z = 1.0 / zeff_ref[:]  # back from the max-1/z scan domain
        hit = idx_scr[:] >= 0

        # ---- stage 2: plane interpolation ----
        def interp(i):
            return a_scr[3 * i] * xg + a_scr[3 * i + 1] * yg + a_scr[3 * i + 2]

        inv_w = interp(0)
        safe_w = jnp.where(inv_w == 0.0, 1.0, inv_w)
        u = interp(1) / safe_w
        v = interp(2) / safe_w
        nx = interp(3)
        ny = interp(4)
        nz = interp(5)

        kind = a_scr[18]
        repeat = a_scr[19]
        fullbright = (repeat >= 4.0).astype(jnp.float32)
        repeat = repeat - 4.0 * fullbright
        has_n = a_scr[20]
        rgba_cols = [a_scr[21 + c] for c in range(4)]
        amb_r, amb_g, amb_b = a_scr[25], a_scr[26], a_scr[27]
        rect = (a_scr[28], a_scr[29], a_scr[30], a_scr[31])

        # ---- stage 3: texel resolve ----
        atlas_w = params_ref[54].astype(jnp.int32)
        tex = _texel_lookup(
            atlas_ref, u, v, rect, kind, rgba_cols, repeat, sample_mode, atlas_w
        )
        if has_blend:
            # blend ext start (module header)
            mb = 45 if has_matmap else 34 if has_material else 32
            rect2 = (a_scr[mb + 8], a_scr[mb + 9], a_scr[mb + 10], a_scr[mb + 11])
            rgba2_cols = [a_scr[mb + 4 + c] for c in range(4)]
            tex2 = _texel_lookup(
                atlas_ref, u, v, rect2, a_scr[mb + 3], rgba2_cols, repeat,
                sample_mode, atlas_w,
            )
            b_w = jnp.clip(
                (a_scr[mb] * xg + a_scr[mb + 1] * yg + a_scr[mb + 2]) / safe_w,
                0.0, 1.0,
            )
            blend_on = (a_scr[mb + 3] >= 0.0).astype(jnp.float32) * b_w
            tex = [a * (1.0 - blend_on) + b * blend_on for a, b in zip(tex, tex2)]
        tex_r, tex_g, tex_b, tex_a = tex

        if stage_cut == 2:  # profiling: scan + interp + texel, no shading
            def q2(x):
                return jnp.floor(
                    jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5
                ).astype(jnp.int32)

            rgba_ref[:] = (
                q2(tex_r) | (q2(tex_g) << 8) | (q2(tex_b) << 16)
                | (q2(tex_a) << 24)
            )
            return

        if has_matmap:
            # per-PIXEL material from baked M1/M2 sidecar tiles (scene_pack
            # matmap bake; the reference writes these registers per pixel in
            # the hot loop, rasterizer.rs:1284-1303):
            #   M1 = emissive rgb (x em_scale) | roughness
            #   M2 = encoded normal (n+1)/2   | metallic
            m_on = a_scr[44]
            kindm = jnp.where(
                m_on > 0.5, float(SRC_TEXTURE), float(SRC_OFF)
            )
            zeros4 = [jnp.zeros_like(u)] * 4
            m1 = _texel_lookup(
                atlas_ref, u, v, (a_scr[34], a_scr[35], a_scr[36], a_scr[37]),
                kindm, zeros4, repeat, sample_mode, atlas_w,
            )
            m2 = _texel_lookup(
                atlas_ref, u, v, (a_scr[38], a_scr[39], a_scr[40], a_scr[41]),
                kindm, zeros4, repeat, sample_mode, atlas_w,
            )

        # ---- stage 4: lighting (rasterizer.rs:1319-1412 + light.rs:491-653) ----
        width = params_ref[41]
        height = params_ref[42]
        x_ndc = 2.0 * (xg / width) - 1.0
        y_ndc = 1.0 - 2.0 * (yg / height)

        def mat(base, r, c):
            return params_ref[base + 4 * r + c]

        vx = mat(0, 0, 0) * x_ndc + mat(0, 0, 1) * y_ndc + mat(0, 0, 2) * z + mat(0, 0, 3)
        vy = mat(0, 1, 0) * x_ndc + mat(0, 1, 1) * y_ndc + mat(0, 1, 2) * z + mat(0, 1, 3)
        vz = mat(0, 2, 0) * x_ndc + mat(0, 2, 1) * y_ndc + mat(0, 2, 2) * z + mat(0, 2, 3)
        vw = mat(0, 3, 0) * x_ndc + mat(0, 3, 1) * y_ndc + mat(0, 3, 2) * z + mat(0, 3, 3)
        inv_vw = 1.0 / vw
        vx *= inv_vw
        vy *= inv_vw
        vz *= inv_vw
        wx = mat(16, 0, 0) * vx + mat(16, 0, 1) * vy + mat(16, 0, 2) * vz + mat(16, 0, 3)
        wy = mat(16, 1, 0) * vx + mat(16, 1, 1) * vy + mat(16, 1, 2) * vz + mat(16, 1, 3)
        wz = mat(16, 2, 0) * vx + mat(16, 2, 1) * vy + mat(16, 2, 2) * vz + mat(16, 2, 3)

        cam_x = params_ref[32]
        cam_y = params_ref[33]
        cam_z = params_ref[34]

        vdx = cam_x - wx
        vdy = cam_y - wy
        vdz = cam_z - wz
        vlen = jnp.sqrt(vdx * vdx + vdy * vdy + vdz * vdz)
        inv_vlen = 1.0 / jnp.maximum(vlen, 1e-30)
        vdx *= inv_vlen
        vdy *= inv_vlen
        vdz *= inv_vlen

        nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        inv_nlen = 1.0 / jnp.maximum(nlen, 1e-30)
        ux = nx * inv_nlen
        uy = ny * inv_nlen
        uz = nz * inv_nlen
        flip = jnp.where(ux * vdx + uy * vdy + uz * vdz < 0.0, -1.0, 1.0)
        n_ok = has_n > 0.5
        ux = jnp.where(n_ok, ux * flip, 0.0)
        uy = jnp.where(n_ok, uy * flip, 0.0)
        uz = jnp.where(n_ok, uz * flip, 0.0)

        if has_matmap:
            # shader-written normals (M2 rgb, decode 2x-1) replace the
            # interpolated normal UNflipped (shade_pass parity); byte-127
            # "zero" texels decode to |n| < 0.02 and keep the written-zero
            # semantics (no normal -> hemi-only lighting)
            ndx = m2[0] * 2.0 - 1.0
            ndy = m2[1] * 2.0 - 1.0
            ndz = m2[2] * 2.0 - 1.0
            dlen = jnp.sqrt(ndx * ndx + ndy * ndy + ndz * ndz)
            inv_dlen = jnp.where(dlen > 0.02, 1.0 / jnp.maximum(dlen, 1e-30), 0.0)
            use_n = (a_scr[43] > 0.5) & (m_on > 0.5)
            # bump strength (params[75], RenderSettings bump_strength): the
            # SceneVM blends the written normal into the geometric one —
            # N = normalize(mix(N, N_written, bump)), 3d_shader.wgsl:398-404.
            # bump=1 reproduces the raster path's full replacement; written-
            # zero normals keep their hemi-only semantics at ANY strength.
            bump_k = params_ref[75]
            wx_n, wy_n, wz_n = ndx * inv_dlen, ndy * inv_dlen, ndz * inv_dlen
            mixed_x = wx_n * bump_k + ux * (1.0 - bump_k)
            mixed_y = wy_n * bump_k + uy * (1.0 - bump_k)
            mixed_z = wz_n * bump_k + uz * (1.0 - bump_k)
            mlen = jnp.sqrt(
                mixed_x * mixed_x + mixed_y * mixed_y + mixed_z * mixed_z
            )
            inv_ml = jnp.where(
                (inv_dlen > 0.0) & (mlen > 1e-20),
                1.0 / jnp.maximum(mlen, 1e-30),
                0.0,
            )
            # bump >= 1 takes the EXACT replacement branch (bit-parity with
            # the bump-free raster path); 0 < bump < 1 takes the mix
            use_full = use_n & (bump_k >= 1.0)
            use_mix = use_n & (bump_k > 0.0) & (bump_k < 1.0)
            ux = jnp.where(use_full, wx_n, jnp.where(use_mix, mixed_x * inv_ml, ux))
            uy = jnp.where(use_full, wy_n, jnp.where(use_mix, mixed_y * inv_ml, uy))
            uz = jnp.where(use_full, wz_n, jnp.where(use_mix, mixed_z * inv_ml, uz))

        base_r = _srgb_to_linear(tex_r)
        base_g = _srgb_to_linear(tex_g)
        base_b = _srgb_to_linear(tex_b)

        if has_material:
            # per-batch constant material from baked shaders (cols 32/33):
            # same math as shade_fast_brdf with variable roughness/metallic
            m_rough = jnp.clip(a_scr[32], 0.0, 1.0)
            m_metal = jnp.clip(a_scr[33], 0.0, 1.0)
            if has_matmap:
                # matmap pixels take the per-pixel sidecar values instead
                m_onb = m_on > 0.5
                m_rough = jnp.where(m_onb, m1[3], m_rough)
                m_metal = jnp.where(m_onb, m2[3], m_metal)
            f0_r = 0.04 + (base_r - 0.04) * m_metal
            f0_g = 0.04 + (base_g - 0.04) * m_metal
            f0_b = 0.04 + (base_b - 0.04) * m_metal
            f0_max = jnp.maximum(f0_r, jnp.maximum(f0_g, f0_b))
            kd_scale = (1.0 - m_metal) * (1.0 - f0_max)
            kd_r = base_r * kd_scale
            kd_g = base_g * kd_scale
            kd_b = base_b * kd_scale
            # ambient (sky + batch) reduces by the CONSTANT 0.04 F0, not
            # f0_max — "cheap F0 reduction", rasterizer.rs:1338,1369
            ka_scale = (1.0 - m_metal) * 0.96
            ka_r = base_r * ka_scale
            ka_g = base_g * ka_scale
            ka_b = base_b * ka_scale
            alpha_m = jnp.maximum(m_rough * m_rough, 1e-4)
            shininess = jnp.clip(2.0 / alpha_m - 2.0, 1.0, 2048.0)
        else:
            # roughness fixed at 0.5, metallic 0 (rasterizer.rs:1284): f0=0.04,
            # shininess 6 — integer power keeps the transcendentals out
            kd_r = base_r * 0.96
            kd_g = base_g * 0.96
            kd_b = base_b * 0.96
            ka_r, ka_g, ka_b = kd_r, kd_g, kd_b
        if brdf_ggx:
            # Cook-Torrance GGX constants (pbr_lighting,
            # 3d_shader.wgsl:559-650). Without materials roughness is the
            # fixed 0.5 / metallic 0 of the fast path -> a2 and the Smith k
            # fold to Python constants and the whole chain stays on the VPU
            # with zero extra loads.
            if has_material:
                r_g = jnp.clip(m_rough, 0.045, 1.0)
                a_g = r_g * r_g
                a2_g = a_g * a_g
                k_g = (r_g + 1.0) * (r_g + 1.0) * 0.125
                metal_g = m_metal
            else:
                a2_g = 0.0625  # (0.5^2)^2
                k_g = 0.28125  # (1.5^2)/8
                metal_g = 0.0
        hemi = 0.5 * (uy + 1.0)
        if has_ao:
            # screen-space ambient occlusion factor (ops/ao.py, computed
            # from the visibility pre-pass) scales ONLY the ambient terms
            # (WGSL compute_ao consumption: `ambient * ao`,
            # 3d_shader.wgsl:746) — hemi appears exactly in those two
            hemi = hemi * ao_ref[:]

        # ---- per-light geometry shadows (ops/shadow.py lookup, in-tile;
        # SceneVM trace_shadow family, 3d_shader.wgsl:436-517). Expression
        # order mirrors shadow_factor_xla exactly; the map reads are
        # _row_gather_f32 lane gathers — the same access pattern as the
        # atlas texel fetch. ----
        shadow_cube = {}
        sun_shadow = None
        if shadow_spec is not None:
            from .shadow import NORMAL_OFFSET_TEXELS as _K

            sun_entry, cube_entries = shadow_spec
            msd_s = params_ref[59]
            bias_s = params_ref[60]

            def _cube_factor(lpx, lpy, lpz, l_end, base, res, tbase, steps):
                tpx0 = wx - lpx
                tpy0 = wy - lpy
                tpz0 = wz - lpz
                ma0 = jnp.maximum(
                    jnp.abs(tpx0), jnp.maximum(jnp.abs(tpy0), jnp.abs(tpz0))
                )
                offs = bias_s + ma0 * (2.0 * _K / res)
                tpx = tpx0 + ux * offs
                tpy = tpy0 + uy * offs
                tpz = tpz0 + uz * offs
                ax = jnp.abs(tpx)
                ay = jnp.abs(tpy)
                az = jnp.abs(tpz)
                is_x = (ax >= ay) & (ax >= az)
                is_y = (~is_x) & (ay >= az)
                ma = jnp.maximum(ax, jnp.maximum(ay, az))
                sgn_x = jnp.where(tpx >= 0, 1.0, -1.0)
                sgn_z = jnp.where(tpz >= 0, 1.0, -1.0)
                u_num = jnp.where(
                    is_x, -sgn_x * tpz, jnp.where(is_y, tpx, -sgn_z * tpx)
                )
                sgn_y = jnp.where(tpy >= 0, 1.0, -1.0)
                v_num = jnp.where(
                    is_x, tpy, jnp.where(is_y, -sgn_y * tpz, tpy)
                )
                face = jnp.where(
                    is_x,
                    jnp.where(tpx < 0, 1, 0),
                    jnp.where(
                        is_y,
                        jnp.where(tpy < 0, 3, 2),
                        jnp.where(tpz < 0, 5, 4),
                    ),
                )
                ma_safe = jnp.maximum(ma, 1e-20)
                half = res * 0.5
                sx = jnp.clip(jnp.floor(u_num / ma_safe * half + half), 0, res - 1)
                sy = jnp.clip(jnp.floor(-v_num / ma_safe * half + half), 0, res - 1)
                flat = (
                    base
                    + face.astype(jnp.int32) * (res * res)
                    + sy.astype(jnp.int32) * res
                    + sx.astype(jnp.int32)
                )
                # face-split masked gathers: each face's pixels are
                # spatially compact in its map region, so per-face row
                # ranges stay short; miss pixels (garbage world pos) and
                # pixels beyond the light's range (Chebyshev ma0 <= dist,
                # so ma0 > end implies radiance 0) park the loop entirely
                live = hit & (ma0 < l_end)
                stored = jnp.zeros_like(ma)
                trans = jnp.ones_like(ma)
                msize = 6 * res * res
                rel = flat - base
                for f in range(6):
                    m_f = live & (face == f)
                    g = _row_gather_f32(
                        shadow_ref, flat >> 7, flat & 127, mask=m_f
                    )
                    stored = jnp.where(m_f, g, stored)
                    if tbase >= 0:
                        # depth-peeled transparent layers: attenuate only
                        # through layers strictly between light and
                        # receiver (shadow_factor_xla mirror; trace_shadow
                        # stepping, 3d_shader.wgsl:479-515)
                        for k in range(steps):
                            d_flat = tbase + (2 * k) * msize + rel
                            a_flat = tbase + (2 * k + 1) * msize + rel
                            dk = _row_gather_f32(
                                shadow_ref, d_flat >> 7, d_flat & 127,
                                mask=m_f,
                            )
                            ak = _row_gather_f32(
                                shadow_ref, a_flat >> 7, a_flat & 127,
                                mask=m_f,
                            )
                            between = (
                                m_f & (dk < ma - bias_s)
                                & (ma - dk <= msd_s)
                            )
                            trans = trans * jnp.where(
                                between, 1.0 - ak, 1.0
                            )
                blocked = live & (stored < ma - bias_s) & (ma - stored <= msd_s)
                factor = jnp.where(blocked, 0.0, 1.0)
                if tbase >= 0:
                    factor = factor * trans
                return factor

            for li_e, base_e, res_e, tbase_e, steps_e in cube_entries:
                shadow_cube[li_e] = _cube_factor(
                    lights_ref[li_e, 0], lights_ref[li_e, 1],
                    lights_ref[li_e, 2], lights_ref[li_e, 5],
                    base_e, res_e, tbase_e, steps_e,
                )

            if sun_entry is not None and not sun_off:
                base_e, res_e, tbase_e, steps_e = sun_entry
                dx0 = wx - params_ref[61]
                dy0 = wy - params_ref[62]
                dz0 = wz - params_ref[63]
                f_s = params_ref[73]
                vz0 = (
                    dx0 * params_ref[70] + dy0 * params_ref[71]
                    + dz0 * params_ref[72]
                )
                offs = bias_s + jnp.maximum(vz0, 0.0) * (
                    2.0 * _K / (f_s * res_e)
                )
                dx = dx0 + ux * offs
                dy = dy0 + uy * offs
                dz = dz0 + uz * offs
                vx = dx * params_ref[64] + dy * params_ref[65] + dz * params_ref[66]
                vy = dx * params_ref[67] + dy * params_ref[68] + dz * params_ref[69]
                vz = dx * params_ref[70] + dy * params_ref[71] + dz * params_ref[72]
                vz_safe = jnp.maximum(vz, 1e-20)
                half = res_e * 0.5
                sxf = jnp.floor(f_s * vx / vz_safe * half + half)
                syf = jnp.floor(-f_s * vy / vz_safe * half + half)
                in_range = (
                    (vz > params_ref[74])
                    & (sxf >= 0) & (sxf < res_e)
                    & (syf >= 0) & (syf < res_e)
                )
                sxc = jnp.clip(sxf, 0, res_e - 1)
                syc = jnp.clip(syf, 0, res_e - 1)
                flat = (
                    base_e + syc.astype(jnp.int32) * res_e
                    + sxc.astype(jnp.int32)
                )
                live = hit & in_range  # miss pixels park the gather loop
                stored = _row_gather_f32(
                    shadow_ref, flat >> 7, flat & 127, mask=live
                )
                blocked = (
                    live & (stored < vz - bias_s) & (vz - stored <= msd_s)
                )
                sun_shadow = jnp.where(blocked, 0.0, 1.0)
                if tbase_e >= 0:
                    msize = res_e * res_e
                    rel = flat - base_e
                    for k in range(steps_e):
                        d_flat = tbase_e + (2 * k) * msize + rel
                        a_flat = tbase_e + (2 * k + 1) * msize + rel
                        dk = _row_gather_f32(
                            shadow_ref, d_flat >> 7, d_flat & 127,
                            mask=live,
                        )
                        ak = _row_gather_f32(
                            shadow_ref, a_flat >> 7, a_flat & 127,
                            mask=live,
                        )
                        between = (
                            live & (dk < vz - bias_s) & (vz - dk <= msd_s)
                        )
                        sun_shadow = sun_shadow * jnp.where(
                            between, 1.0 - ak, 1.0
                        )

        occlusion = jnp.ones_like(wx)
        for bi in range(occ_ref.shape[0]):
            inside = (
                (wx >= occ_ref[bi, 0])
                & (wz >= occ_ref[bi, 1])
                & (wx <= occ_ref[bi, 2])
                & (wz <= occ_ref[bi, 3])
            )
            occlusion = jnp.minimum(occlusion, jnp.where(inside, occ_ref[bi, 4], 1.0))

        has_ambient = params_ref[35]
        lit_r = has_ambient * params_ref[36] * ka_r * hemi
        lit_g = has_ambient * params_ref[37] * ka_g * hemi
        lit_b = has_ambient * params_ref[38] * ka_b * hemi

        if brdf_ggx:

            def brdf(ldx, ldy, ldz, rad_r, rad_g, rad_b):
                # Cook-Torrance: (kD*base/pi + F*D*G/(4 NdotV NdotL)) *
                # radiance * NdotL (pbr_lighting, 3d_shader.wgsl:585-650;
                # component math — the (P,3) AoS form is 18x slower on the
                # VPU, see tracer.py)
                n_dot_l = jnp.maximum(ux * ldx + uy * ldy + uz * ldz, 0.0)
                n_dot_v = jnp.maximum(ux * vdx + uy * vdy + uz * vdz, 0.0)
                hx = ldx + vdx
                hy = ldy + vdy
                hz = ldz + vdz
                hl = jnp.sqrt(hx * hx + hy * hy + hz * hz)
                inv_hl = 1.0 / jnp.maximum(hl, 1e-30)
                n_dot_h = jnp.maximum(
                    (ux * hx + uy * hy + uz * hz) * inv_hl, 0.0
                )
                denom_d = n_dot_h * n_dot_h * (a2_g - 1.0) + 1.0
                dist = a2_g / (
                    3.14159265358979 * denom_d * denom_d + 1e-7
                )
                gv = n_dot_v / (n_dot_v * (1.0 - k_g) + k_g + 1e-7)
                gl = n_dot_l / (n_dot_l * (1.0 - k_g) + k_g + 1e-7)
                s = dist * gv * gl / (4.0 * n_dot_l * n_dot_v + 1e-7)
                h_dot_v = jnp.maximum(
                    (hx * vdx + hy * vdy + hz * vdz) * inv_hl, 0.0
                )
                x1 = 1.0 - jnp.clip(h_dot_v, 0.0, 1.0)
                x2 = x1 * x1
                x5 = x2 * x2 * x1
                if has_material:
                    fr = f0_r + (1.0 - f0_r) * x5
                    fg = f0_g + (1.0 - f0_g) * x5
                    fb = f0_b + (1.0 - f0_b) * x5
                else:
                    fr = fg = fb = 0.04 + 0.96 * x5
                dd = (1.0 - metal_g) * n_dot_l * 0.31830988618379
                sl = s * n_dot_l
                dead = (n_dot_l <= 0.0) | (n_dot_v <= 0.0)
                return (
                    jnp.where(
                        dead, 0.0, ((1.0 - fr) * dd * base_r + fr * sl) * rad_r
                    ),
                    jnp.where(
                        dead, 0.0, ((1.0 - fg) * dd * base_g + fg * sl) * rad_g
                    ),
                    jnp.where(
                        dead, 0.0, ((1.0 - fb) * dd * base_b + fb * sl) * rad_b
                    ),
                )

        else:

            def brdf(ldx, ldy, ldz, rad_r, rad_g, rad_b):
                n_dot_l = jnp.maximum(ux * ldx + uy * ldy + uz * ldz, 0.0)
                hx = ldx + vdx
                hy = ldy + vdy
                hz = ldz + vdz
                hl = jnp.sqrt(hx * hx + hy * hy + hz * hz)
                inv_hl = 1.0 / jnp.maximum(hl, 1e-30)
                n_dot_h = jnp.maximum((ux * hx + uy * hy + uz * hz) * inv_hl, 0.0)
                if has_material:
                    spec_b = jnp.where(
                        n_dot_h > 0.0,
                        jnp.exp2(
                            shininess * (jnp.log2(jnp.maximum(n_dot_h, 1e-38)))
                        ),
                        0.0,
                    )
                else:
                    nh2 = n_dot_h * n_dot_h
                    spec_b = nh2 * nh2 * nh2
                n_dot_v = jnp.maximum(ux * vdx + uy * vdy + uz * vdz, 0.0)
                x1 = 1.0 - jnp.clip(n_dot_v, 0.0, 1.0)
                x2 = x1 * x1
                x5 = x2 * x2 * x1
                if has_material:
                    fr = f0_r + (1.0 - f0_r) * x5
                    fg = f0_g + (1.0 - f0_g) * x5
                    fb = f0_b + (1.0 - f0_b) * x5
                else:
                    fr = fg = fb = 0.04 + 0.96 * x5
                sb = spec_b * n_dot_l
                dead = n_dot_l <= 0.0
                return (
                    jnp.where(dead, 0.0, (kd_r * n_dot_l + fr * sb) * rad_r),
                    jnp.where(dead, 0.0, (kd_g * n_dot_l + fg * sb) * rad_g),
                    jnp.where(dead, 0.0, (kd_b * n_dot_l + fb * sb) * rad_b),
                )

        # sun_off (static): the caller knows host-side that has_sun == 0, so the
        # whole sun BRDF drops out (bit-safe: its contribution would be
        # has_sun * finite = 0.0 exactly)
        if not sun_off:
            has_sun = params_ref[43]
            sdx = -params_ref[44]
            sdy = -params_ref[45]
            sdz = -params_ref[46]
            slen = jnp.sqrt(sdx * sdx + sdy * sdy + sdz * sdz)
            inv_slen = 1.0 / jnp.maximum(slen, 1e-30)
            day = params_ref[47]
            day_r = day * params_ref[55]
            day_g = day * params_ref[56]
            day_b = day * params_ref[57]
            if sun_shadow is not None:
                day_r = day_r * sun_shadow
                day_g = day_g * sun_shadow
                day_b = day_b * sun_shadow
            sr, sg, sb = brdf(
                sdx * inv_slen, sdy * inv_slen, sdz * inv_slen,
                day_r, day_g, day_b,
            )
            lit_r += has_sun * sr
            lit_g += has_sun * sg
            lit_b += has_sun * sb

        lit_r *= occlusion
        lit_g *= occlusion
        lit_b *= occlusion

        lit_r += amb_r * ka_r * hemi
        lit_g += amb_g * ka_g * hemi
        lit_b += amb_b * ka_b * hemi

        # light_spec (static, from the caller): tuple of (row, type_code) for the
        # VALID light rows — each light emits ONLY its own type's attenuation
        # path (dead padding rows are never visited). None falls back to the
        # generic runtime one-hot blend over every row (the sharded path, whose
        # lights are device arrays at call time). Bit-compatible: the one-hot
        # factors are exact 0.0/1.0 and every blended term is finite, so
        # dropping the zero-weighted terms cannot change the sum.
        if light_spec is None:
            light_iter = [(li, None) for li in range(lights_ref.shape[0])]
        else:
            light_iter = list(light_spec)
        for li, lt in light_iter:
            lpx = lights_ref[li, 0]
            lpy = lights_ref[li, 1]
            lpz = lights_ref[li, 2]
            start = lights_ref[li, 4]
            end = lights_ref[li, 5]
            intensity = lights_ref[li, 6]
            valid = lights_ref[li, 20]
            # static emission predicates (p_*): which paths THIS light needs.
            # f_* stay the numeric one-hot factors (traced in generic mode,
            # exact Python 0/1 in specialized mode).
            p_point = lt is None or lt == 0
            p_amb = lt is None or lt in (1, 2)
            p_spot = lt is None or lt == 3
            p_area = lt is None or lt == 4
            p_day = lt is None or lt not in (0, 1, 2, 3, 4)
            if lt is None:
                f_point = lights_ref[li, 3]
                f_amb = lights_ref[li, 21]
                f_spot = lights_ref[li, 22]
                f_area = lights_ref[li, 23]
                f_day = 1.0 - f_point - f_amb - f_spot - f_area
            f_linedef = lights_ref[li, 19]

            tpx = wx - lpx
            tpy = wy - lpy
            tpz = wz - lpz
            dist = jnp.sqrt(tpx * tpx + tpy * tpy + tpz * tpz)
            inv_dist = 1.0 / jnp.maximum(dist, 1e-20)

            rng_f = (dist < end).astype(jnp.float32)
            near_f = (dist <= start).astype(jnp.float32)
            if p_point or p_area or p_day:
                smooth_att = near_f + (1.0 - near_f) * _smoothstep(end, start, dist)

            point_c = intensity * smooth_att if p_point else 0.0

            if p_spot:
                lin_att = near_f + (1.0 - near_f) * (
                    1.0 - (dist - start) / jnp.maximum(end - start, 1e-20)
                )
                dirx = lights_ref[li, 10]
                diry = lights_ref[li, 11]
                dirz = lights_ref[li, 12]
                cosang = jnp.clip(
                    (dirx * tpx + diry * tpy + dirz * tpz) * inv_dist, -1.0, 1.0
                )
                spot_ok_f = (cosang >= lights_ref[li, 13]).astype(jnp.float32)
                spot_c = spot_ok_f * intensity * lin_att
            else:
                spot_c = 0.0

            if p_area or p_day:
                lnx = lights_ref[li, 16]
                lny = lights_ref[li, 17]
                lnz = lights_ref[li, 18]
                angle_att = jnp.maximum(
                    (lnx * tpx + lny * tpy + lnz * tpz) * inv_dist, 0.0
                )
            if p_area:
                area = lights_ref[li, 14] * lights_ref[li, 15]
                area_main = angle_att * smooth_att * area * intensity
                area_linedef = smooth_att * area * intensity
                area_c = f_linedef * area_linedef + (1.0 - f_linedef) * area_main
                inner_f = (dist < 0.1).astype(jnp.float32)
                area_c = inner_f + (1.0 - inner_f) * area_c
            else:
                area_c = 0.0

            day_c = angle_att * smooth_att * intensity if p_day else 0.0

            if lt is None:
                scale = (
                    f_point * point_c
                    + f_amb * intensity
                    + f_spot * spot_c
                    + f_area * area_c
                    + f_day * day_c
                )
                ok_f = valid * (f_amb + (1.0 - f_amb) * rng_f)
                ok_f = ok_f * (1.0 - f_spot * (1.0 - spot_ok_f))
            else:
                # exactly one one-hot is 1.0: the blends reduce to that term
                scale = (
                    point_c if lt == 0
                    else intensity if lt in (1, 2)
                    else spot_c if lt == 3
                    else area_c if lt == 4
                    else day_c
                )
                if lt in (1, 2):
                    ok_f = valid
                elif lt == 3:
                    ok_f = valid * rng_f * spot_ok_f
                else:
                    ok_f = valid * rng_f

            ldx = -tpx * inv_dist
            ldy = -tpy * inv_dist
            ldz = -tpz * inv_dist
            if lt is None:
                needs = f_point + f_spot + f_area
                lambert = jnp.maximum(ux * ldx + uy * ldy + uz * ldz, 0.0)
                lam = needs * lambert + (1.0 - needs)
            elif lt in (0, 3, 4):
                lam = jnp.maximum(ux * ldx + uy * ldy + uz * ldz, 0.0)
            else:
                lam = 1.0

            rad = ok_f * scale * lam
            if li in shadow_cube:
                rad = rad * shadow_cube[li]
            rad_r = lights_ref[li, 7] * rad
            rad_g = lights_ref[li, 8] * rad
            rad_b = lights_ref[li, 9] * rad

            cr, cg, cb = brdf(ldx, ldy, ldz, rad_r, rad_g, rad_b)
            has_rad = (
                (rad_r != 0.0) | (rad_g != 0.0) | (rad_b != 0.0)
            ).astype(jnp.float32)
            lit_r += has_rad * cr
            lit_g += has_rad * cg
            lit_b += has_rad * cb

        if has_matmap:
            # emissive adds once after all lights (shade_pass parity:
            # `lit = lit + emissive` before the srgb encode)
            em = m_on * a_scr[42]
            lit_r += m1[0] * em
            lit_g += m1[1] * em
            lit_b += m1[2] * em

        if tonemap:
            # SceneVM display transform (Reinhard + gamma 2.2,
            # 3d_shader.wgsl:871-873) — set_tonemap("scenevm")
            def _enc(x):
                t = jnp.maximum(x, 0.0)
                t = t / (t + 1.0)
                return jnp.exp(jnp.log(jnp.maximum(t, 1e-30)) * (1.0 / 2.2))
        else:
            _enc = _linear_to_srgb
        out_r = _enc(lit_r)
        out_g = _enc(lit_g)
        out_b = _enc(lit_b)

        # fullbright batches bypass lighting entirely (raw sRGB texel)
        out_r = fullbright * tex_r + (1.0 - fullbright) * out_r
        out_g = fullbright * tex_g + (1.0 - fullbright) * out_g
        out_b = fullbright * tex_b + (1.0 - fullbright) * out_b

        # ---- stage 5: distance fog ----
        # mode 0: the Fog render node's linear fade (shapefx.rs:1071-1083);
        # mode 1: SceneVM exp^2 fog from RenderSettings fog_density
        # (3d_shader.wgsl:857-868) — both always computed, select is free
        has_fog = params_ref[48]
        fog_lin = jnp.clip(
            (vlen - params_ref[52]) / params_ref[53], 0.0, 1.0
        )
        fog_exp = 1.0 - jnp.exp(-params_ref[77] * vlen * vlen)
        fog_mode = params_ref[76]
        fog_t = has_fog * (fog_mode * fog_exp + (1.0 - fog_mode) * fog_lin)
        out_r = out_r * (1.0 - fog_t) + params_ref[49] * fog_t
        out_g = out_g * (1.0 - fog_t) + params_ref[50] * fog_t
        out_b = out_b * (1.0 - fog_t) + params_ref[51] * fog_t

        # ---- stage 6: compose + RGBA8 pack ----
        a_u8 = jnp.floor(jnp.clip(tex_a, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.int32)
        wrote = hit & (a_u8 >= 255)

        def q(x):
            return jnp.floor(jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.int32)

        packed = q(out_r) | (q(out_g) << 8) | (q(out_b) << 16) | (a_u8 << 24)
        rgba_ref[:] = jnp.where(wrote, packed, bg_ref[:])
        zeff_ref[:] = jnp.where(wrote, z, 1.0)

    @pl.when(jnp.logical_not(jnp.any(tile_hit)))
    def _miss_tile():
        rgba_ref[:] = bg_ref[:]
        zeff_ref[:] = jnp.ones((TILE_H, TILE_W), jnp.float32)


def pack_mega_table(attr_planes, tri_id, meta, atlas, anim_frame,
                    has_blend: bool, has_material: bool = False,
                    has_matmap: bool = False):
    """Per-candidate rows for the megakernel (layout in the module header).

    The texture rect is anim-resolved HERE, per frame per candidate (T rows,
    not H*W pixels), so the kernel never touches tile_first/tile_count."""
    assert not has_matmap or has_material, (
        "has_matmap implies has_material (fixed column layout, see header)"
    )

    def resolve_rect(slot_col):
        slot = jnp.maximum(slot_col, 0)
        tex_id = jnp.take(atlas["tile_first"], slot) + jnp.remainder(
            anim_frame, jnp.maximum(jnp.take(atlas["tile_count"], slot), 1)
        )
        return jnp.take(atlas["rects"], tex_id, axis=0).astype(jnp.float32)

    # receives_light=False rides the repeat column as +4 (decoded in-kernel)
    repeat_enc = meta["repeat"].astype(jnp.float32) + 4.0 * (
        meta["receives_light"] < 0.5
    )
    # concatenate the per-TRIANGLE columns FIRST (T rows, cheap) and gather
    # per candidate ONCE — eight separate (2T,) takes cost ~0.5ms of the
    # 1080p frame as unfused XLA gathers
    tri_cols = [
        meta["kind"].astype(jnp.float32)[:, None],
        repeat_enc[:, None],
        meta["has_normals"][:, None],
        meta["rgba"],
        meta["ambient"],
        resolve_rect(meta["tex_slot"]),
    ]
    if has_material:
        tri_cols += [meta["rough"][:, None], meta["metal"][:, None]]
    if has_matmap:
        tri_cols += [
            resolve_rect(meta["m1_slot"]),
            resolve_rect(meta["m2_slot"]),
            meta["em_scale"][:, None],
            meta["nmap"][:, None],
            (meta["m1_slot"] >= 0).astype(jnp.float32)[:, None],
        ]
    if has_blend:
        tri_cols += [
            meta["kind2"].astype(jnp.float32)[:, None],
            meta["rgba2"],
            resolve_rect(meta["tex_slot2"]),
        ]
    g = jnp.concatenate(tri_cols, axis=1)[tri_id]
    # kind..rect(4) [+rough+metal] [+m1rect+m2rect+em+nmap+on]
    n_front = 14 + (2 if has_material else 0) + (11 if has_matmap else 0)
    cols = [attr_planes[:, :18], g[:, :n_front]]
    if has_blend:
        cols += [
            attr_planes[:, 18:21],  # bw plane sits between material and kind2
            g[:, n_front:],
            jnp.zeros((attr_planes.shape[0], 4), jnp.float32),
        ]
    return jnp.concatenate(cols, axis=1)


def _tri_near_bound(vis_planes, bbox, alive, width, y0g, rows_local):
    """Conservative per-candidate nearest-invz: the invz plane (affine in
    screen x,y) evaluated at the screen-clipped bbox corners — the max over
    the box bounds the max over the triangle. Clips rows to
    [y0g, y0g + rows_local), the rows this kernel instance owns under row
    sharding. ONE definition: morton_ftb_sort and mega_render's unsorted
    fallback must produce bit-identical front-to-back orders or the
    early-out contract between the fused and unfused pipelines breaks."""
    bx0 = jnp.clip(bbox[:, 0], 0.0, float(width))
    by0 = jnp.clip(bbox[:, 1], y0g, y0g + rows_local)
    bx1 = jnp.clip(bbox[:, 2], 0.0, float(width))
    by1 = jnp.clip(bbox[:, 3], y0g, y0g + rows_local)
    pa, pb, pc = vis_planes[:, 9], vis_planes[:, 10], vis_planes[:, 11]
    tri_near = jnp.maximum(
        jnp.maximum(pa * bx0 + pb * by0 + pc, pa * bx1 + pb * by0 + pc),
        jnp.maximum(pa * bx0 + pb * by1 + pc, pa * bx1 + pb * by1 + pc),
    )
    return jnp.where(alive > 0.5, tri_near, -jnp.inf)


def morton_ftb_sort(vis_planes, bbox, alive, table, width: int, height: int,
                    y0g=0.0, rows_local: int = None, return_perm: bool = False):
    """Morton + front-to-back super ordering in ONE fused row gather.

    Composes the two permutations the mega path needs — the Morton curve
    (visibility_pallas.morton_sort) and the nearest-first super-chunk order
    (previously recomputed inside mega_render with a SECOND full-table
    gather) — and applies them to the combined candidate matrix once. The
    full table is ~50-66 f32 columns; at map@1080p the second gather was
    ~0.3ms of the 1.5ms pack+morton phase.

    `height` is the FULL frame height (Morton normalization); the near-bound
    clip window is rows [y0g, y0g + rows_local) — the rows this kernel
    instance owns under row sharding (y0g may be traced). Returns
    (vis_s, bbox_s, alive_s, table_s, s_near) with every array padded to a
    super-group multiple, ready for mega_render(..., s_near=s_near).

    Bit-exact vs the unfused pipeline: dead/padded rows carry an all-ones
    code field and tie-break by slot, so they land in the same tail order,
    and s_near is the same group-max over the same values — argsort ties
    resolve identically.
    """
    group = CHUNK * SUPER
    t2 = vis_planes.shape[0]
    pad = (-t2) % group
    if pad:
        vis_planes = jnp.pad(vis_planes, ((0, pad), (0, 0)))
        bbox = jnp.pad(bbox, ((0, pad), (0, 0)))
        alive = jnp.pad(alive, (0, pad))
        table = jnp.pad(table, ((0, pad), (0, 0)))
        t2 += pad
    ns = t2 // group

    # ---- Morton key (the SHARED curve, visibility_pallas.morton_perm) ----
    p1 = morton_perm(bbox, alive, width, height)

    # ---- per-row near bound (elementwise, ORIGINAL order) ----
    rl = float(height if rows_local is None else rows_local)
    tri_near = _tri_near_bound(vis_planes, bbox, alive, width, y0g, rl)

    # group-max over the MORTON order (one single-column gather), then the
    # composed permutation feeds the one full-table gather below
    s_near = tri_near[p1].reshape(ns, group).max(axis=1)
    order = jnp.argsort(-s_near)
    s_near = jnp.maximum(s_near[order], -1e30).astype(jnp.float32)
    perm = p1.reshape(ns, group)[order].reshape(-1)

    nv = vis_planes.shape[1]
    combined = jnp.concatenate(
        [vis_planes, bbox, alive[:, None], table], axis=1
    )[perm]
    out = (
        combined[:, :nv],
        combined[:, nv : nv + 4],
        combined[:, nv + 4],
        combined[:, nv + 5 :],
        s_near,
    )
    if return_perm:
        # sorted position -> ORIGINAL candidate slot: lets consumers of the
        # sorted visibility kernel (AO depth, the reflection G-buffer) map
        # winner indices back into tri_id/attr space with one tiny gather
        return out + (perm,)
    return out


def light_spec_from(lights) -> tuple:
    """Static (row, type) pairs of the VALID light rows, for mega_render's
    `light_spec` argument — the kernel emits ONLY each listed light's own
    attenuation path and never visits dead padding rows. ONE definition:
    the predicate must stay in lock-step with pack_light_params' slot
    layout and the kernel's type-code dispatch, and bench/profiling/dryrun
    must measure the same specialization production renders."""
    types = np.asarray(lights["type"])
    valid = np.asarray(lights["valid"])
    return tuple(
        (i, int(t)) for i, t in enumerate(types) if float(valid[i]) > 0.5
    )


def pack_light_params(lights) -> jnp.ndarray:
    """SoA light dict -> (L, 24) scalar-prefetch array. Light-type dispatch
    uses host-precomputed one-hot floats (slots 3/21/22/23): scalar-pred
    selects over vector operands don't legalize in Mosaic."""
    L = lights["position"].shape[0]
    out = jnp.zeros((L, 24), jnp.float32)
    out = out.at[:, 0:3].set(lights["position"])
    t = lights["type"].astype(jnp.int32)
    out = out.at[:, 3].set((t == 0).astype(jnp.float32))  # one-hot point
    out = out.at[:, 21].set(((t == 1) | (t == 2)).astype(jnp.float32))
    out = out.at[:, 22].set((t == 3).astype(jnp.float32))
    out = out.at[:, 23].set((t == 4).astype(jnp.float32))
    out = out.at[:, 4].set(lights["start"])
    out = out.at[:, 5].set(lights["end"])
    out = out.at[:, 6].set(lights["intensity"] * lights["flicker_factor"])
    out = out.at[:, 7:10].set(lights["color"])
    out = out.at[:, 10:13].set(lights["direction"])
    out = out.at[:, 13].set(jnp.cos(lights["cone_angle"]))
    out = out.at[:, 14].set(lights["width"])
    out = out.at[:, 15].set(lights["height"])
    out = out.at[:, 16:19].set(lights["normal"])
    out = out.at[:, 19].set(lights["from_linedef"])
    out = out.at[:, 20].set(lights["valid"])
    return out


def pack_occ_params(uniforms) -> jnp.ndarray:
    """Occluded-sector boxes -> (B, 5) [x0 z0 x1 z1 value] (mini.rs:57)."""
    if "occ_box" in uniforms:
        return jnp.concatenate(
            [uniforms["occ_box"], uniforms["occ_val"][:, None]], axis=1
        )
    # one inverted dummy box (matches no pixel)
    return jnp.array([[1e9, 1e9, -1e9, -1e9, 1.0]], jnp.float32)


def pack_mega_params(uniforms, width: int, height: int, atlas_w,
                     has_fog: bool = False, y0: int = 0,
                     shadow_params=None) -> jnp.ndarray:
    """inv_proj/inv_view/camera/ambient/sun scalars + fog at 48-53, the
    atlas row width at 54, shadow params at 59-74, bump strength at 75,
    fog mode/density at 76-77 -> (80,) SMEM array.

    shadow_params: the (40,) array from ops.shadow.bake_shadow_pack; its
    first 16 slots (msd, bias, sun camera) copy to params[59:75]."""
    p = jnp.zeros(80, jnp.float32)
    p = p.at[75].set(uniforms.get("bump_strength", jnp.float32(1.0)))
    if shadow_params is not None:
        p = p.at[59:75].set(jnp.asarray(shadow_params, jnp.float32)[:16])
    p = p.at[0:16].set(uniforms["inv_proj"].reshape(-1))
    p = p.at[16:32].set(uniforms["inv_view"].reshape(-1))
    p = p.at[32:35].set(uniforms["camera_pos"])
    p = p.at[35].set(uniforms["has_ambient"])
    p = p.at[36:39].set(uniforms["ambient"][:3])
    p = p.at[41].set(jnp.float32(width))
    p = p.at[42].set(jnp.float32(height))
    p = p.at[43].set(uniforms["has_sun"])
    p = p.at[44:47].set(uniforms["sun_dir"])
    p = p.at[47].set(uniforms["day_factor"])
    p = p.at[48].set(jnp.float32(1.0 if has_fog else 0.0))
    p = p.at[49:52].set(uniforms["fog_color"][:3])
    p = p.at[52].set(uniforms["fog_end"])
    p = p.at[53].set(uniforms["fog_fade"])
    p = p.at[54].set(jnp.asarray(atlas_w, jnp.float32))
    p = p.at[55:58].set(uniforms.get("sun_color", jnp.ones(3, jnp.float32)))
    p = p.at[58].set(jnp.asarray(y0, jnp.float32))
    p = p.at[76].set(uniforms.get("fog_mode", jnp.float32(0.0)))
    p = p.at[77].set(uniforms.get("fog_density", jnp.float32(0.0)))
    return p


def atlas_rows_i32(atlas_flat_u32: jnp.ndarray) -> jnp.ndarray:
    """(N,) u32 atlas -> (R, 128) i32 rows for VMEM-resident lane gathers."""
    n = atlas_flat_u32.shape[0]
    pad = (-n) % 128
    a = jnp.pad(atlas_flat_u32, (0, pad))
    return jax.lax.bitcast_convert_type(a, jnp.int32).reshape(-1, 128)


def pack_background_u32(background) -> jnp.ndarray:
    """(H,W,4) f32 0..1 -> (H,W) packed RGBA8 u32-in-i32 (lib.rs:63-68)."""
    q = jnp.floor(jnp.clip(background, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.int32)
    return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (q[..., 3] << 24)


def unpack_frame_u32(rgba_u32) -> jnp.ndarray:
    """(H,W) packed -> (H,W,4) u8 (little-endian byte order = r,g,b,a)."""
    return jax.lax.bitcast_convert_type(rgba_u32, jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "sample_mode", "has_blend", "has_material",
        "has_matmap", "interpret", "force_hbm", "full_height", "light_spec",
        "sun_off", "stage_cut", "shadow_spec", "brdf_ggx", "tonemap",
    ),
)
def mega_render(
    vis_planes, alive, bbox, attr, atlas_rows, bg_u32,
    params, lights_packed, occ_packed,
    width: int, height: int, sample_mode: int = 0, has_blend: bool = False,
    has_material: bool = False, has_matmap: bool = False,
    interpret: bool = False,
    force_hbm: bool = False, full_height: int = None, light_spec: tuple = None,
    sun_off: bool = False, s_near=None, stage_cut: int = 0,
    shadow_rows=None, shadow_spec: tuple = None, ao_img=None,
    brdf_ggx: bool = False, tonemap: bool = False,
):
    """One composed opaque frame -> (rgba_u32 (H,W) i32, z_eff (H,W) f32).

    Inputs are Morton-sorted candidate
    planes/bbox/alive plus the mega attr table; atlas_rows from
    atlas_rows_i32; bg_u32 from pack_background_u32.

    `s_near` (from morton_ftb_sort): the per-super nearest-invz bounds for
    inputs ALREADY in front-to-back super order — skips the second
    full-table gather this function otherwise performs."""
    t2 = vis_planes.shape[0]
    n_attr = attr.shape[1]
    group = CHUNK * SUPER
    if s_near is None:
        pad = (-t2) % group
        if pad:
            vis_planes = jnp.pad(vis_planes, ((0, pad), (0, 0)))
            alive = jnp.pad(alive, (0, pad))
            attr = jnp.pad(attr, ((0, pad), (0, 0)))
            bbox = jnp.pad(bbox, ((0, pad), (0, 0)))
            bbox = (
                bbox.at[t2:, 0].set(1e9)
                .at[t2:, 1].set(1e9)
                .at[t2:, 2].set(-1e9)
                .at[t2:, 3].set(-1e9)
            )
            t2 += pad
    else:
        assert t2 % group == 0, (
            f"presorted inputs must be padded to super-group multiples "
            f"(t2={t2}, group={group}) — use morton_ftb_sort"
        )

    dead = jnp.array([0.0, 0.0, -1.0] * 3 + [0.0, 0.0, 1.0], jnp.float32)
    planes = jnp.where((alive > 0.5)[:, None], vis_planes, dead[None, :])
    bbox = jnp.where(
        (alive > 0.5)[:, None],
        bbox,
        jnp.array([1e9, 1e9, -1e9, -1e9], jnp.float32)[None, :],
    )
    attr = jnp.where((alive > 0.5)[:, None], attr, 0.0)

    if s_near is None:
        # ---- front-to-back super ordering + per-super near bound ----
        # Conservative nearest point of each triangle: the invz plane (affine
        # in screen x,y) evaluated at its screen-clipped bbox corners — the
        # max over the bbox bounds the max over the triangle. Supers scan
        # nearest-first so the kernel can STOP the whole visibility scan once
        # every pixel's winner is nearer than everything remaining
        # (early-out; tie caveat shared with morton sorting: scan order flips
        # bitwise-equal-invz winners).
        ns_ = t2 // group
        # bboxes are GLOBAL screen coords; under row sharding this kernel
        # owns rows [y0g, y0g+height) (y0g = params[58]), so the near bound
        # clips to that range — clipping to [0, height) would underestimate
        # invz for geometry below the first shard and let the early-out drop
        # it
        y0g = params[58]
        tri_near = _tri_near_bound(
            planes, bbox, alive, width, y0g, float(height)
        )
        s_near = tri_near.reshape(ns_, group).max(axis=1)
        order = jnp.argsort(-s_near)
        row_perm = (
            order[:, None] * group
            + jnp.arange(group, dtype=order.dtype)[None, :]
        ).reshape(-1)
        planes = planes[row_perm]
        attr = attr[row_perm]
        bbox = bbox[row_perm]
        s_near = s_near[order]
        # dead supers carry -inf: clamp so SMEM comparisons stay finite
        s_near = jnp.maximum(s_near, -1e30).astype(jnp.float32)

    cboxes = _group_boxes(bbox, CHUNK)
    sboxes = _group_boxes(bbox, group)

    # SMEM budget: flat per-chunk boxes are t2 i32 values and blow the
    # scalar-memory limit past ~64K candidate slots (observed: 128K tris =
    # 1MB of prefetched SMEM -> compile OOM; this is what broke big scenes
    # after the CHUNK 8->4 sweep). Boxes pack 4-in-1 at 16-px granularity
    # (t2 bytes); only past _CBOX_SMEM_LIMIT — or on >4080px screens where
    # the packed range clips — does the chunk gate drop out, leaving the
    # super-level test + front-to-back early-out.
    # the 16-px packed range must cover GLOBAL coordinates: under row
    # sharding `height` is rows_local but box y / y_base run to the full
    # frame height (full_height), so gate on that
    use_cbox = (
        cboxes.shape[0] <= _CBOX_SMEM_LIMIT
        and max(width, full_height or height) <= 4080
    )
    cboxes = _pack_boxes16(cboxes) if use_cbox else jnp.zeros(1, jnp.int32)

    ph = -height % TILE_H
    pw = -width % TILE_W
    hp, wp = height + ph, width + pw
    grid = (hp // TILE_H, wp // TILE_W)

    if ph or pw:
        bg_u32 = jnp.pad(bg_u32, ((0, ph), (0, pw)))

    group = CHUNK * SUPER
    # candidate tables larger than ~4MB stay in HBM and stream per
    # super-chunk through double-buffered DMA (VMEM-resident tables fail to
    # compile around 64K candidate slots)
    table_bytes = (planes.shape[0] * 12 + attr.shape[0] * n_attr) * 4
    # force_hbm lets the CPU test suite exercise the DMA-streaming path in
    # interpret mode on small scenes (the size switch would never take it)
    hbm_tables = force_hbm or (not interpret and table_bytes > (4 << 20))

    # ---- per-tile gate precompute (tmask) ----
    # The supers/chunks each tile must visit are knowable OUTSIDE the kernel:
    # one vectorized box-vs-tile pass here (261K lane-parallel tests at
    # 1080p/4K tris — noise) replaces the kernel's per-tile SCALAR-core gate
    # loops (up to ns + passing_supers*SUPER branchy iterations per tile —
    # measured as HALF the kernel at 1080p). Per tile: a front-to-back
    # compacted list of bbox-passing supers (sentinel ns) + one i32 bit word
    # per listed super flagging its intersecting chunks. SMEM-bounded like
    # cbox; huge scenes keep the in-kernel gates / HBM skip-ahead.
    ns_t = planes.shape[0] // group
    n_th, n_tw = grid
    use_tmask = (
        not hbm_tables
        and SUPER <= 32
        and ns_t > 0
        and 2 * n_th * n_tw * ns_t * 4 <= _CBOX_SMEM_LIMIT
    )
    # HBM-streamed scenes can't prefetch the whole (tiles x ns) gate table
    # into SMEM — but the SAME precomputed lists fit in HBM at any scale,
    # and the kernel DMAs just THIS tile's two (ns,) rows (8KB at 128K
    # slots) into SMEM scratch in its prologue. That replaces the scalar
    # skip-ahead box-test loop (tiles x ns SMEM reads+compares) AND gates
    # chunk scans inside each DMA'd super by the precomputed bit words —
    # the gate quality huge scenes lost past the cbox/tmask SMEM cliffs.
    use_tmask_hbm = (
        hbm_tables
        and SUPER <= 32
        and ns_t > 0
        and 2 * ns_t * 4 <= _TMASK_HBM_SMEM_LIMIT
    )
    if use_tmask or use_tmask_hbm:
        y0g_i = params[58].astype(jnp.int32)
        tx0 = jnp.arange(n_tw, dtype=jnp.int32) * TILE_W
        ty0 = jnp.arange(n_th, dtype=jnp.int32) * TILE_H + y0g_i

        def tile_hits(boxes_flat):
            b = boxes_flat.reshape(-1, 4)
            hx = (b[None, :, 0] < tx0[:, None] + TILE_W) & (
                b[None, :, 2] > tx0[:, None]
            )  # (n_tw, n)
            hy = (b[None, :, 1] < ty0[:, None] + TILE_H) & (
                b[None, :, 3] > ty0[:, None]
            )  # (n_th, n)
            return hy[:, None, :] & hx[None, :, :]  # (n_th, n_tw, n)

        s_hit = tile_hits(sboxes)
        slist_in = jnp.sort(
            jnp.where(
                s_hit, jnp.arange(ns_t, dtype=jnp.int32)[None, None, :], ns_t
            ),
            axis=-1,
        ).reshape(-1)
        c_hit = tile_hits(_group_boxes(bbox, CHUNK)).reshape(
            n_th, n_tw, ns_t, SUPER
        )
        bitw = jnp.left_shift(
            jnp.int32(1), jnp.arange(SUPER, dtype=jnp.int32)
        )
        cmask_sup = jnp.sum(
            c_hit.astype(jnp.int32) * bitw[None, None, None, :], axis=-1
        )  # (n_th, n_tw, ns) — disjoint powers: sum == bitwise OR
        # align each tile's words with its compacted super list (the kernel
        # reads cmask[base + i] for list entry i); sentinel entries read
        # in-range garbage the (s < ns) loop guard never visits
        sidx = jnp.minimum(slist_in.reshape(n_th, n_tw, ns_t), ns_t - 1)
        cmask_in = jnp.take_along_axis(cmask_sup, sidx, axis=-1).reshape(-1)
        cboxes = jnp.zeros(1, jnp.int32)  # gates precomputed; free the SMEM
        use_cbox = False
    else:
        slist_in = jnp.zeros(1, jnp.int32)
        cmask_in = jnp.zeros(1, jnp.int32)
    if use_tmask_hbm:
        # the lists ride as ordinary HBM tensor operands (per-tile DMA in
        # the kernel), NOT scalar prefetch — swap them out of the SMEM slots
        slist_hbm, cmask_hbm = slist_in, cmask_in
        slist_in = jnp.zeros(1, jnp.int32)
        cmask_in = jnp.zeros(1, jnp.int32)
    else:
        slist_hbm = jnp.zeros(8, jnp.int32)
        cmask_hbm = jnp.zeros(8, jnp.int32)

    table_space = pl.ANY if (interpret or hbm_tables) else pltpu.VMEM
    if hbm_tables:
        # combined 128-wide rows: [planes | attr | pad] per candidate
        combined = jnp.concatenate([planes, attr], axis=1)
        planes_in = jnp.pad(
            combined, ((0, 0), (0, 128 - combined.shape[1]))
        )
        attr_in = jnp.zeros((1, 1), jnp.float32)  # unused in hbm mode
        planes_spec = pl.BlockSpec(
            planes_in.shape, lambda i, j, *_: (0, 0), memory_space=table_space
        )
        attr_spec = pl.BlockSpec(
            attr_in.shape, lambda i, j, *_: (0, 0), memory_space=table_space
        )
    else:
        planes_in = planes
        attr_in = attr
        planes_spec = pl.BlockSpec(
            (planes.shape[0], 12), lambda i, j, *_: (0, 0),
            memory_space=table_space,
        )
        attr_spec = pl.BlockSpec(
            (attr.shape[0], n_attr), lambda i, j, *_: (0, 0),
            memory_space=table_space,
        )
    scratch = [
        pltpu.VMEM((n_attr, TILE_H, TILE_W), jnp.float32),
        pltpu.VMEM((TILE_H, TILE_W), jnp.int32),
        pltpu.SMEM((1,), jnp.float32),  # front-to-back early-out min(best)
    ]
    if hbm_tables:
        scratch += [
            pltpu.VMEM((2, group, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 1)),
        ]
    if use_tmask_hbm:
        scratch += [
            pltpu.SMEM((ns_t,), jnp.int32),  # this tile's super list
            pltpu.SMEM((ns_t,), jnp.int32),  # matching chunk bit words
            pltpu.SemaphoreType.DMA((2,)),
        ]

    if shadow_rows is None:
        shadow_rows = jnp.zeros((8, 128), jnp.float32)
    has_ao = ao_img is not None
    if has_ao:
        if ph or pw:
            ao_img = jnp.pad(ao_img, ((0, ph), (0, pw)), constant_values=1.0)
        ao_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j))
    else:
        ao_img = jnp.ones((TILE_H, TILE_W), jnp.float32)
        ao_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=grid,
        in_specs=[
            planes_spec,
            attr_spec,
            pl.BlockSpec(
                atlas_rows.shape, lambda i, j, *_: (0, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j)),
            pl.BlockSpec(
                shadow_rows.shape, lambda i, j, *_: (0, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
            ao_spec,
            # per-tile gate lists for the HBM path: stay in HBM; the kernel
            # DMAs one (ns,) row pair per tile into SMEM scratch
            pl.BlockSpec(
                slist_hbm.shape, lambda i, j, *_: (0,), memory_space=pl.ANY
            ),
            pl.BlockSpec(
                cmask_hbm.shape, lambda i, j, *_: (0,), memory_space=pl.ANY
            ),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j)),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j)),
        ],
        scratch_shapes=scratch,
    )

    rgba, zeff = pl.pallas_call(
        functools.partial(
            _mega_kernel, n_attr, sample_mode, has_blend, has_material,
            has_matmap, hbm_tables, use_cbox, use_tmask, use_tmask_hbm,
            light_spec, sun_off, stage_cut, shadow_spec, has_ao, brdf_ggx,
            tonemap,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        ],
        interpret=interpret,
    )(sboxes, cboxes, s_near, slist_in, cmask_in, params, lights_packed,
      occ_packed, planes_in, attr_in, atlas_rows, bg_u32, shadow_rows, ao_img,
      slist_hbm, cmask_hbm)

    return rgba[:height, :width], zeff[:height, :width]
