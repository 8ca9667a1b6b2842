"""Visibility pass — Pallas TPU kernel.

The TPU-native equivalent of the reference's tile-parallel rasterization loop
(src/rasterizer.rs:256-273: rayon over framebuffer tiles, per-tile private
z buffers). The Pallas grid runs one program per (TILE_H x TILE_W) screen
tile; each program walks a two-level bbox hierarchy (super-chunks of
CHUNK*SUPER triangles -> chunks of CHUNK; currently 128 -> 4, tuned on the
map@1080p bench) and *skips whole groups whose screen bbox misses
the tile* — the reference's per-batch bbox check (rasterizer.rs:978-982)
hoisted into real control flow, which the XLA formulation (visibility.py)
cannot do. Candidates should be Morton-sorted (morton_sort) so group bboxes
stay tight.

Measured on v5e @1920x1080, 4096 scattered small triangles: ~0.6ms/chunk of
fully-covering work, linear-scan floor cut from 9ms (flat chunks) to ~1ms by
the hierarchy.

Output: per-pixel closest candidate index + z, semantics identical to
visibility.visibility_pass (strict z '<' keeps the first/lowest slot on
ties within the scan order).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# env overrides exist for offline tuning sweeps only (bench hosts); the
# defaults are the tuned production values
TILE_H = int(os.environ.get("RUSTERIX_TPU_TILE_H", "64"))
TILE_W = 128
CHUNK = int(os.environ.get("RUSTERIX_TPU_CHUNK", "4"))
SUPER = int(os.environ.get("RUSTERIX_TPU_SUPER", "32"))  # chunks per super


def _kernel(sbox_ref, cbox_ref, planes_ref, z_ref, idx_ref):
    """sbox_ref: (NS*4,) i32 super bboxes; cbox_ref: (NC*4,) i32 chunk
    bboxes (scalar-prefetch/SMEM); planes_ref: (T2, 12) f32 VMEM;
    z/idx: (TILE_H, TILE_W) outputs."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    y0 = ti * TILE_H
    x0 = tj * TILE_W

    # separable plane factors (see megakernel / visibility.py — identical
    # expression order keeps edge decisions bit-equal across paths)
    xs_row = (
        jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1).astype(jnp.float32)
        + (x0.astype(jnp.float32) + 0.5)
    )
    ys_col = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, 1), 0).astype(jnp.float32)
        + (y0.astype(jnp.float32) + 0.5)
    )

    z_ref[:] = jnp.ones((TILE_H, TILE_W), jnp.float32)
    idx_ref[:] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)

    ns = planes_ref.shape[0] // (CHUNK * SUPER)

    def super_body(s, _):
        sx0 = sbox_ref[s * 4 + 0]
        sy0 = sbox_ref[s * 4 + 1]
        sx1 = sbox_ref[s * 4 + 2]
        sy1 = sbox_ref[s * 4 + 3]
        s_hit = (
            (sx0 < x0 + TILE_W) & (sx1 > x0) & (sy0 < y0 + TILE_H) & (sy1 > y0)
        )

        @pl.when(s_hit)
        def _():
            def chunk_body(c, _2):
                bx0 = cbox_ref[c * 4 + 0]
                by0 = cbox_ref[c * 4 + 1]
                bx1 = cbox_ref[c * 4 + 2]
                by1 = cbox_ref[c * 4 + 3]
                c_hit = (
                    (bx0 < x0 + TILE_W)
                    & (bx1 > x0)
                    & (by0 < y0 + TILE_H)
                    & (by1 > y0)
                )

                @pl.when(c_hit)
                def _():
                    # max-1/z scan: no per-triangle reciprocal (see megakernel)
                    best = z_ref[:]
                    idx = idx_ref[:]
                    for k in range(CHUNK):
                        t = c * CHUNK + k
                        row = planes_ref[t, :]  # (12,)
                        e0 = (row[0] * xs_row + row[2]) + row[1] * ys_col
                        e1 = (row[3] * xs_row + row[5]) + row[4] * ys_col
                        e2 = (row[6] * xs_row + row[8]) + row[7] * ys_col
                        invz = (row[9] * xs_row + row[11]) + row[10] * ys_col
                        cov = jnp.minimum(jnp.minimum(e0, e1), e2) >= 0
                        better = cov & (invz > best)
                        best = jnp.where(better, invz, best)
                        idx = jnp.where(better, t, idx)
                    z_ref[:] = best
                    idx_ref[:] = idx

                return 0

            jax.lax.fori_loop(s * SUPER, (s + 1) * SUPER, chunk_body, 0)

        return 0

    jax.lax.fori_loop(0, ns, super_body, 0)


def _group_boxes(bbox, group: int):
    """Merged integer bboxes over groups of `group` rows of bbox (N, 4)."""
    n = bbox.shape[0] // group
    bb = bbox.reshape(n, group, 4)
    x0 = jnp.clip(jnp.floor(jnp.min(bb[:, :, 0], axis=1)), -2e9, 2e9).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(jnp.min(bb[:, :, 1], axis=1)), -2e9, 2e9).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(jnp.max(bb[:, :, 2], axis=1)), -2e9, 2e9).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(jnp.max(bb[:, :, 3], axis=1)), -2e9, 2e9).astype(jnp.int32)
    return jnp.stack([x0, y0, x1, y1], axis=1).reshape(-1)


@functools.partial(jax.jit, static_argnames=("width", "height", "interpret"))
def visibility_pass_pallas(
    vis_planes, alive, bbox, width: int, height: int, interpret: bool = False
):
    """Drop-in replacement for visibility_pass using the tile kernel.

    vis_planes (T2, 12), alive (T2,), bbox (T2, 4) f32 (min_x, min_y, max_x,
    max_y; dead slots carry an empty box) -> (z, idx, hit) at (height, width).
    """
    t2 = vis_planes.shape[0]
    group = CHUNK * SUPER
    pad = (-t2) % group
    if pad:
        vis_planes = jnp.pad(vis_planes, ((0, pad), (0, 0)))
        alive = jnp.pad(alive, (0, pad))
        bbox = jnp.pad(bbox, ((0, pad), (0, 0)))
        bbox = (
            bbox.at[t2:, 0].set(1e9)
            .at[t2:, 1].set(1e9)
            .at[t2:, 2].set(-1e9)
            .at[t2:, 3].set(-1e9)
        )
        t2 += pad

    dead = jnp.array([0.0, 0.0, -1.0] * 3 + [0.0, 0.0, 1.0], jnp.float32)
    planes = jnp.where((alive > 0.5)[:, None], vis_planes, dead[None, :])
    # dead slots must not contribute to group boxes
    bbox = jnp.where(
        (alive > 0.5)[:, None],
        bbox,
        jnp.array([1e9, 1e9, -1e9, -1e9], jnp.float32)[None, :],
    )

    cboxes = _group_boxes(bbox, CHUNK)
    sboxes = _group_boxes(bbox, group)

    ph = -height % TILE_H
    pw = -width % TILE_W
    grid = ((height + ph) // TILE_H, (width + pw) // TILE_W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (planes.shape[0], 12),
                lambda i, j, sb, cb: (0, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, sb, cb: (i, j)),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, sb, cb: (i, j)),
        ],
    )

    z, idx = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((height + ph, width + pw), jnp.float32),
            jax.ShapeDtypeStruct((height + ph, width + pw), jnp.int32),
        ],
        interpret=interpret,
    )(sboxes, cboxes, planes)

    z = 1.0 / z[:height, :width]  # back from the max-1/z scan domain
    idx = idx[:height, :width]
    return z, idx, idx >= 0


def morton_perm(bbox, alive, width: int, height: int) -> jnp.ndarray:
    """Permutation sorting candidates along the Morton (Z-order) curve of
    their screen-bbox centers: dead slots to the end (+all-ones code), ties
    break by slot index. ONE u32 code|slot sort instead of argsort's
    variadic (key, iota) sort. This is the SINGLE definition of the curve —
    morton_sort here and megakernel.morton_ftb_sort both build on it, which
    is what keeps the fused and unfused pipelines' orders bit-identical."""
    cx = jnp.clip((bbox[:, 0] + bbox[:, 2]) * 0.5 / width, 0.0, 1.0)
    cy = jnp.clip((bbox[:, 1] + bbox[:, 3]) * 0.5 / height, 0.0, 1.0)
    xi = (cx * 1023).astype(jnp.uint32)
    yi = (cy * 1023).astype(jnp.uint32)

    def spread(v):
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    code = (spread(xi) << 1) | spread(yi)
    t2 = bbox.shape[0]
    slot_bits = max((t2 - 1).bit_length(), 1)
    code_bits = 32 - slot_bits
    if code_bits < 20:
        # huge scenes: coarsen the curve so code|slot still fits u32 (the
        # curve is a locality heuristic — any deterministic order is valid)
        code = code >> (20 - code_bits)
    code = jnp.where(alive > 0.5, code, jnp.uint32((1 << code_bits) - 1))
    packed_key = (code << slot_bits) | jnp.arange(t2, dtype=jnp.uint32)
    return (jnp.sort(packed_key) & jnp.uint32((1 << slot_bits) - 1)).astype(
        jnp.int32
    )


def morton_sort(vis_planes, bbox, alive, tri_id, width: int, height: int,
                extra=None):
    """Reorder candidate triangles along a Morton (Z-order) curve of their
    screen-bbox centers so that group-merged bboxes stay tight and the tile
    kernel's hierarchy skip actually skips.

    Dead slots sort to the end (+inf key). Returns permuted
    (vis_planes, bbox, alive, tri_id). Note: reordering changes z-tie
    winners between EXACTLY co-planar triangles (the reference resolves
    ties by draw order); exact ties are measure-zero in real scenes.
    """
    perm = morton_perm(bbox, alive, width, height)
    # one fused row-gather over a combined matrix instead of five gathers
    cols = [vis_planes, bbox, alive[:, None], tri_id.astype(jnp.float32)[:, None]]
    n_extra = 0
    if extra is not None:
        cols.append(extra)
        n_extra = extra.shape[1]
    combined = jnp.concatenate(cols, axis=1)[perm]
    nv = vis_planes.shape[1]
    out = (
        combined[:, :nv],
        combined[:, nv : nv + 4],
        combined[:, nv + 4],
        combined[:, nv + 5].astype(tri_id.dtype),
    )
    if extra is not None:
        return out + (combined[:, nv + 6 : nv + 6 + n_extra],)
    return out


def pallas_supported() -> bool:
    """True when running on a real TPU backend."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
