"""Visibility (depth) pass — XLA formulation.

Replaces the reference's per-tile per-triangle per-pixel loop
(src/rasterizer.rs:984-1060) with a data-parallel reduction: for every pixel,
the closest covering candidate triangle wins (`z < z_buffer` with first-wins
ties, exactly the reference's sequential semantics since candidates are
scanned in draw order).

Coverage is three edge half-plane tests (src/edge.rs:28-36); depth is the
interpolated 1/z plane, z = 1/interp (rasterizer.rs:1049-1060). All per-pixel
work is fused-multiply-add broadcasting over (H, W, C) chunks so XLA keeps it
in registers; the Pallas tile kernel (visibility_pallas.py) is the
performance path for large triangle counts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("width", "height", "chunk"))
def visibility_pass(vis_planes, alive, width: int, height: int, chunk: int = 8):
    """vis_planes (T2, 12), alive (T2,) -> (z (H,W), idx (H,W) int32, hit (H,W)).

    z is initialized to 1.0 (reference z_buffer init, rasterizer.rs:287);
    idx = -1 where no triangle won.
    """
    t2 = vis_planes.shape[0]
    if t2 % chunk != 0:
        pad = chunk - t2 % chunk
        vis_planes = jnp.pad(vis_planes, ((0, pad), (0, 0)))
        alive = jnp.pad(alive, (0, pad))
        t2 += pad

    px = jnp.arange(width, dtype=jnp.float32) + 0.5  # pixel centers
    py = jnp.arange(height, dtype=jnp.float32) + 0.5

    planes = vis_planes.reshape(t2 // chunk, chunk, 12)
    alive_c = alive.reshape(t2 // chunk, chunk)
    starts = jnp.arange(0, t2, chunk, dtype=jnp.int32)

    z0 = jnp.ones((height, width), jnp.float32)
    i0 = jnp.full((height, width), -1, jnp.int32)

    def step(carry, xs):
        zbest, ibest = carry
        pl, al, base = xs  # (C,12), (C,), scalar
        a = pl[:, 0][None, None, :]
        b = pl[:, 1][None, None, :]
        c = pl[:, 2][None, None, :]
        x = px[None, :, None]
        y = py[:, None, None]
        e0 = a * x + b * y + c
        e1 = pl[:, 3][None, None, :] * x + pl[:, 4][None, None, :] * y + pl[:, 5][None, None, :]
        e2 = pl[:, 6][None, None, :] * x + pl[:, 7][None, None, :] * y + pl[:, 8][None, None, :]
        cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (al > 0.5)[None, None, :]
        invz = (
            pl[:, 9][None, None, :] * x
            + pl[:, 10][None, None, :] * y
            + pl[:, 11][None, None, :]
        )
        z = 1.0 / invz
        zm = jnp.where(cov & jnp.isfinite(z), z, jnp.inf)
        # first-wins tie-break inside the chunk: argmin returns first minimum
        local = jnp.argmin(zm, axis=-1)
        zmin = jnp.take_along_axis(zm, local[..., None], axis=-1)[..., 0]
        better = zmin < zbest  # strict: earlier chunks win ties
        zbest = jnp.where(better, zmin, zbest)
        ibest = jnp.where(better, base + local.astype(jnp.int32), ibest)
        return (zbest, ibest), None

    (z, idx), _ = jax.lax.scan(step, (z0, i0), (planes, alive_c, starts))
    hit = idx >= 0
    return z, idx, hit
