"""Visibility (depth) pass — XLA formulation.

Replaces the reference's per-tile per-triangle per-pixel loop
(src/rasterizer.rs:984-1060) with a data-parallel reduction: for every pixel,
the closest covering candidate triangle wins (`z < z_buffer` with first-wins
ties, exactly the reference's sequential semantics since candidates are
scanned in draw order).

Coverage is three edge half-plane tests (src/edge.rs:28-36); depth is the
interpolated 1/z plane, z = 1/interp (rasterizer.rs:1049-1060).

Layout note (TPU): all per-pixel intermediates are full (H, W) arrays so the
VPU's (8, 128) lanes stay saturated — a (H, W, C) layout with small C as the
minor dimension runs ~50x slower. The triangle loop is a `lax.scan` over
chunks with a small unrolled inner loop; XLA fuses each chunk into one pass
over the framebuffer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("width", "height", "chunk", "return_invz"))
def visibility_pass(vis_planes, alive, width: int, height: int, chunk: int = 8, y0=0,
                    z_ceil=None, return_invz: bool = False):
    """vis_planes (T2, 12), alive (T2,) -> (z (H,W), idx (H,W) int32, hit (H,W)).

    z is initialized to 1.0 (reference z_buffer init, rasterizer.rs:287);
    idx = -1 where no triangle won. `y0` offsets the pixel rows (used when
    the framebuffer is row-sharded across devices).

    Dead slots carry the impossible edge (0,0,-1) from the setup pass, so
    `alive` only needs to kill padding rows beyond the packed capacity.

    `z_ceil` (optional, (H,W) in 1/z space): only candidates strictly
    FARTHER than the bound win (invz < z_ceil) — depth peeling for the
    multi-layer transparency pass (the SceneVM front-to-back layer loop,
    3d_shader.wgsl:692-846). Pass the previous layer's raw invz (returned
    with return_invz=True) so the strict < excludes that exact surface
    without any epsilon."""
    t2 = vis_planes.shape[0]
    if t2 % chunk != 0:
        pad = chunk - t2 % chunk
        vis_planes = jnp.pad(vis_planes, ((0, pad), (0, 0)))
        alive = jnp.pad(alive, (0, pad))
        t2 += pad

    # separable plane evaluation: a*x + b*y + c == (a*xs + c) + (b*ys) with
    # the row term on a (W,) vector and the column term on (H,1) — ONE
    # broadcast-add over the framebuffer per plane instead of two FMAs.
    # The megakernel / pallas visibility scans use the IDENTICAL expression
    # order so edge decisions stay bit-equal across paths.
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = (jnp.arange(height, dtype=jnp.float32) + jnp.float32(y0) + 0.5)[:, None]

    # fold `alive` into the planes once: dead rows get the impossible edge
    dead = jnp.array([0.0, 0.0, -1.0] * 3 + [0.0, 0.0, 1.0], jnp.float32)
    planes = jnp.where((alive > 0.5)[:, None], vis_planes, dead[None, :])

    planes_c = planes.reshape(t2 // chunk, chunk, 12)
    starts = jnp.arange(0, t2, chunk, dtype=jnp.int32)

    z0 = jnp.ones((height, width), jnp.float32)
    i0 = jnp.full((height, width), -1, jnp.int32)

    def step(carry, chunk_xs):
        # winner tracked as MAX 1/z (strictly monotonic in z): keeps the
        # per-candidate reciprocal out of the scan and matches the Pallas
        # kernels' selection bit-for-bit
        zbest, ibest = carry
        pl, base = chunk_xs  # (C, 12), scalar
        for c in range(pl.shape[0]):
            e0 = (pl[c, 0] * xs + pl[c, 2]) + pl[c, 1] * ys
            e1 = (pl[c, 3] * xs + pl[c, 5]) + pl[c, 4] * ys
            e2 = (pl[c, 6] * xs + pl[c, 8]) + pl[c, 7] * ys
            invz = (pl[c, 9] * xs + pl[c, 11]) + pl[c, 10] * ys
            # min-chain == all-three >= 0 (NaN propagates to a miss either way)
            cov = jnp.minimum(jnp.minimum(e0, e1), e2) >= 0
            better = cov & (invz > zbest)
            if z_ceil is not None:
                better = better & (invz < z_ceil)
            zbest = jnp.where(better, invz, zbest)
            ibest = jnp.where(better, base + c, ibest)
        return (zbest, ibest), None

    (best, idx), _ = jax.lax.scan(step, (z0, i0), (planes_c, starts))
    hit = idx >= 0
    if return_invz:
        return 1.0 / best, idx, hit, best
    return 1.0 / best, idx, hit
