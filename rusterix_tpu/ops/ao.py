"""Screen-space ambient occlusion — the TPU realization of SceneVM's
hemisphere-sampled AO (reference embedded/shader/3d_shader.wgsl:519-560
`compute_ao`, driven by gp5.x = ao_samples / gp5.y = ao_radius from
src/render_settings.rs).

The reference shoots `ao_samples` cosine-weighted occlusion rays per pixel
and accumulates `(1 - t/ao_radius) * opacity`. Per-pixel divergent rays are
the worst case for a vector machine, and arbitrary screen-space gathers cost
~8ns/element on XLA-TPU (CLAUDE.md) — so this pass uses FIXED pixel-offset
taps instead: every tap is a whole-frame shifted image (jnp shifts compile
to copies, zero gathers). A tap occludes when its linear view depth is
closer to the camera than the centre pixel by more than a slope tolerance
and by less than `ao_radius` world units, weighted by the reference's
`1 - delta/radius` falloff. Corners and contact regions darken the same way
the traced version does (tests/test_ao.py validates ordering against a
Möller-Trumbore hemisphere-ray oracle); the known approximation is that
occluders outside the frame or hidden behind nearer geometry are missed —
the usual SSAO contract.

The output (H, W) factor multiplies ONLY the ambient terms (WGSL:
`ambient = (ambient_color * strength + sky) * albedo * ao`), in both the
XLA shade path and the megakernel (per-tile input).
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

#: height above the tangent plane (as a fraction of ao_radius) before a
#: tap counts as an occluder — the screen-space analogue of the traced
#: version's ray-origin normal offset (3d_shader.wgsl:538 `pos + n * eps`)
_BIAS = 0.05

_GOLDEN = math.pi * (3.0 - math.sqrt(5.0))


def tap_offsets(samples: int, max_px: int = 24) -> tuple:
    """Deterministic spiral of `samples` (dx, dy) pixel offsets, radii
    sqrt-spaced from 1.5 (contact occlusion) to `max_px` (area-uniform like
    the reference's cosine_sample_hemisphere r = sqrt(u1)). Static per
    compile."""
    samples = max(1, min(int(samples), 32))
    out = []
    for i in range(samples):
        ang = _GOLDEN * i
        f = math.sqrt(i / (samples - 1)) if samples > 1 else 0.0
        r = 1.5 + (max_px - 1.5) * f
        out.append((int(round(r * math.cos(ang))), int(round(r * math.sin(ang)))))
    return tuple(out)


def _shift_edge(img, dy: int, dx: int):
    """Shift with edge-clamp (pad-edge + slice — no wraparound ghosts)."""
    h, w = img.shape
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    p = jnp.pad(img, ((py0, py1), (px0, px1)), mode="edge")
    return jax.lax.dynamic_slice(p, (py1, px1), (h, w))


@partial(jax.jit, static_argnames=("taps",))
def ssao_pass(z_ndc, hit, depth_a, depth_b, radius, px_scale, taps: tuple):
    """(H, W) ambient-occlusion factor in [0, 1].

    z_ndc/hit: the visibility pass result. depth_a/depth_b: the camera
    projection's depth constants (view depth d = depth_b / (z_ndc +
    depth_a), ops/shadow.depth_const). radius: ao_radius world units
    (traced). px_scale: world units per pixel per unit depth
    (2 / (proj[1,1] * render_height)) — converts a tap's pixel offset into
    its lateral world distance at the centre pixel's depth. taps: static
    pixel-offset tuple from tap_offsets(ao_samples).

    Faithfulness to the traced `compute_ao`: an occluder at plane-relative
    height `dc` and lateral distance `lam` is a hemisphere-ray hit at
    distance ~sqrt(lam^2 + dc^2); it contributes the reference's
    `1 - t/radius` falloff and only counts when that distance is inside
    `radius`. The estimate is renormalised by the taps whose lateral reach
    is inside `radius` at this depth, so distant geometry (taps all out of
    range) fades to unoccluded rather than sampling garbage.

    A flat surface viewed at a slant has a nonzero screen-space depth
    gradient, so raw ``d - d_tap`` would flag half of every spiral as
    occluders (the classic SSAO slope artifact). The local tangent plane's
    predicted delta (``dx*gx + dy*gy`` from clamped central differences) is
    subtracted first — open slanted floors stay at ao == 1 exactly like the
    reference's traced hemisphere, no normals needed.
    """
    d = depth_b / (z_ndc + depth_a)
    # misses park at +inf: they never occlude and never receive
    d = jnp.where(hit, d, jnp.inf)

    # tangent-plane depth gradients as the MIN-MAGNITUDE one-sided
    # difference per axis: at a depth edge (occluder/miss next door) the
    # contaminated side is the larger one, so this picks the true surface
    # slope instead of tilting the plane into the occluder (a central
    # difference would cancel the very occlusion we're measuring);
    # non-finite -> 0 and a `radius`-per-pixel clamp as the backstop
    def _minmag(a, b):
        g = jnp.where(jnp.abs(a) < jnp.abs(b), a, b)
        return jnp.clip(jnp.where(jnp.isfinite(g), g, 0.0), -radius, radius)

    gx = _minmag(_shift_edge(d, 0, -1) - d, d - _shift_edge(d, 0, 1))
    gy = _minmag(_shift_edge(d, -1, 0) - d, d - _shift_edge(d, 1, 0))

    bias = _BIAS * radius
    occ = jnp.zeros(z_ndc.shape, jnp.float32)
    n_eff = jnp.zeros(z_ndc.shape, jnp.float32)
    for dx, dy in taps:
        s = math.hypot(dx, dy)
        d_tap = _shift_edge(d, dy, dx)  # d_tap[y, x] == d[y-dy, x-dx]
        delta = d - d_tap  # view-depth gap (>0: tap surface is closer)
        # the occluder's true lateral offset scales with ITS depth — a
        # nearby occluder seen through a far-away tap pixel is laterally
        # closer than the centre depth suggests
        lam = s * px_scale * jnp.minimum(d, d_tap)
        # plane-relative height decides occluder-ness; the raw delta is
        # the world offset along view z, so the 3D separation is
        # ~sqrt(lateral^2 + delta^2) — the traced ray's `t`
        dc = delta - (dx * gx + dy * gy)
        dist = jnp.sqrt(lam * lam + delta * delta)
        near = (dc > bias) & (dist < radius)
        fall = jnp.maximum(1.0 - dist / jnp.maximum(radius, 1e-6), 0.0)
        occ = occ + jnp.where(near, fall, 0.0)
        # renormalise by the taps whose reach at the CENTRE depth is
        # inside the hemisphere — distant geometry fades to unoccluded
        n_eff = n_eff + (s * px_scale * d < radius).astype(jnp.float32)

    ao = 1.0 - occ / jnp.maximum(n_eff, 1.0)
    return jnp.where(hit, jnp.clip(ao, 0.0, 1.0), 1.0)
