"""Sky / Fog render hooks — vectorized over the whole frame.

Exact ports of the reference node math (src/shapestack/shapefx.rs:935-1224):
sun arc + day factor from hour, day/night horizon/zenith lerp, haze, sun
glare disc, perlin cloud layer, distance fog. The per-pixel loops become
jnp tensor expressions evaluated inside the jitted frame."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..shader.patterns import pattern_bank
from ..utils.color import linear_to_srgb_fast


def _smoothstep_transition(hour: float) -> float:
    """shapefx.rs:937-950."""
    dawn_t = min(max(hour - 6.0, 0.0), 2.0) / 2.0
    dawn = dawn_t * dawn_t * (3.0 - 2.0 * dawn_t)
    dusk_t = min(max(20.0 - hour, 0.0), 2.0) / 2.0
    dusk = dusk_t * dusk_t * (3.0 - 2.0 * dusk_t)
    if hour < 6.0:
        return 0.0
    if hour < 8.0:
        return dawn
    if hour < 18.0:
        return 1.0
    if hour < 20.0:
        return dusk
    return 0.0


def sky_setup(node, hour: float):
    """shapefx.rs:971-1057 — precompute sun + palette; returns
    (sun_dir, day_factor)."""
    sunrise, sunset = 6.0, 20.0
    t_day = min(max((hour - sunrise) / (sunset - sunrise), 0.0), 1.0)
    theta = t_day * np.pi
    sun_dir = np.array([np.cos(theta), np.sin(theta), 0.0], np.float32)
    day_factor = _smoothstep_transition(hour)

    node.precomputed = [
        np.array([sun_dir[0], sun_dir[1], sun_dir[2], day_factor], np.float32),
        # haze: lerp(night, day, day_factor)
        (
            np.array([0.1, 0.1, 0.15, 0.0], np.float32) * (1 - day_factor)
            + np.array([0.3, 0.3, 0.35, 0.0], np.float32) * day_factor
        ),
        np.asarray(
            node.values.get_vec("day_horizon", (0.87, 0.80, 0.70, 1.0)), np.float32
        ),
        np.asarray(
            node.values.get_vec("day_zenith", (0.36, 0.62, 0.98, 1.0)), np.float32
        ),
        np.asarray(
            node.values.get_vec("night_horizon", (0.03, 0.04, 0.08, 1.0)), np.float32
        ),
        np.asarray(
            node.values.get_vec("night_zenith", (0.00, 0.01, 0.05, 1.0)), np.float32
        ),
    ]
    return sun_dir, day_factor


def fog_setup(node):
    """shapefx.rs:957-969."""
    node.precomputed = [
        np.asarray(node.values.get_vec("fog_color", (0.0, 0.0, 0.0, 0.0)), np.float32),
        np.array(
            [
                node.values.get_float_default("fog_end_distance", 30.0),
                max(node.values.get_float_default("fog_fade_out", 20.0), 1.0),
                0.0,
                0.0,
            ],
            np.float32,
        ),
    ]


def sky_ambient_color(node):
    """shapefx.rs:1086-1119."""
    if not node.precomputed:
        sky_setup(node, 12.0)
    day_factor = float(node.precomputed[0][3])
    day_avg = (node.precomputed[2] + node.precomputed[3]) * 0.5
    night_avg = (node.precomputed[4] + node.precomputed[5]) * 0.5
    c = night_avg * (1 - day_factor) + day_avg * day_factor
    out = np.asarray(
        linear_to_srgb_fast(np.maximum(c[:3], 0.2)), np.float32
    )
    return np.array([out[0], out[1], out[2], 1.0], np.float32)


def sky_miss(sky_pre, ray_dir, cam_pos):
    """Vectorized render_miss_d3 for the Sky node (shapefx.rs:1122-1224).

    sky_pre: dict of device arrays from the precomputed vec4s;
    ray_dir: (..., 3); cam_pos: (3,). Returns (..., 4) color."""
    sun_data = sky_pre["sun"]
    sun_dir = sun_data[:3]
    day_factor = sun_data[3]

    up = jnp.clip(ray_dir[..., 1], -1.0, 1.0)
    t = ((up + 1.0) * 0.5)[..., None]

    night = sky_pre["night_horizon"] + (sky_pre["night_zenith"] - sky_pre["night_horizon"]) * t
    day = sky_pre["day_horizon"] + (sky_pre["day_zenith"] - sky_pre["day_horizon"]) * t
    color = night * (1.0 - day_factor) + day * day_factor

    # atmospheric haze
    haze = (1.0 - up) ** 3
    fog = sky_pre["haze"] * haze[..., None] * 0.3
    color = color * (1.0 - haze[..., None] * 0.2) + fog

    # sun glare disc
    dot = jnp.clip(jnp.sum(ray_dir * sun_dir, axis=-1), -1.0, 1.0)
    dist = jnp.maximum(1.0 - dot, 0.0)
    sun_radius = 0.04
    k = jnp.clip(1.0 - dist / sun_radius, 0.0, 1.0)
    glare = k * k * (3.0 - 2.0 * k)
    sun_color = jnp.array([1.0, 0.85, 0.6, 0.0], jnp.float32)
    color = color + jnp.where(
        (day_factor > 0.0) & (dist < sun_radius),
        glare,
        0.0,
    )[..., None] * sun_color * day_factor

    # perlin cloud layer at 1500 units (pattern-bank perlin stands in for the
    # reference's own perlin_noise_2d realization)
    cloud_height = 1500.0
    dy = ray_dir[..., 1]
    t_hit = jnp.where(dy > 0.0, (cloud_height - cam_pos[1]) / jnp.where(dy > 0, dy, 1.0), -1.0)
    hit_x = cam_pos[0] + ray_dir[..., 0] * t_hit
    hit_z = cam_pos[2] + ray_dir[..., 2] * t_hit
    u = hit_x * 0.0005
    v = hit_z * 0.0005
    bank = sky_pre["pattern_bank"]
    from ..shader.patterns import PATTERN_NAMES, sample_pattern_jnp

    n = sample_pattern_jnp(bank, PATTERN_NAMES["perlin"], u, v) * 2.0 - 1.0
    alpha_raw = (n + 1.0) * 0.5
    alpha = alpha_raw * jnp.clip(dy * 6.0, 0.0, 1.0)
    alpha = jnp.where((dy > 0.0) & (t_hit > 0.0), alpha, 0.0)

    whiteness = 0.15 + (0.6 - 0.15) * day_factor
    base_colour = color + (jnp.ones(4, jnp.float32) - color) * whiteness
    sun_lit = jnp.maximum(jnp.sum(ray_dir * sun_dir, axis=-1), 0.0) ** 3
    rim_day = jnp.array([1.0, 0.9, 0.8, 1.0], jnp.float32) * 0.4 * day_factor
    rim_night = jnp.array([0.6, 0.7, 1.0, 1.0], jnp.float32) * 0.08
    rim = jnp.where(day_factor > 0.0, rim_day, rim_night) * sun_lit[..., None]
    cloud_colour = base_colour + rim
    color = color + (cloud_colour - color) * alpha[..., None]

    return color


def sky_device_params(node) -> dict:
    """Precomputed vec4s -> device dict for sky_miss."""
    if not node.precomputed:
        sky_setup(node, 12.0)
    return {
        "sun": jnp.asarray(node.precomputed[0]),
        "haze": jnp.asarray(node.precomputed[1]),
        "day_horizon": jnp.asarray(node.precomputed[2]),
        "day_zenith": jnp.asarray(node.precomputed[3]),
        "night_horizon": jnp.asarray(node.precomputed[4]),
        "night_zenith": jnp.asarray(node.precomputed[5]),
        "pattern_bank": jnp.asarray(pattern_bank()),
    }


def fog_apply(color_rgb, world, cam_pos, fog_color, fog_end, fog_fade,
              fog_mode=0.0, fog_density=0.0):
    """Vectorized distance fog for pixels with geometry.

    Two falloffs, selected by the dynamic `fog_mode` scalar:
    - 0: the ShapeFX Fog render node's linear fade
      (shapefx.rs:1071-1083, t = clip((dist-end)/fade))
    - 1: the SceneVM exponential-squared fog the RenderSettings block
      drives (embedded/shader/3d_shader.wgsl:857-868,
      t = 1 - exp(-density * dist^2))
    Divergence note: the WGSL fogs the linear color pre-gamma; this
    pipeline fogs the post-lighting sRGB color like the reference's Fog
    node — the blend end-points are identical, only mid-fog ramps differ
    by the transfer curve."""
    dist = jnp.sqrt(jnp.sum((world - cam_pos) ** 2, axis=-1))
    t_lin = jnp.clip((dist - fog_end) / fog_fade, 0.0, 1.0)
    t_exp = 1.0 - jnp.exp(-fog_density * dist * dist)
    t = fog_mode * t_exp + (1.0 - fog_mode) * t_lin
    return color_rgb * (1.0 - t[..., None]) + fog_color[:3] * t[..., None]
