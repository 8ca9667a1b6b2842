"""RenderSettings -> Rasterizer plumbing (reference src/render_settings.rs:
10-120 consumed by the SceneHandler; here apply_render_settings maps the
block onto renderer uniforms): sky/sun/ambient/fog params and the
DaylightSimulation apply_hour drive actual frame changes."""

import os

import numpy as np
import pytest

from rusterix_tpu import (
    Assets,
    Batch3D,
    CullMode,
    D3FirstPCamera,
    PixelSource,
    RenderSettings,
    Scene,
)
from rusterix_tpu.ops.raster import Rasterizer

W, H = 128, 96
REF_TOML = "/root/reference/render_settings_example.toml"


def _scene():
    # a long wall receding into the distance (fog needs depth spread)
    return Scene.from_static(
        [],
        [
            Batch3D.from_box(-0.5, 0.0, -40.0, 1.0, 3.0, 40.0)
            .set_cull_mode(CullMode.Off)
            .set_source(PixelSource.pixel((180, 160, 140, 255)))
            .with_computed_normals()
        ],
    )


def _render(rs=None, hour=None):
    cam = D3FirstPCamera()
    cam.set_parameter_vec3("position", [2.5, 1.5, 2.0])
    cam.set_parameter_vec3("center", [0.0, 1.5, -20.0])
    rast = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(W, H)
    )
    if rs is not None:
        rast.apply_render_settings(rs, hour=hour)
    return rast.rasterize(_scene(), W, H, 32, Assets.default())


def test_defaults_change_frame():
    plain = _render()
    lit = _render(RenderSettings())
    assert (plain != lit).any()
    # sky_color becomes the background fill
    rs = RenderSettings()
    f = _render(rs)
    corner = f[2, 2]  # top corner = background
    expect = [round(c * 255) for c in rs.sky_color] + [255]
    assert np.abs(corner.astype(int) - expect).max() <= 1


def test_fog_apply_matches_both_falloff_oracles():
    """fog_apply mode 0 == the Fog node's linear fade (shapefx.rs:
    1071-1083); mode 1 == the SceneVM exp^2 fog (3d_shader.wgsl:857-868:
    fog_factor = exp(-density * d^2), mix(fog_color, color, factor))."""
    import jax.numpy as jnp

    from rusterix_tpu.shapefx.render import fog_apply

    rng = np.random.default_rng(11)
    world = rng.uniform(-8.0, 8.0, (5, 7, 3)).astype(np.float32)
    color = rng.uniform(0.0, 1.0, (5, 7, 3)).astype(np.float32)
    cam = np.array([0.5, 1.0, -2.0], np.float32)
    fog_c = np.array([0.9, 0.3, 0.2, 1.0], np.float32)
    d = np.linalg.norm(world - cam, axis=-1)

    lin = np.asarray(fog_apply(
        jnp.asarray(color), jnp.asarray(world), jnp.asarray(cam),
        jnp.asarray(fog_c), jnp.float32(3.0), jnp.float32(5.0),
        jnp.float32(0.0), jnp.float32(0.0),
    ))
    t = np.clip((d - 3.0) / 5.0, 0.0, 1.0)[..., None]
    assert np.abs(lin - (color * (1 - t) + fog_c[:3] * t)).max() < 1e-5

    dens = 0.07
    exp2 = np.asarray(fog_apply(
        jnp.asarray(color), jnp.asarray(world), jnp.asarray(cam),
        jnp.asarray(fog_c), jnp.float32(0.0), jnp.float32(1.0 / dens),
        jnp.float32(1.0), jnp.float32(dens),
    ))
    f = np.exp(-dens * d * d)[..., None]
    assert np.abs(exp2 - (fog_c[:3] * (1 - f) + color * f)).max() < 1e-5


def test_fog_density_pulls_distant_pixels_to_fog_color():
    rs_clear = RenderSettings()
    rs_fog = RenderSettings()
    rs_fog.fog_density = 0.08
    rs_fog.fog_color = (1.0, 0.2, 0.2)
    clear = _render(rs_clear).astype(int)
    foggy = _render(rs_fog).astype(int)
    assert (clear != foggy).any()
    # distant geometry (top middle of the wall) approaches the fog color;
    # the wall recedes toward the image center
    far = foggy[H // 2 - 4, W // 2 - 20]
    assert far[0] > far[2] + 40, far  # strongly red-shifted by fog


def test_apply_hour_daylight_changes_frame():
    rs_noon = RenderSettings()
    rs_noon.simulation.enabled = True
    rs_night = RenderSettings()
    rs_night.simulation.enabled = True
    noon = _render(rs_noon, hour=12.0).astype(int)
    night = _render(rs_night, hour=23.0).astype(int)
    assert (noon != night).any()
    # night is darker overall and the sun intensity collapses to 0.15
    assert night.mean() < noon.mean() - 5
    assert rs_night.sun_intensity == pytest.approx(0.15)


def test_sun_disabled_removes_directional_light():
    rs_on = RenderSettings()
    rs_on.sun_direction = (-1.0, -0.3, 0.0)  # lights the wall's +x face
    rs_off = RenderSettings()
    rs_off.sun_direction = rs_on.sun_direction
    rs_off.sun_enabled = False
    on = _render(rs_on).astype(int)
    off = _render(rs_off).astype(int)
    assert on[..., :3].sum() > off[..., :3].sum()


@pytest.mark.skipif(not os.path.exists(REF_TOML), reason="reference absent")
def test_reference_example_toml_drives_renderer():
    with open(REF_TOML) as f:
        rs = RenderSettings.from_toml(f.read())
    frame = _render(rs)
    assert frame.shape == (H, W, 4)
    # example file: sky #87CEEB
    corner = frame[2, 2].astype(int)
    assert np.abs(corner[:3] - [0x87, 0xCE, 0xEB]).max() <= 1


def test_timed_transitions_consume_frame_time_ms():
    """set(name, value, time) interpolates at frame_time_ms per tick
    (reference render_settings.rs:222-277 set, :433-505 update_transitions;
    frame_time_ms exists to drive this dt)."""
    rs = RenderSettings()
    rs.frame_time_ms = 100.0  # 10 ticks per second
    rs.fog_density = 0.0
    rs.set("fog_density", 1.0, time=1.0)
    for i in range(5):
        rs.update_transitions()
    assert rs.fog_density == pytest.approx(0.5, abs=1e-5)
    for i in range(6):  # one extra tick absorbs float dt accumulation
        rs.update_transitions()
    assert rs.fog_density == pytest.approx(1.0)
    assert not rs.transitions  # finished transitions clear

    # Vec3 keys interpolate componentwise
    rs.set("sky_color", (1.0, 0.0, 0.0), time=1.0)
    for _ in range(5):
        rs.update_transitions()
    assert rs.sky_color[0] == pytest.approx(0.75, abs=1e-5)

    # time=0 applies immediately; frame_time_ms sets directly
    rs.set("sun_intensity", 0.25)
    assert rs.sun_intensity == 0.25
    rs.set("frame_time_ms", 50.0)
    assert rs.frame_time_ms == 50.0
    with pytest.raises(KeyError):
        rs.set("no_such_setting", 1.0)
