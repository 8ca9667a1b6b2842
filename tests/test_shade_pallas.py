"""Fused Pallas lighting tail vs the XLA shade path: identical pixels
(interpret mode on CPU) across light types, ambient, sun and occlusion."""

import numpy as np
import pytest

import jax.numpy as jnp

from rusterix_tpu import (
    Assets,
    Batch3D,
    D3OrbitCamera,
    Light,
    LightType,
    PixelSource,
    Scene,
)
from rusterix_tpu.ops.raster import Rasterizer
from rusterix_tpu.ops.scene_pack import PackedScene
from rusterix_tpu.ops.setup_pass import setup_pass
from rusterix_tpu.ops.shade import shade_pass
from rusterix_tpu.ops.visibility import visibility_pass

W, H = 192, 96  # exercises tile padding (H=96 < 64*2)


def build_inputs(lights):
    batch = (
        Batch3D.from_box(-0.6, -0.6, -0.6, 1.2, 1.2, 1.2)
        .set_source(PixelSource.pixel((200, 150, 90, 255)))
        .with_computed_normals()
    )
    scene = Scene.from_static([], [batch]).set_lights([l.compile() for l in lights])
    packed = PackedScene.from_scene(scene, Assets.default())
    atlas_np = packed.atlas_index.atlas
    atlas = {
        "flat": jnp.asarray(atlas_np.data.reshape(-1, 4)),
        "w": jnp.int32(atlas_np.data.shape[1]),
        "rects": jnp.asarray(atlas_np.rects),
        "tile_first": jnp.asarray(atlas_np.tile_first),
        "tile_count": jnp.asarray(atlas_np.tile_count),
    }
    d3 = {k: jnp.asarray(v) for k, v in vars(packed.d3).items()}
    ld = dict(packed.lights)
    ld["flicker_factor"] = np.ones_like(ld["valid"])
    ld = {k: jnp.asarray(v) for k, v in ld.items()}

    cam = D3OrbitCamera()
    cam.azimuth = 0.8
    cam.set_parameter_f32("distance", 2.5)
    rast = Rasterizer.setup(None, cam.view_matrix(), cam.projection_matrix(W, H))
    rast.ambient((0.5, 0.6, 0.7, 1.0))
    rast.sun_dir = np.array([0.4, -1.0, 0.2], np.float32)
    rast.day_factor = 0.8
    uni = rast._uniforms(scene)
    uni["has_sun"] = jnp.float32(1.0)
    # occlusion box covering half the world
    uni["occ_box"] = jnp.asarray([[-10.0, -10.0, 0.0, 10.0]], jnp.float32)
    uni["occ_val"] = jnp.asarray([0.5], jnp.float32)

    vis, attr, bbox, alive, tri_id = setup_pass(
        d3["pos"], d3["uv"], d3["nrm"], d3["valid"], d3["cull"],
        uni["view"], uni["proj"], W, H,
    )
    z, idx, hit = visibility_pass(vis, alive.astype(jnp.float32), W, H)
    return z, idx, hit, attr, tri_id, d3, atlas, ld, uni


LIGHT_SETS = {
    "point": [Light(LightType.Point).with_position([2, 2, 2]).with_intensity(1.2)],
    "mixed": [
        Light(LightType.Point).with_position([2, 2, 2]).with_intensity(1.0),
        Light(LightType.Ambient).with_position([0, 2, 0]).with_intensity(0.3),
        Light(LightType.Spot).with_position([0, 3, 0]).with_intensity(1.5),
        Light(LightType.Area).with_position([-2, 2, 0]).with_intensity(0.8),
        Light(LightType.Daylight).with_position([0, 5, 0]).with_intensity(0.5),
    ],
}


@pytest.mark.parametrize("which", list(LIGHT_SETS))
def test_pallas_tail_matches_xla(which):
    args = build_inputs(LIGHT_SETS[which])
    ref, wrote_ref = shade_pass(*args, W, H, 0)
    out, wrote = shade_pass(*args, W, H, 0, use_pallas_tail=True)
    ref = np.asarray(ref)
    out = np.asarray(out)
    assert np.asarray(wrote).tolist() == np.asarray(wrote_ref).tolist()
    hit = np.asarray(args[2])
    diff = np.abs(ref[hit] - out[hit])
    assert diff.max() < 2e-3, diff.max()


def test_pallas_tail_e2e_u8_parity():
    """Full frames through render_frame agree to <=1/255 on every pixel."""
    from rusterix_tpu.ops import raster as raster_mod

    lights = LIGHT_SETS["mixed"]
    batch = (
        Batch3D.from_box(-0.6, -0.6, -0.6, 1.2, 1.2, 1.2)
        .set_source(PixelSource.pixel((200, 150, 90, 255)))
        .with_computed_normals()
    )
    scene = Scene.from_static([], [batch]).set_lights([l.compile() for l in lights])
    cam = D3OrbitCamera()
    cam.azimuth = 0.8
    cam.set_parameter_f32("distance", 2.5)

    frames = []
    for use in (False, True):
        rast = Rasterizer.setup(None, cam.view_matrix(), cam.projection_matrix(W, H))
        rast.ambient((0.5, 0.6, 0.7, 1.0))
        rast.use_pallas = use
        frames.append(
            rast.rasterize(scene, W, H, 32, Assets.default()).astype(np.int32)
        )
    assert np.abs(frames[0] - frames[1]).max() <= 1
