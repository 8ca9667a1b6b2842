"""Pallas visibility kernel: exact parity with the XLA pass (interpret mode
on CPU; the TPU path compiles the same kernel)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rusterix_tpu import (
    Assets,
    Batch3D,
    CullMode,
    D3OrbitCamera,
    PixelSource,
    Scene,
)
from rusterix_tpu.ops.scene_pack import PackedScene
from rusterix_tpu.ops.setup_pass import setup_pass
from rusterix_tpu.ops.visibility import visibility_pass
from rusterix_tpu.ops.visibility_pallas import morton_sort, visibility_pass_pallas


def build_candidates(W, H):
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-0.5, -0.5, -0.5, 1, 1, 1)
            .set_source(PixelSource.pixel((200, 60, 30, 255))),
            Batch3D.from_box(-1.2, -0.2, -1.2, 0.6, 0.6, 0.6)
            .set_source(PixelSource.pixel((30, 200, 60, 255))),
        ],
    )
    packed = PackedScene.from_scene(scene, Assets.default())
    cam = D3OrbitCamera()
    cam.azimuth = 0.9
    cam.set_parameter_f32("distance", 2.0)
    view = jnp.asarray(cam.view_matrix())
    proj = jnp.asarray(cam.projection_matrix(W, H))
    d3 = {k: jnp.asarray(v) for k, v in vars(packed.d3).items()}
    return setup_pass(
        d3["pos"], d3["uv"], d3["nrm"], d3["valid"], d3["cull"], view, proj, W, H
    )


def test_pallas_matches_xla():
    W, H = 192, 128
    vis, attr, bbox, ok, tid = build_candidates(W, H)
    alive = ok.astype(jnp.float32)
    z1, i1, h1 = visibility_pass(vis, alive, W, H)
    z2, i2, h2 = visibility_pass_pallas(vis, alive, bbox, W, H, interpret=True)
    assert (np.asarray(i1) == np.asarray(i2)).all()
    assert np.abs(np.asarray(z1) - np.asarray(z2)).max() == 0.0


def test_pallas_with_morton_sort_matches():
    W, H = 192, 128
    vis, attr, bbox, ok, tid = build_candidates(W, H)
    alive = ok.astype(jnp.float32)
    z1, i1, h1 = visibility_pass(vis, alive, W, H)

    slot_id = jnp.arange(vis.shape[0], dtype=jnp.int32)
    vis_s, bbox_s, alive_s, slot_s = morton_sort(vis, bbox, alive, slot_id, W, H)
    z2, i2, h2 = visibility_pass_pallas(vis_s, alive_s, bbox_s, W, H, interpret=True)
    i2_mapped = np.where(
        np.asarray(h2), np.asarray(slot_s)[np.maximum(np.asarray(i2), 0)], -1
    )
    assert (np.asarray(i1) == i2_mapped).all()
    assert np.abs(np.asarray(z1) - np.asarray(z2)).max() < 1e-6


def test_non_tile_aligned_frame():
    W, H = 100, 70  # not multiples of the kernel tile
    vis, attr, bbox, ok, tid = build_candidates(W, H)
    alive = ok.astype(jnp.float32)
    z1, i1, h1 = visibility_pass(vis, alive, W, H)
    z2, i2, h2 = visibility_pass_pallas(vis, alive, bbox, W, H, interpret=True)
    assert z2.shape == (H, W)
    assert (np.asarray(i1) == np.asarray(i2)).all()
