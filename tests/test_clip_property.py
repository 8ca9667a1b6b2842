"""Property tests: the device setup pass (vmapped clip/project/edge build)
vs the NumPy oracle port of Batch3D::clip_and_project over randomized
triangles — including near-plane straddlers and degenerate cases
(SURVEY.md §4 suggested oracle strategy)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rusterix_tpu import Assets, Batch3D, CullMode, D3OrbitCamera, PixelSource, Scene
from rusterix_tpu.ops.scene_pack import PackedScene
from rusterix_tpu.ops.setup_pass import setup_pass

from .oracle import clip_and_project

W, H = 128, 96


def run_both(verts, cull=CullMode.Off, seed_cam=0.7):
    tris = np.arange(len(verts)).reshape(-1, 3)
    batch = Batch3D.new(verts, tris, np.zeros((len(verts), 2), np.float32))
    batch.set_cull_mode(cull)
    batch.set_source(PixelSource.pixel((255, 255, 255, 255)))
    scene = Scene.from_static([], [batch])
    packed = PackedScene.from_scene(scene, Assets.default())
    cam = D3OrbitCamera()
    cam.azimuth = seed_cam
    cam.set_parameter_f32("distance", 2.0)
    view = cam.view_matrix()
    proj = cam.projection_matrix(W, H)
    d3 = {k: jnp.asarray(v) for k, v in vars(packed.d3).items()}
    vis, attr, bbox, ok, tid = setup_pass(
        d3["pos"], d3["uv"], d3["nrm"], d3["valid"], d3["cull"],
        jnp.asarray(view), jnp.asarray(proj), W, H,
    )
    oracle = clip_and_project(batch, view.astype(np.float64), proj.astype(np.float64), W, H)
    return np.asarray(ok), np.asarray(bbox), oracle


def oracle_visible_bboxes(oracle):
    out = []
    for ti, (coeffs, vis) in enumerate(oracle["edges"]):
        if not vis:
            continue
        i0, i1, i2 = oracle["indices"][ti]
        pts = [oracle["projected"][i] for i in (i0, i1, i2)]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        out.append((min(xs), min(ys), max(xs), max(ys)))
    return out


@pytest.mark.parametrize("seed", [1, 7, 42, 99])
def test_random_triangles_match_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 12
    verts = rng.uniform(-1.5, 1.5, (n * 3, 3)).astype(np.float32)
    verts = np.concatenate([verts, np.ones((n * 3, 1), np.float32)], axis=1)
    ok, bbox, oracle = run_both(verts)
    dev_boxes = sorted(
        tuple(np.round(b, 2)) for b, alive in zip(bbox, ok) if alive
    )
    ora_boxes = sorted(tuple(np.round(np.array(b), 2)) for b in oracle_visible_bboxes(oracle))
    assert len(dev_boxes) == len(ora_boxes)
    for d, o in zip(dev_boxes, ora_boxes):
        assert np.allclose(d, o, atol=0.2), (d, o)


@pytest.mark.parametrize("seed", [3, 11])
def test_near_plane_straddlers_match_oracle(seed):
    """Triangles crossing the z = -0.1 view plane exercise the fixed-slot
    clip emission order."""
    rng = np.random.default_rng(seed)
    cam = D3OrbitCamera()
    cam.azimuth = 0.7
    cam.set_parameter_f32("distance", 2.0)
    eye = cam.eye_position()
    fwd = -eye / np.linalg.norm(eye)
    n = 10
    # centers near the camera so triangles straddle the near plane
    centers = eye[None, :] + fwd[None, :] * rng.uniform(0.0, 0.3, (n, 1))
    verts = (
        centers[:, None, :] + rng.uniform(-0.6, 0.6, (n, 3, 3))
    ).reshape(-1, 3).astype(np.float32)
    verts = np.concatenate([verts, np.ones((n * 3, 1), np.float32)], axis=1)
    ok, bbox, oracle = run_both(verts)
    assert int(ok.sum()) == len(oracle_visible_bboxes(oracle))


def test_degenerate_triangles_cover_nothing():
    """Zero-area triangles may remain candidates (the reference keeps them,
    coverage rejects every pixel) but must never produce hit pixels."""
    from rusterix_tpu.ops.raster import Rasterizer
    from rusterix_tpu.models import VGrayGradientShader

    verts = np.array(
        [
            [0, 0, 0, 1], [0, 0, 0, 1], [0, 0, 0, 1],  # point
            [0, 0, 0, 1], [1, 0, 0, 1], [2, 0, 0, 1],  # collinear
        ],
        np.float32,
    )
    tris = np.arange(6).reshape(-1, 3)
    batch = Batch3D.new(verts, tris, np.zeros((6, 2), np.float32))
    batch.set_source(PixelSource.pixel((255, 0, 0, 255)))
    scene = Scene.from_static([], [batch]).set_background(VGrayGradientShader())
    cam = D3OrbitCamera()
    cam.azimuth = 0.7
    cam.set_parameter_f32("distance", 2.0)
    rast = Rasterizer.setup(None, cam.view_matrix(), cam.projection_matrix(W, H))
    frame = rast.rasterize(scene, W, H, 32, Assets.default())
    golden = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(W, H)
    ).rasterize(
        Scene.from_static([], []).set_background(VGrayGradientShader()),
        W, H, 32, Assets.default(),
    )
    assert np.array_equal(frame, golden)


@pytest.mark.parametrize("cull", [CullMode.Back, CullMode.Front])
def test_cull_modes_match_oracle(cull):
    rng = np.random.default_rng(5)
    n = 10
    verts = rng.uniform(-1.0, 1.0, (n * 3, 3)).astype(np.float32)
    verts = np.concatenate([verts, np.ones((n * 3, 1), np.float32)], axis=1)
    ok, bbox, oracle = run_both(verts, cull=cull)
    assert int(ok.sum()) == len(oracle_visible_bboxes(oracle))
