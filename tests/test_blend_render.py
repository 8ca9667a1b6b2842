"""Vertex-blend rendering: per-pixel mix toward source2 by the
perspective-correct interpolated per-vertex weight (extra b/w attribute
plane in the setup pass; reference scenevm add_poly_3d_blended)."""

import numpy as np

from rusterix_tpu import Assets, Batch3D, PixelSource, Scene
from rusterix_tpu.models import D3OrbitCamera
from rusterix_tpu.ops.raster import Rasterizer

W, H = 128, 96


def quad_batch(weights):
    verts = np.array(
        [
            [-1, -1, 0, 1],
            [1, -1, 0, 1],
            [1, 1, 0, 1],
            [-1, 1, 0, 1],
        ],
        np.float32,
    )
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    b = Batch3D.new(verts, tris, uvs)
    b.source = PixelSource.pixel((255, 0, 0, 255))
    b.source2 = PixelSource.pixel((0, 255, 0, 255))
    b.blend_weights = np.asarray(weights, np.float32)
    return b


def render(batch):
    scene = Scene.from_static([], [batch])
    cam = D3OrbitCamera()
    cam.azimuth = 0.7  # off-axis: at 0 the eye lies in the quad's plane
    cam.set_parameter_f32("distance", 2.5)
    rast = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(W, H)
    ).ambient((1.0, 1.0, 1.0, 1.0))
    return rast.rasterize(scene, W, H, 32, Assets.default())


def test_full_secondary_weight():
    frame = render(quad_batch([1.0, 1.0, 1.0, 1.0]))
    c = frame[H // 2, W // 2]
    assert c[1] > 150 and c[0] < 60, c  # green (ambient-lit)


def test_zero_weight_keeps_base():
    frame = render(quad_batch([0.0, 0.0, 0.0, 0.0]))
    c = frame[H // 2, W // 2]
    assert c[0] > 150 and c[1] < 60, c  # red (ambient-lit)


def test_gradient_weight_interpolates():
    # weight 0 on the bottom edge, 1 on the top edge -> vertical gradient
    frame = render(quad_batch([0.0, 0.0, 1.0, 1.0]))
    mid = frame[H // 2, W // 2].astype(int)
    # quad center: ~50/50 mix of red and green
    assert abs(int(mid[0]) - int(mid[1])) < 40, mid
    assert mid[0] > 50 and mid[1] > 50, mid
    # sample rows inside the quad: red fades, green rises downward in screen
    ys = np.linspace(H * 0.25, H * 0.75, 5).astype(int)
    greens = [int(frame[y, W // 2, 1]) for y in ys]
    assert greens == sorted(greens, reverse=True) or greens == sorted(greens), greens
    assert max(greens) - min(greens) > 60, greens


def test_unblended_batches_unaffected():
    b = quad_batch([1.0, 1.0, 1.0, 1.0])
    b.source2 = None
    b.blend_weights = None
    frame = render(b)
    c = frame[H // 2, W // 2]
    assert c[0] > 150 and c[1] < 60, c
