"""Supersampled antialiasing (Rasterizer.set_supersample): renders at n x
the requested resolution and box-filters down on device. Beyond-reference
feature (the reference has no AA path); the projection matrices are
aspect-only so they hold at the internal resolution, and 2D screen-space
geometry scales through the proj2d affine rows.
"""

import numpy as np

from rusterix_tpu import (
    Assets,
    Batch2D,
    Batch3D,
    CullMode,
    D3OrbitCamera,
    PixelSource,
    Scene,
)
from rusterix_tpu.ops.raster import Rasterizer

W, H = 96, 64


def _scene():
    return Scene.from_static(
        [
            Batch2D.from_rectangle(4.0, 4.0, 20.0, 20.0).set_source(
                PixelSource.pixel((0, 255, 0, 255))
            )
        ],
        [
            Batch3D.from_box(-0.6, -0.6, -0.6, 1.2, 1.2, 1.2)
            .set_cull_mode(CullMode.Off)
            .set_source(PixelSource.pixel((255, 255, 255, 255)))
            .with_computed_normals()
        ],
    )


def _rast(ss):
    cam = D3OrbitCamera()
    cam.azimuth = 0.7
    cam.set_parameter_f32("distance", 2.4)
    r = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(W, H)
    ).ambient([0.6, 0.6, 0.6, 1.0])
    return r.set_supersample(ss)


def test_ssaa_identity_at_one():
    a = _rast(1).rasterize(_scene(), W, H, 32, Assets.default())
    b = _rast(1).rasterize(_scene(), W, H, 32, Assets.default())
    assert a.shape == (H, W, 4)
    np.testing.assert_array_equal(a, b)


def test_ssaa_output_shape_and_smoother_silhouette():
    base = _rast(1).rasterize(_scene(), W, H, 32, Assets.default())
    ssaa = _rast(2).rasterize(_scene(), W, H, 32, Assets.default())
    assert ssaa.shape == base.shape

    # the cube silhouette against the background gains intermediate
    # coverage values: strictly more alpha values off the {0, 255} extremes
    def partial_px(f):
        a = f[..., 3].astype(int)
        return int(((a > 0) & (a < 255)).sum())

    assert partial_px(base) == 0  # hard-edged opaque render
    assert partial_px(ssaa) > 20  # box-filtered edge coverage

    # interior content agrees (downsample of a flat region is the region)
    cy, cx = H // 2, W // 2
    assert np.abs(base[cy, cx].astype(int) - ssaa[cy, cx].astype(int)).max() <= 8


def test_ssaa_2d_geometry_stays_in_output_coordinates():
    """The green 2D rect must cover the SAME output pixels at every ss."""
    base = _rast(1).rasterize(_scene(), W, H, 32, Assets.default())
    ssaa = _rast(2).rasterize(_scene(), W, H, 32, Assets.default())

    def green_box(f):
        # d2 lighting modulates the pure green down (~153 under 0.6 ambient)
        g = (f[..., 1].astype(int) > 120) & (f[..., 0].astype(int) < 100)
        ys, xs = np.where(g)
        return ys.min(), ys.max(), xs.min(), xs.max()

    gb, gs = green_box(base), green_box(ssaa)
    assert all(abs(a - b) <= 1 for a, b in zip(gb, gs)), (gb, gs)


def test_ssaa_device_resident_path():
    f = _rast(2).rasterize(
        _scene(), W, H, 32, Assets.default(), readback=False
    )
    assert f.shape == (H, W, 4)
