"""Extended Draw2D primitive coverage (reference src/client/draw2d.rs:42-1395
~40 primitives), brush preview miss-pass highlight (rasterizer.rs:434-457)
and the full GGX BRDF (rasterizer.rs:1954-2009)."""

import numpy as np

from rusterix_tpu.client.draw2d import Draw2D


def _buf(w=96, h=64):
    b = np.zeros((h, w, 4), np.uint8)
    b[..., 3] = 255
    return b


def test_rounded_rect_fills_and_borders():
    d = Draw2D()
    buf = _buf()
    d.rounded_rect_with_border(
        buf, 4, 4, 40, 30, (200, 60, 60, 255), (8, 8, 8, 8),
        (255, 255, 255, 255), 2.0,
    )
    assert tuple(buf[19, 24][:3]) == (200, 60, 60)  # center fill
    assert buf[5, 5, 0] < 100  # rounded corner stays background
    assert buf[19, 4].astype(int)[:3].sum() > 600  # white border on the edge


def test_circle_hexagon_rhombus():
    d = Draw2D()
    buf = _buf()
    d.circle_with_border(buf, 2, 2, 30, 30, (0, 200, 0, 255), 12.0,
                         (0, 0, 255, 255), 2.0)
    assert tuple(buf[17, 17][:3]) == (0, 200, 0)
    d.hexagon_with_border(buf, 40, 2, 24, 24, (0, 0, 200, 255),
                          (255, 255, 0, 255), 1.5)
    assert buf[14, 52, 2] > 150
    d.rhombus_with_border(buf, 66, 2, 24, 24, (200, 200, 0, 255),
                          (255, 0, 255, 255), 1.5)
    assert buf[14, 78, 0] > 150 and buf[14, 78, 1] > 150
    # rhombus corners (outside the diamond) keep the background
    assert buf[3, 67, 0] == 0


def test_square_pattern_and_blend_mask():
    d = Draw2D()
    buf = _buf()
    d.square_pattern(buf, 0, 0, 24, 24, (10, 10, 10, 255), (90, 90, 90, 255), 6)
    assert tuple(buf[0, 0][:3]) == (90, 90, 90)
    assert tuple(buf[3, 3][:3]) == (10, 10, 10)
    mask = np.zeros((8, 8), np.uint8)
    mask[2:6, 2:6] = 255
    d.blend_mask(buf, 40, 40, mask, (255, 0, 0, 255))
    assert tuple(buf[43, 43][:3]) == (255, 0, 0)
    assert tuple(buf[40, 40][:3]) == (0, 0, 0)


def test_blend_scale_chunk_variants():
    d = Draw2D()
    buf = _buf()
    src = np.zeros((4, 4, 4), np.uint8)
    src[..., 0] = 255
    src[..., 3] = 255
    d.blend_scale_chunk(buf, src, 0, 0, 16, 16)
    assert buf[8, 8, 0] == 255
    d.blend_scale_chunk_alpha(buf, src, 32, 0, 16, 16, 0.5)
    assert 100 < buf[8, 40, 0] < 160
    d.blend_scale_chunk_linear(buf, src, 0, 32, 16, 16)
    assert buf[40, 8, 0] == 255


def test_text_rect_truncates_and_aligns():
    d = Draw2D()
    buf = _buf()
    d.text_rect(buf, (0, 0, 96, 20), "a very long overflowing string here",
                (255, 255, 255, 255), 10)
    assert (buf[:20, :, 0] > 128).any()
    layout_xs, (w, h) = d.get_text_layout("abc", 10)
    assert len(layout_xs) == 3 and layout_xs[0] == 0 and w > 0


def test_brush_preview_highlights_miss_pixels():
    import jax

    from rusterix_tpu import Assets, D3OrbitCamera, Scene
    from rusterix_tpu.ops.raster import BrushPreview, Rasterizer

    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 3.0)
    r = Rasterizer.setup(None, cam.view_matrix(), cam.projection_matrix(96, 64))
    r.background((10, 10, 10, 255))
    f0 = r.rasterize(Scene.empty(), 96, 64, 32, Assets.default())
    r.brush_preview = BrushPreview(
        position=np.array([0, 0, 0], np.float32), radius=2.0, falloff=0.5
    )
    f1 = r.rasterize(Scene.empty(), 96, 64, 32, Assets.default())
    changed = (f0 != f1).any(axis=-1)
    assert changed.any() and not changed.all()
    # highlighted pixels are brighter than background
    assert f1[changed][:, :3].min() > 10


def test_ggx_brdf_properties():
    import jax.numpy as jnp

    from rusterix_tpu.ops.shade import shade_brdf_ggx

    base = jnp.array([[[0.5, 0.5, 0.5]]])
    n = jnp.array([[[0.0, 1.0, 0.0]]])
    v = jnp.array([[[0.0, 1.0, 0.0]]])
    l_up = jnp.array([[[0.0, 1.0, 0.0]]])
    l_down = jnp.array([[[0.0, -1.0, 0.0]]])
    rough = jnp.array([[0.5]])
    metal0 = jnp.array([[0.0]])
    emis = jnp.zeros((1, 1, 3))
    rad = jnp.ones((1, 1, 3))

    lit = np.asarray(shade_brdf_ggx(base, rough, metal0, emis, n, v, l_up, rad))
    assert (lit > 0.0).all()
    # light from below contributes nothing but emissive
    dark = np.asarray(shade_brdf_ggx(base, rough, metal0, emis, n, v, l_down, rad))
    assert (dark == 0.0).all()
    # rougher surface -> dimmer specular peak at normal incidence
    lit_rough = np.asarray(
        shade_brdf_ggx(base, jnp.array([[1.0]]), metal0, emis, n, v, l_up, rad)
    )
    assert lit_rough[0, 0, 0] < lit[0, 0, 0]
    # full metal kills diffuse: off-specular direction goes dark
    l_side = jnp.array([[[0.7071, 0.7071, 0.0]]])
    d_metal = np.asarray(
        shade_brdf_ggx(base, rough, jnp.array([[1.0]]), emis, n, v, l_side, rad)
    )
    d_diel = np.asarray(
        shade_brdf_ggx(base, rough, metal0, emis, n, v, l_side, rad)
    )
    assert d_metal[0, 0, 1] < d_diel[0, 0, 1]
