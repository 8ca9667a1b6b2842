"""ShapeFX render graph: sky/fog nodes through the device pipeline."""

import numpy as np

from rusterix_tpu import (
    Assets,
    Batch3D,
    D3FirstPCamera,
    PixelSource,
    Scene,
)
from rusterix_tpu.ops.raster import Rasterizer
from rusterix_tpu.shapefx import ShapeFX, ShapeFXGraph, ShapeFXRole
from rusterix_tpu.shapefx.render import sky_setup


def test_graph_collect_nodes():
    g = ShapeFXGraph.default_render_graph(with_sky=True, with_fog=True)
    assert g.nodes[0].role == ShapeFXRole.Render
    miss = g.collect_nodes_from(0, 1)
    hit = g.collect_nodes_from(0, 0)
    assert [g.nodes[i].role for i in miss] == [ShapeFXRole.Sky]
    assert [g.nodes[i].role for i in hit] == [ShapeFXRole.Fog]


def test_sky_setup_sun_arc():
    node = ShapeFX(ShapeFXRole.Sky)
    sun_noon, df_noon = sky_setup(node, 13.0)
    assert df_noon == 1.0
    assert sun_noon[1] > 0.9  # overhead at midday
    sun_dawn, df_dawn = sky_setup(node, 6.0)
    assert df_dawn == 0.0
    assert abs(sun_dawn[1]) < 1e-5  # on the horizon
    _, df_night = sky_setup(node, 23.0)
    assert df_night == 0.0


def _render(graph, hour):
    scene = Scene.from_static(
        [],
        [
            Batch3D.from_box(-2, -0.5, 2, 4, 1, 1)
            .set_source(PixelSource.pixel((200, 200, 200, 255)))
            .with_computed_normals()
        ],
    )
    cam = D3FirstPCamera()
    cam.set_parameter_vec3("position", [0, 0.5, 8.0])
    cam.set_parameter_vec3("center", [0, 0.5, 0.0])
    rast = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(96, 72)
    )
    rast.render_graph = graph
    rast.hour = hour
    return rast.rasterize(scene, 96, 72, 32, Assets.default()), rast


def test_sky_miss_renders_day_vs_night():
    g = ShapeFXGraph.default_render_graph(with_sky=True)
    day, rast_day = _render(g, 13.0)
    assert rast_day.sun_dir is not None and rast_day.day_factor == 1.0
    assert rast_day.ambient_color is not None  # sky sets ambient
    night, _ = _render(g, 2.0)
    # day sky is much brighter than night sky (top rows = pure sky)
    assert day[:10].astype(int).mean() > night[:10].astype(int).mean() + 30
    # day sky: zenith blue-ish (b > r at top)
    top = day[:5].astype(int)
    assert top[..., 2].mean() > top[..., 0].mean()


def test_fog_fades_distant_geometry():
    g = ShapeFXGraph.default_render_graph(with_fog=True)
    fog_node = g.nodes[1]
    fog_node.values.set("fog_color", (0.5, 0.5, 0.5, 1.0))
    fog_node.values.set("fog_end_distance", 2.0)
    fog_node.values.set("fog_fade_out", 4.0)
    foggy, _ = _render(g, 13.0)
    clear, _ = _render(ShapeFXGraph.default_render_graph(), 13.0)
    # box front face ~5 units away -> t = (5-2)/4 = 0.75 toward 0.5 gray;
    # the unlit box shades to black, so expect ~0.75*128 = 96
    cy, cx = 36, 48
    assert abs(int(foggy[cy, cx, 0]) - 96) <= 4
    assert int(foggy[cy, cx, 0]) > int(clear[cy, cx, 0])


def test_material_and_light_nodes_compile():
    from rusterix_tpu.models.batch import MaterialRole

    m = ShapeFX(ShapeFXRole.Material)
    m.values.set("role", 2)
    m.values.set("value", 0.7)
    mat = m.compile_material()
    assert mat.role == MaterialRole.Metallic
    assert abs(mat.value - 0.7) < 1e-6

    l = ShapeFX(ShapeFXRole.PointLight)
    l.values.set("intensity", 2.0)
    light = l.compile_light()
    assert light.intensity == 2.0


def test_sky_palette_edit_invalidates_device_cache():
    """Regression: the sky's device params are cached across frames; the key
    must track the precomputed CONTENT, not just (node, hour) — sky_setup
    reads node.values, so a palette edit at a fixed hour changes the sky."""
    g = ShapeFXGraph.default_render_graph(with_sky=True)
    sky_node = next(n for n in g.nodes if n.role == ShapeFXRole.Sky)
    before, rast = _render(g, 13.0)

    sky_node.values.set("day_zenith", (0.9, 0.05, 0.05, 1.0))
    scene = Scene.from_static([], [])
    after = rast.rasterize(scene, 96, 72, 32, Assets.default())
    top = after[:5].astype(int)
    assert top[..., 0].mean() > top[..., 2].mean() + 40  # red now dominates
    assert not np.array_equal(after[:5], before[:5])
