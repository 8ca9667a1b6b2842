"""Shape SDF nodes (Circle/Line/Box), shape graphs and screen-widget baking
(reference shapefx.rs:1277-1385, shapefxgraph.rs:144-218, 385-499)."""

import numpy as np

from rusterix_tpu.shapefx import ShapeFX, ShapeFXGraph, ShapeFXRole
from rusterix_tpu.shapestack import (
    create_screen_widgets,
    evaluate_shape_distance,
    evaluate_screen_widget,
)
from rusterix_tpu.shapestack.context import ShapeContext
from rusterix_tpu.shapestack.nodes import evaluate_distance


def grid(n=32, span=4.0):
    xs = np.linspace(-span, span, n, dtype=np.float32)
    return np.meshgrid(xs, xs)


def test_circle_sdf():
    node = ShapeFX(ShapeFXRole.Circle)
    node.values.set("radius", 1.5)
    px, py = grid()
    d = evaluate_distance(node, px, py, [(0.0, 0.0)])
    assert abs(d[16, 16] - (-1.5)) < 0.2  # center: -radius
    # on the ring: ~0
    ring = np.abs(np.hypot(px, py) - 1.5) < 0.05
    assert np.abs(d[ring]).max() < 0.06


def test_line_sdf_symmetric_and_tapered():
    node = ShapeFX(ShapeFXRole.Line)
    node.values.set("radius", 0.5)
    px, py = grid()
    d = evaluate_distance(node, px, py, [(-2.0, 0.0), (2.0, 0.0)])
    assert d[16, 16] < 0  # on the segment, inside radius
    # 1 unit above the segment: distance 1 - 0.5
    iy = np.argmin(np.abs(px[0] - 0.0))
    ix = np.argmin(np.abs(py[:, 0] - 1.0))
    assert abs(d[ix, iy] - 0.5) < 0.1
    # tapered: radius2 at the end
    node.values.set("radius2", 1.0)
    d2 = evaluate_distance(node, px, py, [(-2.0, 0.0), (2.0, 0.0)])
    start = np.argmin(np.abs(px[0] + 2.0))
    end = np.argmin(np.abs(px[0] - 2.0))
    mid_row = np.argmin(np.abs(py[:, 0]))
    assert d2[mid_row, end] < d2[mid_row, start]  # fatter at the end


def test_box_sdf_oriented():
    node = ShapeFX(ShapeFXRole.Box)
    node.values.set("thickness", 1.0)
    px, py = grid()
    d = evaluate_distance(node, px, py, [(-1.0, -1.0), (1.0, 1.0)])
    assert d[16, 16] < 0  # center inside the diagonal box
    assert d[0, 0] > 0  # far corner outside


def test_shape_graph_min_distance_and_node_choice():
    g = ShapeFXGraph(
        nodes=[
            ShapeFX(ShapeFXRole.Shape),
            ShapeFX(ShapeFXRole.Circle),
            ShapeFX(ShapeFXRole.Circle),
        ],
        connections=[(0, 0, 1, 0), (1, 0, 2, 0)],
    )
    g.nodes[1].values.set("radius", 1.0)
    g.nodes[2].values.set("radius", 0.5)
    px, py = grid()
    # both circles at the same center: node 1 (bigger) always wins the min
    d, node_idx = evaluate_shape_distance(g, px, py, [(0.0, 0.0)])
    assert (node_idx[d < 1e9] == 1).all()
    assert abs(d[16, 16] - (-1.0)) < 0.2


def test_screen_widget_bake_two_states():
    assets_palette = np.array([[0.1, 0.1, 0.1], [1.0, 0.0, 0.0]], np.float32)
    g = ShapeFXGraph(
        nodes=[
            ShapeFX(ShapeFXRole.UIWidget),
            ShapeFX(ShapeFXRole.Color),
            ShapeFX(ShapeFXRole.Color),
        ],
        connections=[(0, 0, 1, 0), (0, 1, 2, 0)],
    )
    g.nodes[1].values.set("color", 0)  # normal: dark
    g.nodes[2].values.set("color", 1)  # selected: red
    normal, selected = create_screen_widgets(g, 16, 16, assets_palette)
    assert normal.shape == (16, 16, 4) and selected.shape == (16, 16, 4)
    assert selected[8, 8, 0] > 200 and normal[8, 8, 0] < 50
    assert not np.array_equal(normal, selected)


def test_screen_widget_requires_widget_root():
    g = ShapeFXGraph(nodes=[ShapeFX(ShapeFXRole.Color)])
    ctx = ShapeContext(
        uv=np.zeros((4, 4, 2), np.float32),
        distance=np.zeros((4, 4), np.float32),
        px=1.0,
    )
    col, mask = evaluate_screen_widget(g, ctx, (0, 0, 0, 1), 0, None)
    assert col is None and mask is None
