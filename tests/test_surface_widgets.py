"""Surface UV mapping/caps, widgets, blend presets, render mode."""

import numpy as np

from rusterix_tpu.builders import SceneManager, compile_source_map
from rusterix_tpu.client import (
    Client,
    DecoWidget,
    GameWidget,
    MessagesWidget,
    TextWidget,
)
from rusterix_tpu.map import LoopOp, LoopOpKind, Map, ProfileLoop, Surface
from rusterix_tpu.models import (
    Assets,
    MaterialProfileKind,
    PixelSource,
    RenderMode,
    VertexBlendPreset,
)
from rusterix_tpu.utils.rect import Rect


def make_flat_sector():
    m = Map()
    a = m.add_vertex_at(0, 0)
    b = m.add_vertex_at(4, 0)
    c = m.add_vertex_at(4, 4)
    d = m.add_vertex_at(0, 4)
    m.create_linedef(a, b)
    m.create_linedef(b, c)
    m.create_linedef(c, d)
    _, sid = m.create_linedef(d, a)
    return m, sid


def test_surface_basis_and_uv_roundtrip():
    m, sid = make_flat_sector()
    s = Surface(sector_id=sid)
    s.calculate_geometry(m)
    assert s.is_valid()
    # flat floor: normal is +/-y
    assert abs(abs(s.plane.normal[1]) - 1.0) < 1e-5
    p = s.uv_to_world((1.5, -2.0))
    uv = s.world_to_uv(p)
    assert np.allclose(uv, [1.5, -2.0], atol=1e-5)
    w = s.uvw_to_world((0.0, 0.0), 2.0)
    assert np.allclose(w, s.plane.origin + s.frame.normal * 2.0, atol=1e-5)
    tile = s.world_to_tile(s.uv_to_world((1.2, 3.7)))
    assert tile == (1, 3)
    outline = s.tile_outline_world((0, 0))
    assert len(outline) == 4


def test_surface_cap_with_hole():
    m, sid = make_flat_sector()
    s = Surface(sector_id=sid)
    s.calculate_geometry(m)
    s.profile_loops.append(
        ProfileLoop(
            path=[(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)],
            op=LoopOp(LoopOpKind.Nothing),
        )
    )
    batch = s.build_cap_batch(m, PixelSource.pixel((255, 255, 255, 255)))
    assert batch is not None
    # area of triangles = sector area (16) - hole (1)
    v = batch.vertices[:, :3]
    area = 0.0
    for i0, i1, i2 in batch.indices:
        area += 0.5 * np.linalg.norm(np.cross(v[i1] - v[i0], v[i2] - v[i0]))
    assert abs(area - 15.0) < 0.01


def test_widgets_draw():
    buf = np.zeros((64, 96, 4), np.uint8)
    TextWidget(rect=Rect(2, 2, 60, 14), text="Hello").draw(buf)
    assert buf[2:18, 0:70].any()
    DecoWidget(rect=Rect(0, 40, 20, 10), color=(90, 30, 30, 255)).draw(buf)
    assert (buf[45, 5] == [90, 30, 30, 255]).all()
    msgs = MessagesWidget(rect=Rect(30, 30, 60, 30))
    msgs.add("one")
    msgs.add("two")
    msgs.draw(buf)
    assert buf[30:60, 30:90].any()


def test_game_widget_pumps_chunks():
    src = "set_default(\"wall_height\", 2.0)\nwall(8)\nturn_right()\nwall(8)\nturn_right()\nwall(8)\nturn_right()\nwall(8)\n"
    m = compile_source_map(src)
    mgr = SceneManager()
    mgr.set_map(m, Assets.default())
    client = Client()
    gw = GameWidget(rect=Rect(0, 0, 32, 32), scene_manager=mgr, client=client)
    applied = gw.pump_chunks(client.scene)
    assert applied >= 1
    assert client.scene.chunks


def test_blend_presets_and_profiles():
    assert VertexBlendPreset.Top.weights() == (1.0, 1.0, 0.0, 0.0)
    assert VertexBlendPreset.Solid.weights() == (0.0, 0.0, 0.0, 0.0)
    assert VertexBlendPreset.BottomLeft.weights() == (0.0, 0.0, 0.0, 1.0)

    metal_m, metal_r = MaterialProfileKind.Metal.evaluate_target((0.8, 0.5, 0.2))
    assert metal_m > 0.8
    glass_m, glass_r = MaterialProfileKind.Glass.evaluate_target((1, 1, 1))
    assert glass_m == 0.0 and glass_r < 0.02


def test_render_mode():
    assert RenderMode.render_all().supports2d()
    assert not RenderMode.render_2d().supports3d()
    assert not RenderMode.render_3d().supports2d()


def test_d2_preview_builder():
    from rusterix_tpu.builders import D2PreviewBuilder

    m, sid = make_flat_sector()
    m.selected_vertices = [0]
    m.selected_linedefs = [1]
    m.selected_sectors = [sid]
    scene = D2PreviewBuilder().build(m)
    assert scene.background is not None  # grid shader
    kinds = len(scene.d2_static)
    # sector fill + normal lines + selected lines + handles + selected handles
    assert kinds >= 4
