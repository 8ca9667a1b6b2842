"""Map clipboard/extraction ops + ClientAction input scripting
(reference map/mod.rs:1527-1850, client/action.rs)."""

import numpy as np

from rusterix_tpu.client import ClientAction
from rusterix_tpu.map import Map
from rusterix_tpu.models import Assets
from rusterix_tpu.server.message import EntityAction, EntityActionKind
from rusterix_tpu.utils.rect import Rect


def square(m, x0, y0, x1, y1):
    a = m.add_vertex_at(x0, y0)
    b = m.add_vertex_at(x1, y0)
    c = m.add_vertex_at(x1, y1)
    d = m.add_vertex_at(x0, y1)
    m.create_linedef(a, b)
    m.create_linedef(b, c)
    m.create_linedef(c, d)
    _, sid = m.create_linedef(d, a)
    return sid


def test_copy_selected_normalizes_and_remaps():
    m = Map()
    sid = square(m, 10, 10, 14, 14)
    m.selected_sectors = [sid]
    clip = m.copy_selected()
    assert len(clip.vertices) == 4 and len(clip.linedefs) == 4
    assert len(clip.sectors) == 1
    # normalized to origin
    xs = [v.x for v in clip.vertices]
    ys = [v.y for v in clip.vertices]
    assert min(xs) == 0.0 and min(ys) == 0.0
    # the source is untouched (copy, not cut)
    assert len(m.sectors) == 1


def test_cut_removes_source():
    m = Map()
    sid = square(m, 0, 0, 4, 4)
    m.selected_sectors = [sid]
    clip = m.copy_selected(cut=True)
    assert len(clip.sectors) == 1
    assert len(m.sectors) == 0
    assert m.selected_sectors == []


def test_paste_at_position_translates_and_selects():
    m = Map()
    sid = square(m, 0, 0, 4, 4)
    m.selected_sectors = [sid]
    clip = m.copy_selected()
    m2 = Map()
    m2.paste_at_position(clip, (20.0, 30.0))
    assert len(m2.sectors) == 1
    xs = [v.x for v in m2.vertices]
    ys = [v.y for v in m2.vertices]
    assert min(xs) == 20.0 and min(ys) == 30.0
    assert m2.selected_sectors and m2.selected_linedefs and m2.selected_vertices
    # sector back-links restored on linedefs
    s = m2.sectors[0]
    for lid in s.linedefs:
        assert s.id in m2.find_linedef(lid).sector_ids


def test_extract_chunk_geometry():
    m = Map()
    square(m, 0, 0, 4, 4)
    square(m, 100, 100, 104, 104)  # far away
    sub = m.extract_chunk_geometry(Rect(-1, -1, 10, 10))
    assert len(sub.sectors) == 1
    assert len(sub.linedefs) == 4
    assert all(v.x < 10 for v in sub.vertices)
    # crossing linedef picked up even with both endpoints outside
    m3 = Map()
    a = m3.add_vertex_at(-5, 2)
    b = m3.add_vertex_at(15, 2)
    m3.create_linedef(a, b)
    sub3 = m3.extract_chunk_geometry(Rect(0, 0, 10, 10))
    assert len(sub3.linedefs) == 1


def test_geometry_clone_strips_entities():
    m = Map()
    square(m, 0, 0, 2, 2)
    m.entities.append(object())
    g = m.geometry_clone()
    assert len(g.sectors) == 1 and len(g.entities) == 0
    # deep copy: edits don't leak back
    g.vertices[0].x = 99.0
    assert m.vertices[0].x != 99.0


def test_client_action_routes_input():
    assets = Assets.default()
    assets.entities["Player"] = (
        """
        fn user_event(event, value) {
            if event == "key_down" {
                if value == "w" { action("forward"); }
                if value == "a" { action("left"); }
                if value == "t" { intent("talk"); }
            }
        }
        """,
        "",
    )
    ca = ClientAction()
    ca.init("Player", assets)
    assert ca.user_event("key_down", "w").kind == EntityActionKind.Forward
    assert ca.user_event("key_down", "a").kind == EntityActionKind.Left
    t = ca.user_event("key_down", "t")
    assert t.kind == EntityActionKind.Intent and t.string == "talk"
    assert ca.user_event("key_down", "x").kind == EntityActionKind.Off
    assert ca.user_event("key_up", "w").kind == EntityActionKind.Off


def test_entity_action_from_str_round_trip():
    for name in ("none", "left", "forward", "right", "backward"):
        a = EntityAction.from_str(name)
        assert a is not None and a.display() == name
    assert EntityAction.from_str("bogus") is None


def test_reference_editor_helper_surface():
    """Selection ops, free-id allocation, 3D vertices, duplication,
    surface/sector lookups (map/mod.rs:203-1160)."""
    from rusterix_tpu.map import Map
    from rusterix_tpu.utils.rect import Rect

    m = Map()
    assert m.is_empty() and not m.has_selection()
    a = m.add_vertex_at(0, 0)
    b = m.add_vertex_at(2, 0)
    c = m.add_vertex_at(2, 2)
    d = m.add_vertex_at(0, 2)
    for p, q in ((a, b), (b, c), (c, d), (d, a)):
        m.create_linedef(p, q)
    assert not m.is_empty()
    assert "4 vertices" in m.info()
    assert m.find_free_vertex_id() == 4 and m.find_free_sector_id() == 1

    m.add_to_selection(vertices=[a, b], sectors=[0])
    m.add_to_selection(vertices=[a])  # no dup
    assert m.selected_vertices == [a, b] and m.has_selection()
    m.remove_from_selection(vertices=[a])
    assert m.selected_vertices == [b]

    assert m.is_vertex_in_rect(a, Rect(-1, -1, 3, 3))
    assert not m.is_vertex_in_rect(c, Rect(-1, -1, 1, 1))
    assert m.is_linedef_in_rect(m.linedefs[0].id, Rect(-1, -1, 4, 4))
    assert m.is_linedef_in_closed_polygon(m.linedefs[0].id)
    assert [s.id for s in m.sorted_sectors_by_area()] == [0]
    assert m.find_sectors_with_vertex_indices([a, b, c, d]) == [0]
    assert m.find_sector_at(1.0, 1.0) is not None

    dup = m.duplicate_vertex(a)
    assert dup is not None and dup != a
    v3 = m.add_vertex_at_3d(5.0, 5.0, 1.25)
    np.testing.assert_allclose(m.get_vertex_3d(v3), [5.0, 1.25, 5.0])
    assert m.add_vertex_at_3d(5.0, 5.0, 1.25) == v3  # reuse
    m.update_vertex(b, (9.0, 9.0))
    assert m.get_vertex(b).x == 9.0
    m.replace_vertex_in_sector(0, b, dup)
    assert all(
        b not in (m.find_linedef(lid).start_vertex, m.find_linedef(lid).end_vertex)
        for lid in m.find_sector(0).linedefs
    )


def test_client_and_facade_reference_surface():
    """Thin reference-API wrappers: Client touch/camera/time helpers and
    the Rusterix facade delegations (client/mod.rs, rusterix.rs)."""
    import numpy as np

    import pytest

    from rusterix_tpu.client import Client
    from rusterix_tpu.models import Texture
    from rusterix_tpu.rusterix import DrawMode, Rusterix

    c = Client()
    af = c.scene.animation_frame
    c.inc_animation_frame()
    assert c.scene.animation_frame == af + 1
    c.set_server_time(15 * 60.0)
    assert c.hour == 15.0
    assert c.is_inside_game((10, 10)) and not c.is_inside_game((-1, 5))
    c.touch_hover((3, 4))
    assert c.cursor_pos == (3, 4) and c.hovered_entity_id is None
    c.touch_up()
    # aspect upscale letterboxes on the 30,30,30 background
    c.config.upscale = "aspect"
    target = np.zeros((100, 200, 4), np.uint8)
    frame = np.full((50, 50, 4), 255, np.uint8)
    c.insert_game_buffer(target, frame)
    assert tuple(target[0, 0, :3]) == (30, 30, 30)  # letterbox band
    assert target[50, 100, 0] == 255  # centered content

    rx = Rusterix()
    rx.set_d2()
    assert rx.draw_mode == DrawMode.D2
    rx.set_d3()
    assert rx.draw_mode == DrawMode.D3
    rx.client_touch_hover((1, 2))
    assert rx.client.cursor_pos == (1, 2)

    # texture material channel setters (texture.rs:714-800)
    t = Texture.checkerboard(4, 2)
    t.set_default_materials()
    assert t.get_materials(0, 0)[0] == pytest.approx(0.5, abs=0.05)
    t.set_roughness(1, 1, 1.0)
    r, mtl, o, e = t.get_materials(1, 1)
    assert r == 1.0 and o == pytest.approx(1.0, abs=0.05)
    t.set_metallic(1, 1, 0.5)
    assert t.get_materials(1, 1)[0] == 1.0  # preserved


def test_sector_wall_geometry_2d():
    """2D wall rings (sector.rs:337-580): miter-offset outer/inner loops
    and per-linedef quads keyed by wall_width."""
    from rusterix_tpu.map import Map

    m = Map()
    ids = [m.add_vertex_at(*p) for p in ((0, 0), (4, 0), (4, 4), (0, 4))]
    for i in range(4):
        m.create_linedef(ids[i], ids[(i + 1) % 4])
    s = m.sectors[0]

    verts, tris = s.generate_wall_geometry(m, 0.5)
    assert len(verts) == 8 and len(tris) == 8
    half = np.asarray(verts, np.float32)
    ring_a, ring_b = half[:4], half[4:]
    # the two rings sit 0.25 on either side of the unit-square edges
    spans = sorted([ring_a.min(), ring_b.min()])
    assert abs(spans[0] + 0.25) < 1e-5 and abs(spans[1] - 0.25) < 1e-5

    # no widths -> None; with widths, one quad per linedef
    assert s.generate_wall_geometry_by_linedef(m) is None
    for l in m.linedefs:
        l.properties.set("wall_width", 0.4)
    per = s.generate_wall_geometry_by_linedef(m)
    assert set(per.keys()) == {l.id for l in m.linedefs}
    quad, inds = per[m.linedefs[0].id]
    assert len(quad) == 4 and inds == [(0, 1, 3), (1, 2, 3)]
