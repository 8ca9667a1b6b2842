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
