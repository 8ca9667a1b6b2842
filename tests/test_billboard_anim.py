"""Door/gate billboard animation (reference scene_handler.rs:580-731):
item-visibility-driven open/close transitions, slide + fade poses,
state restarts mid-animation, stale-state pruning."""

import numpy as np

from rusterix_tpu.builders import D3Builder
from rusterix_tpu.client import (
    BillboardAnimState,
    Client,
    animate_billboards,
    find_item_by_profile_attrs,
)
from rusterix_tpu.map import BillboardAnimation, LoopOp, LoopOpKind, Map, ProfileLoop, Surface
from rusterix_tpu.models import Assets, PixelSource, Scene
from rusterix_tpu.server.item import Item

FPS = 30.0
DUR = 0.35


def door_world(animation=BillboardAnimation.OpenUp):
    m = Map()
    a = m.add_vertex_at(0, 0)
    b = m.add_vertex_at(4, 0)
    c = m.add_vertex_at(4, 4)
    d = m.add_vertex_at(0, 4)
    for v in m.vertices:
        v.z = 1.0
    m.create_linedef(a, b)
    m.create_linedef(b, c)
    m.create_linedef(c, d)
    _, sid = m.create_linedef(d, a)
    s = Surface(sector_id=sid)
    s.calculate_geometry(m)
    s.profile_loops.append(
        ProfileLoop(
            path=[(-1.0, -0.5), (1.0, -0.5), (1.0, 0.5), (-1.0, 0.5)],
            op=LoopOp(LoopOpKind.Billboard, depth=0.05, animation=animation),
        )
    )
    m.surfaces[s.id] = s
    sector = m.find_sector(sid)
    sector.properties.set("source", PixelSource.pixel((180, 180, 180, 255)))

    item = Item()
    item.attributes.set("host_sector", sid)
    item.attributes.set("visible", True)
    m.items.append(item)

    scene = Scene()
    D3Builder().build(m, Assets.default(), scene)
    return m, scene, item, sid


def test_anim_state_progression_and_restart():
    st = BillboardAnimState(0.0, 1.0, 0)
    dur_frames = DUR * FPS
    assert st.open_amount(0, FPS, DUR) == 0.0
    mid = st.open_amount(int(dur_frames / 2), FPS, DUR)
    assert 0.3 < mid < 0.7
    assert st.open_amount(int(dur_frames) + 2, FPS, DUR) == 1.0
    # restart from current pose toward closed
    st2 = BillboardAnimState(mid, 0.0, int(dur_frames / 2))
    assert abs(st2.open_amount(int(dur_frames / 2), FPS, DUR) - mid) < 1e-6
    assert st2.open_amount(int(dur_frames * 2), FPS, DUR) == 0.0


def test_find_item_by_profile_attrs():
    m, scene, item, sid = door_world()
    assert find_item_by_profile_attrs(m, sid, None) is item
    assert find_item_by_profile_attrs(m, sid + 99, None) is None


def test_closed_door_draws_at_rest():
    m, scene, item, sid = door_world()
    states = {}
    opaque, transparent = animate_billboards(
        scene, m, Assets.default(), states, 1, 0, FPS, FPS
    )
    assert len(opaque) == 1 and not transparent
    bb = next(iter(scene.chunks.values())).billboards[0]
    quad_center = opaque[0].vertices[:, :3].mean(axis=0)
    assert np.allclose(quad_center, bb.center, atol=1e-4)


def test_open_slides_then_vanishes():
    m, scene, item, sid = door_world()
    states = {}
    animate_billboards(scene, m, Assets.default(), states, 1, 0, FPS, FPS)
    item.attributes.set("visible", False)
    # the transition latches on the first frame that observes the change
    animate_billboards(scene, m, Assets.default(), states, 2, 0, FPS, FPS)

    # mid-animation: door slid partway along bb.right
    mid_frame = 2 + int(DUR * FPS / 2)
    opaque, _ = animate_billboards(
        scene, m, Assets.default(), states, mid_frame, 0, FPS, FPS
    )
    assert len(opaque) == 1
    bb = next(iter(scene.chunks.values())).billboards[0]
    center_now = opaque[0].vertices[:, :3].mean(axis=0)
    slide = np.dot(center_now - bb.center, bb.right)
    assert 0.2 * bb.size < slide < 0.8 * bb.size

    # fully open: nothing drawn
    end_frame = 2 + int(DUR * FPS) + 5
    opaque, transparent = animate_billboards(
        scene, m, Assets.default(), states, end_frame, 0, FPS, FPS
    )
    assert not opaque and not transparent

    # closing again restarts from the open pose back to rest
    item.attributes.set("visible", True)
    animate_billboards(scene, m, Assets.default(), states, end_frame + 1, 0, FPS, FPS)
    opaque, _ = animate_billboards(
        scene, m, Assets.default(), states, end_frame + 1 + int(DUR * FPS) + 5, 0, FPS, FPS
    )
    assert len(opaque) == 1
    center_back = opaque[0].vertices[:, :3].mean(axis=0)
    assert np.allclose(center_back, bb.center, atol=1e-4)


def test_fade_routes_to_transparent_with_opacity():
    m, scene, item, sid = door_world(BillboardAnimation.Fade)
    states = {}
    animate_billboards(scene, m, Assets.default(), states, 1, 0, FPS, FPS)
    item.attributes.set("visible", False)
    animate_billboards(scene, m, Assets.default(), states, 2, 0, FPS, FPS)
    mid_frame = 2 + int(DUR * FPS / 2)
    opaque, transparent = animate_billboards(
        scene, m, Assets.default(), states, mid_frame, 0, FPS, FPS
    )
    assert not opaque and len(transparent) == 1
    assert 0.2 < transparent[0].opacity < 0.8


def test_item_animation_override_and_game_clock():
    m, scene, item, sid = door_world(BillboardAnimation.OpenUp)
    item.attributes.set("billboard_animation", 2)  # OpenRight
    item.attributes.set("animation_clock", "tick")
    item.attributes.set("animation_duration", 1.0)
    states = {}
    animate_billboards(scene, m, Assets.default(), states, 0, 0, FPS, FPS)
    item.attributes.set("visible", False)
    animate_billboards(scene, m, Assets.default(), states, 0, 0, FPS, FPS)
    opaque, _ = animate_billboards(
        scene, m, Assets.default(), states, 0, int(FPS / 2), FPS, FPS
    )
    assert len(opaque) == 1
    bb = next(iter(scene.chunks.values())).billboards[0]
    center_now = opaque[0].vertices[:, :3].mean(axis=0)
    # OpenRight slides along bb.up (scene_handler.rs:697-699)
    slide_up = np.dot(center_now - bb.center, bb.up)
    assert 0.2 * bb.size < slide_up < 0.8 * bb.size


def test_stale_states_pruned():
    m, scene, item, sid = door_world()
    states = {("ghost", None): BillboardAnimState(0.0, 1.0, 0)}
    animate_billboards(scene, m, Assets.default(), states, 1, 0, FPS, FPS)
    assert ("ghost", None) not in states
    assert (sid, None) in states


def test_client_integration_renders_door():
    m, scene, item, sid = door_world()
    client = Client()
    client.set_map(m, Assets.default())
    client.build_entities_items_d3(m, Assets.default())
    assert len(client.scene.d3_dynamic) == 1
    item.attributes.set("visible", False)
    for _ in range(int(DUR * FPS) + 5):
        client.build_entities_items_d3(m, Assets.default())
    assert len(client.scene.d3_dynamic) == 0
