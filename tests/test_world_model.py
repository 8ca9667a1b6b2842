"""World model tests: map editing, earcut, mapscript DSL, builders, mini."""

import numpy as np

from rusterix_tpu.builders import D3Builder, MapScript, SceneManager, compile_source_map
from rusterix_tpu.map import Map, MapMini, Terrain, earcut, polygon_area, triangulate_polygon
from rusterix_tpu.map.elements import CompiledLinedef
from rusterix_tpu.models import Assets, Scene, Texture, Tile


def test_earcut_square():
    idx = earcut([0, 0, 10, 0, 10, 10, 0, 10])
    assert len(idx) == 6  # 2 triangles
    # total area preserved
    pts = [(0, 0), (10, 0), (10, 10), (0, 10)]
    area = 0.0
    for i in range(0, len(idx), 3):
        a, b, c = pts[idx[i]], pts[idx[i + 1]], pts[idx[i + 2]]
        area += abs(
            (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        ) / 2
    assert abs(area - 100.0) < 1e-6


def test_earcut_concave():
    # L-shape
    pts = [(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)]
    flat = [c for p in pts for c in p]
    idx = earcut(flat)
    assert len(idx) == 12  # 4 triangles
    area = 0.0
    for i in range(0, len(idx), 3):
        a, b, c = pts[idx[i]], pts[idx[i + 1]], pts[idx[i + 2]]
        area += abs((b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])) / 2
    assert abs(area - 12.0) < 1e-6


def test_earcut_with_hole():
    outer = [(0, 0), (10, 0), (10, 10), (0, 10)]
    hole = [(4, 4), (6, 4), (6, 6), (4, 6)]
    pts, tris = triangulate_polygon(outer, [hole])
    area = 0.0
    for a, b, c in tris:
        pa, pb, pc = pts[a], pts[b], pts[c]
        area += abs(
            (pb[0] - pa[0]) * (pc[1] - pa[1]) - (pb[1] - pa[1]) * (pc[0] - pa[0])
        ) / 2
    assert abs(area - 96.0) < 1e-5  # 100 - 4


def test_map_polygon_autoclose():
    m = Map()
    a = m.add_vertex_at(0, 0)
    b = m.add_vertex_at(10, 0)
    c = m.add_vertex_at(10, 10)
    d = m.add_vertex_at(0, 10)
    _, s1 = m.create_linedef(a, b)
    _, s2 = m.create_linedef(b, c)
    _, s3 = m.create_linedef(c, d)
    _, s4 = m.create_linedef(d, a)
    assert s1 is None and s2 is None and s3 is None
    assert s4 is not None  # loop closed -> sector created
    sector = m.find_sector(s4)
    assert len(sector.linedefs) == 4
    assert sector.is_inside(m, (5, 5))
    assert not sector.is_inside(m, (15, 5))
    assert abs(sector.area(m) - 100.0) < 1e-5


def test_map_vertex_dedup_and_midpoint():
    m = Map()
    a = m.add_vertex_at(0, 0)
    assert m.add_vertex_at(0, 0) == a
    b = m.add_vertex_at(4, 0)
    lid, _ = m.create_linedef(a, b)
    mid = m.add_midpoint(lid)
    assert mid is not None
    v = m.get_vertex(mid)
    assert v.x == 2.0 and v.y == 0.0
    assert len(m.linedefs) == 2


def test_map_delete_cascade_and_sanitize():
    m = Map()
    a = m.add_vertex_at(0, 0)
    b = m.add_vertex_at(10, 0)
    c = m.add_vertex_at(10, 10)
    m.create_linedef(a, b)
    m.create_linedef(b, c)
    m.create_linedef(c, a)
    assert len(m.sectors) == 1
    m.delete_elements([a], [], [])
    assert len(m.vertices) == 2
    assert len(m.linedefs) == 1  # only b->c survives
    assert len(m.sectors) == 0


def test_mapscript_world():
    src = """
set_default("wall_height", 2.0)
box = 8
wall(box)
turn_right()
wall(box)
turn_right()
wall(box)
turn_right()
wall(box)
add_point_light("#ffffbb", 2.0, 2.0, 13.0)
move_to(4, 4)
"""
    m = compile_source_map(src)
    assert len(m.sectors) == 1
    assert len(m.linedefs) == 4
    assert len(m.lights) == 1
    ld = m.linedefs[0]
    assert ld.properties.get_float_default("wall_height", 0) == 2.0
    # orientation turtle: square closes back at origin
    assert m.find_vertex_at(0, 0) is not None


def test_d3_builder_emits_geometry():
    src = """
set_default("wall_height", 2.0)
wall(8)
turn_right()
wall(8)
turn_right()
wall(8)
turn_right()
wall(8)
"""
    assets = Assets.default()
    assets.textures["wall"] = Texture.checkerboard(16, 4)
    script = MapScript(assets)
    script.set_default("wall_tex", "wall")
    script.set_default("floor_tex", "wall")
    m = script.compile(src)

    scene = Scene.empty()
    D3Builder().build(m, assets, scene)
    batches = scene.all_d3_batches()
    assert batches, "no geometry emitted"
    total_tris = sum(len(b.indices) for b in batches)
    # floor (2) + 4 walls x 2 rows x 2 tris
    assert total_tris >= 2 + 4 * 2 * 2
    # collision extracted
    vols = [
        v
        for chunk in scene.chunks.values()
        for v in chunk.collision.blocking_volumes
    ]
    assert len(vols) == 4
    assert scene.mapmini is not None
    assert len(scene.mapmini.linedefs) == 4


def test_scene_manager_incremental():
    src = "set_default(\"wall_height\", 2.0)\nwall(20)\nturn_right()\nwall(20)\nturn_right()\nwall(20)\nturn_right()\nwall(20)\n"
    m = compile_source_map(src)
    mgr = SceneManager()
    mgr.set_map(m, Assets.default())
    assert mgr.total >= 1
    results = []
    while True:
        r = mgr.tick()
        if r is None:
            break
        results.append(r)
    assert len(results) == mgr.total
    assert results[-1].remaining == 0


def test_mapmini_visibility_and_occlusion():
    mini = MapMini()
    mini.linedefs.append(
        CompiledLinedef(np.array([0.0, -5.0]), np.array([0.0, 5.0]), 0.0, 2.0)
    )
    assert not mini.is_visible((-2, 0), (2, 0))  # wall between
    assert mini.is_visible((-2, 8), (2, 8))  # above the wall end
    from rusterix_tpu.utils.rect import Rect

    mini.occluded_sectors.append((Rect(0, 0, 4, 4), 0.25))
    assert mini.get_occlusion((2, 2)) == 0.25
    assert mini.get_occlusion((9, 9)) == 1.0


def test_terrain_sampling():
    t = Terrain()
    t.set_height(0, 0, 1.0)
    t.set_height(1, 0, 3.0)
    assert abs(t.sample_height(0.5, 0.0) - 2.0) < 1e-5
    n = t.sample_normal(0.5, 0.0)
    assert n[1] > 0  # upward
    mesh = t.build_mesh((0, 0))
    assert mesh is not None
    verts, idx, uvs, normals = mesh
    assert len(idx) == 16 * 16 * 2
