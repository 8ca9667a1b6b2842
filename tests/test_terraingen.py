"""Procedural terrain generation: control-point hills, ridge sectors,
linedef corridors, map-edge falloff, exclusion holes
(reference terrain_generator.rs + TERRAIN.md)."""

import numpy as np

from rusterix_tpu.builders import (
    D3Builder,
    TerrainConfig,
    TerrainGenerator,
    sample_height_at,
)
from rusterix_tpu.map import Map
from rusterix_tpu.models import Assets, PixelSource, Scene


def base_map(size=40.0):
    """A map whose bbox is (0,0)-(size,size) via two corner vertices."""
    m = Map()
    m.add_vertex_at(0, 0)
    m.add_vertex_at(size, size)
    return m


def add_control(m, x, y, z, smoothness=None):
    vid = m.add_vertex_at(x, y)
    v = m.get_vertex(vid)
    v.z = z
    v.properties.set("terrain_control", True)
    if smoothness is not None:
        v.properties.set("smoothness", smoothness)
    return v


def test_control_point_hill_and_edge_falloff():
    m = base_map()
    add_control(m, 20, 20, 8.0, smoothness=3.0)
    # peak at the control point
    assert abs(sample_height_at(m, (20, 20)) - 8.0) < 1e-4
    # falls off with distance (radius = smoothness*2 = 6, smoothing 6 -> 0 at 12)
    mid = sample_height_at(m, (20, 28))
    assert 0.0 < mid < 8.0
    assert sample_height_at(m, (20, 33)) == 0.0
    # map edge: height 0 at the boundary even under a hill
    m2 = base_map()
    add_control(m2, 0.0, 20.0, 8.0, smoothness=5.0)
    assert sample_height_at(m2, (0.0, 20.0)) == 0.0


def test_max_combination_not_sum():
    m = base_map()
    add_control(m, 20, 20, 5.0, smoothness=4.0)
    add_control(m, 21, 20, 5.0, smoothness=4.0)
    # overlapping hills take MAX (terrain_generator.rs:700-706), not sum
    assert sample_height_at(m, (20.5, 20)) <= 5.0 + 1e-5


def test_ridge_sector_plateau_and_falloff():
    m = base_map()
    a = m.add_vertex_at(18, 18)
    b = m.add_vertex_at(22, 18)
    c = m.add_vertex_at(22, 22)
    d = m.add_vertex_at(18, 22)
    m.create_linedef(a, b)
    m.create_linedef(b, c)
    m.create_linedef(c, d)
    _, sid = m.create_linedef(d, a)
    s = m.find_sector(sid)
    s.properties.set("terrain_mode", 2)
    s.properties.set("ridge_height", 4.0)
    s.properties.set("ridge_plateau_width", 1.0)
    s.properties.set("ridge_falloff_distance", 4.0)
    s.properties.set("ridge_falloff_steepness", 2.0)
    # within plateau_width of the boundary -> full height
    assert abs(sample_height_at(m, (18.5, 20.0)) - 4.0) < 1e-4
    # farther out: quadratic falloff
    h = sample_height_at(m, (15.0, 20.0))  # 3 from edge, 2 past plateau
    assert abs(h - 4.0 * (1.0 - 2.0 / 4.0) ** 2.0) < 1e-4
    # beyond falloff distance -> 0
    assert sample_height_at(m, (12.0, 20.0)) == 0.0


def test_linedef_corridor_blends_toward_target():
    m = base_map()
    add_control(m, 20, 20, 6.0, smoothness=5.0)
    v0 = m.add_vertex_at(10, 20)
    v1 = m.add_vertex_at(30, 20)
    m.get_vertex(v0).z = 0.0
    m.get_vertex(v1).z = 2.0
    lid, _ = m.create_linedef(v0, v1)
    ld = m.find_linedef(lid)
    ld.properties.set("terrain_smooth", True)
    ld.properties.set("terrain_width", 1.0)
    ld.properties.set("terrain_falloff_distance", 2.0)
    # on the corridor at the midpoint: height == interpolated target (1.0),
    # flattening the 6-unit hill
    assert abs(sample_height_at(m, (20.0, 20.0)) - 1.0) < 1e-4
    # at the start: target 0
    assert abs(sample_height_at(m, (10.5, 20.0)) - 0.025) < 0.03


def test_generate_mesh_and_exclusion():
    m = base_map()
    add_control(m, 20, 20, 5.0, smoothness=4.0)
    # exclusion sector in a corner
    a = m.add_vertex_at(2, 2)
    b = m.add_vertex_at(8, 2)
    c = m.add_vertex_at(8, 8)
    d = m.add_vertex_at(2, 8)
    m.create_linedef(a, b)
    m.create_linedef(b, c)
    m.create_linedef(c, d)
    _, sid = m.create_linedef(d, a)
    m.find_sector(sid).properties.set("terrain_mode", 1)

    gen = TerrainGenerator(TerrainConfig(subdivisions=1))
    meshes = gen.generate(m, (0, 0, 40, 40), Assets.default())
    assert len(meshes) == 1
    src, verts, tris, uvs = meshes[0]
    assert verts.shape[1] == 3 and tris.shape[1] == 3
    # peak vertex near (20,20) carries ~5.0 height
    near = np.argmin(np.hypot(verts[:, 0] - 20, verts[:, 2] - 20))
    assert verts[near, 1] > 4.0
    # the excluded interior has no triangles whose corners all sit inside
    cen = verts[tris].mean(axis=1)
    inside = (cen[:, 0] > 3) & (cen[:, 0] < 7) & (cen[:, 2] > 3) & (cen[:, 2] < 7)
    assert not inside.any()
    # uvs are world xz
    assert np.allclose(uvs, verts[:, [0, 2]])


def test_tile_override_partitioning():
    m = base_map(10.0)
    add_control(m, 5, 5, 1.0, smoothness=2.0)
    gen = TerrainGenerator()
    red = PixelSource.pixel((255, 0, 0, 255))
    meshes = gen.generate(
        m, (0, 0, 10, 10), Assets.default(),
        PixelSource.pixel((0, 255, 0, 255)),
        {(5, 5): red},
    )
    assert len(meshes) == 2
    srcs = {id(s) for s, *_ in meshes}
    assert id(red) in srcs


def test_d3builder_emits_generated_terrain():
    m = base_map()
    m.properties.set("terrain_enabled", True)
    add_control(m, 20, 20, 5.0, smoothness=4.0)
    scene = Scene()
    D3Builder().build(m, Assets.default(), scene)
    batches = [b for c in scene.chunks.values() for b in c.batches3d]
    assert len(batches) >= 1
    b = batches[0]
    assert len(b.normals) == len(b.vertices)
    # normals lean away from vertical on the hill slope
    slope = np.argmin(np.hypot(b.vertices[:, 0] - 24, b.vertices[:, 2] - 20))
    assert b.normals[slope, 1] < 0.9999


def test_sample_normal_and_tile_normal():
    m = base_map()
    add_control(m, 20, 20, 5.0, smoothness=4.0)
    gen = TerrainGenerator()
    n = gen.sample_normal_at(m, (24.0, 20.0))
    assert abs(np.linalg.norm(n) - 1.0) < 1e-5
    assert n[1] > 0  # upward facing
    assert abs(n[0]) > 1e-4  # tilted by the slope
    flat = gen.tile_normal(m, (35, 35))
    assert np.allclose(flat, [0, 1, 0], atol=1e-5)


def test_ray_terrain_hit_picks_hill():
    """Editor ray-pick (terrain/mod.rs:427-480): a downward ray over a hill
    lands on the surface within the 0.1-step + binary-refine tolerance."""
    from rusterix_tpu.map import Terrain

    t = Terrain()
    for tx in range(8):
        for ty in range(8):
            t.set_height(tx, ty, 2.0)
    hit = t.ray_terrain_hit([2.0, 10.0, 2.0], [0.0, -1.0, 0.0])
    assert hit is not None
    assert abs(hit.height - 2.0) < 1e-3
    assert abs(hit.world_pos[1] - 2.0) < 1e-3
    assert hit.grid_pos == (2, 2)
    # an angled ray walks forward until it dips below the field
    hit2 = t.ray_terrain_hit([0.0, 4.0, 0.0], _norm([1.0, -0.5, 1.0]))
    assert hit2 is not None and abs(hit2.height - hit2.world_pos[1]) < 1e-4
    # a ray that never reaches the surface misses
    assert t.ray_terrain_hit([0.0, 10.0, 0.0], [0.0, 0.0, 1.0], 20.0) is None


def _norm(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)
