"""Surface/profile chunk building: base caps with holes, tile/blend override
partitioning, extrusion (back cap + jambs), relief/recess/billboard features
(reference d3chunkbuilder.rs surface flow + action/*.rs + \
surface_mesh_builder.rs)."""

import numpy as np
import pytest

from rusterix_tpu.builders import (
    D3Builder,
    build_surface_batches,
    build_surface_uvs,
    fix_winding,
    partition_tile_and_blend_overrides,
    split_loops_for_base,
    subdivide_triangles_into_tiles,
)
from rusterix_tpu.map import (
    BillboardAnimation,
    LoopOp,
    LoopOpKind,
    Map,
    ProfileLoop,
    Surface,
)
from rusterix_tpu.models import Assets, PixelSource, Scene, VertexBlendPreset


def make_surface_map(w=4.0, h=4.0, height=0.0):
    m = Map()
    a = m.add_vertex_at(0, 0)
    b = m.add_vertex_at(w, 0)
    c = m.add_vertex_at(w, h)
    d = m.add_vertex_at(0, h)
    if height:
        for v in m.vertices:
            v.z = height  # vertex z = world height
    m.create_linedef(a, b)
    m.create_linedef(b, c)
    m.create_linedef(c, d)
    _, sid = m.create_linedef(d, a)
    s = Surface(sector_id=sid)
    s.calculate_geometry(m)
    m.surfaces[s.id] = s
    sector = m.find_sector(sid)
    sector.properties.set("source", PixelSource.pixel((200, 200, 200, 255)))
    return m, sector, s


def batch_area(batch):
    v = batch.vertices[:, :3]
    area = 0.0
    for i0, i1, i2 in batch.indices:
        area += 0.5 * np.linalg.norm(np.cross(v[i1] - v[i0], v[i2] - v[i0]))
    return area


def total_area(batches):
    return sum(batch_area(b) for b in batches)


def test_base_cap_with_hole():
    m, sector, s = make_surface_map()
    s.profile_loops.append(
        ProfileLoop(
            path=[(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)],
            op=LoopOp(LoopOpKind.Nothing),
        )
    )
    batches, bills = build_surface_batches(m, sector, s)
    assert len(batches) == 1 and not bills
    assert abs(batch_area(batches[0]) - 15.0) < 0.01
    # front cap faces the surface normal (d3chunkbuilder.rs:524)
    v = batches[0].vertices[:, :3]
    i0, i1, i2 = batches[0].indices[0]
    n = np.cross(v[i1] - v[i0], v[i2] - v[i0])
    assert np.dot(n, s.plane.normal) > 0


def test_tile_override_partitioning():
    m, sector, s = make_surface_map()
    red = PixelSource.pixel((255, 0, 0, 255))
    # cells are in surface UV space (origin at the plane centroid)
    sector.properties.set("tiles", {(0, 0): red})
    batches, _ = build_surface_batches(m, sector, s)
    assert len(batches) == 2
    override = [b for b in batches if b.source.pixel[:3] == (255, 0, 0)]
    default = [b for b in batches if b is not override[0]]
    assert len(override) == 1
    # override covers exactly the 1x1 cell; default the rest
    assert abs(batch_area(override[0]) - 1.0) < 1e-3
    assert abs(batch_area(default[0]) - 15.0) < 1e-3
    assert abs(total_area(batches) - 16.0) < 1e-3


def test_blend_override_weights():
    m, sector, s = make_surface_map()
    grass = PixelSource.pixel((0, 255, 0, 255))
    sector.properties.set(
        "blend_tiles", {(0, 0): (VertexBlendPreset.Secondary, grass)}
    )
    batches, _ = build_surface_batches(m, sector, s)
    blend = [b for b in batches if b.source2 is not None]
    assert len(blend) == 1
    b = blend[0]
    # Secondary preset: all corners weight 1 -> every referenced vertex 1.0
    used = np.unique(b.indices)
    assert np.allclose(b.blend_weights[used], 1.0)
    assert abs(batch_area(b) - 1.0) < 1e-3


def test_blend_weights_bilinear_top_preset():
    """Top preset on a horizontal surface: weight 1 along v=0 edge of the
    cell, 0 along v=1 (bilinear corner interpolation,
    d3chunkbuilder.rs:199-210)."""
    m, sector, s = make_surface_map()
    src = PixelSource.pixel((0, 0, 255, 255))
    preset = VertexBlendPreset.Top.orient_to_world(s.plane.normal)
    sector.properties.set("blend_tiles", {(0, 0): (preset, src)})
    batches, _ = build_surface_batches(m, sector, s)
    b = [x for x in batches if x.source2 is not None][0]
    used = np.unique(b.indices)
    w = VertexBlendPreset(preset).weights()
    for idx in used:
        # recompute local uv from world via the surface mapping
        uv = s.world_to_uv(b.vertices[idx, :3])
        u, v = float(uv[0]) - 0.0, float(uv[1]) - 0.0
        expect = (
            w[0] * (1 - u) * (1 - v)
            + w[1] * u * (1 - v)
            + w[2] * u * v
            + w[3] * (1 - u) * v
        )
        assert abs(float(b.blend_weights[idx]) - expect) < 1e-4


def test_subdivide_into_tiles_preserves_area():
    tri = np.array([[0.2, 0.2], [2.8, 0.4], [1.5, 2.6]], np.float32)
    m, sector, s = make_surface_map()
    uvs, world, tiled, cells = subdivide_triangles_into_tiles(
        [(0, 1, 2)], tri, s
    )
    # pieces land in their cells and sum to the original area
    total = 0.0
    for (tx, ty), (a, b, c) in tiled:
        pts = uvs[[a, b, c]]
        assert (pts[:, 0] >= tx - 1e-4).all() and (pts[:, 0] <= tx + 1 + 1e-4).all()
        assert (pts[:, 1] >= ty - 1e-4).all() and (pts[:, 1] <= ty + 1 + 1e-4).all()
        total += 0.5 * abs(
            (pts[1, 0] - pts[0, 0]) * (pts[2, 1] - pts[0, 1])
            - (pts[1, 1] - pts[0, 1]) * (pts[2, 0] - pts[0, 0])
        )
    orig = 0.5 * abs(
        (tri[1, 0] - tri[0, 0]) * (tri[2, 1] - tri[0, 1])
        - (tri[1, 1] - tri[0, 1]) * (tri[2, 0] - tri[0, 0])
    )
    assert abs(total - orig) < 1e-3


def test_extrusion_back_cap_and_jamb():
    # raised off the floor: floor-level horizontal edges would be skipped as
    # door bottoms (d3chunkbuilder.rs:731-739)
    m, sector, s = make_surface_map(height=1.0)
    s.extrusion.enabled = True
    s.extrusion.depth = 0.5
    batches, _ = build_surface_batches(m, sector, s)
    # front cap + back cap + outer jamb
    assert len(batches) == 3
    front, back, jamb = batches
    assert abs(batch_area(front) - 16.0) < 1e-3
    assert abs(batch_area(back) - 16.0) < 1e-3
    # back cap offset along the normal by depth
    n = s.plane.normal
    d_front = np.dot(front.vertices[0, :3], n)
    d_back = np.dot(back.vertices[0, :3], n)
    assert abs((d_back - d_front) - 0.5) < 1e-4
    # jamb: perimeter 16 x depth 0.5 (vertical wall edges aren't floor-level)
    assert abs(batch_area(jamb) - 8.0) < 1e-2


def test_through_hole_gets_jamb_tube():
    m, sector, s = make_surface_map(height=1.0)
    s.extrusion.enabled = True
    s.extrusion.depth = 0.5
    s.profile_loops.append(
        ProfileLoop(
            path=[(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)],
            op=LoopOp(LoopOpKind.Nothing),
        )
    )
    batches, _ = build_surface_batches(m, sector, s)
    # both caps have the hole, plus outer jamb + hole tube
    areas = sorted(batch_area(b) for b in batches)
    assert len(batches) == 4
    assert abs(areas[0] - 2.0) < 1e-2  # hole tube: perimeter 4 x 0.5
    assert abs(areas[1] - 8.0) < 1e-2  # outer jamb
    assert abs(areas[2] - 15.0) < 1e-2 and abs(areas[3] - 15.0) < 1e-2


def test_relief_feature():
    m, sector, s = make_surface_map()
    s.profile_loops.append(
        ProfileLoop(
            path=[(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)],
            op=LoopOp(LoopOpKind.Relief, height=0.75),
        )
    )
    batches, _ = build_surface_batches(m, sector, s)
    # base cap (no hole cut on flat surfaces) + relief cap + relief sides
    assert len(batches) == 3
    base, cap, sides = batches
    assert abs(batch_area(base) - 16.0) < 1e-3
    assert abs(batch_area(cap) - 4.0) < 1e-3
    # relief cap floats height * -normal off the front (target 0 faces -n)
    n = s.plane.normal
    off = abs(np.dot(cap.vertices[0, :3] - base.vertices[0, :3], n))
    assert abs(off - 0.75) < 1e-4
    assert abs(batch_area(sides) - 8.0 * 0.75) < 1e-2


def test_recess_cuts_front_cap_on_extruded_surface():
    m, sector, s = make_surface_map(height=1.0)
    s.extrusion.enabled = True
    s.extrusion.depth = 0.5
    s.profile_loops.append(
        ProfileLoop(
            path=[(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)],
            op=LoopOp(LoopOpKind.Recess, depth=0.25),
        )
    )
    batches, _ = build_surface_batches(m, sector, s)
    areas = sorted(batch_area(b) for b in batches)
    # front cap 15 (hole cut), back cap 16, outer jamb 8,
    # recess cap 1 + recess pocket sides 1 (perimeter 4 x 0.25)
    assert len(batches) == 5
    assert abs(areas[0] - 1.0) < 1e-2 and abs(areas[1] - 1.0) < 1e-2
    assert abs(areas[2] - 8.0) < 1e-2
    assert abs(areas[3] - 15.0) < 1e-2
    assert abs(areas[4] - 16.0) < 1e-2


def test_billboard_loop_emits_metadata_and_cuts_hole():
    m, sector, s = make_surface_map()
    s.profile_loops.append(
        ProfileLoop(
            path=[(-1.0, -0.5), (1.0, -0.5), (1.0, 0.5), (-1.0, 0.5)],
            op=LoopOp(
                LoopOpKind.Billboard,
                depth=0.1,
                animation=BillboardAnimation.OpenUp,
            ),
        )
    )
    batches, bills = build_surface_batches(m, sector, s)
    assert len(bills) == 1
    bb = bills[0]
    assert bb.animation == BillboardAnimation.OpenUp
    assert bb.size == 2.0
    assert abs(bb.inset - 0.1) < 1e-6
    # the billboard quad itself is client-side dynamic geometry (it animates);
    # the builder only cuts the hole in the base cap
    assert len(batches) == 1
    assert abs(batch_area(batches[0]) - 14.0) < 1e-3


def test_split_loops_classification():
    hole = ProfileLoop(path=[(0, 0)], op=LoopOp(LoopOpKind.Nothing))
    recess = ProfileLoop(path=[(0, 0)], op=LoopOp(LoopOpKind.Recess, depth=1))
    relief = ProfileLoop(path=[(0, 0)], op=LoopOp(LoopOpKind.Relief, height=1))
    bill = ProfileLoop(path=[(0, 0)], op=LoopOp(LoopOpKind.Billboard))
    base, feats = split_loops_for_base([hole, recess, relief, bill], 0.5)
    assert base == [hole, bill]
    assert feats == [recess, relief, bill]
    # zero-thickness: recess is both a base hole and a feature
    base0, feats0 = split_loops_for_base([recess], 0.0)
    assert base0 == [recess] and feats0 == [recess]


def test_fix_winding_flips():
    verts = np.array(
        [[0, 0, 0, 1], [1, 0, 0, 1], [0, 0, 1, 1]], np.float32
    )
    tris = np.array([[0, 1, 2]], np.int32)
    up = fix_winding(verts, tris, (0, 1, 0))
    down = fix_winding(verts, tris, (0, -1, 0))
    assert not np.array_equal(up, down)


def test_build_surface_uvs_modes():
    class FakeSector:
        def __init__(self, props):
            from rusterix_tpu.map.value import ValueContainer

            self.properties = ValueContainer(props)

    pts = np.array([[0, 0], [8, 0], [8, 4], [0, 4]], np.float32)
    fit = build_surface_uvs(pts, FakeSector({"tile_mode": 0}))
    assert np.allclose(fit.max(axis=0), [1, 1])
    rep = build_surface_uvs(
        pts, FakeSector({"tile_mode": 1, "texture_scale_x": 2.0})
    )
    assert np.allclose(rep.max(axis=0), [4, 4])


def test_d3builder_integrates_surfaces_and_renders():
    from rusterix_tpu.models import D3OrbitCamera
    from rusterix_tpu.ops.raster import Rasterizer

    m, sector, s = make_surface_map()
    s.profile_loops.append(
        ProfileLoop(
            path=[(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)],
            op=LoopOp(LoopOpKind.Relief, height=0.5),
        )
    )
    scene = Scene()
    D3Builder().build(m, Assets.default(), scene)
    n_surface_batches = sum(len(c.batches3d) for c in scene.chunks.values())
    assert n_surface_batches >= 3

    cam = D3OrbitCamera()
    cam.set_parameter_f32("distance", 8.0)
    cam.azimuth = 0.8
    cam.center = np.array([2.0, 0.0, 2.0], np.float32)
    rast = Rasterizer.setup(
        None, cam.view_matrix(), cam.projection_matrix(160, 120)
    ).ambient((1.0, 1.0, 1.0, 1.0))
    frame = rast.rasterize(scene, 160, 120, 32, Assets.default())
    assert frame.shape == (120, 160, 4)
    assert (frame[..., :3] > 0).any()
