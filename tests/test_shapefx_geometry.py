"""ShapeFX geometry-group nodes (SectorGeometry / LinedefGeometry roots with
Flatten / Colorize modifiers) evaluated in the terrain build — reference
src/shapestack/shapefx.rs:411-930 driven by terrain/chunk.rs:144-247."""

import numpy as np

from rusterix_tpu import Assets, Scene
from rusterix_tpu.builders import D3Builder
from rusterix_tpu.map.elements import Linedef, Sector, Vertex
from rusterix_tpu.map.worldmap import Map
from rusterix_tpu.models.batch import PixelSource
from rusterix_tpu.shapefx import ShapeFX, ShapeFXGraph, ShapeFXRole
from rusterix_tpu.shapefx.geometry import process_chunk_modifiers


def _square_map(x0=2, y0=2, size=4, floor_height=1.0):
    m = Map()
    pts = [(x0, y0), (x0 + size, y0), (x0 + size, y0 + size), (x0, y0 + size)]
    for i, (x, y) in enumerate(pts):
        m.vertices.append(Vertex(id=i, x=float(x), y=float(y)))
    for i in range(4):
        m.linedefs.append(
            Linedef(id=i, start_vertex=i, end_vertex=(i + 1) % 4, sector_ids=[0])
        )
    s = Sector(id=0, linedefs=[0, 1, 2, 3])
    s.properties.set("floor_height", floor_height)
    m.sectors.append(s)
    return m


def _flat_terrain(m, h=5.0, n=12):
    for ty in range(n):
        for tx in range(n):
            m.terrain.set_height(tx, ty, h)


def _attach_graph(m, element, *roles, values=None):
    """region_graph property -> graph with a geometry root + modifier chain
    (terminal-0 links) and a Color material on each modifier's terminal 1."""
    g = ShapeFXGraph(nodes=[ShapeFX(roles[0])])
    prev = 0
    for role in roles[1:]:
        node = ShapeFX(role)
        for k, v in (values or {}).items():
            node.values.set(k, v)
        g.nodes.append(node)
        idx = len(g.nodes) - 1
        g.connections.append((prev, 0, idx, 0))
        # color chain: palette slot 1
        color = ShapeFX(ShapeFXRole.Color)
        color.values.set("color", 1)
        g.nodes.append(color)
        g.connections.append((idx, 1, len(g.nodes) - 1, 0))
        prev = idx
    m.shapefx_graphs[g.id] = g
    element.properties.set("region_graph", PixelSource.shapefx_graph(g.id))
    return g


def test_sector_flatten_modifies_heights():
    m = _square_map(floor_height=1.0)
    _flat_terrain(m, 5.0)
    _attach_graph(m, m.sectors[0], ShapeFXRole.SectorGeometry, ShapeFXRole.Flatten,
                  values={"bevel": 1.0})
    chunk = m.terrain.chunks[(0, 0)]
    heights = process_chunk_modifiers(m, m.terrain, chunk)
    assert heights, "Flatten produced no height overrides"
    # well inside the sector: flattened to floor_height
    assert abs(heights[(4, 4)] - 1.0) < 1e-4
    # far outside: untouched (no override emitted)
    assert (10, 10) not in heights
    # across the bevel: between floor and original
    edge = heights.get((2, 4))
    assert edge is None or 1.0 - 1e-4 <= edge <= 5.0 + 1e-4


def test_linedef_flatten_carves_path():
    m = Map()
    m.vertices.append(Vertex(id=0, x=1.0, y=6.0))
    m.vertices.append(Vertex(id=1, x=11.0, y=6.0))
    m.vertices[0].properties.set("height", 0.5)
    m.vertices[1].properties.set("height", 2.5)
    m.linedefs.append(Linedef(id=0, start_vertex=0, end_vertex=1))
    _flat_terrain(m, 5.0)
    _attach_graph(m, m.linedefs[0], ShapeFXRole.LinedefGeometry,
                  ShapeFXRole.Flatten, values={"bevel": 1.2, "path_width": 2.0})
    chunk = m.terrain.chunks[(0, 0)]
    heights = process_chunk_modifiers(m, m.terrain, chunk)
    assert heights
    # on the path: lerped vertex heights (t=~0.35 at x=4.5 -> ~1.2), not 5.0
    on_path = heights[(4, 6)]
    assert on_path < 3.0
    # path height increases along the segment (height_start -> height_end)
    assert heights[(9, 6)] > heights[(2, 6)]
    # off the path: untouched
    assert (4, 1) not in heights


def test_sector_colorize_paints_baked_texture():
    m = _square_map(floor_height=1.0)
    _flat_terrain(m, 0.0)
    _attach_graph(m, m.sectors[0], ShapeFXRole.SectorGeometry,
                  ShapeFXRole.Colorize, values={"fade_distance": 0.3})
    assets = Assets.default()
    palette = assets.palette
    tex, heights = m.terrain.bake_chunk(m, (0, 0), assets, palette=palette)
    assert not heights  # Colorize alone doesn't move heights
    ppt = tex.shape[0] // 16
    inside = tex[4 * ppt + ppt // 2, 4 * ppt + ppt // 2]
    outside = tex[10 * ppt, 10 * ppt]
    expect = np.clip(np.asarray(palette[1][:3]) * 255 + 0.5, 0, 255).astype(int)
    assert np.abs(inside[:3].astype(int) - expect).max() <= 1, (inside, expect)
    assert (outside[:3] == 0).all()


def test_colorize_height_window_gates_painting():
    m = _square_map(x0=0, y0=0, size=12, floor_height=0.0)
    _flat_terrain(m, 0.0)
    # raise a hill on one side
    for ty in range(13):
        for tx in range(6, 13):
            m.terrain.set_height(tx, ty, 4.0)
    _attach_graph(
        m, m.sectors[0], ShapeFXRole.SectorGeometry, ShapeFXRole.Colorize,
        values={"fade_distance": 0.2, "min_height": -1.0, "max_height": 1.0},
    )
    assets = Assets.default()
    tex, _ = m.terrain.bake_chunk(m, (0, 0), assets, palette=assets.palette)
    ppt = tex.shape[0] // 16
    low = tex[3 * ppt, 3 * ppt]
    high = tex[3 * ppt, 9 * ppt]
    assert low[:3].astype(int).sum() > high[:3].astype(int).sum()


def test_builder_emits_flattened_textured_terrain():
    """End-to-end: D3Builder bakes the chunk texture, applies Flatten to the
    mesh and routes the bake through the scene's dynamic textures."""
    m = _square_map(floor_height=0.5)
    _flat_terrain(m, 3.0)
    _attach_graph(m, m.sectors[0], ShapeFXRole.SectorGeometry, ShapeFXRole.Flatten,
                  values={"bevel": 1.0})
    # make walls not dominate: no wall_height properties set
    scene = Scene.empty()
    D3Builder().build(m, Assets.default(), scene)
    batches = [
        c.terrain_batch3d for c in scene.chunks.values()
        if c.terrain_batch3d is not None
    ]
    assert batches
    assert len(scene.dynamic_textures) >= 1
    ys = np.concatenate([b.vertices[:, 1] for b in batches])
    assert ys.min() < 0.5 + 1e-3  # flattened region reaches floor_height
    assert ys.max() >= 3.0 - 1e-3  # untouched region keeps original height
