"""ShapeStack 2D SDF styling + character tile baking (reference
src/shapestack/: mod.rs render_geometry, shapefx.rs material nodes,
tilebuilder.rs sequences)."""

import numpy as np

from rusterix_tpu.map import Keyform, Map, SoftRig
from rusterix_tpu.map.softrig import blend_softrigs
from rusterix_tpu.map.value import ValueContainer
from rusterix_tpu.models import Assets, PixelSource, Scene
from rusterix_tpu.server.entity import Entity
from rusterix_tpu.server.item import Item
from rusterix_tpu.shapefx import ShapeFX, ShapeFXGraph, ShapeFXRole
from rusterix_tpu.shapestack import (
    ShapeStack,
    build_tile,
    compute_sector_overrides,
    tile_builder,
)
from rusterix_tpu.shapestack.nodes import box_divide, noise2d, noise2d_tileable


def square_map(graph_nodes, connections, lo=-2.0, hi=2.0):
    m = Map()
    a = m.add_vertex_at(lo, lo)
    b = m.add_vertex_at(hi, lo)
    c = m.add_vertex_at(hi, hi)
    d = m.add_vertex_at(0 + lo, hi)
    m.create_linedef(a, b)
    m.create_linedef(b, c)
    m.create_linedef(c, d)
    _, sid = m.create_linedef(d, a)
    g = ShapeFXGraph(nodes=graph_nodes, connections=connections)
    m.shapefx_graphs[g.id] = g
    sector = m.find_sector(sid)
    sector.properties.set("shape_graph", PixelSource.shapefx_graph(g.id))
    return m, sector


def material_graph(*chain_nodes):
    """MaterialGroup root with `chain_nodes` wired to the inside terminal."""
    nodes = [ShapeFX(ShapeFXRole.MaterialGroup)] + list(chain_nodes)
    connections = []
    prev, prev_t = 0, 0
    for i in range(1, len(nodes)):
        connections.append((prev, prev_t, i, 0))
        prev, prev_t = i, 0
    return nodes, connections


def render64(m, assets=None):
    buf = np.zeros((64, 64, 4), np.uint8)
    ShapeStack((-5.0, -5.0), (5.0, 5.0)).render_geometry(
        buf, m, assets or Assets.default(), False, {}
    )
    return buf


def palette_index_of(assets, rgb):
    pal = np.asarray(assets.palette)
    d = np.abs(pal[:, :3] - np.asarray(rgb)[None]).sum(axis=1)
    return int(d.argmin())


def test_noise_helpers_shapes_and_ranges():
    u, v = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32))
    n = noise2d(u, v, (1.0, 1.0), 3)
    assert n.shape == (32, 32)
    assert n.min() >= -0.1 and n.max() <= 1.1
    nt = noise2d_tileable(u, v, (2.0, 2.0), 2, (-5.0, 5.0))
    assert nt.shape == (32, 32)
    sdf, cid = box_divide(u * 3, v * 3, 0.2, 0.3, 0.2)
    assert sdf.shape == (32, 32) and cid.shape == (32, 32)
    assert (cid >= 0.0).all() and (cid < 1.0).all()
    # deterministic
    assert np.allclose(noise2d(u, v, (1.0, 1.0), 3), n)


def test_color_node_fills_sector():
    assets = Assets.default()
    color_node = ShapeFX(ShapeFXRole.Color)
    idx = palette_index_of(assets, (1.0, 1.0, 1.0))
    color_node.values.set("color", idx)
    nodes, conns = material_graph(color_node)
    m, sector = square_map(nodes, conns)
    buf = render64(m, assets)
    # center inside: palette color; far corner outside the sector is... also
    # alpha-composited (the Color node returns alpha 1 outside, shapefx.rs:1529)
    pal = (np.asarray(assets.palette)[idx] * 255 + 0.5).astype(np.uint8)
    assert np.allclose(buf[32, 32, :3], pal, atol=2)


def test_outline_node_rings_boundary():
    assets = Assets.default()
    outline = ShapeFX(ShapeFXRole.Outline)
    outline.values.set("color", palette_index_of(assets, (1.0, 1.0, 1.0)))
    outline.values.set("thickness", 2.0)
    nodes, conns = material_graph(outline)
    m, sector = square_map(nodes, conns)
    buf = render64(m, assets)
    # boundary at world x=-2 -> pixel x ~ (3/10)*64 = 19; ring inside only
    assert buf[32, 21, :3].any()
    assert not buf[32, 32, :3].any()  # deep inside: outline doesn't reach
    assert not buf[32, 5, :3].any()  # far outside


def test_gradient_node_steps_inward():
    assets = Assets.default()
    grad = ShapeFX(ShapeFXRole.Gradient)
    grad.values.set("steps", 4)
    grad.values.set("edge", palette_index_of(assets, (0.0, 0.0, 0.0)))
    grad.values.set("interior", palette_index_of(assets, (1.0, 1.0, 1.0)))
    grad.values.set("thickness", 2.0)
    nodes, conns = material_graph(grad)
    m, sector = square_map(nodes, conns)
    buf = render64(m, assets)
    edge_lum = int(buf[32, 20, :3].astype(int).sum())
    center_lum = int(buf[32, 32, :3].astype(int).sum())
    assert center_lum > edge_lum + 100  # brightens toward the interior


def test_stone_and_wood_nodes_produce_texture():
    assets = Assets.default()
    for role in (ShapeFXRole.Stone, ShapeFXRole.Wood):
        node = ShapeFX(role)
        nodes, conns = material_graph(node)
        m, sector = square_map(nodes, conns)
        buf = render64(m, assets)
        inside = buf[24:40, 24:40, :3]
        assert inside.std() > 5.0, role  # visible structure, not flat


def test_blend_softrigs_midpoint():
    a = SoftRig(name="walk1", keyforms=[Keyform([(0, (0.0, 0.0)), (1, (2.0, 0.0))])])
    b = SoftRig(name="walk2", keyforms=[Keyform([(0, (1.0, 1.0))])])
    mid = blend_softrigs(a, b, 0.5)
    pos = dict(mid.keyforms[0].vertex_positions)
    assert pos[0] == (0.5, 0.5)
    assert pos[1] == (2.0, 0.0)  # only in rig a -> kept


def character_assets():
    assets = Assets.default()
    color = ShapeFX(ShapeFXRole.Color)
    color.values.set("color", palette_index_of(assets, (1.0, 1.0, 1.0)))
    nodes, conns = material_graph(color)
    cmap, sector = square_map(nodes, conns, lo=-1.0, hi=1.0)
    assets.character_maps["hero"] = cmap
    return assets, cmap


def test_build_tile_static_and_rig_frames():
    assets, cmap = character_assets()
    tile = build_tile(cmap, assets, "idle", 32)
    assert len(tile.textures) == 1
    assert tile.textures[0].data[16, 16, :3].any()

    # two walk rigs -> looping transition: 2 transitions x 2 frames
    vids = [v.id for v in cmap.vertices]
    r1 = SoftRig(name="walk1", keyforms=[Keyform([(vids[0], (-1.0, -1.0))])])
    r2 = SoftRig(name="walk2", keyforms=[Keyform([(vids[0], (-3.0, -3.0))])])
    cmap.softrigs[r1.id] = r1
    cmap.softrigs[r2.id] = r2
    tile = build_tile(cmap, assets, "walk", 32)
    assert len(tile.textures) == 4
    # poses differ between frames
    assert not np.array_equal(tile.textures[0].data, tile.textures[1].data)


def test_tile_builder_and_client_source_resolution():
    from rusterix_tpu.client import Client

    assets, cmap = character_assets()
    m = Map()
    ent = Entity()
    ent.id = 7
    ent.attributes.set("class_name", "hero")
    ent.attributes.set("_source_seq", PixelSource.sequence("idle"))
    m.entities.append(ent)

    tile_builder(m, assets)
    assert 7 in assets.entity_tiles and "idle" in assets.entity_tiles[7]

    client = Client()
    src = client._entity_source(ent, assets)
    assert src is not None
    assert src.entity_id == 7 and src.index == 0

    # the packer maps EntityTile sources into atlas slots
    from rusterix_tpu.ops.scene_pack import SRC_TEXTURE, AtlasIndex

    scene = Scene()
    ai = AtlasIndex.build(assets, scene)
    kind, slot, _ = ai.resolve(src)
    assert kind == SRC_TEXTURE and slot >= 0


def test_sector_overrides_from_equipped_item():
    assets, cmap = character_assets()
    cmap.sectors[0].name = "torso"
    ent = Entity()
    item = Item()
    item.attributes.set("color", (1.0, 0.0, 0.0))
    item.attributes.set("color_targets", ("torso",))
    ent.equipped["chest"] = item
    overrides = compute_sector_overrides(cmap, ent)
    assert cmap.sectors[0].id in overrides
    assert np.allclose(overrides[cmap.sectors[0].id][:3], (1.0, 0.0, 0.0))
