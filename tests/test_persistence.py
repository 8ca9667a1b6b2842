"""World-model persistence round-trip (the save-game format — reference
src/map/mod.rs:53 serde on Map, src/server/entity.rs:10 on Entity/Item):
save a built world to JSON, load it back, re-render byte-identical, and
resume the server simulation from a snapshot."""

import json

import numpy as np

from rusterix_tpu import Assets, D3FirstPCamera, Scene, Texture
from rusterix_tpu.builders import D3Builder, MapScript
from rusterix_tpu.map.persist import (
    entity_from_json,
    entity_to_json,
    item_from_json,
    item_to_json,
    load_map,
    map_from_json,
    map_to_json,
    save_map,
    value_from_json,
    value_to_json,
)
from rusterix_tpu.map.value import Value, ValueKind
from rusterix_tpu.models.batch import PixelSource
from rusterix_tpu.models.light import Light, LightType
from rusterix_tpu.ops.raster import Rasterizer

from .test_minigame import build_engine

WORLD_RXM = """
set("sky_tex", "sky")
set_default("wall_tex", "brickwall")
set_default("floor_tex", "brickfloor")
set_default("wall_height", 2.0)

wall(8)
turn_right()
wall(8)
add_point_light("#ffffbb", 2.0, 2.0, 13.0)
turn_right()
wall(8)
turn_right()
wall(8)
"""


def _build_world():
    assets = Assets.default()
    assets.textures["brickwall"] = Texture.checkerboard(16, 4)
    assets.textures["brickfloor"] = Texture.checkerboard(16, 8)
    assets.textures["sky"] = Texture.from_color((60, 60, 120, 255))
    world = MapScript(assets).compile(WORLD_RXM)
    # exercise terrain + properties through the round trip
    world.terrain.set_height(2, 2, 0.6)
    world.properties.set("gravity", 9.81)
    world.properties.set("spawn", (4.0, 0.0, 4.0))
    return world, assets


def _render(world, assets, width=160, height=120):
    scene = Scene.empty()
    D3Builder().build(world, assets, scene)
    camera = D3FirstPCamera()
    camera.set_parameter_vec3("position", [4.0, 1.6, 7.0])
    camera.set_parameter_vec3("center", [4.0, 1.2, 0.0])
    rast = Rasterizer.setup(
        None, camera.view_matrix(), camera.projection_matrix(width, height)
    ).ambient([0.8, 0.8, 0.8, 1.0])
    return rast.rasterize(scene, width, height, 40, assets)


def test_map_save_load_render_identical(tmp_path):
    world, assets = _build_world()
    path = str(tmp_path / "world.json")
    save_map(world, path)
    loaded = load_map(path)

    assert len(loaded.vertices) == len(world.vertices)
    assert len(loaded.linedefs) == len(world.linedefs)
    assert len(loaded.sectors) == len(world.sectors)
    assert loaded.sky_texture == world.sky_texture
    assert loaded.terrain.sample_height(2, 2) == world.terrain.sample_height(2, 2)
    assert loaded.properties.get_float_default("gravity", 0.0) == 9.81

    f0 = _render(world, assets)
    f1 = _render(loaded, assets)
    np.testing.assert_array_equal(f0, f1)


def test_map_json_is_plain_and_stable(tmp_path):
    """The format is plain JSON (serde-compatible shape): dicts/lists/scalars
    only, and a second save of the loaded map is byte-identical."""
    world, _ = _build_world()
    blob = json.dumps(map_to_json(world), sort_keys=True)
    blob2 = json.dumps(map_to_json(map_from_json(json.loads(blob))), sort_keys=True)
    assert blob == blob2


def test_value_kinds_roundtrip():
    cases = [
        Value.bool_(True),
        Value.int_(7),
        Value.float_(2.5),
        Value.str_("hello"),
        Value(ValueKind.Vec3, (1.0, 2.0, 3.0)),
        Value(ValueKind.StrArray, ("a", "b")),
        Value.source(PixelSource.static_tile_index(3)),
        Value.light(Light(LightType.Spot).with_intensity(1.5).compile()),
        Value(
            ValueKind.TileOverrides,
            {(1, 2): PixelSource.pixel((10, 20, 30, 255))},
        ),
    ]
    for v in cases:
        rt = value_from_json(json.loads(json.dumps(value_to_json(v))))
        assert rt.kind == v.kind
        if v.kind == ValueKind.Source:
            assert rt.data.kind == v.data.kind and rt.data.index == v.data.index
        elif v.kind == ValueKind.Light:
            assert rt.data.intensity == v.data.intensity
            assert rt.data.light_type == v.data.light_type
        elif v.kind == ValueKind.TileOverrides:
            assert rt.data[(1, 2)].pixel == (10, 20, 30, 255)
        else:
            assert rt.data == v.data


def test_entity_item_roundtrip():
    from rusterix_tpu.server.entity import Entity
    from rusterix_tpu.server.item import Item

    sword = Item()
    sword.id = 42
    sword.set_attribute("name", "sword")
    sword.set_attribute("damage", 3)

    e = Entity()
    e.id = 9
    e.set_position([1.0, 0.5, 2.0])
    e.set_attribute("health", 10)
    e.set_attribute("mode", "active")
    e.inventory = [sword, None]
    e.equipped = {"hand": sword}
    e.wallet.add("gold", 25)

    rt = entity_from_json(json.loads(json.dumps(entity_to_json(e))))
    assert rt.id == 9
    np.testing.assert_allclose(rt.position, e.position)
    assert rt.attributes.get_int_default("health", 0) == 10
    assert rt.attributes.get_str_default("mode", "") == "active"
    assert rt.inventory[0].get_attribute("name").data == "sword"
    assert rt.inventory[1] is None
    assert rt.equipped["hand"].get_attribute("damage").data == 3
    assert rt.wallet.balance("gold") == 25

    it = item_from_json(json.loads(json.dumps(item_to_json(sword))))
    assert it.id == 42 and it.get_attribute("damage").data == 3


def test_server_resumes_from_snapshot(tmp_path):
    """Run the minigame, snapshot the region's entities + save the map,
    rebuild a fresh engine from the snapshot, and keep ticking."""
    rx = build_engine()
    inst = rx.server.instances[0]
    for _ in range(20):
        rx.update_server()
    player = inst.find_entity(rx.client.player_id)
    player.set_attribute("health", 7)
    player.wallet.add("gold", 3)
    snapshot = [entity_to_json(e) for e in inst.ctx.entities]
    save_map(rx.assets.maps["world"], str(tmp_path / "save.json"))
    rx.server.stop()

    # fresh engine, same assets; restore the saved entity state
    rx2 = build_engine()
    inst2 = rx2.server.instances[0]
    inst2.restore_entities(snapshot)
    p2 = inst2.find_entity(rx.client.player_id)
    assert p2 is not None
    assert p2.attributes.get_int_default("health", 0) == 7
    assert p2.wallet.balance("gold") == 3
    np.testing.assert_allclose(p2.position, player.position)

    # the restored server keeps ticking and mirrors the restored state
    for _ in range(10):
        rx2.update_server()
    world = rx2.assets.maps["world"]
    rx2.apply_entities_items(world)
    mirrored = next((e for e in world.entities if e.id == p2.id), None)
    assert mirrored is not None
    assert mirrored.attributes.get_int_default("health", 0) == 7
    rx2.server.stop()


def test_create_regions_respects_loaded_map(tmp_path):
    """A save-game map placed in assets.maps must not be clobbered by
    recompiling its map_source of the same name (review finding r2)."""
    rx = build_engine()
    world = rx.assets.maps["world"]
    world.properties.set("save_marker", 123)
    save_map(world, str(tmp_path / "w.json"))
    rx.server.stop()

    from rusterix_tpu.rusterix import Rusterix
    from rusterix_tpu.models import Texture

    rx2 = Rusterix()
    rx2.assets.textures["brickwall"] = Texture.checkerboard(16, 4)
    rx2.assets.textures["brickfloor"] = Texture.checkerboard(16, 8)
    rx2.assets.textures["sky"] = Texture.from_color((60, 60, 120, 255))
    from .test_minigame import CONFIG_TOML, MONSTER_RXE, PLAYER_RXE, PLAYER_TOML, WORLD_RXM

    rx2.assets.map_sources["world"] = WORLD_RXM  # source ALSO present
    rx2.assets.entities = {
        "Player": (PLAYER_RXE, PLAYER_TOML),
        "Monster": (MONSTER_RXE, ""),
    }
    rx2.assets.config = CONFIG_TOML
    rx2.assets.maps["world"] = load_map(str(tmp_path / "w.json"))
    rx2.create_regions()
    assert rx2.assets.maps["world"].properties.get_int_default("save_marker", 0) == 123
    assert len(rx2.server.instances) == 1
    rx2.update_server()
    rx2.server.stop()


def test_shapefx_graphs_roundtrip(tmp_path):
    """ShapeFX graphs (terrain Flatten/Colorize modifiers, ShapeFXGraphId
    sources) survive save/load — reference derives serde on ShapeFXGraph
    (shapefxgraph.rs:10)."""
    from rusterix_tpu.map import Map
    from rusterix_tpu.map.persist import load_map, save_map
    from rusterix_tpu.shapefx import ShapeFX, ShapeFXGraph, ShapeFXRole

    m = Map(name="fx")
    node = ShapeFX(ShapeFXRole.Colorize)
    node.values.set("color", 7)
    node.position = (3.0, 4.0)
    g = ShapeFXGraph(nodes=[ShapeFX(ShapeFXRole.Render), node])
    g.connections.append((0, 0, 1, 0))
    m.shapefx_graphs[g.id] = g

    path = str(tmp_path / "fx.json")
    save_map(m, path)
    m2 = load_map(path)
    g2 = m2.shapefx_graphs[g.id]
    assert [n.role for n in g2.nodes] == [ShapeFXRole.Render, ShapeFXRole.Colorize]
    assert g2.nodes[1].values.get_int_default("color", 0) == 7
    assert g2.nodes[1].position == (3.0, 4.0)
    assert g2.connections == [(0, 0, 1, 0)]


def test_currency_rounding_half_away_from_zero():
    """Rust f32::round is half-away-from-zero; Python round() is banker's —
    the port must follow the reference (currency.rs .round() calls)."""
    from rusterix_tpu.server import Currencies, Currency, Wallet, wallet_balance

    c = Currencies(base_currency="S")
    c.add_currency(Currency("Silver", "S", 1.0))
    c.add_currency(Currency("Odd", "O", 0.5))
    w = Wallet()
    w.balances = {"O": 5}  # 5 * 0.5 = 2.5 -> rounds to 3, not banker's 2
    assert wallet_balance(w, c) == 3
    assert c.convert_to_base(5, "O") == 3
    assert c.convert_from_base(3, "O") == 6
