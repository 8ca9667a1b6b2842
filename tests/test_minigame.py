"""Minigame end-to-end: the full engine loop (reference examples/minigame.rs)
— assets -> regions -> client -> input -> server tick -> billboard build ->
device render."""

import numpy as np

from rusterix_tpu.client import Client, ClientConfig, Daylight, Draw2D, MsgParser
from rusterix_tpu.models import Texture, Tile
from rusterix_tpu.rusterix import Rusterix

WORLD_RXM = """
set("sky_tex", "sky")
set_default("wall_tex", "brickwall")
set_default("floor_tex", "brickfloor")
set_default("wall_height", 2.0)

box_size = 15

wall(box_size)
turn_right()
wall(box_size)
turn_right()
wall(box_size)
add_point_light("#ffffbb", 2.0, 2.0, 13.0)
turn_right()
wall(box_size)

move_to(10, 10.5)
add_entity("Orc", "Monster", "brickwall")

move_to(6, 4.5)
add_entity("Shabby", "Player", "brickwall")
"""

PLAYER_RXE = """
fn event(name, value) {
    if name == "startup" {
        set_attr("health", 10);
    }
}

fn user_event(name, value) {
    match name {
        "key_down" {
            if value == "w" { action("forward"); }
            if value == "a" { action("left"); }
            if value == "d" { action("right"); }
            if value == "s" { action("backward"); }
        }
        "key_up" { action("none"); }
        _ { }
    }
}
"""

PLAYER_TOML = "[attributes]\nplayer = true\n"

MONSTER_RXE = """
fn event(name, value) {
    if name == "startup" {
        random_walk(2.0, 1.0, 1.0);
    }
}
"""

CONFIG_TOML = """
[viewport]
width = 160
height = 120

[game]
target_fps = 30
game_tick_ms = 250
start_region = "world"
auto_create_player = true
player_class = "Player"
"""


def build_engine() -> Rusterix:
    rx = Rusterix()
    rx.assets.textures["brickwall"] = Texture.checkerboard(16, 4)
    rx.assets.textures["brickfloor"] = Texture.checkerboard(16, 8)
    rx.assets.textures["sky"] = Texture.from_color((60, 60, 120, 255))
    rx.assets.map_sources["world"] = WORLD_RXM
    rx.assets.entities = {
        "Player": (PLAYER_RXE, PLAYER_TOML),
        "Monster": (MONSTER_RXE, ""),
    }
    rx.assets.config = CONFIG_TOML
    rx.create_regions()
    rx.setup_client()
    return rx


def test_minigame_boot_and_player():
    rx = build_engine()
    assert rx.client.player_id is not None
    inst = rx.server.instances[0]
    assert len(inst.ctx.entities) == 2  # player + monster
    assert not inst.ctx.startup_errors


def test_minigame_frame_loop_renders():
    rx = build_engine()
    world = rx.assets.maps["world"]

    # a few engine ticks
    for _ in range(3):
        rx.update_server()
        rx.apply_entities_items(world)
        rx.build_entities_items_d3(world)

    frame = rx.draw_scene(world, 160, 120, ambient=[0.4, 0.4, 0.4, 1.0])
    assert frame.shape == (120, 160, 4)
    # geometry covers most of the view (player spawns inside the room) and
    # the checkerboard gives at least light/dark texel classes
    drawn = (frame[..., 3] == 255).sum()
    assert drawn > 5000
    assert len(np.unique(frame.reshape(-1, 4), axis=0)) >= 3


def test_minigame_input_moves_player():
    rx = build_engine()
    world = rx.assets.maps["world"]
    inst = rx.server.instances[0]
    player = inst.find_entity(rx.client.player_id)
    start = player.position.copy()

    rx.local_player_event("key_down", "w")
    for _ in range(10):
        rx.update_server()
    assert not np.allclose(player.position, start)

    rx.local_player_event("key_up", "w")
    rx.update_server()

    # camera follows the player
    rx.apply_entities_items(world)
    cam = rx.client.camera_d3
    assert np.allclose(cam.position_v, player.position, atol=1e-5)


def test_minigame_monster_wanders_and_mirrors():
    rx = build_engine()
    world = rx.assets.maps["world"]
    inst = rx.server.instances[0]
    monster = next(
        e for e in inst.ctx.entities if e.get_attr_string("class_name") == "Monster"
    )
    start = monster.position.copy()
    for _ in range(60):
        rx.update_server()
    assert not np.allclose(monster.position, start)
    rx.apply_entities_items(world)
    mirrored = next(
        (e for e in world.entities if e.id == monster.id), None
    )
    assert mirrored is not None
    assert np.allclose(mirrored.position, monster.position)


def test_billboards_built_for_entities():
    rx = build_engine()
    world = rx.assets.maps["world"]
    rx.update_server()
    rx.apply_entities_items(world)
    rx.build_entities_items_d3(world)
    # monster billboard present (player excluded in first person)
    assert len(rx.client.scene.d3_dynamic) == 1
    batch = rx.client.scene.d3_dynamic[0]
    assert len(batch.indices) == 2  # one quad


def test_client_config_parsing():
    cfg = ClientConfig.parse(CONFIG_TOML)
    assert cfg.width == 160 and cfg.height == 120
    assert cfg.target_fps == 30
    assert cfg.game_tick_ms == 250
    assert cfg.start_region == "world"
    assert cfg.auto_create_player


def test_daylight_cycle():
    d = Daylight()
    assert d.daylight_intensity(0) == 0.0  # midnight
    assert d.daylight_intensity(12 * 60) == 1.0  # noon
    assert 0.0 < d.daylight_intensity(d.sunrise + 30) < 1.0
    noon = d.daylight(12 * 60, 0.0, 1.0)
    night = d.daylight(0, 0.0, 1.0)
    assert noon.sum() > night.sum()
    sun = d.calculate_light_direction(12 * 60)
    assert sun[1] > 0.5  # high at noon


def test_msg_parser():
    p = MsgParser()
    toks = p.parse("You see {E:20.name,article=def} with {N:50,unit=hp}.")
    kinds = [t.kind for t in toks]
    assert kinds == ["plain", "entity", "plain", "num", "plain"]

    class E:
        id = 20

        class attributes:
            @staticmethod
            def get_str_default(k, d):
                return "orc"

    out = p.render("You see {E:20.name,article=def}!", entities=[E()])
    assert out == "You see the orc!"
    assert p.render("{F:3.14159,precision=2}") == "3.14"


def test_msg_parser_en_locale_articles():
    """EnLocale article rules (resolver.rs:20-90): a/an with exception
    prefixes, 'a pair of' for pair items, 'some' for mass nouns, and the
    long article option spellings."""
    p = MsgParser()

    def ent(name):
        class E:
            id = 7

            class attributes:
                @staticmethod
                def get_str_default(k, d, _n=name):
                    return _n

        return E()

    def indef(name):
        return p.render("{E:7.name,article=indef}", entities=[ent(name)])

    assert indef("orc") == "an orc"
    assert indef("sword") == "a sword"
    assert indef("hourglass") == "an hourglass"  # 'hour' exception
    assert indef("unicorn") == "a unicorn"  # 'uni' exception
    assert indef("boots") == "a pair of boots"
    assert indef("armor") == "some armor"
    # long spellings + definite (resolver.rs:67-73)
    e = ent("orc")
    assert p.render("{E:7.name,article=definite}", entities=[e]) == "the orc"
    assert p.render("{E:7.name,article=indefinite}", entities=[e]) == "an orc"
    assert p.render("{E:7.name,article=none}", entities=[e]) == "orc"


def test_msg_parser_case_space_and_degrade():
    """apply_case spellings (resolver.rs:207-272), wordy auto-spacing
    (:192-200 — templates need no literal spaces between tokens), quoted
    option values, and malformed N:/F:/refs degrading to text keys
    (parser.rs:85-136)."""
    p = MsgParser()
    loc = {"hello world": "hello world"}
    assert p.render("{hello world,case=title}", locale=loc) == "Hello World"
    assert p.render("{hello world,case=ucfirst}", locale=loc) == "Hello world"
    assert (
        p.render("{hello world,case=uppercase}", locale=loc) == "HELLO WORLD"
    )
    # quoted option values (parser.rs:171-176)
    assert p.render('{N:3,unit="hp"}') == "3 hp"
    # float unit (resolver.rs:289-299)
    assert p.render("{F:2.5,precision=1,unit=kg}") == "2.5 kg"
    # auto-space between adjacent wordy tokens; none next to punctuation
    assert p.render("{you,case=ucfirst}{win}!", locale={}) == "You win!"
    # malformed payloads degrade to text keys instead of raising
    assert p.render("{N:abc}") == "N:abc"
    assert p.render("{F:xyz}") == "F:xyz"
    assert p.render("{E:notanid.name}") == "E:notanid.name"


def test_draw2d_primitives():
    d = Draw2D()
    buf = np.zeros((64, 64, 4), np.uint8)
    d.rect(buf, 4, 4, 10, 10, (255, 0, 0, 255))
    assert (buf[8, 8] == [255, 0, 0, 255]).all()
    d.rect_outline(buf, 20, 20, 10, 10, (0, 255, 0, 255))
    assert (buf[20, 25] == [0, 255, 0, 255]).all()
    assert (buf[25, 25] == [0, 0, 0, 0]).all()
    d.line(buf, 0, 40, 63, 40, (0, 0, 255, 255))
    assert (buf[40, 30] == [0, 0, 255, 255]).all()
    d.disc(buf, 50, 50, 5, (255, 255, 0, 255))
    assert (buf[50, 50] == [255, 255, 0, 255]).all()
    src = np.full((8, 8, 4), 77, np.uint8)
    d.blit(buf, src, 0, 0)
    assert (buf[2, 2] == 77).all()
    d.text(buf, 2, 54, "hi", (255, 255, 255, 255), 10)
    assert buf[54:64, 0:16].any()
