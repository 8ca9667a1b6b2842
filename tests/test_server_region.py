"""Server/region integration: multi-region queues, script events, actions,
delta mirroring, transfer — exercised in-process like the reference
(SURVEY.md §4: multi-region behavior over real channels)."""

import numpy as np

from rusterix_tpu.builders import compile_source_map
from rusterix_tpu.server import EntityAction, EntityActionKind
from rusterix_tpu.server.server import Server, ServerState

PLAYER_RXE = """
fn event(name, value) {
    if name == "startup" {
        set_attr("health", 10);
    }
    if name == "took_damage" {
        set_attr("health", get_attr("health") - value);
    }
}

fn user_event(name, value) {
    match name {
        "key_down" {
            if value == "w" { action("forward"); }
            if value == "s" { action("backward"); }
        }
        "key_up" { action("none"); }
        _ { }
    }
}
"""

PLAYER_TOML = """
[attributes]
player = true
"""

MONSTER_RXE = """
fn event(name, value) {
    if name == "startup" {
        set_attr("health", 5);
        random_walk(2.0, 1.0, 1.0);
    }
}
"""

WORLD = """
set_default("wall_height", 2.0)
wall(15)
turn_right()
wall(15)
turn_right()
wall(15)
turn_right()
wall(15)
move_to(10, 10)
add_entity("Orc", "Monster", "wall")
move_to(4, 4)
add_entity("Hero", "Player", "wall")
"""


def make_server():
    m = compile_source_map(WORLD)
    m.name = "world"
    server = Server()
    server.create_region_instance(
        "world",
        m,
        entities={
            "Player": (PLAYER_RXE, PLAYER_TOML),
            "Monster": (MONSTER_RXE, ""),
        },
    )
    server.start()
    return server, m


def test_region_init_strips_players_spawns_monsters():
    server, m = make_server()
    inst = server.instances[0]
    assert len(inst.ctx.entities) == 1  # only the monster
    monster = inst.ctx.entities[0]
    assert monster.get_attr_string("class_name") == "Monster"
    # startup script ran: health set + random walk action armed
    assert monster.attributes.get_float_default("health", 0) == 5.0
    assert monster.action is not None
    assert monster.action.kind == EntityActionKind.RandomWalk


def test_player_register_and_input_roundtrip():
    server, m = make_server()
    pid = server.register_player("world", "Player", [4.0, 1.0, 4.0])
    assert pid is not None
    inst = server.instances[0]
    player = inst.find_entity(pid)
    assert player is not None
    assert player.attributes.get_bool_default("player", False)
    assert player.attributes.get_float_default("health", 0) == 10.0

    start = player.position.copy()
    server.local_player_event(pid, "key_down", "w")
    for _ in range(10):
        inst.redraw_tick()
    assert not np.allclose(player.position, start)  # moved forward

    server.local_player_event(pid, "key_up", "w")
    inst.redraw_tick()
    assert player.action.kind == EntityActionKind.Off


def test_delta_mirror_flow():
    server, m = make_server()
    pid = server.register_player("world", "Player", [4.0, 1.0, 4.0])
    inst = server.instances[0]
    server.local_player_action(pid, EntityAction(EntityActionKind.Forward))
    for _ in range(5):
        inst.redraw_tick()
    server.update()
    mirror = server.entities[inst.ctx.region_id]
    me = next(e for e in mirror if e.id == pid)
    live = inst.find_entity(pid)
    assert np.allclose(me.position, live.position)

    server.apply_entities_items(m)
    assert any(e.id == pid for e in m.entities)


def test_wall_collision_blocks_player():
    server, m = make_server()
    pid = server.register_player("world", "Player", [1.0, 1.0, 4.0])
    inst = server.instances[0]
    player = inst.find_entity(pid)
    player.face_west()  # wall at x=0
    server.local_player_action(pid, EntityAction(EntityActionKind.Forward))
    for _ in range(120):
        inst.redraw_tick()
    assert player.position[0] > 0.2  # held off the wall by its radius


def test_script_damage_event():
    server, m = make_server()
    inst = server.instances[0]
    monster = inst.ctx.entities[0]
    inst.queue_event(monster.id, "took_damage", 2.0)
    # Monster has no took_damage handler — use player
    pid = server.register_player("world", "Player", [4.0, 1.0, 4.0])
    inst.queue_event(pid, "took_damage", 3.0)
    inst.redraw_tick()
    player = inst.find_entity(pid)
    assert player.attributes.get_float_default("health", 0) == 7.0


def test_multi_region_transfer():
    m1 = compile_source_map("set_default(\"wall_height\", 2.0)\nwall(8)\nturn_right()\nwall(8)\nturn_right()\nwall(8)\nturn_right()\nwall(8)\n")
    m1.name = "region_a"
    m2 = compile_source_map("set_default(\"wall_height\", 2.0)\nwall(8)\nturn_right()\nwall(8)\nturn_right()\nwall(8)\nturn_right()\nwall(8)\n")
    m2.name = "region_b"
    server = Server()
    server.create_region_instance("region_a", m1, entities={"Player": (PLAYER_RXE, PLAYER_TOML)})
    server.create_region_instance("region_b", m2, entities={"Player": (PLAYER_RXE, PLAYER_TOML)})
    server.start()
    pid = server.register_player("region_a", "Player", [2.0, 1.0, 2.0])
    inst_a = server.instances[0]
    inst_b = server.instances[1]
    player = inst_a.find_entity(pid)

    from rusterix_tpu.server.message import RegionMessage

    inst_a.inbox.put(
        RegionMessage.transfer_entity(0, player, "region_b", [3.0, 1.0, 3.0])
    )
    inst_a.redraw_tick()
    server.update()
    assert inst_a.find_entity(pid) is None
    assert inst_b.find_entity(pid) is not None
    assert server.local_players[pid] == inst_b.ctx.region_id


def test_lifecycle_pause_continue():
    server, m = make_server()
    pid = server.register_player("world", "Player", [4.0, 1.0, 4.0])
    inst = server.instances[0]
    player = inst.find_entity(pid)
    server.local_player_action(pid, EntityAction(EntityActionKind.Forward))
    server.pause()
    inst.redraw_tick()
    start = player.position.copy()
    inst.redraw_tick()
    assert np.allclose(player.position, start)  # paused: no movement
    server.cont()
    inst.redraw_tick()
    inst.redraw_tick()
    assert not np.allclose(player.position, start)


def test_notifications_and_time():
    server, m = make_server()
    pid = server.register_player("world", "Player", [4.0, 1.0, 4.0])
    inst = server.instances[0]
    player = inst.find_entity(pid)
    # schedule a future damage via notify_in host call through a script event
    inst.host.entity = player
    from rusterix_tpu.vm import VMValue

    inst.host.h_notify_in([VMValue.broadcast(2.0), VMValue.from_string("took_damage")], None)
    inst.host.entity = None
    t0 = inst.ctx.game_time
    inst.system_tick()
    assert inst.ctx.game_time == t0 + 1.0
    assert player.attributes.get_float_default("health", 0) == 10.0
    inst.system_tick()  # now the notification fires (value None -> 0 damage)
    assert inst.ctx.notifications == []


def _make_region_with_player():
    server, m = make_server()
    pid = server.register_player("world", "Player", [4.0, 1.0, 4.0])
    inst = server.instances[0]
    return inst, inst.find_entity(pid)


def test_new_host_builtins():
    """id / is_entity / is_item / distance_to / list_get / drop_items /
    set_debug_loc (region_host.rs:106-950)."""
    from rusterix_tpu.server.item import Item as _Item
    from rusterix_tpu.vm import VMValue

    region, player = _make_region_with_player()
    host = region.host
    host.entity = player

    assert host.h_id([], None).x == float(player.id)
    assert host.h_is_entity([VMValue.broadcast(float(player.id))], None).x == 1.0
    assert host.h_is_entity([VMValue.broadcast(9999.0)], None).x == 0.0

    # world item + is_item + distance_to
    item = _Item()
    item.id = 4242
    item.set_position(player.position + 3.0)
    region.ctx.items.append(item)
    assert host.h_is_item([VMValue.broadcast(4242.0)], None).x == 1.0
    d = host.h_distance_to([VMValue.broadcast(4242.0)], None).x
    assert abs(d - (2.0 * 9.0) ** 0.5) < 1e-4  # 3 in x and 3 in z

    # list_get
    v = host.h_list_get([VMValue.from_string("a,b,c"), VMValue.broadcast(1.0)], None)
    assert v.as_string() == "b"
    assert host.h_list_get([VMValue.from_string("a"), VMValue.broadcast(5.0)], None).x == 0.0

    # drop_items with filter
    sword = _Item()
    sword.id = 1
    sword.attributes.set("name", "iron sword")
    shield = _Item()
    shield.id = 2
    shield.attributes.set("name", "shield")
    player.add_item(sword)
    player.add_item(shield)
    host.h_drop_items([VMValue.from_string("sword")], None)
    names = [
        i.attributes.get_str_default("name", "")
        for i in player.inventory
        if i is not None
    ]
    assert "iron sword" not in names and "shield" in names
    assert any(i.id == 1 for i in region.ctx.items)

    # is_item finds inventory items too
    assert host.h_is_item([VMValue.broadcast(2.0)], None).x == 1.0

    host.h_set_debug_loc(
        [VMValue.from_string("startup"), VMValue.broadcast(2.0), VMValue.broadcast(3.0)],
        None,
    )
    assert region.ctx.curr_debug_loc == ("startup", 2, 3)
