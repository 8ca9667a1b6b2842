"""MultipleChoice UI loop end-to-end (round-2 verdict missing #1).

A trader offers its inventory via offer_inventory(); the server mirrors the
MultipleChoice to the client, the MessagesWidget renders a numbered menu +
cancel entry and builds the key->Choice map, and key/touch answers route
back to the owning region where the purchase (or goodbye) executes.

Reference: src/server/region_host.rs:863-898 (offer_inventory),
src/client/widget/messages.rs:110-208,315-328 (menu render + choice map +
touch), src/client/mod.rs:909-930,1463-1477 (mirror + key intercept),
src/server/region.rs:1285-1352 (ItemToSell / Cancel consumption).
"""

import numpy as np

from rusterix_tpu.models import Texture
from rusterix_tpu.rusterix import Rusterix

WORLD_RXM = """
set_default("wall_tex", "brickwall")
set_default("floor_tex", "brickwall")
set_default("wall_height", 2.0)

wall(12)
turn_right()
wall(12)
turn_right()
wall(12)
turn_right()
wall(12)

move_to(8, 8.5)
add_entity("Trader", "Trader", "brickwall")

move_to(4, 4.5)
add_entity("Shabby", "Player", "brickwall")
"""

PLAYER_RXE = """
fn event(name, value) {
}

fn user_event(name, value) {
    match name {
        "key_down" {
            if value == "w" { action("forward"); }
        }
        "key_up" { action("none"); }
        _ { }
    }
}
"""

PLAYER_TOML = """
[attributes]
player = true
wealth = 10
inventory_slots = 4
"""

TRADER_RXE = """
fn event(name, value) {
    if name == "startup" {
        add_item("Sword");
        add_item("Apple");
    }
    if name == "talk" {
        offer_inventory(value, "");
    }
    if name == "goodbye" {
        set_attr("said_goodbye", 1);
    }
}
"""

SWORD_TOML = '[attributes]\nname = "Sword"\nworth = 5\n'
APPLE_TOML = '[attributes]\nname = "Apple"\nworth = 1\n'

CONFIG_TOML = """
[game]
start_region = "world"
auto_create_player = true
player_class = "Player"
"""


def build_engine() -> Rusterix:
    rx = Rusterix()
    rx.assets.textures["brickwall"] = Texture.checkerboard(16, 4)
    rx.assets.map_sources["world"] = WORLD_RXM
    rx.assets.entities = {
        "Player": (PLAYER_RXE, PLAYER_TOML),
        "Trader": (TRADER_RXE, ""),
    }
    rx.assets.items = {
        "Sword": ("", SWORD_TOML),
        "Apple": ("", APPLE_TOML),
    }
    rx.assets.config = CONFIG_TOML
    rx.create_regions()
    rx.setup_client()
    return rx


def _trader(rx):
    inst = rx.server.instances[0]
    for e in inst.ctx.entities:
        if e.get_attr_string("class_name") == "Trader":
            return inst, e
    raise AssertionError("no trader spawned")


def _offer(rx):
    """Trigger the trader's talk event and pump the engine so the choice
    reaches the client."""
    inst, trader = _trader(rx)
    world = rx.assets.maps["world"]
    rx.update_server()
    rx.apply_entities_items(world)  # mirror inventories for menu labels
    inst.run_entity_event(trader, "talk", float(rx.client.player_id))
    rx.update_server()
    return inst, trader


def test_offer_arms_choice_map_and_renders_menu():
    rx = build_engine()
    _offer(rx)

    cmap = rx.client.choice_map
    assert cmap is not None
    assert set(cmap) == {"0", "1", "2"}
    assert cmap["0"].kind == "cancel"
    assert cmap["1"].kind == "item_to_sell"
    assert cmap["2"].kind == "item_to_sell"

    texts = rx.client.messages_widget.messages
    assert any(t.startswith("1) Sword") and t.endswith("5G") for t in texts)
    assert any(t.startswith("2) Apple") and t.endswith("1G") for t in texts)
    assert any(t.startswith("0)") for t in texts)
    rx.server.stop()


def test_key_answer_buys_item_and_moves_currency():
    rx = build_engine()
    inst, trader = _offer(rx)
    player = inst.find_entity(rx.client.player_id)
    assert player.wallet.balances.get("G") == 10  # seeded wealth

    rx.local_player_event("key_down", "1")  # buy the Sword (worth 5)
    rx.update_server()

    names = [i.name() for _, i in player.iter_inventory()]
    assert "Sword" in names
    assert "Sword" not in [i.name() for _, i in trader.iter_inventory()]
    assert player.wallet.balances.get("G") == 5
    assert trader.wallet.balances.get("G") == 5
    # buyer got the purchase message on the next drain, with the item token
    # resolved from the mirrored inventory ({I:<id>.name, article=indef,
    # case=lower} -> "a sword"; "you_bought" stays a raw locale key here)
    rx.update_server()
    rx.apply_entities_items(rx.assets.maps["world"])
    rx.process_messages()
    assert any("a sword" in m[1] for m in rx.client.messages), rx.client.messages
    rx.server.stop()


def test_cant_afford_is_refused():
    rx = build_engine()
    inst, trader = _offer(rx)
    player = inst.find_entity(rx.client.player_id)
    player.wallet.balances["G"] = 2  # cheaper than the Sword's worth=5

    rx.local_player_event("key_down", "1")
    rx.update_server()

    assert "Sword" not in [i.name() for _, i in player.iter_inventory()]
    assert "Sword" in [i.name() for _, i in trader.iter_inventory()]
    rx.server.stop()


def test_cancel_disarms_menu_and_fires_goodbye():
    rx = build_engine()
    inst, trader = _offer(rx)
    assert rx.client.choice_map is not None

    rx.local_player_event("key_down", "0")
    rx.update_server()

    assert rx.client.choice_map is None
    assert trader.attributes.get_int_default("said_goodbye", 0) == 1
    rx.server.stop()


def test_touch_answer_on_menu_entry():
    rx = build_engine()
    inst, trader = _offer(rx)
    player = inst.find_entity(rx.client.player_id)

    w = rx.client.messages_widget
    from rusterix_tpu.utils.rect import Rect

    w.rect = Rect(0, 0, 200, 100)
    buf = np.zeros((100, 200, 4), np.uint8)
    w.draw(buf)  # records per-entry rects

    entry = next(e for e in w.entries if e.text.startswith("1) Sword"))
    hit = rx.client.touch_down(
        entry.rect.x + 2, entry.rect.y + 2, rx.server, 200, 100
    )
    assert hit is not None and hit[0] == "choice"
    rx.update_server()
    assert "Sword" in [i.name() for _, i in player.iter_inventory()]
    rx.server.stop()


def test_missing_seller_is_silent():
    """A despawned seller (or stale seller_id) between offer and answer is
    SILENT: region.rs:1309-1332 only messages the buyer on a genuine failed
    affordability check — price 0 with no seller must not say cant_afford."""
    rx = build_engine()
    inst, trader = _offer(rx)
    player = inst.find_entity(rx.client.player_id)
    inst.ctx.entities.remove(trader)  # seller despawns before the answer

    rx.local_player_event("key_down", "1")
    rx.update_server()

    assert "Sword" not in [i.name() for _, i in player.iter_inventory()]
    assert player.wallet.balances.get("G") == 10  # untouched
    assert not any(
        "cant_afford" in str(m.message)
        for m in inst.out_messages
        if getattr(m, "message", None)
    )
    rx.server.stop()
