"""Currency system (reference src/server/currency.rs) and TOML class-data
specials (src/server/data.rs)."""

import numpy as np
import pytest

from rusterix_tpu.map.value import ValueKind
from rusterix_tpu.models.batch import PixelSourceKind
from rusterix_tpu.server import (
    Currencies,
    Currency,
    CurrencyError,
    Wallet,
    apply_entity_data,
    apply_item_data,
    wallet_add,
    wallet_add_base,
    wallet_balance,
    wallet_can_afford,
    wallet_spend,
)
from rusterix_tpu.server.entity import Entity
from rusterix_tpu.server.item import Item


def _coins():
    c = Currencies(base_currency="G")
    c.add_currency(Currency("Gold", "G", 1.0, max_limit=99))
    c.add_currency(Currency("Platinum", "P", 100.0))
    return c


def test_wallet_overflow_carries_into_higher_denomination():
    c = _coins()
    w = Wallet()
    wallet_add(w, "G", 250, c)
    # 99 gold cap, the remaining 151 G converts to platinum (rounded)
    assert w.balances["G"] == 99
    assert w.balances["P"] == 2
    assert wallet_balance(w, c) == 99 + 200


def test_wallet_spend_drains_high_value_first():
    c = _coins()
    w = Wallet()
    w.balances = {"G": 50, "P": 3}
    # reference semantics (currency.rs:129-157): the spend is rounded to
    # whole units of each denomination, so a 120-base spend deducts 1 P
    # (= 100 base) and considers the 120 satisfied
    wallet_spend(w, 120, c)
    assert w.balances["P"] == 2
    assert w.balances["G"] == 50
    # an exactly-divisible spend drains denominations high-to-low
    wallet_spend(w, 210, c)
    assert w.balances["P"] == 0
    assert w.balances["G"] == 40
    assert wallet_can_afford(w, 40, c)
    assert not wallet_can_afford(w, 10_000, c)
    # a failed spend raises (and, like the reference, leaves the wallet
    # partially drained — currency.rs:152-155 checks AFTER deducting)
    with pytest.raises(CurrencyError):
        wallet_spend(w, 10_000, c)


def test_wallet_add_base_and_negative_rejected():
    c = _coins()
    w = Wallet()
    wallet_add_base(w, 42, c)
    assert w.balances["G"] == 42
    with pytest.raises(CurrencyError):
        wallet_add(w, "G", -1, c)


def test_apply_entity_data_specials():
    e = Entity()
    apply_entity_data(
        e,
        """
[attributes]
health = 10
name = "Orc"
tile_id = "abc-123"

[light]
strength = 2.5
range = 6.0
color = "#FF8000"
flicker = 0.3
""",
    )
    assert e.attributes.get_int_default("health", 0) == 10
    src = e.attributes.get("source").data
    assert src.kind == PixelSourceKind.TileId and src.uuid == "abc-123"
    light = e.attributes.get("light").data
    assert light.intensity == 2.5 and light.end_distance == 6.0
    assert light.flicker == pytest.approx(0.3)
    np.testing.assert_allclose(light.color, [1.0, 128 / 255, 0.0], atol=1e-3)


def test_apply_item_data_specials():
    it = Item()
    apply_item_data(
        it,
        """
[attributes]
slots = ["hand", "belt"]
color = "#00FF00"
animation = "Up"
animation_clock = "Smooth"
animation_duration = "1.5"
weight = 2
""",
    )
    assert it.attributes.get("slots").kind == ValueKind.StrArray
    assert it.attributes.get("slots").data == ("hand", "belt")
    assert it.attributes.get("color").data == (0.0, 1.0, 0.0)
    assert it.attributes.get_int_default("billboard_animation", -1) == 1
    assert it.attributes.get_str_default("animation_clock", "") == "smooth"
    assert it.attributes.get_float_default("animation_duration", 0.0) == 1.5
    assert it.attributes.get_int_default("weight", 0) == 2
