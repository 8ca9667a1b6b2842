"""Collision tests ported from the reference suite
(src/collision_world.rs:701-757) plus entity delta-protocol tests."""

import numpy as np

from rusterix_tpu.server import (
    BlockingVolume,
    ChunkCollision,
    CollisionWorld,
    Entity,
    EntityUpdate,
    Item,
    Wallet,
)
from rusterix_tpu.server.collision import DynamicOpening, OpeningType


def test_aabb_collision():
    # reference collision_world.rs:705-714
    world = CollisionWorld(10)
    mn = np.array([4.0, 0.0, 4.0])
    mx = np.array([6.0, 2.0, 6.0])
    assert world.collides_with_aabb([5.0, 1.0, 5.0], 0.5, mn, mx)
    assert not world.collides_with_aabb([10.0, 1.0, 5.0], 0.5, mn, mx)


def test_point_in_polygon():
    # reference collision_world.rs:716-728
    world = CollisionWorld(10)
    polygon = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    assert world.point_in_polygon_2d((5.0, 5.0), polygon, 0.0)
    assert not world.point_in_polygon_2d((15.0, 5.0), polygon, 0.0)


def test_door_state():
    # reference collision_world.rs:730-742
    world = CollisionWorld(10)
    door = ("sector", 1)
    world.set_opening_state(door, False)
    assert not world.get_opening_state(door).is_passable
    world.set_opening_state(door, True)
    assert world.get_opening_state(door).is_passable


def test_move_distance_slides_along_wall():
    # reference collision_world.rs:744-763
    world = CollisionWorld(10)
    chunk = ChunkCollision()
    chunk.static_volumes.append(
        BlockingVolume(
            geo_id=("sector", 1),
            min=np.array([1.0, 0.0, -2.0], np.float32),
            max=np.array([1.1, 2.0, 2.0], np.float32),
        )
    )
    world.update_chunk((0, 0), chunk)

    end, blocked = world.move_distance(
        np.zeros(3, np.float32), np.array([2.0, 0.0, 1.0], np.float32), 0.5
    )
    assert blocked
    assert end[0] < 0.6
    assert end[2] > 0.7


def test_move_unobstructed():
    world = CollisionWorld(10)
    end, blocked = world.move_distance(
        np.zeros(3, np.float32), np.array([1.0, 0.0, 1.0], np.float32), 0.5
    )
    assert not blocked
    assert np.allclose(end, [1.0, 0.0, 1.0])


def test_passable_opening_allows_movement():
    world = CollisionWorld(10)
    chunk = ChunkCollision()
    chunk.static_volumes.append(
        BlockingVolume(
            geo_id=("wall", 1),
            min=np.array([2.0, 0.0, -5.0], np.float32),
            max=np.array([2.2, 3.0, 5.0], np.float32),
        )
    )
    chunk.dynamic_openings.append(
        DynamicOpening(
            geo_id=("door", 1),
            boundary_2d=[
                np.array([1.8, -1.0]),
                np.array([2.4, -1.0]),
                np.array([2.4, 1.0]),
                np.array([1.8, 1.0]),
            ],
            opening_type=OpeningType.Door,
        )
    )
    world.update_chunk((0, 0), chunk)
    # door defaults open -> target inside opening is allowed
    end, blocked = world.move_distance(
        np.array([1.0, 1.0, 0.0], np.float32),
        np.array([1.1, 0.0, 0.0], np.float32),
        0.3,
    )
    assert not blocked
    # close the door -> blocked
    world.set_opening_state(("door", 1), False)
    end, blocked = world.move_distance(
        np.array([1.0, 1.0, 0.0], np.float32),
        np.array([1.1, 0.0, 0.0], np.float32),
        0.3,
    )
    assert blocked


# ---- entity delta protocol (entity.rs:458-681) ----


def test_entity_dirty_delta_roundtrip():
    e = Entity()
    e.id = 7
    e.set_position([1.0, 2.0, 3.0])
    e.set_attribute("name", "Orc")
    e.turn_left(90.0)

    assert e.is_dirty()
    update = e.get_update()
    packed = update.pack()
    restored = EntityUpdate.unpack(packed)

    mirror = Entity()
    mirror.id = 7
    mirror.apply_update(restored)
    assert np.allclose(mirror.position, [1.0, 2.0, 3.0])
    assert mirror.attributes.get_str_default("name", "") == "Orc"
    assert np.allclose(mirror.orientation, e.orientation)

    e.clear_dirty()
    assert not e.is_dirty()
    assert e.get_update().position is None  # sparse: nothing dirty


def test_entity_movement_helpers():
    e = Entity()
    e.face_north()
    assert np.allclose(e.orientation, [0, -1])
    p = e.move_forward(2.0)
    assert np.allclose(p, [0, -2])
    e.face_at([10.0, 0.0])
    assert np.allclose(e.orientation, [1, 0], atol=1e-6)
    f = e.forward()
    assert np.allclose(f, [1, 0, 0], atol=1e-6)


def test_entity_inventory_and_wallet():
    e = Entity()
    sword = Item()
    sword.id = 1
    sword.set_attribute("name", "sword")
    slot = e.add_item(sword)
    assert slot == 0
    update = e.get_update()
    assert update.inventory_additions is not None
    e.clear_dirty()
    e.equip("hand", sword)
    assert e.get_update().equipped_updates is not None
    got = e.remove_item(0)
    assert got is sword

    w = Wallet()
    w.add("gold", 10)
    assert w.spend("gold", 4)
    assert w.balance("gold") == 6
    assert not w.spend("gold", 100)


def test_entity_apply_update_wrong_id_rejected():
    e = Entity()
    e.id = 1
    assert not e.apply_update(EntityUpdate(id=2))
