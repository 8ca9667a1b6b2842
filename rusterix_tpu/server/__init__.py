from .collision import (
    BlockingVolume,
    ChunkCollision,
    CollisionWorld,
    DynamicOpening,
    OpeningType,
    WalkableFloor,
)
from .entity import Entity, EntityUpdate
from .item import Item, ItemUpdate, Wallet
from .message import (
    Choice,
    EntityAction,
    EntityActionKind,
    MultipleChoice,
    PlayerCamera,
    RegionMessage,
    RegionMessageKind,
)

__all__ = [
    "BlockingVolume",
    "ChunkCollision",
    "CollisionWorld",
    "DynamicOpening",
    "OpeningType",
    "WalkableFloor",
    "Entity",
    "EntityUpdate",
    "Item",
    "ItemUpdate",
    "Wallet",
    "Choice",
    "EntityAction",
    "EntityActionKind",
    "MultipleChoice",
    "PlayerCamera",
    "RegionMessage",
    "RegionMessageKind",
]
