"""Game UI widgets (reference src/client/widget/).

GameWidget pumps incremental chunk builds into the scene and draws the 3D
viewport (widget/game.rs); ScreenWidget renders 2D "screen maps" through the
rasterizer (widget/screen.rs:81); TextWidget/MessagesWidget draw text via
Draw2D.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from ..utils.rect import Rect
from .draw2d import Draw2D


@dataclass
class Widget:
    rect: Rect = field(default_factory=Rect)
    visible: bool = True

    def draw(self, buf: np.ndarray, ctx) -> None:
        pass


@dataclass
class TextWidget(Widget):
    """widget/text.rs — a text label."""

    text: str = ""
    color: Tuple[int, int, int, int] = (255, 255, 255, 255)
    size: int = 12
    centered: bool = True

    def draw(self, buf: np.ndarray, ctx=None) -> None:
        if not self.visible or not self.text:
            return
        d = Draw2D()
        if self.centered:
            d.text_centered(
                buf,
                (int(self.rect.x), int(self.rect.y), int(self.rect.width), int(self.rect.height)),
                self.text,
                self.color,
                self.size,
            )
        else:
            d.text(buf, int(self.rect.x), int(self.rect.y), self.text, self.color, self.size)


@dataclass
class DecoWidget(Widget):
    """widget/deco.rs — a colored/textured rectangle decoration."""

    color: Tuple[int, int, int, int] = (40, 40, 48, 255)
    texture: Optional[np.ndarray] = None  # (h, w, 4) u8
    outline: Optional[Tuple[int, int, int, int]] = None

    def draw(self, buf: np.ndarray, ctx=None) -> None:
        if not self.visible:
            return
        d = Draw2D()
        x, y = int(self.rect.x), int(self.rect.y)
        w, h = int(self.rect.width), int(self.rect.height)
        if self.texture is not None:
            d.blit_scaled(buf, self.texture, x, y, w, h)
        else:
            d.rect(buf, x, y, w, h, self.color)
        if self.outline is not None:
            d.rect_outline(buf, x, y, w, h, self.outline)


@dataclass
class MessagesWidget(Widget):
    """widget/messages.rs — scrolling message log."""

    messages: List[str] = field(default_factory=list)
    max_messages: int = 6
    color: Tuple[int, int, int, int] = (255, 255, 255, 255)
    size: int = 11
    line_height: int = 14

    #: uuid of the multiple-choice entry under the pointer (messages.rs)
    clicked: object = None

    def add(self, text: str) -> None:
        self.messages.append(text)
        if len(self.messages) > 64:
            self.messages = self.messages[-64:]

    def touch_up(self) -> None:
        """Clear the clicked choice (widget/messages.rs:326-328)."""
        self.clicked = None

    def draw(self, buf: np.ndarray, ctx=None) -> None:
        if not self.visible:
            return
        d = Draw2D()
        x, y = int(self.rect.x), int(self.rect.y)
        for i, text in enumerate(self.messages[-self.max_messages:]):
            d.text(buf, x, y + i * self.line_height, text, self.color, self.size)


@dataclass
class ScreenWidget(Widget):
    """widget/screen.rs — renders a 2D 'screen map' through the rasterizer
    into the widget rect (the reference path that still uses the software
    Rasterizer directly, screen.rs:81)."""

    screen_map: object = None  # a Map whose sectors carry UI shapes
    grid_size: float = 16.0

    def draw(self, buf: np.ndarray, ctx) -> None:
        if not self.visible or self.screen_map is None:
            return
        from ..builders import D2Builder
        from ..models.scene import Scene
        from ..ops.matrices import mat3_translation_scale
        from ..ops.raster import Rasterizer

        assets = ctx.get("assets") if isinstance(ctx, dict) else None
        w, h = int(self.rect.width), int(self.rect.height)
        if w <= 0 or h <= 0:
            return
        scene = Scene.empty()
        D2Builder().build(self.screen_map, assets, scene)
        proj2d = mat3_translation_scale(w / 2.0, h / 2.0, self.grid_size)
        rast = Rasterizer.setup(
            proj2d, np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32)
        )
        frame = rast.rasterize(scene, w, h, 64, assets)
        Draw2D().blend_blit(buf, frame, int(self.rect.x), int(self.rect.y))


@dataclass
class GameWidget(Widget):
    """widget/game.rs — the 3D viewport: pumps the SceneManager's incremental
    chunk results into the scene, then renders through the client camera."""

    scene_manager: object = None
    client: object = None
    ambient: Optional[tuple] = None

    def pump_chunks(self, scene) -> int:
        """Drain pending chunk builds into scene.chunks
        (widget/game.rs:146-180). Returns chunks applied."""
        if self.scene_manager is None:
            return 0
        applied = 0
        while True:
            result = self.scene_manager.tick()
            if result is None:
                break
            if result.kind == "chunk" and result.coord is not None:
                scene.chunks[result.coord] = result.chunk
                scene.touch()
                applied += 1
            if result.remaining == 0:
                break
        return applied

    def draw(self, buf: np.ndarray, ctx) -> None:
        if not self.visible or self.client is None:
            return
        assets = ctx.get("assets") if isinstance(ctx, dict) else None
        self.pump_chunks(self.client.scene)
        w, h = int(self.rect.width), int(self.rect.height)
        frame = self.client.draw_d3(w, h, assets, self.ambient)
        Draw2D().blit(buf, frame, int(self.rect.x), int(self.rect.y))
