"""Draw2D — software 2D blit/shape/text primitives on RGBA8 numpy buffers
(reference src/client/draw2d.rs:42-1395, ~40 primitives).

Used by the client for UI/screen composition (game widgets, messages, text);
all operations are vectorized numpy — the buffers are host-side frames or
widget surfaces that then upload as overlay textures.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _clip_rect(buf, x, y, w, h):
    bh, bw = buf.shape[:2]
    x0 = max(0, int(x))
    y0 = max(0, int(y))
    x1 = min(bw, int(x + w))
    y1 = min(bh, int(y + h))
    return x0, y0, x1, y1


class Draw2D:
    """All methods mutate `buf`: (H, W, 4) uint8."""

    def rect(self, buf, x, y, w, h, color) -> None:
        x0, y0, x1, y1 = _clip_rect(buf, x, y, w, h)
        if x1 > x0 and y1 > y0:
            buf[y0:y1, x0:x1] = np.asarray(color, np.uint8)

    def rect_outline(self, buf, x, y, w, h, color, thickness: int = 1) -> None:
        t = thickness
        self.rect(buf, x, y, w, t, color)
        self.rect(buf, x, y + h - t, w, t, color)
        self.rect(buf, x, y, t, h, color)
        self.rect(buf, x + w - t, y, t, h, color)

    def blend_rect(self, buf, x, y, w, h, color) -> None:
        """src-over with the rect color's alpha."""
        x0, y0, x1, y1 = _clip_rect(buf, x, y, w, h)
        if x1 <= x0 or y1 <= y0:
            return
        c = np.asarray(color, np.float32)
        a = c[3] / 255.0
        dst = buf[y0:y1, x0:x1].astype(np.float32)
        dst[..., :3] = c[:3] * a + dst[..., :3] * (1 - a)
        buf[y0:y1, x0:x1] = dst.astype(np.uint8)

    def hline(self, buf, x, y, length, color) -> None:
        self.rect(buf, x, y, length, 1, color)

    def vline(self, buf, x, y, length, color) -> None:
        self.rect(buf, x, y, 1, length, color)

    def line(self, buf, x0, y0, x1, y1, color) -> None:
        """Bresenham (draw2d line primitive)."""
        x0, y0, x1, y1 = int(x0), int(y0), int(x1), int(y1)
        dx = abs(x1 - x0)
        dy = abs(y1 - y0)
        sx = 1 if x0 < x1 else -1
        sy = 1 if y0 < y1 else -1
        err = dx - dy
        h, w = buf.shape[:2]
        x, y = x0, y0
        while True:
            if 0 <= x < w and 0 <= y < h:
                buf[y, x] = np.asarray(color, np.uint8)
            if x == x1 and y == y1:
                break
            e2 = err * 2
            if e2 > -dy:
                err -= dy
                x += sx
            if e2 < dx:
                err += dx
                y += sy

    def circle(self, buf, cx, cy, radius, color, thickness: float = 1.0) -> None:
        x0, y0, x1, y1 = _clip_rect(buf, cx - radius - 1, cy - radius - 1, 2 * radius + 2, 2 * radius + 2)
        if x1 <= x0 or y1 <= y0:
            return
        ys, xs = np.mgrid[y0:y1, x0:x1]
        d = np.sqrt((xs - cx) ** 2 + (ys - cy) ** 2)
        mask = (d <= radius) & (d >= radius - thickness)
        buf[y0:y1, x0:x1][mask] = np.asarray(color, np.uint8)

    def disc(self, buf, cx, cy, radius, color) -> None:
        x0, y0, x1, y1 = _clip_rect(buf, cx - radius - 1, cy - radius - 1, 2 * radius + 2, 2 * radius + 2)
        if x1 <= x0 or y1 <= y0:
            return
        ys, xs = np.mgrid[y0:y1, x0:x1]
        mask = (xs - cx) ** 2 + (ys - cy) ** 2 <= radius * radius
        buf[y0:y1, x0:x1][mask] = np.asarray(color, np.uint8)

    def blit(self, buf, src, x, y) -> None:
        """Copy src (h, w, 4) at (x, y), clipped, alpha-ignored."""
        sh, sw = src.shape[:2]
        x0, y0, x1, y1 = _clip_rect(buf, x, y, sw, sh)
        if x1 <= x0 or y1 <= y0:
            return
        buf[y0:y1, x0:x1] = src[y0 - int(y) : y1 - int(y), x0 - int(x) : x1 - int(x)]

    def blend_blit(self, buf, src, x, y) -> None:
        """src-over alpha blit."""
        sh, sw = src.shape[:2]
        x0, y0, x1, y1 = _clip_rect(buf, x, y, sw, sh)
        if x1 <= x0 or y1 <= y0:
            return
        s = src[y0 - int(y) : y1 - int(y), x0 - int(x) : x1 - int(x)].astype(np.float32)
        d = buf[y0:y1, x0:x1].astype(np.float32)
        a = s[..., 3:4] / 255.0
        d[..., :3] = s[..., :3] * a + d[..., :3] * (1 - a)
        d[..., 3] = np.maximum(d[..., 3], s[..., 3])
        buf[y0:y1, x0:x1] = d.astype(np.uint8)

    def blit_scaled(self, buf, src, x, y, w, h) -> None:
        """Nearest-neighbor scaled blit (upscale path, client/mod.rs)."""
        sh, sw = src.shape[:2]
        if w <= 0 or h <= 0:
            return
        ys = (np.arange(h) * sh // h).clip(0, sh - 1)
        xs = (np.arange(w) * sw // w).clip(0, sw - 1)
        scaled = src[np.ix_(ys, xs)]
        self.blit(buf, scaled, x, y)

    # -- text --

    _font_cache = {}

    def _font(self, size: int):
        from PIL import ImageFont

        f = self._font_cache.get(size)
        if f is None:
            try:
                f = ImageFont.truetype(
                    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", size
                )
            except OSError:
                f = ImageFont.load_default()
            self._font_cache[size] = f
        return f

    def text_size(self, text: str, size: int = 12) -> Tuple[int, int]:
        from PIL import Image, ImageDraw

        img = Image.new("RGBA", (1, 1))
        d = ImageDraw.Draw(img)
        box = d.textbbox((0, 0), text, font=self._font(size))
        return box[2] - box[0], box[3] - box[1]

    def text(self, buf, x, y, text: str, color, size: int = 12) -> None:
        from PIL import Image, ImageDraw

        if not text:
            return
        w, h = self.text_size(text, size)
        if w <= 0 or h <= 0:
            return
        img = Image.new("RGBA", (w + 2, h + size // 2 + 2), (0, 0, 0, 0))
        d = ImageDraw.Draw(img)
        d.text((0, 0), text, font=self._font(size), fill=tuple(int(c) for c in color))
        self.blend_blit(buf, np.asarray(img, np.uint8), x, y)

    def text_centered(self, buf, rect, text: str, color, size: int = 12) -> None:
        x, y, w, h = rect
        tw, th = self.text_size(text, size)
        self.text(buf, x + (w - tw) // 2, y + (h - th) // 2, text, color, size)
