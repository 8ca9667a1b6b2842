"""MapMini — slimmed map for per-pixel lighting occlusion and server
navigation (reference src/map/mini.rs).

Holds compiled wall segments + occluded-sector boxes. The renderer consumes
`pack_device` SoA arrays: the 2D light-visibility test
(`is_visible`, mini.rs:88+) vectorizes to a pixel x segment crossing test in
the shading pass; the host methods serve the server (collision/AI).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import List, Optional, Set, Tuple

import numpy as np

from .elements import CompiledLinedef


@dataclass
class MapMini:
    linedefs: List[CompiledLinedef] = field(default_factory=list)
    dynamic_linedefs: List[CompiledLinedef] = field(default_factory=list)
    occluded_sectors: List[Tuple[object, float]] = field(default_factory=list)  # (Rect, occlusion)
    blocked_tiles: Set[Tuple[int, int]] = field(default_factory=set)

    def all_linedefs(self):
        return list(self.linedefs) + list(self.dynamic_linedefs)

    def get_occlusion(self, point) -> float:
        """Occlusion factor from occluded-sector boxes (mini.rs:57+)."""
        x, y = float(point[0]), float(point[1])
        occ = 1.0
        for rect, o in self.occluded_sectors:
            if rect.x <= x <= rect.max_x and rect.y <= y <= rect.max_y:
                occ = min(occ, o)
        return occ

    def is_visible(self, frm, to) -> bool:
        """Segment-vs-walls visibility (mini.rs:88+): blocked when the
        from->to segment crosses any wall segment with height > 0."""
        fx, fy = float(frm[0]), float(frm[1])
        tx, ty = float(to[0]), float(to[1])
        for ld in self.all_linedefs():
            if ld.wall_height <= 0.0:
                continue
            if _segments_intersect(
                fx, fy, tx, ty, ld.start[0], ld.start[1], ld.end[0], ld.end[1]
            ):
                return False
        return True

    def is_blocked(self, point, radius: float = 0.0) -> bool:
        x, y = float(point[0]), float(point[1])
        if (int(np.floor(x)), int(np.floor(y))) in self.blocked_tiles:
            return True
        for ld in self.all_linedefs():
            if ld.wall_height <= 0.0:
                continue
            if _point_segment_distance(x, y, ld) <= radius:
                return True
        return False

    def pathfind(self, start, goal, step: float = 0.5, max_nodes: int = 20000):
        """Grid A* over the walkable plane (reference uses the `pathfinding`
        crate, mini.rs). Returns list of (x, y) or None."""
        sx, sy = round(start[0] / step), round(start[1] / step)
        gx, gy = round(goal[0] / step), round(goal[1] / step)

        def blocked(cx, cy):
            return self.is_blocked((cx * step, cy * step), radius=step * 0.4)

        if blocked(gx, gy):
            return None
        open_q = [(0.0, (sx, sy))]
        came = {(sx, sy): None}
        cost = {(sx, sy): 0.0}
        visited = 0
        while open_q and visited < max_nodes:
            _, cur = heapq.heappop(open_q)
            visited += 1
            if cur == (gx, gy):
                path = []
                while cur is not None:
                    path.append((cur[0] * step, cur[1] * step))
                    cur = came[cur]
                return list(reversed(path))
            cx, cy = cur
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1)):
                nxt = (cx + dx, cy + dy)
                if nxt in cost:
                    continue
                if blocked(*nxt):
                    continue
                c = cost[cur] + (1.414 if dx and dy else 1.0)
                cost[nxt] = c
                came[nxt] = cur
                h = abs(nxt[0] - gx) + abs(nxt[1] - gy)
                heapq.heappush(open_q, (c + h, nxt))
        return None

    def pack_device(self, capacity: Optional[int] = None) -> dict:
        """SoA wall segments for the in-kernel visibility test."""
        lds = [ld for ld in self.all_linedefs() if ld.wall_height > 0.0]
        n = len(lds)
        cap = capacity if capacity is not None else max(1, 1 << int(np.ceil(np.log2(max(n, 1)))))
        out = {
            "seg_a": np.zeros((cap, 2), np.float32),
            "seg_b": np.zeros((cap, 2), np.float32),
            "seg_valid": np.zeros(cap, np.float32),
        }
        for i, ld in enumerate(lds[:cap]):
            out["seg_a"][i] = ld.start
            out["seg_b"][i] = ld.end
            out["seg_valid"][i] = 1.0
        return out


def _segments_intersect(ax, ay, bx, by, cx, cy, dx, dy) -> bool:
    def ccw(px, py, qx, qy, rx, ry):
        return (ry - py) * (qx - px) > (qy - py) * (rx - px)

    return ccw(ax, ay, cx, cy, dx, dy) != ccw(bx, by, cx, cy, dx, dy) and ccw(
        ax, ay, bx, by, cx, cy
    ) != ccw(ax, ay, bx, by, dx, dy)


def _point_segment_distance(x, y, ld: CompiledLinedef) -> float:
    a = np.asarray(ld.start, np.float32)
    b = np.asarray(ld.end, np.float32)
    p = np.array([x, y], np.float32)
    e = b - a
    t = float(np.dot(p - a, e) / max(float(np.dot(e, e)), 1e-20))
    t = min(1.0, max(0.0, t))
    return float(np.linalg.norm(p - (a + e * t)))
