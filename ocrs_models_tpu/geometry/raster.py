"""Scanline polygon rasterization with exact PIL parity.

First-party replacement for PIL ``ImageDraw.polygon`` in detection-mask
generation (reference datasets/util.py:78-110). The reference rasterizes
training masks through Pillow, so mask parity requires reproducing
Pillow's fill rule *exactly*, which was reverse-engineered here by
differential testing against Pillow 12 (see tools/raster_delta.py and
docs/parity.md):

- Vertex coordinates are truncated to ``int`` (C cast toward zero) before
  rasterization — Pillow's C binding does this, so sub-pixel vertex
  positions never reach the fill.
- Horizontal edges are drawn directly as inclusive hlines at their row.
- Non-horizontal edges contribute even-odd crossings at integer scanlines
  ``y`` over ``[ymin, ymax]`` (float32 arithmetic, like Pillow's C); an
  edge ending at this row duplicates its crossing (except on the global
  last row).
- Span ends round half-away-from-zero: left ``floor(x + 0.5)``, right
  ``ceil(x - 0.5)``; a span whose rounded left exceeds its rounded right
  draws nothing (no swap) — thin slivers legitimately skip rows.
- "Connect discontiguous corners": when two same-sign-slope edges meet at
  an exact-integer crossing at a shared endpoint row, the span is widened
  toward the adjacent row's crossings (the even-indexed-crossing, widening
  adjustments only).

Residual divergence (documented, measured in RASTER_DELTA.json): polygons
that truncate to degenerate sub-pixel slivers with duplicate vertices can
differ by 1-2 boundary pixels; on a 30k-polygon HierText-like corpus this
is ~0.03% of polygons and ~1e-6 of mask pixels.
"""

from __future__ import annotations

import math

import numpy as np

from .polygon import shrink_polygon

_F32 = np.float32


def _round_up(f: float) -> int:
    # Pillow's ROUND_UP: round half away from zero.
    return int(math.floor(f + 0.5)) if f >= 0 else -int(math.floor(abs(f) + 0.5))


def _round_down(f: float) -> int:
    # Pillow's ROUND_DOWN: round half toward zero.
    return int(math.ceil(f - 0.5)) if f >= 0 else -int(math.ceil(abs(f) - 0.5))


class _Edge:
    __slots__ = ("x0", "y0", "ymin", "ymax", "dx")

    def __init__(self, x0: int, y0: int, x1: int, y1: int):
        self.ymin, self.ymax = (y0, y1) if y0 <= y1 else (y1, y0)
        self.dx = _F32(x1 - x0) / _F32(y1 - y0)
        self.x0 = x0
        self.y0 = y0

    def cross(self, y: int):
        # float32 like Pillow's C: (y - y0) * dx + x0
        return _F32(_F32(y - self.y0) * self.dx + _F32(self.x0))


def fill_polygon(
    width: int, height: int, poly, out: np.ndarray | None = None
) -> np.ndarray:
    """Rasterize a filled polygon into a ``[height, width]`` uint8 mask,
    matching PIL ``ImageDraw.polygon(fill=...)`` output bit-for-bit (see
    module docstring for the one documented residual)."""
    if out is None:
        out = np.zeros((height, width), dtype=np.uint8)
    p = np.asarray(poly, dtype=np.float64)
    if len(p) < 2:
        return out
    from . import native

    if native.available() and out.flags.c_contiguous:
        native.fill_polygon(p, height, width, out)
        return out

    def hline(x0: int, y: int, x1: int) -> None:
        # Pillow's hline: no swap — reversed spans draw nothing.
        if y < 0 or y >= height or x0 > x1 or x1 < 0 or x0 >= width:
            return
        out[y, max(x0, 0) : min(x1, width - 1) + 1] = 1

    pts = [(int(x), int(y)) for x, y in p]
    n = len(pts)
    edges: list[_Edge] = []
    gymin, gymax = height - 1, 0
    for i in range(n):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        gymin = min(gymin, y0, y1)
        gymax = max(gymax, y0, y1)
        if y0 == y1:
            hline(min(x0, x1), y0, max(x0, x1))
            continue
        edges.append(_Edge(x0, y0, x1, y1))
    if not edges:
        return out
    gymin = max(gymin, 0)
    gymax = min(gymax, height)

    for y in range(gymin, gymax + 1):
        xx: dict[int, np.float32] = {}
        j = 0
        for i, cur in enumerate(edges):
            if not (cur.ymin <= y <= cur.ymax):
                continue
            xx[j] = cur.cross(y)
            j += 1
            if y == cur.ymax and y < gymax:
                # Edge ends here: duplicate the crossing to keep parity.
                xx[j] = xx[j - 1]
                j += 1
            elif (
                cur.dx != 0
                and j % 2 == 0
                and float(xx[j - 1]).is_integer()
            ):
                # Connect discontiguous corners.
                for k in range(i):
                    other = edges[k]
                    if (cur.dx > 0 and other.dx <= 0) or (
                        cur.dx < 0 and other.dx >= 0
                    ):
                        continue
                    if not (
                        y in (cur.ymin, cur.ymax)
                        and y in (other.ymin, other.ymax)
                    ):
                        continue
                    if xx[j - 1] == other.cross(y):
                        offset = -1 if y == gymax else 1
                        a = cur.cross(y + offset)
                        b = other.cross(y + offset)
                        if y == cur.ymax:
                            if cur.dx > 0:
                                v = max(a, b) + _F32(1)
                                widens = v < xx[j - 1]
                            else:
                                v = min(a, b) - _F32(1)
                                widens = v > xx[j - 1]
                        else:
                            if cur.dx > 0:
                                v = min(a, b) - _F32(1)
                                widens = v > xx[j - 1]
                            else:
                                v = max(a, b) + _F32(1)
                                widens = v < xx[j - 1]
                        if widens:
                            xx[k] = v
                        break
        vals = sorted(float(xx[s]) for s in range(j))
        for s in range(0, j - 1, 2):
            hline(_round_up(vals[s]), y, _round_down(vals[s + 1]))
    return out


def generate_mask(
    width: int, height: int, polys, shrink_dist: float = 3.0
) -> np.ndarray:
    """Binary text mask from word/line polygons, each shrunk by
    ``shrink_dist`` along every edge (reference datasets/util.py:78-110).

    Returns a float32 ``[height, width]`` mask with values in {0, 1}.
    """
    mask = np.zeros((height, width), dtype=np.uint8)
    for poly in polys:
        if shrink_dist != 0.0:
            poly = shrink_polygon(poly, shrink_dist)
        if len(poly) == 0:
            continue
        fill_polygon(width, height, poly, out=mask)
    return mask.astype(np.float32)
