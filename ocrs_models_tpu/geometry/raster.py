"""Scanline polygon rasterization.

First-party replacement for PIL ``ImageDraw.polygon`` in detection-mask
generation (reference datasets/util.py:78-110). Fills pixels whose integer
lattice coordinate lies inside or on the polygon (inclusive boundaries, like
PIL's convention where ``polygon([(0,0),(4,0),(4,4),(0,4)])`` fills a 5x5
block).
"""

from __future__ import annotations

import numpy as np

from .polygon import shrink_polygon


def fill_polygon(width: int, height: int, poly, out: np.ndarray | None = None) -> np.ndarray:
    """Rasterize a filled polygon into a ``[height, width]`` uint8 mask.

    Even-odd scanline fill with PIL-style inclusive boundaries: every pixel
    row/column the polygon touches is filled (span = ``floor(x_enter)`` to
    ``floor(x_exit)``, rows ``floor(y_min)`` to ``floor(y_max)``), with
    intersections evaluated at the pixel-center row clamped into each edge's
    y-range.
    """
    if out is None:
        out = np.zeros((height, width), dtype=np.uint8)
    p = np.asarray(poly, dtype=np.float64)
    if len(p) < 3:
        return out
    from . import native

    if native.available() and out.flags.c_contiguous:
        native.fill_polygon(p, height, width, out)
        return out
    ys = p[:, 1]
    y0 = max(0, int(np.floor(ys.min())))
    y1 = min(height - 1, int(np.floor(ys.max())))
    if y1 < y0:
        return out

    a = p
    b = np.roll(p, -1, axis=0)
    for y in range(y0, y1 + 1):
        yc = y + 0.5
        xs: list[float] = []  # parity crossings at the pixel-center row
        spans: list[tuple[float, float]] = []  # touched boundary sub-segments
        for (x1p, y1p), (x2p, y2p) in zip(a, b):
            lo, hi = (y1p, y2p) if y1p < y2p else (y2p, y1p)
            if hi < y or lo >= y + 1:
                continue  # edge does not touch pixel row [y, y+1)
            if y1p != y2p and lo <= yc < hi:
                # Crossing the pixel-center scanline: single parity entry.
                t = (yc - y1p) / (y2p - y1p)
                xs.append(x1p + t * (x2p - x1p))
            else:
                # Edge touches the row but not its center (or is horizontal):
                # fill the touched sub-segment's x-extent directly so touched
                # boundary pixels fill without affecting crossing parity.
                if y1p == y2p:
                    xa, xb = x1p, x2p
                else:
                    ta = (max(lo, float(y)) - y1p) / (y2p - y1p)
                    tb = (min(hi, float(y + 1)) - y1p) / (y2p - y1p)
                    xa = x1p + ta * (x2p - x1p)
                    xb = x1p + tb * (x2p - x1p)
                spans.append((min(xa, xb), max(xa, xb)))
        xs.sort()
        for i in range(0, len(xs) - 1, 2):
            spans.append((xs[i], xs[i + 1]))
        for lo_f, hi_f in spans:
            lo_i = int(np.floor(lo_f))
            hi_i = int(np.floor(hi_f))
            if hi_i >= 0 and lo_i < width:
                out[y, max(lo_i, 0) : min(hi_i, width - 1) + 1] = 1
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
