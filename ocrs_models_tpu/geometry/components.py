"""Connected-component labeling and oriented-quad extraction.

First-party replacement for ``cv2.findContours`` + ``cv2.minAreaRect`` +
``cv2.boxPoints`` (reference postprocess.py:11-36): label 8-connected
components of a binary mask, then fit the minimum-area rotated rectangle to
each component's boundary pixels.
"""

from __future__ import annotations

import numpy as np

from .polygon import min_area_rect


def connected_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Label 8-connected components of a binary mask.

    Returns ``(labels, n)`` where ``labels`` is int32 with 0 = background and
    components numbered 1..n. Two-pass union-find over rows, vectorized with
    numpy (runs per-image on the host postprocess path).
    """
    m = np.asarray(mask)
    if m.ndim == 3 and m.shape[0] == 1:
        m = m[0]
    if m.ndim == 3 and m.shape[-1] == 1:
        m = m[..., 0]
    if m.ndim != 2:
        raise ValueError("Expected mask to be HxW (optionally with a 1-channel dim)")
    from . import native

    if native.available():
        return native.cc_label(m)
    fg = m > 0
    h, w = fg.shape
    labels = np.zeros((h, w), dtype=np.int32)

    # Pass 1: label runs of foreground per row; union with runs in the
    # previous row they touch (8-connectivity => ranges extended by 1).
    parent: list[int] = [0]

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(x: int, y: int) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    prev_runs: list[tuple[int, int, int]] = []  # (start, end, label)
    for y in range(h):
        row = fg[y]
        if not row.any():
            prev_runs = []
            continue
        diff = np.diff(row.astype(np.int8))
        starts = list(np.flatnonzero(diff == 1) + 1)
        ends = list(np.flatnonzero(diff == -1) + 1)
        if row[0]:
            starts.insert(0, 0)
        if row[-1]:
            ends.append(w)
        runs = []
        pi = 0
        for s, e in zip(starts, ends):
            label = 0
            # Merge with previous-row runs overlapping [s-1, e] (8-conn).
            for ps, pe, pl in prev_runs:
                if pe >= s - 1 + 1 and ps <= e:  # ranges [ps,pe) vs [s-1,e+1)
                    if label == 0:
                        label = pl
                    else:
                        union(label, pl)
            if label == 0:
                parent.append(len(parent))
                label = len(parent) - 1
            labels[y, s:e] = label
            runs.append((s, e, label))
        prev_runs = runs
        del pi

    # Pass 2: flatten labels.
    n_labels = len(parent)
    remap = np.zeros(n_labels, dtype=np.int32)
    next_id = 0
    for i in range(1, n_labels):
        r = find(i)
        if r == i:
            next_id += 1
            remap[i] = next_id
    for i in range(1, n_labels):
        remap[i] = remap[find(i)]
    labels = remap[labels]
    return labels, next_id


def extract_cc_quads(mask: np.ndarray) -> np.ndarray:
    """Min-area-rect quads of each connected component in a binary mask.

    Returns an ``Nx4x2`` float32 array of (component, vertex, xy), matching
    the reference's ``extract_cc_quads`` contract (postprocess.py:11-36).
    """
    labels, n = connected_components(mask)
    if n == 0:
        return np.zeros((0, 4, 2), dtype=np.float32)

    # Boundary pixels suffice for the hull: a pixel is boundary if any
    # 4-neighbour differs. (Hull(boundary) == hull(component).)
    fg = labels > 0
    interior = np.zeros_like(fg)
    interior[1:-1, 1:-1] = (
        fg[1:-1, 1:-1]
        & fg[:-2, 1:-1]
        & fg[2:, 1:-1]
        & fg[1:-1, :-2]
        & fg[1:-1, 2:]
    )
    boundary = fg & ~interior
    ys, xs = np.nonzero(boundary)
    ls = labels[ys, xs]
    order = np.argsort(ls, kind="stable")
    ys, xs, ls = ys[order], xs[order], ls[order]
    splits = np.searchsorted(ls, np.arange(2, n + 1))
    quads = []
    for comp_xs, comp_ys in zip(np.split(xs, splits), np.split(ys, splits)):
        pts = np.stack([comp_xs, comp_ys], axis=1).astype(np.float64)
        quads.append(min_area_rect(pts))
    return np.stack(quads).astype(np.float32)
