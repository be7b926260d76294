"""Geometry kit tests, golden-checked against OpenCV/PIL where available."""

import numpy as np
import pytest

from ocrs_models_tpu.geometry import (
    box_match_metrics,
    connected_components,
    convex_hull,
    convex_intersection_area,
    expand_quad,
    extract_cc_quads,
    fill_polygon,
    generate_mask,
    min_area_rect,
    polygon_area,
    shrink_polygon,
)

cv2 = pytest.importorskip("cv2", reason="cv2 used only as a golden oracle")
from PIL import Image, ImageDraw  # noqa: E402


def rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64)


class TestPolygonBasics:
    def test_area(self):
        assert polygon_area(rect(0, 0, 4, 3)) == pytest.approx(12.0)
        assert polygon_area(rect(0, 0, 4, 3)[::-1]) == pytest.approx(-12.0)

    def test_convex_hull(self):
        pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 1]])
        hull = convex_hull(pts)
        assert len(hull) == 4
        assert abs(polygon_area(hull)) == pytest.approx(16.0)

    def test_min_area_rect_axis_aligned(self):
        pts = rect(1, 2, 7, 5)
        r = min_area_rect(pts)
        assert abs(polygon_area(r)) == pytest.approx(18.0)
        assert set(map(tuple, np.round(r, 6))) == {(1, 2), (7, 2), (7, 5), (1, 5)}

    def test_min_area_rect_vs_cv2_random(self):
        rng = np.random.default_rng(0)
        for _ in range(30):
            pts = rng.uniform(0, 100, size=(rng.integers(3, 20), 2)).astype(np.float32)
            ours = min_area_rect(pts)
            cv_rect = cv2.minAreaRect(pts)
            cv_area = cv_rect[1][0] * cv_rect[1][1]
            assert abs(polygon_area(ours)) == pytest.approx(cv_area, rel=1e-4, abs=1e-4)

    def test_min_area_rect_degenerate_line(self):
        pts = np.array([[0, 0], [5, 5]])
        r = min_area_rect(pts)
        assert abs(polygon_area(r)) == pytest.approx(0.0)


class TestOffsets:
    def test_shrink_rect(self):
        p = shrink_polygon(rect(0, 0, 20, 10), 3.0)
        assert set(map(tuple, np.round(p, 6))) == {(3, 3), (17, 3), (17, 7), (3, 7)}

    def test_shrink_rect_ccw(self):
        p = shrink_polygon(rect(0, 0, 20, 10)[::-1], 3.0)
        assert set(map(tuple, np.round(p, 6))) == {(3, 3), (17, 3), (17, 7), (3, 7)}

    def test_shrink_too_thin_returns_empty(self):
        assert shrink_polygon(rect(0, 0, 100, 5), 3.0) == []
        assert shrink_polygon(rect(0, 0, 5, 100), 3.0) == []

    def test_shrink_triangle(self):
        tri = np.array([[0, 0], [30, 0], [0, 30]], dtype=np.float64)
        p = np.array(shrink_polygon(tri, 3.0))
        assert len(p) == 3
        # Inner triangle edges at distance 3 from the originals.
        assert p[:, 0].min() == pytest.approx(3.0)
        assert p[:, 1].min() == pytest.approx(3.0)

    def test_expand_quad_rect(self):
        q = expand_quad(rect(10, 10, 20, 16), 3.0)
        assert abs(polygon_area(q)) == pytest.approx(16 * 12)
        assert set(map(tuple, np.round(q, 5))) == {(7, 7), (23, 7), (23, 19), (7, 19)}

    def test_expand_quad_point(self):
        q = np.array([[5, 5]] * 4, dtype=np.float64)
        out = expand_quad(q, 3.0)
        assert np.allclose(out, q)

    def test_expand_rotated_quad(self):
        # 45-degree square; expansion preserves orientation & grows area.
        q = np.array([[10, 0], [20, 10], [10, 20], [0, 10]], dtype=np.float64)
        out = expand_quad(q, 2.0)
        side = np.hypot(10, 10)
        expect = (side + 4) ** 2
        assert abs(polygon_area(out)) == pytest.approx(expect, rel=1e-6)


class TestClip:
    def test_intersection_disjoint(self):
        assert convex_intersection_area(rect(0, 0, 1, 1), rect(5, 5, 6, 6)) == 0.0

    def test_intersection_nested(self):
        assert convex_intersection_area(rect(0, 0, 10, 10), rect(2, 2, 4, 4)) == pytest.approx(4.0)

    def test_intersection_partial(self):
        assert convex_intersection_area(rect(0, 0, 4, 4), rect(2, 2, 6, 6)) == pytest.approx(4.0)

    def test_intersection_rotated(self):
        sq = rect(0, 0, 2, 2) + 4  # [4,6]^2
        diamond = np.array([[5, 3], [7, 5], [5, 7], [3, 5]], dtype=np.float64)
        # Square fully inside diamond? Diamond has "radius" 2 from (5,5) in L1.
        # Square corners at L1 distance 2 → exactly inscribed.
        area = convex_intersection_area(sq, diamond)
        assert area == pytest.approx(4.0, rel=1e-6)


class TestRaster:
    def test_rect_fill_matches_pil(self):
        poly = [(2, 3), (10, 3), (10, 8), (2, 8)]
        ours = fill_polygon(16, 12, poly)
        img = Image.new("1", (16, 12), 0)
        ImageDraw.Draw(img).polygon(poly, fill=1)
        theirs = np.array(img, dtype=np.uint8)
        assert (ours == theirs).all()

    def test_word_quads_exactly_match_pil(self):
        # The mask-generation distribution: rotated word boxes shrunk by the
        # 3px SHRINK_DISTANCE. The fill rule was derived from Pillow by
        # differential testing and must stay bit-exact here.
        from ocrs_models_tpu.geometry import shrink_polygon

        rng = np.random.default_rng(7)
        for trial in range(200):
            w = rng.uniform(8, 80)
            h = rng.uniform(8, 30)
            ang = np.deg2rad(rng.uniform(-25, 25))
            c, s = np.cos(ang), np.sin(ang)
            quad = np.array([[0, 0], [w, 0], [w, h], [0, h]], float)
            quad = quad @ np.array([[c, s], [-s, c]]) + rng.uniform(0, 40, 2)
            poly = shrink_polygon(quad, 3.0)
            if len(poly) < 3:
                continue
            ours = fill_polygon(120, 90, poly)
            img = Image.new("1", (120, 90), 0)
            ImageDraw.Draw(img).polygon([tuple(p) for p in poly], fill=1)
            theirs = np.array(img, dtype=np.uint8)
            assert (ours == theirs).all(), f"trial {trial}: {poly}"

    def test_random_polygons_close_to_pil(self):
        rng = np.random.default_rng(2)
        total = agree = 0
        for _ in range(50):
            n = rng.integers(3, 8)
            # Star-shaped (simple) polygon around a center.
            angles = np.sort(rng.uniform(0, 2 * np.pi, size=n))
            radii = rng.uniform(5, 30, size=n)
            cx, cy = rng.uniform(20, 50, size=2)
            poly = [
                (cx + r * np.cos(a), cy + r * np.sin(a)) for r, a in zip(radii, angles)
            ]
            ours = fill_polygon(80, 80, poly)
            img = Image.new("1", (80, 80), 0)
            ImageDraw.Draw(img).polygon(poly, fill=1)
            theirs = np.array(img, dtype=np.uint8)
            total += theirs.size
            agree += int((ours == theirs).sum())
        # Sharp-apex corner rows can still differ by a pixel on degenerate
        # geometry (documented residual, RASTER_DELTA.json); measured
        # agreement on this family is ~1 - 2e-5.
        assert agree / total > 0.9999

    def test_generate_mask_shrinks(self):
        mask = generate_mask(40, 20, [rect(0, 0, 39, 19)], shrink_dist=3.0)
        assert mask.shape == (20, 40)
        assert mask.dtype == np.float32
        assert mask[10, 20] == 1.0
        assert mask[0, 0] == 0.0  # shrunk away from the border
        assert mask[1, 1] == 0.0

    def test_generate_mask_drops_thin(self):
        mask = generate_mask(100, 100, [rect(10, 10, 90, 14)], shrink_dist=3.0)
        assert mask.sum() == 0.0

    def test_generate_mask_no_shrink(self):
        mask = generate_mask(10, 10, [rect(0, 0, 9, 9)], shrink_dist=0.0)
        assert mask.sum() == 100.0


class TestComponents:
    def test_two_blobs(self):
        mask = np.zeros((20, 30), dtype=np.uint8)
        mask[2:8, 3:12] = 1
        mask[12:18, 15:28] = 1
        labels, n = connected_components(mask)
        assert n == 2
        assert len(np.unique(labels[labels > 0])) == 2

    def test_diagonal_is_8_connected(self):
        mask = np.zeros((4, 4), dtype=np.uint8)
        mask[0, 0] = 1
        mask[1, 1] = 1
        _, n = connected_components(mask)
        assert n == 1

    def test_extract_cc_quads_vs_cv2(self):
        rng = np.random.default_rng(3)
        mask = np.zeros((60, 80), dtype=np.uint8)
        for _ in range(5):
            x, y = rng.integers(0, 60), rng.integers(0, 40)
            w, h = rng.integers(4, 15), rng.integers(4, 15)
            mask[y : y + h, x : x + w] = 1
        ours = extract_cc_quads(mask)
        contours, _ = cv2.findContours(
            mask, mode=cv2.RETR_EXTERNAL, method=cv2.CHAIN_APPROX_SIMPLE
        )
        theirs = np.array(
            [cv2.boxPoints(cv2.minAreaRect(c[:, 0])) for c in contours]
        )
        assert len(ours) == len(theirs)
        # Compare as sets of quads via IoU.
        matched = 0
        for q in ours:
            for t in theirs:
                inter = convex_intersection_area(q, t)
                union = abs(polygon_area(q)) + abs(polygon_area(t)) - inter
                if union == 0 or inter / union > 0.99:
                    matched += 1
                    break
        assert matched == len(ours)

    def test_empty_mask(self):
        quads = extract_cc_quads(np.zeros((10, 10), dtype=np.uint8))
        assert quads.shape == (0, 4, 2)


class TestBoxMatchMetrics:
    def test_perfect_match(self):
        quads = np.stack([rect(0, 0, 10, 10), rect(20, 20, 30, 30)])
        m = box_match_metrics(quads, quads)
        assert m == {
            "precision": 1.0,
            "recall": 1.0,
            "merged_frac": 0.0,
            "split_frac": 0.0,
        }

    def test_empty(self):
        empty = np.zeros((0, 4, 2))
        m = box_match_metrics(empty, empty)
        assert m["precision"] == 1.0
        assert m["recall"] == 1.0

    def test_miss(self):
        m = box_match_metrics(
            rect(0, 0, 10, 10)[None], rect(100, 100, 110, 110)[None]
        )
        assert m["precision"] == 0.0
        assert m["recall"] == 0.0

    def test_merged(self):
        # One big prediction covering two targets.
        pred = rect(0, 0, 30, 10)[None]
        target = np.stack([rect(0, 0, 12, 10), rect(18, 0, 30, 10)])
        m = box_match_metrics(pred, target)
        assert m["merged_frac"] == 1.0
        assert m["precision"] == 0.0  # IoU with either target < 0.5

    def test_split(self):
        # Two predictions splitting one target.
        pred = np.stack([rect(0, 0, 12, 10), rect(18, 0, 30, 10)])
        target = rect(0, 0, 30, 10)[None]
        m = box_match_metrics(pred, target)
        assert m["split_frac"] == 1.0
