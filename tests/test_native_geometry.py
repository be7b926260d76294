"""Native (C++) geometry core vs the numpy reference implementations."""

import numpy as np
import pytest

from ocrs_models_tpu.geometry import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="native geometry lib unavailable"
)


def _force_numpy(monkeypatch):
    monkeypatch.setattr(native, "available", lambda: False)


@requires_native
class TestNativeParity:
    def test_cc_label_matches_numpy(self, monkeypatch):
        from ocrs_models_tpu.geometry.components import connected_components

        rng = np.random.default_rng(0)
        for _ in range(5):
            mask = (rng.uniform(size=(40, 60)) > 0.7).astype(np.uint8)
            ln, nn = connected_components(mask)
            _force_numpy(monkeypatch)
            lp, np_ = connected_components(mask)
            monkeypatch.undo()
            assert nn == np_
            # Same partition (label ids may differ): compare canonicalized.
            assert (ln > 0).sum() == (lp > 0).sum()
            mapping = {}
            for a, b in zip(ln.ravel(), lp.ravel()):
                if a == 0:
                    assert b == 0
                    continue
                assert mapping.setdefault(a, b) == b

    def test_min_area_rect_matches_numpy(self, monkeypatch):
        from ocrs_models_tpu.geometry.polygon import min_area_rect, polygon_area

        rng = np.random.default_rng(1)
        for _ in range(10):
            pts = rng.uniform(0, 100, size=(rng.integers(3, 25), 2))
            rn = min_area_rect(pts)
            _force_numpy(monkeypatch)
            rp = min_area_rect(pts)
            monkeypatch.undo()
            assert abs(polygon_area(rn)) == pytest.approx(
                abs(polygon_area(rp)), rel=1e-6, abs=1e-9
            )

    def test_offset_matches_numpy(self, monkeypatch):
        from ocrs_models_tpu.geometry.polygon import shrink_polygon

        rect = [(0, 0), (40, 0), (40, 20), (0, 20)]
        thin = [(0, 0), (40, 0), (40, 4), (0, 4)]
        for poly, dist in ((rect, 3.0), (thin, 3.0), (rect, 0.5)):
            rn = shrink_polygon(poly, dist)
            _force_numpy(monkeypatch)
            rp = shrink_polygon(poly, dist)
            monkeypatch.undo()
            np.testing.assert_allclose(
                np.asarray(rn).reshape(-1, 2),
                np.asarray(rp).reshape(-1, 2),
                rtol=1e-9,
                atol=1e-9,
            )

    def test_fill_polygon_matches_numpy(self, monkeypatch):
        from ocrs_models_tpu.geometry.raster import fill_polygon

        rng = np.random.default_rng(2)
        for _ in range(8):
            n = rng.integers(3, 8)
            angles = np.sort(rng.uniform(0, 2 * np.pi, size=n))
            radii = rng.uniform(3, 25, size=n)
            cx, cy = rng.uniform(15, 45, size=2)
            poly = [
                (cx + r * np.cos(a), cy + r * np.sin(a))
                for r, a in zip(radii, angles)
            ]
            mn = fill_polygon(64, 64, poly)
            _force_numpy(monkeypatch)
            mp = fill_polygon(64, 64, poly)
            monkeypatch.undo()
            np.testing.assert_array_equal(mn, mp)

    def test_clip_area_matches_numpy(self, monkeypatch):
        from ocrs_models_tpu.geometry.polygon import convex_intersection_area

        rng = np.random.default_rng(3)
        for _ in range(10):
            a = np.array([[0, 0], [10, 0], [10, 10], [0, 10]]) + rng.uniform(0, 6, 2)
            b = np.array([[5, 3], [12, 5], [7, 12], [3, 8]])
            an = convex_intersection_area(a, b)
            _force_numpy(monkeypatch)
            ap = convex_intersection_area(a, b)
            monkeypatch.undo()
            assert an == pytest.approx(ap, rel=1e-9, abs=1e-9)

    def test_levenshtein_matches_python(self):
        from ocrs_models_tpu.utils.text import levenshtein

        assert native.levenshtein("kitten", "sitting") == 3
        assert native.levenshtein("", "abc") == 3
        assert native.levenshtein("abc", "abc") == 0
        rng = np.random.default_rng(4)
        for _ in range(20):
            a = "".join(rng.choice(list("abcdefg"), size=rng.integers(0, 15)))
            b = "".join(rng.choice(list("abcdefg"), size=rng.integers(0, 15)))
            assert native.levenshtein(a, b) == levenshtein(a, b) or True
            # levenshtein() dispatches to native; compare against pure DP:
            def ref(x, y):
                dp = list(range(len(y) + 1))
                for i, cx in enumerate(x):
                    ndp = [i + 1]
                    for j, cy in enumerate(y):
                        ndp.append(min(dp[j + 1] + 1, ndp[j] + 1, dp[j] + (cx != cy)))
                    dp = ndp
                return dp[-1]

            assert native.levenshtein(a, b) == ref(a, b)
