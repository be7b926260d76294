"""End-to-end OCR pipeline tests (random weights; exercises plumbing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrs_models_tpu.config import DEFAULT_ALPHABET
from ocrs_models_tpu.models import DetectionModel, RecognitionModel
from ocrs_models_tpu.pipeline import OcrPipeline, group_words_into_lines


def rect_quad(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64)


class TestLineGrouping:
    def test_two_lines(self):
        quads = np.stack(
            [
                rect_quad(10, 10, 60, 30),
                rect_quad(70, 12, 120, 32),  # same line
                rect_quad(10, 50, 80, 70),  # next line
            ]
        )
        lines = group_words_into_lines(quads)
        assert len(lines) == 2
        box0, members0 = lines[0]
        assert members0 == [0, 1]
        assert box0[1] == 10 and box0[3] == 32
        assert lines[1][1] == [2]

    def test_reading_order(self):
        # Out-of-order input still yields top-to-bottom, left-to-right.
        quads = np.stack(
            [
                rect_quad(70, 50, 120, 70),
                rect_quad(10, 10, 60, 30),
                rect_quad(10, 48, 60, 68),
            ]
        )
        lines = group_words_into_lines(quads)
        assert len(lines) == 2
        assert lines[0][1] == [1]
        assert lines[1][1] == [2, 0]

    def test_empty(self):
        assert group_words_into_lines(np.zeros((0, 4, 2))) == []


class TestPipeline:
    def test_end_to_end_runs(self):
        det = DetectionModel()
        rec = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
        det_vars = det.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)), train=False)
        rec_vars = rec.init(jax.random.key(1), jnp.zeros((1, 64, 64, 1)), train=False)
        pipe = OcrPipeline(det_vars, rec_vars, det_size=(128, 96))

        from ocrs_models_tpu.data import SyntheticDetection

        img = SyntheticDetection(size=1, page_size=(256, 192))[0]["image"]
        result = pipe(img)
        assert isinstance(result, list)
        for line in result:
            assert isinstance(line.text, str)
            assert len(line.box) == 4

    def test_recognize_lines_buckets(self):
        det = DetectionModel()
        rec = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
        det_vars = det.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)), train=False)
        rec_vars = rec.init(jax.random.key(1), jnp.zeros((1, 64, 64, 1)), train=False)
        pipe = OcrPipeline(det_vars, rec_vars, width_step=64)

        img = np.random.default_rng(0).uniform(-0.5, 0.5, (100, 400, 1)).astype(
            np.float32
        )
        boxes = [np.array([5, 5, 100, 30]), np.array([5, 40, 390, 80]),
                 np.array([0, 0, 1, 1])]  # degenerate box -> ""
        texts = pipe.recognize_lines(img, boxes)
        assert len(texts) == 3
        assert texts[2] == ""


class TestBatchedServing:
    def _pipe(self, **kwargs):
        det = DetectionModel()
        rec = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
        det_vars = det.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)), train=False)
        rec_vars = rec.init(jax.random.key(1), jnp.zeros((1, 64, 64, 1)), train=False)
        return OcrPipeline(det_vars, rec_vars, det_size=(128, 96), **kwargs)

    def test_run_batch_shapes_and_tail_padding(self):
        # 3 pages of different sizes through det_batch=2 (pads the tail
        # sub-batch) and rec_batch=4 (pads recognition rows).
        pipe = self._pipe()
        from ocrs_models_tpu.data import SyntheticDetection

        images = [
            SyntheticDetection(size=1, page_size=(256, 192), seed=s)[0]["image"]
            for s in (0, 1)
        ]
        images.append(
            SyntheticDetection(size=1, page_size=(192, 256), seed=2)[0]["image"]
        )
        results = pipe.run_batch(images, det_batch=2, rec_batch=4)
        assert len(results) == 3
        for page in results:
            for line in page:
                assert isinstance(line.text, str)
                assert len(line.box) == 4

    def test_run_batch_matches_single_image_path(self):
        # The serving path must produce the same lines and texts as
        # calling the pipeline per page (same weights, same seeds).
        pipe = self._pipe()
        from ocrs_models_tpu.data import SyntheticDetection

        images = [
            SyntheticDetection(size=1, page_size=(256, 192), seed=s)[0]["image"]
            for s in (3, 4)
        ]
        batched = pipe.run_batch(images, det_batch=2, rec_batch=4)
        for img, page in zip(images, batched):
            single = pipe(img)
            assert len(page) == len(single)
            for a, b in zip(page, single):
                assert a.text == b.text
                np.testing.assert_allclose(a.box, b.box, rtol=1e-5, atol=1e-4)

    def test_run_batch_empty_and_blank_pages(self):
        pipe = self._pipe(threshold=1.1)  # nothing ever detected
        blank = np.zeros((128, 96, 1), np.float32)
        assert pipe.run_batch([]) == []
        results = pipe.run_batch([blank, blank], det_batch=2, rec_batch=2)
        assert results == [[], []]

    @pytest.mark.slow
    def test_run_batch_on_mesh_matches_single_device(self):
        # Multi-chip serving: the same batch over an 8-device data mesh
        # must produce the single-device path's exact output.
        import pytest

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from ocrs_models_tpu.parallel import create_mesh

        det = DetectionModel()
        rec = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
        det_vars = det.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)), train=False)
        rec_vars = rec.init(jax.random.key(1), jnp.zeros((1, 64, 64, 1)), train=False)
        from ocrs_models_tpu.data import SyntheticDetection

        images = [
            SyntheticDetection(size=1, page_size=(256, 192), seed=s)[0]["image"]
            for s in (5, 6)
        ]
        plain = OcrPipeline(det_vars, rec_vars, det_size=(128, 96))
        sharded = OcrPipeline(
            det_vars, rec_vars, det_size=(128, 96), mesh=create_mesh()
        )
        a = plain.run_batch(images, det_batch=8, rec_batch=8)
        b = sharded.run_batch(images, det_batch=8, rec_batch=8)
        for pa, pb in zip(a, b):
            assert [ln.text for ln in pa] == [ln.text for ln in pb]
            for la, lb in zip(pa, pb):
                np.testing.assert_allclose(la.box, lb.box, rtol=1e-5, atol=1e-4)

    def test_recognize_crops_matches_recognize_lines(self):
        pipe = self._pipe(width_step=64)
        img = np.random.default_rng(0).uniform(
            -0.5, 0.5, (100, 400, 1)
        ).astype(np.float32)
        boxes = [
            np.array([5, 5, 100, 30]),
            np.array([5, 40, 390, 80]),
            np.array([0, 0, 1, 1]),  # degenerate -> ""
        ]
        want = pipe.recognize_lines(img, boxes)
        crops = [pipe._crop_line(img, b) for b in boxes]
        got = pipe._recognize_crops(crops, rec_batch=2)
        assert got == want


class TestLayoutModelGrouping:
    def test_group_from_probs_splits_at_starts(self):
        from ocrs_models_tpu.pipeline import group_lines_from_layout_probs

        boxes = np.array(
            [
                [10, 10, 60, 30],
                [70, 12, 120, 32],
                [10, 50, 80, 70],
                [90, 50, 140, 70],
            ],
            np.float32,
        )
        probs = np.array(
            [[0.9, 0.1], [0.1, 0.8], [0.95, 0.1], [0.1, 0.9]], np.float32
        )
        lines = group_lines_from_layout_probs(boxes, probs)
        assert [m for _, m in lines] == [[0, 1], [2, 3]]
        assert lines[0][0].tolist() == [10, 10, 120, 32]

    def test_group_from_probs_end_forces_break(self):
        from ocrs_models_tpu.pipeline import group_lines_from_layout_probs

        boxes = np.array(
            [[0, 0, 10, 10], [20, 0, 30, 10], [40, 0, 50, 10]], np.float32
        )
        # No explicit start on word 2, but word 1 is marked line_end.
        probs = np.array([[0.9, 0.0], [0.0, 0.9], [0.0, 0.0]], np.float32)
        lines = group_lines_from_layout_probs(boxes, probs)
        assert [m for _, m in lines] == [[0, 1], [2]]

    def test_group_from_probs_leading_non_start(self):
        # First word predicted non-start: it must still open a line (the
        # grouping can never drop a word).
        from ocrs_models_tpu.pipeline import group_lines_from_layout_probs

        boxes = np.array([[0, 0, 10, 10], [20, 0, 30, 10]], np.float32)
        probs = np.array([[0.1, 0.0], [0.1, 0.0]], np.float32)
        lines = group_lines_from_layout_probs(boxes, probs)
        assert [m for _, m in lines] == [[0, 1]]

    def test_group_from_probs_geometry_guard_vetoes_merge(self):
        # Word 2 sits on a different text row (no vertical overlap with
        # word 1) but the model misses its line_start: the geometry guard
        # must force the break anyway.
        from ocrs_models_tpu.pipeline import group_lines_from_layout_probs

        boxes = np.array(
            [[0, 0, 10, 10], [20, 0, 30, 10], [0, 40, 10, 50]], np.float32
        )
        probs = np.array([[0.9, 0.0], [0.1, 0.0], [0.1, 0.0]], np.float32)
        lines = group_lines_from_layout_probs(boxes, probs)
        assert [m for _, m in lines] == [[0, 1], [2]]
        # Without the guard the missed start merges the rows.
        lines = group_lines_from_layout_probs(boxes, probs, geometry_guard=False)
        assert [m for _, m in lines] == [[0, 1, 2]]

    def test_group_from_probs_guard_keeps_same_row_words(self):
        # The guard must NOT split words that do share a row: overlapping
        # y-extents with a low line_start probability stay merged.
        from ocrs_models_tpu.pipeline import group_lines_from_layout_probs

        boxes = np.array(
            [[0, 0, 10, 10], [20, 2, 30, 12], [40, 1, 50, 11]], np.float32
        )
        probs = np.array([[0.9, 0.0], [0.1, 0.0], [0.1, 0.0]], np.float32)
        lines = group_lines_from_layout_probs(boxes, probs)
        assert [m for _, m in lines] == [[0, 1, 2]]

    def test_group_from_probs_empty(self):
        from ocrs_models_tpu.pipeline import group_lines_from_layout_probs

        lines = group_lines_from_layout_probs(
            np.zeros((0, 4), np.float32), np.zeros((0, 2), np.float32)
        )
        assert lines == []

    def test_layout_model_grouping_overflow_words(self):
        """Words beyond the model's padded window become their own lines —
        none are dropped."""
        from ocrs_models_tpu.pipeline import OcrPipeline

        pipe = OcrPipeline.__new__(OcrPipeline)
        pipe.layout_pad_words = 4
        pipe._layout_vars = {}
        # Fake layout forward: everything a confident line start.
        pipe._layout_fwd = lambda v, x: np.tile(
            np.array([[1.0, 0.0]], np.float32), (1, x.shape[1], 1)
        )
        n = 6  # > pad_words
        quads = np.stack(
            [
                np.array(
                    [[i * 20, 0], [i * 20 + 10, 0], [i * 20 + 10, 10], [i * 20, 10]],
                    np.float32,
                )
                for i in range(n)
            ]
        )
        lines = pipe.group_lines_with_layout_model(quads)
        members = sorted(m for _, ms in lines for m in ms)
        assert members == list(range(n))
        assert len(lines) == n  # 4 in-window starts + 2 overflow singletons

    def test_pipeline_layout_grouping_matches_oracle(self):
        """Wire-level test: with an oracle layout forward (perfect
        start/end probabilities), use_layout_model grouping reproduces the
        heuristic's grouping on a clean page."""
        det = DetectionModel()
        rec = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
        det_vars = det.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)), train=False)
        rec_vars = rec.init(jax.random.key(1), jnp.zeros((1, 64, 64, 1)), train=False)

        from ocrs_models_tpu.models import LayoutModel

        layout = LayoutModel()
        layout_vars = {
            "params": layout.init(jax.random.key(2), jnp.zeros((1, 8, 4)))["params"]
        }
        pipe = OcrPipeline(
            det_vars,
            rec_vars,
            layout_variables=layout_vars,
            use_layout_model=True,
            layout_pad_words=16,
        )

        # Oracle: line starts where vertical overlap with the previous box
        # breaks (the training-label rule, reference web_layout.py:140-172).
        def oracle_fwd(variables, padded):
            boxes = np.asarray(padded)[0]
            probs = np.zeros((1, boxes.shape[0], 2), np.float32)
            valid = (boxes[:, 2] - boxes[:, 0]) > 0
            for i in np.nonzero(valid)[0]:
                prev = i - 1
                if i == 0 or not (
                    boxes[prev][1] < boxes[i][3] and boxes[i][1] < boxes[prev][3]
                ):
                    probs[0, i, 0] = 1.0
            return jnp.asarray(probs)

        pipe._layout_fwd = oracle_fwd

        quads = np.stack(
            [
                rect_quad(70, 12, 120, 32),
                rect_quad(10, 10, 60, 30),
                rect_quad(10, 50, 80, 70),
                rect_quad(90, 52, 140, 72),
            ]
        )
        got = pipe.group_lines_with_layout_model(quads)
        want = group_words_into_lines(quads)
        assert [sorted(m) for _, m in got] == [sorted(m) for _, m in want]
        for (gb, _), (wb, _) in zip(got, want):
            np.testing.assert_allclose(gb, wb)

    def test_use_layout_model_requires_variables(self):
        det = DetectionModel()
        rec = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
        det_vars = det.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)), train=False)
        rec_vars = rec.init(jax.random.key(1), jnp.zeros((1, 64, 64, 1)), train=False)
        try:
            OcrPipeline(det_vars, rec_vars, use_layout_model=True)
            assert False, "expected ValueError"
        except ValueError:
            pass
