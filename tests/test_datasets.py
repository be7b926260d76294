"""Dataset pipelines over synthetic fixtures in the real on-disk formats."""

import gzip
import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from ocrs_models_tpu.config import DEFAULT_ALPHABET
from ocrs_models_tpu.utils.text import decode_text


def _write_jpeg(path, w, h, seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.integers(150, 255, size=(h, w), dtype=np.uint8)
    arr[20:40, 10:100] = 30  # a dark "text line"
    Image.fromarray(arr, mode="L").save(path, format="JPEG")


@pytest.fixture()
def hiertext_root(tmp_path):
    """Minimal HierText-format dataset: 2 train + 1 val image with GT."""
    root = tmp_path / "hiertext"
    for split, n in (("train", 2), ("validation", 1)):
        (root / split).mkdir(parents=True)
        os.makedirs(root / "gt", exist_ok=True)
        annotations = []
        for i in range(n):
            img_id = f"{split}_img{i}"
            _write_jpeg(root / split / f"{img_id}.jpg", 160, 120, seed=i)
            word = {
                "vertices": [[10, 20], [100, 20], [100, 40], [10, 40]],
                "text": "hello",
                "legible": True,
                "handwritten": False,
                "vertical": False,
            }
            line = {
                "vertices": [[10, 20], [100, 20], [100, 40], [10, 40]],
                "text": "hello",
                "legible": True,
                "handwritten": False,
                "vertical": False,
                "words": [word],
            }
            # A second, unusable (vertical) line that filters must drop.
            bad_line = dict(line, vertical=True)
            annotations.append(
                {
                    "image_id": img_id,
                    "image_width": 160,
                    "image_height": 120,
                    "paragraphs": [{"lines": [line, bad_line]}],
                }
            )
        with gzip.open(root / "gt" / f"{split}.jsonl.gz", "wt") as f:
            json.dump({"annotations": annotations}, f)
    return str(root)


class TestHierTextDetection:
    def test_loads_and_masks(self, hiertext_root):
        from ocrs_models_tpu.data.hiertext import HierTextDetection

        ds = HierTextDetection(hiertext_root, train=True)
        assert len(ds) == 2
        sample = ds[0]
        assert sample["image"].shape == (120, 160, 1)
        assert sample["mask"].shape == (120, 160, 1)
        # Mask covers the shrunk word box interior but not its border.
        assert sample["mask"][30, 50, 0] == 1.0
        assert sample["mask"][21, 11, 0] == 0.0
        assert sample["image"].min() >= -0.5 and sample["image"].max() <= 0.5

    def test_max_images(self, hiertext_root):
        from ocrs_models_tpu.data.hiertext import HierTextDetection

        assert len(HierTextDetection(hiertext_root, train=True, max_images=1)) == 1

    def test_missing_dir_raises(self, tmp_path):
        from ocrs_models_tpu.data.hiertext import HierTextDetection

        with pytest.raises(FileNotFoundError):
            HierTextDetection(str(tmp_path / "nope"))


class TestHierTextRecognition:
    def test_line_filters_and_crops(self, hiertext_root):
        from ocrs_models_tpu.data.hiertext import HierTextRecognition

        ds = HierTextRecognition(hiertext_root, train=True)
        # 2 images x 2 lines, but vertical lines are filtered out.
        assert len(ds) == 2
        sample = ds[0]
        assert sample["image"].shape[0] == 64  # fixed height
        assert 10 <= sample["image"].shape[1] <= 800
        assert decode_text(sample["text"], DEFAULT_ALPHABET) == "hello"

    def test_crop_cache_created_and_reused(self, hiertext_root):
        from ocrs_models_tpu.data.hiertext import HierTextRecognition

        ds = HierTextRecognition(hiertext_root, train=True)
        s1 = ds[0]
        cache_dir = os.path.join(hiertext_root, "train-lines-cache")
        assert os.path.isdir(cache_dir)
        n_cached = sum(len(files) for _, _, files in os.walk(cache_dir))
        assert n_cached == 1
        s2 = ds[0]  # second read comes from cache
        np.testing.assert_array_equal(s1["image"], s2["image"])


class TestDDI100:
    def test_loads(self, tmp_path):
        from ocrs_models_tpu.data.ddi100 import DDI100

        root = tmp_path / "ddi"
        (root / "gen_imgs").mkdir(parents=True)
        (root / "gen_boxes").mkdir()
        for i in range(3):
            _write_jpeg(root / "gen_imgs" / f"{i:02d}.png", 100, 80, seed=i)
            # DDI stores (y, x) corners.
            words = [{"box": np.array([[20, 10], [20, 90], [40, 90], [40, 10]])}]
            with open(root / "gen_boxes" / f"{i:02d}.pickle", "wb") as f:
                pickle.dump(words, f)
        ds = DDI100(str(root), train=True)
        assert len(ds) == 2  # 90/10 split of 3 -> 2 train
        sample = ds[0]
        assert sample["image"].shape == (80, 100, 1)
        assert sample["mask"][30, 50, 0] == 1.0

    def test_restricted_unpickler_rejects_code(self, tmp_path):
        from ocrs_models_tpu.data.ddi100 import RestrictedUnpickler

        class Evil:
            def __reduce__(self):
                return (os.system, ("true",))

        import io

        payload = pickle.dumps(Evil())
        with pytest.raises(pickle.UnpicklingError):
            RestrictedUnpickler(io.BytesIO(payload)).load()


class TestWebLayout:
    def _write(self, root, name, n_words=4):
        words = []
        for i in range(n_words):
            x = 10 + i * 60
            words.append({"text": f"w{i}", "coords": [x, 10, x + 50, 30]})
        # Second line.
        words.append({"text": "next", "coords": [10, 50, 60, 70]})
        content = {
            "url": "http://example.com",
            "resolution": {"width": 800, "height": 600},
            "paragraphs": [{"coords": [10, 10, 790, 70], "words": words}],
        }
        with open(os.path.join(root, name), "w") as f:
            json.dump(content, f)

    def test_labels_from_overlap(self, tmp_path):
        from ocrs_models_tpu.data.web_layout import WebLayout

        for i in range(5):
            self._write(str(tmp_path), f"page{i}.json")
        ds = WebLayout(str(tmp_path), train=True, normalize_coords=False)
        assert len(ds) == 4  # 80/20 split
        boxes, labels = ds[0]
        assert boxes.shape == (5, 4)
        # First word starts a line; 4th word ends line 1; last word is both.
        assert labels[0].tolist() == [1.0, 0.0]
        assert labels[3].tolist() == [0.0, 1.0]
        assert labels[4].tolist() == [1.0, 1.0]

    def test_padding(self, tmp_path):
        from ocrs_models_tpu.data.web_layout import WebLayout

        for i in range(5):
            self._write(str(tmp_path), f"p{i}.json")
        ds = WebLayout(str(tmp_path), train=True, padded_size=10, normalize_coords=True)
        boxes, labels = ds[0]
        assert boxes.shape == (10, 4)
        assert labels.shape == (10, 2)
        assert np.all(boxes[5:] == 0)
        assert np.abs(boxes[:5]).max() <= 0.5


class TestDatasetAugmentSeam:
    def test_hiertext_detection_with_augment_is_deterministic(self, hiertext_root):
        from ocrs_models_tpu.data.augment import DetectionAugment
        from ocrs_models_tpu.data.hiertext import HierTextDetection

        t1 = DetectionAugment((192, 144), augment=True, seed=7)
        t2 = DetectionAugment((192, 144), augment=True, seed=7)
        ds1 = HierTextDetection(hiertext_root, train=True, transform=t1)
        ds2 = HierTextDetection(hiertext_root, train=True, transform=t2)
        s1, s2 = ds1[1], ds2[1]
        assert s1["image"].shape == (192, 144, 1)
        np.testing.assert_array_equal(s1["image"], s2["image"])
        np.testing.assert_array_equal(s1["mask"], s2["mask"])

    def test_hiertext_recognition_with_augment(self, hiertext_root):
        from ocrs_models_tpu.data.augment import RecognitionAugment
        from ocrs_models_tpu.data.hiertext import HierTextRecognition

        ds = HierTextRecognition(
            hiertext_root, train=True, transform=RecognitionAugment(seed=3)
        )
        s = ds[0]
        assert s["image"].shape[0] == 64
        assert s["image"].min() >= -0.5 and s["image"].max() <= 0.5


class TestLayoutSynth:
    def test_schema_round_trips_through_web_layout(self, tmp_path):
        from ocrs_models_tpu.data.layout_synth import (
            DocumentSynthesizer,
            write_corpus,
        )
        from ocrs_models_tpu.data.web_layout import WebLayout, extract_word_boxes

        write_corpus(str(tmp_path), 1, seed=3)
        ds = WebLayout(str(tmp_path), train=True, normalize_coords=False,
                       padded_size=500)
        boxes, labels = ds[0]
        assert boxes.shape == (500, 4)
        # Loader output must equal direct extraction from the same page dict.
        content = DocumentSynthesizer(seed=3).page(0)
        b2, l2 = extract_word_boxes(content, normalize_coords=False)
        k = min(len(b2), 500)
        assert np.allclose(boxes[:k], b2[:k])
        assert np.allclose(labels[:k], l2[:k])

    def test_pages_have_document_structure(self):
        from ocrs_models_tpu.data.layout_synth import DocumentSynthesizer

        synth = DocumentSynthesizer(seed=1)
        page = synth.page(0)
        assert page["resolution"]["width"] >= 800
        n_words = sum(len(p["words"]) for p in page["paragraphs"])
        assert len(page["paragraphs"]) >= 4
        assert n_words >= 100
        # Multi-line paragraphs exist (word wrap happened): some paragraph
        # has words on more than one row.
        wrapped = False
        for p in page["paragraphs"]:
            tops = {w["coords"][1] for w in p["words"]}
            if len(tops) > 2:
                wrapped = True
        assert wrapped
        # Word boxes are within the viewport and non-degenerate.
        for p in page["paragraphs"]:
            for w in p["words"]:
                l, t, r, b = w["coords"]
                assert 0 <= l < r <= page["resolution"]["width"]
                assert 0 <= t < b <= page["resolution"]["height"] + 1

    def test_labels_mark_wrap_points(self):
        from ocrs_models_tpu.data.layout_synth import SyntheticDocLayout

        ds = SyntheticDocLayout(size=4, n_words=500, seed=0)
        boxes, labels = ds[0]
        k = int((np.abs(boxes).sum(axis=1) > 0).sum())
        starts = labels[:k, 0].sum()
        ends = labels[:k, 1].sum()
        assert starts > 5  # many lines on a structured page
        assert abs(starts - ends) <= 1  # starts and ends pair up
        # Deterministic per index.
        b2, l2 = SyntheticDocLayout(size=4, n_words=500, seed=0)[0]
        assert np.array_equal(boxes, b2) and np.array_equal(labels, l2)

    def test_train_val_streams_disjoint(self):
        from ocrs_models_tpu.data.layout_synth import SyntheticDocLayout

        tr = SyntheticDocLayout(size=4, seed=0, train=True)
        va = SyntheticDocLayout(size=4, seed=0, train=False)
        bt, _ = tr[0]
        bv, _ = va[0]
        assert not np.array_equal(bt, bv)
