"""WebLayout against a faithful layout-scraper output fixture.

tests/data/scraper_fixture/en.wikipedia.org_wiki_Example-1024x768.json is
hand-derived from the reference scraper's emit code
(layout-scraper/layout-scraper.ts:52-212): JSON.stringify key order
(words before coords — the object-literal insertion order at ts:166),
`filenameForURL(url) + "-WxH".json` naming (ts:229-241,264-266), /\\w+/g
word splitting ("don't" -> don|t, "co-operation" -> co|operation,
ts:181), paragraph entries keyed on block-parent CHANGES so a div
re-entered after a nested blockquote repeats with identical coords
(ts:160-170), the trim check testing only top/left (ts:84-85, so word
bottoms may exceed the viewport), and paragraphs whose every word failed
the trim check ("words": []).

The tests prove the WebLayout loader (and train_layout on top of it)
consumes real scraper output, not just the first-party synthesizer's
self-consistent rendition of the schema.
"""

import json
from pathlib import Path

import pytest

FIXTURE_DIR = Path(__file__).parent / "data" / "scraper_fixture"
FIXTURE = FIXTURE_DIR / "en.wikipedia.org_wiki_Example-1024x768.json"


@pytest.fixture(scope="module")
def content():
    with open(FIXTURE) as f:
        return json.load(f)


def test_fixture_schema_is_scraper_shaped(content):
    assert set(content) == {"url", "resolution", "paragraphs"}
    assert set(content["resolution"]) == {"width", "height"}
    for para in content["paragraphs"]:
        assert set(para) == {"words", "coords"}
        assert len(para["coords"]) == 4
        for w in para["words"]:
            assert set(w) == {"text", "coords"}
            # /\w+/g cannot emit whitespace or punctuation.
            assert w["text"].isalnum() or "_" in w["text"]
    # Edge cases the fixture must keep encoding:
    coords = [tuple(p["coords"]) for p in content["paragraphs"]]
    assert len(coords) != len(set(coords)), "block re-entry duplicate lost"
    assert any(not p["words"] for p in content["paragraphs"]), (
        "empty-words paragraph lost"
    )
    vh = content["resolution"]["height"]
    kept_bottoms = [
        w["coords"][3] for p in content["paragraphs"] for w in p["words"]
    ]
    assert any(b > vh for b in kept_bottoms), (
        "trim keeps words whose top is above the fold even when the "
        "bottom crosses it (ts:84-85)"
    )


def test_extract_word_boxes_labels(content):
    from ocrs_models_tpu.data.web_layout import extract_word_boxes

    boxes, labels = extract_word_boxes(content, normalize_coords=False)
    n_words = sum(len(p["words"]) for p in content["paragraphs"])
    assert boxes.shape == (n_words, 4) and labels.shape == (n_words, 2)

    texts = [w["text"] for p in content["paragraphs"] for w in p["words"]]
    # Heading line: start on first word, end on last.
    assert labels[texts.index("Example")].tolist() == [1.0, 0.0]
    assert labels[texts.index("article")].tolist() == [0.0, 1.0]
    # Body paragraph: wrapped lines break where vertical overlap dies.
    assert labels[texts.index("The")].tolist() == [1.0, 0.0]
    assert labels[texts.index("over")].tolist() == [0.0, 1.0]  # line 1 end
    assert labels[texts.index("the")].tolist() == [1.0, 0.0]  # line 2 start
    assert labels[texts.index("words")].tolist() == [0.0, 1.0]
    assert labels[texts.index("don")].tolist() == [1.0, 0.0]
    assert labels[texts.index("operation")].tolist() == [0.0, 1.0]
    # Sidebar: the fold-crossing second line is its own line.
    assert labels[texts.index("links")].tolist() == [0.0, 1.0]
    assert labels[texts.index("External")].tolist() == [1.0, 0.0]
    assert labels[texts.index("resources")].tolist() == [0.0, 1.0]
    # Normalized path stays in range horizontally; the fold-crossing word
    # bottom may exceed +0.5 by design.
    nboxes, _ = extract_word_boxes(content, normalize_coords=True)
    assert nboxes[:, 0].min() >= -0.5 and nboxes[:, 2].max() <= 0.5


def test_webloader_reads_fixture_dir():
    from ocrs_models_tpu.data.web_layout import WebLayout

    ds = WebLayout(
        str(FIXTURE_DIR),
        train=True,
        padded_size=64,
        normalize_coords=False,
    )
    assert len(ds) == 1
    boxes, labels = ds[0]
    assert boxes.shape == (64, 4) and labels.shape == (64, 2)
    assert labels[:32].sum() > 0 and labels[32:].sum() == 0  # zero padding


@pytest.mark.slow
def test_train_layout_runs_on_fixture(tmp_path, monkeypatch):
    """One real optimizer epoch of the layout trainer over the scraper
    fixture (train split = the single file)."""
    from ocrs_models_tpu.training import train_layout

    monkeypatch.chdir(tmp_path)  # trainers write checkpoints/metrics to CWD
    train_layout.main(
        [
            str(FIXTURE_DIR),
            "--max-epochs",
            "1",
            "--batch-size",
            "2",
            "--no-bf16",
        ]
    )
