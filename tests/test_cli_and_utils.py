"""Smoke tests for trainer/eval CLIs, checkpointing, metrics, schedules."""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def run_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


class TestSchedules:
    def test_plateau(self):
        from ocrs_models_tpu.training.schedules import ReduceLROnPlateau

        s = ReduceLROnPlateau(1.0, factor=0.1, patience=2)
        assert s.step(1.0) == 1.0
        assert s.step(0.5) == 1.0  # improvement
        assert s.step(0.5) == 1.0  # bad 1
        assert s.step(0.5) == 1.0  # bad 2
        assert s.step(0.5) == pytest.approx(0.1)  # bad 3 > patience

    def test_warmup(self):
        from ocrs_models_tpu.training.schedules import LinearWarmup

        w = LinearWarmup(1.0, warmup_epochs=4)
        assert w.at_epoch(0) == pytest.approx(0.2)
        assert w.at_epoch(3) == pytest.approx(0.8)
        assert w.at_epoch(10) == 1.0


class TestMetrics:
    def test_cer(self):
        from ocrs_models_tpu.utils.metrics import RecognitionAccuracyStats

        stats = RecognitionAccuracyStats("abc")
        # target "ab"; pred (greedy) "ab" -> 0 errors; and "b" vs "ab" -> 1.
        stats.update(
            targets=np.array([[1, 2, 0], [1, 2, 0]]),
            target_lengths=np.array([2, 2]),
            preds=np.array([[1, 0, 2, 2], [2, 0, 0, 0]]),
            pred_lengths=np.array([4, 4]),
        )
        assert stats.total_chars == 4
        assert stats.char_errors == 1
        assert stats.char_error_rate() == 0.25

    def test_layout_stats(self):
        from ocrs_models_tpu.utils.metrics import LayoutAccuracyStats

        stats = LayoutAccuracyStats()
        probs = np.array([[[0.9, 0.1], [0.2, 0.8]]])
        targets = np.array([[[1.0, 0.0], [0.0, 1.0]]])
        stats.update(probs, targets)
        d = stats.stats_dict()
        assert d["line_start_precision"] == 1.0
        assert d["line_end_recall"] == 1.0


class TestCheckpoint:
    def test_roundtrip(self, run_dir):
        import jax
        import jax.numpy as jnp

        from ocrs_models_tpu.models import LayoutModel
        from ocrs_models_tpu.training.state import create_train_state
        from ocrs_models_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

        model = LayoutModel(n_layers=1)
        state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 4, 4)))
        save_checkpoint("ckpt", state, epoch=7)

        state2 = create_train_state(model, jax.random.key(1), jnp.zeros((1, 4, 4)))
        state2, epoch = load_checkpoint("ckpt", state2)
        assert epoch == 7
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTrainerCLIs:
    @pytest.mark.slow
    def test_layout_trainer_synthetic(self, run_dir):
        from ocrs_models_tpu.training.train_layout import main

        main(
            [
                "synthetic", "--max-images", "8", "--batch-size", "8",
                "--max-epochs", "1", "--num-devices", "2",
            ]
        )
        assert os.path.isdir("text-layout-checkpoint")
        lines = open("text-layout-metrics.jsonl").readlines()
        assert any("train_loss" in line for line in lines)

    @pytest.mark.slow
    def test_rec_trainer_and_eval(self, run_dir):
        from ocrs_models_tpu.training.train_rec import main

        main(
            [
                "synthetic", "-", "--max-images", "8", "--batch-size", "8",
                "--max-epochs", "1", "--no-bf16", "--num-devices", "2",
                "--no-augment",
            ]
        )
        assert os.path.isdir("text-rec-checkpoint")
        # validate-only resume path
        main(
            [
                "synthetic", "-", "--max-images", "8", "--batch-size", "8",
                "--checkpoint", "text-rec-checkpoint", "--validate-only",
                "--no-bf16",
            ]
        )
        # npz export
        main(
            [
                "synthetic", "-", "--checkpoint", "text-rec-checkpoint",
                "--export", "w.npz", "--no-bf16",
            ]
        )
        assert os.path.exists("w.npz")

    @pytest.mark.slow
    def test_eval_layout_cli(self, run_dir):
        from ocrs_models_tpu.training.train_layout import main as train_main
        from ocrs_models_tpu.training.eval_layout import main as eval_main

        train_main(
            ["synthetic", "--max-images", "4", "--batch-size", "4",
             "--max-epochs", "1", "--num-devices", "1"]
        )
        wb = {
            "resolution": {"width": 200, "height": 100},
            "paragraphs": [
                {"words": [{"text": "x", "coords": [5, 5, 50, 20]}]}
            ],
        }
        with open("boxes.json", "w") as f:
            json.dump(wb, f)
        eval_main(
            ["boxes.json", "out.png", "--checkpoint", "text-layout-checkpoint",
             "--colors", "labels"]
        )
        assert os.path.exists("out.png")

    def test_preview_cli(self, run_dir):
        from ocrs_models_tpu.data.__main__ import main

        main(["synthetic-rec", "-", "prev", "--max-images", "2"])
        assert len(os.listdir("prev")) == 2
