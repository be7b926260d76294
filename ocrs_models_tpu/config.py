"""Typed configuration tree.

The reference scatters significant hyperparameters as hard-coded constants
(mask size train_detection.py:22-24, SHRINK_DISTANCE util.py:18, alphabet
hiertext.py:133-142, collation width step train_rec.py:267, grad clip
train_rec.py:148, layout n_words/batch/warmup train_layout.py:205,218,179,
model hyperparams models.py:112,364-369, seed 1234 in all trainers). Here
they live in one dataclass tree so every entry point, test, and benchmark
shares a single source of truth.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

DEFAULT_ALPHABET = (
    " 0123456789!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
    + "€"  # Euro sign
    + "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
)
"""Default recognition alphabet (96 chars; class 0 is the CTC blank).

Matches the reference's published checkpoints (datasets/hiertext.py:133-142)
so weights can be imported with full numerical parity.
"""

SHRINK_DISTANCE = 3.0
"""Pixels by which text polygons are shrunk when rasterizing detection masks
(reference: datasets/util.py:18-24)."""


@dataclasses.dataclass(frozen=True)
class DetectionModelConfig:
    """U-Net text detector (reference: models.py:93-143)."""

    depth_scale: Sequence[int] = (8, 16, 32, 32, 64, 128, 256)
    in_channels: int = 1
    n_masks: int = 1


@dataclasses.dataclass(frozen=True)
class RecognitionModelConfig:
    """CRNN text recognizer (reference: models.py:146-268)."""

    alphabet: str = DEFAULT_ALPHABET
    gru_hidden: int = 256
    gru_layers: int = 2
    image_height: int = 64
    # Factor by which the conv stack downsamples width; the model emits
    # floor(W/4)+1 timesteps but CTC input lengths use W//4
    # (reference: models.py:234-243, train_rec.py:110).
    downsample: int = 4

    @property
    def n_classes(self) -> int:
        return len(self.alphabet) + 1


@dataclasses.dataclass(frozen=True)
class LayoutModelConfig:
    """Transformer word-layout model (reference: models.py:340-406)."""

    n_features: int = 4
    d_model: int = 256
    n_layers: int = 6
    n_heads: int = 4
    d_feedforward: int = 1024
    n_classes: int = 2
    pos_embedding: str = "sin"  # "sin" | "mlp"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh for data-parallel training (new in the TPU build;
    the reference is single-device, SURVEY.md section 2.3)."""

    data_axis: str = "data"
    num_devices: Optional[int] = None  # None => all visible devices


@dataclasses.dataclass(frozen=True)
class DetectionTrainConfig:
    mask_height: int = 800
    mask_width: int = 600  # = mask_height * 0.75 (train_detection.py:22-24)
    batch_size: int = 4
    learning_rate: float = 1e-3  # Adam default (train_detection.py:378)
    seed: int = 1234
    early_stop_epochs: int = 3
    shrink_distance: float = SHRINK_DISTANCE
    checkpoint_name: str = "text-detection-checkpoint"

    @property
    def mask_size(self) -> tuple[int, int]:
        return (self.mask_height, self.mask_width)


@dataclasses.dataclass(frozen=True)
class RecognitionTrainConfig:
    batch_size: int = 20
    learning_rate: float = 1e-3
    plateau_factor: float = 0.1
    plateau_patience: int = 3
    grad_clip_norm: float = 4.0
    seed: int = 1234
    # Line-crop geometry (hiertext.py:288-294).
    output_height: int = 64
    min_width: int = 10
    max_width: int = 800
    # Collation: image widths round up to multiples of this to bound the
    # number of distinct XLA compilations (the reference's stated purpose is
    # GPU memory-fragmentation avoidance, train_rec.py:263-267; under XLA the
    # same bucketing bounds recompilation).
    width_step: int = 256
    checkpoint_name: str = "text-rec-checkpoint"


@dataclasses.dataclass(frozen=True)
class LayoutTrainConfig:
    batch_size: int = 64
    learning_rate: float = 3e-4
    warmup_epochs: int = 50
    n_words: int = 500
    pos_weight: float = 10.0
    max_jitter: int = 10
    seed: int = 1234
    checkpoint_name: str = "text-layout-checkpoint"


@dataclasses.dataclass(frozen=True)
class Config:
    detection: DetectionModelConfig = dataclasses.field(
        default_factory=DetectionModelConfig
    )
    recognition: RecognitionModelConfig = dataclasses.field(
        default_factory=RecognitionModelConfig
    )
    layout: LayoutModelConfig = dataclasses.field(default_factory=LayoutModelConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    detection_train: DetectionTrainConfig = dataclasses.field(
        default_factory=DetectionTrainConfig
    )
    recognition_train: RecognitionTrainConfig = dataclasses.field(
        default_factory=RecognitionTrainConfig
    )
    layout_train: LayoutTrainConfig = dataclasses.field(
        default_factory=LayoutTrainConfig
    )
