"""Layout model evaluation/preview CLI.

Capability parity with ``python -m ocrs_models.eval_layout``
(eval_layout.py): word-boxes JSON -> layout model probabilities -> boxes
rendered colored by labels or per-class probabilities.

Usage:
    python -m ocrs_models_tpu.training.eval_layout <word_box_file> <out.png> \
        --checkpoint <ckpt_dir> [--colors labels|line-start-probs|line-end-probs]
"""

from __future__ import annotations

import json
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from ..models import LayoutModel
from ..utils.checkpoint import load_checkpoint
from ..utils.render import draw_word_boxes
from .state import create_train_state


def word_box_tensor(
    word_boxes: list[list[float]],
    img_width: int,
    img_height: int,
    normalize_coords: bool = False,
) -> np.ndarray:
    """[left, top, right, bottom] rows -> model input array [W, 4]."""
    x = np.asarray(word_boxes, dtype=np.float32).reshape(-1, 4)
    if normalize_coords:
        x = x / np.array([img_width, img_height, img_width, img_height]) - 0.5
    return x


def main(argv=None):
    parser = ArgumentParser("Evaluate text layout model and preview results.")
    parser.add_argument("word_box_file")
    parser.add_argument("output_file")
    parser.add_argument("--checkpoint", required=True, type=str)
    parser.add_argument(
        "--colors", choices=["labels", "line-start-probs", "line-end-probs"]
    )
    args = parser.parse_args(argv)

    # Fail fast (with a diagnostic) instead of hanging if the TPU runtime
    # is wedged — a bounded subprocess probe, see utils/backend.py.
    from ..utils.backend import ensure_backend

    ensure_backend()

    model = LayoutModel(return_probs=True)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 8, 4)))
    state, _ = load_checkpoint(args.checkpoint, state)

    with open(args.word_box_file) as f:
        wb = json.load(f)
    img_width = wb["resolution"]["width"]
    img_height = wb["resolution"]["height"]
    word_list = [
        [float(c) for c in word["coords"]]
        for para in wb["paragraphs"]
        for word in para["words"]
    ]
    boxes = word_box_tensor(word_list, img_width, img_height)
    probs = np.asarray(
        model.apply({"params": state.params}, jnp.array(boxes[None]), train=False)
    )[0]

    labels = prob_vec = None
    match args.colors:
        case "labels":
            labels = probs > 0.5
            print(
                f"Words {len(word_list)} predicted line starts "
                f"{int(labels[:, 0].sum())} line ends {int(labels[:, 1].sum())}"
            )
        case "line-start-probs":
            prob_vec = probs[:, 0]
        case "line-end-probs":
            prob_vec = probs[:, 1]

    draw_word_boxes(
        args.output_file, img_width, img_height, boxes, labels, prob_vec
    )


if __name__ == "__main__":
    main()
