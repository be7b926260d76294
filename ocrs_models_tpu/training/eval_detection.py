"""Single-image detection inference CLI.

Capability parity with ``python -m ocrs_models.eval_detection``
(eval_detection.py): load checkpoint -> resize to the training size ->
forward -> binarize at 0.5 -> nearest-upsample the mask to the input size
-> extract word quads -> expand by SHRINK_DISTANCE -> save input /
text-probs / text-regions / word-boxes PNGs; prints predict wall-clock.

Usage:
    python -m ocrs_models_tpu.training.eval_detection <ckpt_dir> <image> <out_basename>
"""

from __future__ import annotations

import sys
import time
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..config import SHRINK_DISTANCE, DetectionTrainConfig
from ..data.augment import resize
from ..geometry import expand_quads, extract_cc_quads
from ..models import DetectionModel
from ..utils.checkpoint import load_checkpoint
from ..utils.render import draw_quads, to_pil_grey
from .state import create_train_state


def main(argv=None):
    parser = ArgumentParser(description="Run text detection on one image.")
    parser.add_argument("model", help="Checkpoint directory")
    parser.add_argument("image")
    parser.add_argument("out_basename")
    args = parser.parse_args(argv)

    # Fail fast (with a diagnostic) instead of hanging if the TPU runtime
    # is wedged — a bounded subprocess probe, see utils/backend.py.
    from ..utils.backend import ensure_backend

    ensure_backend()

    cfg = DetectionTrainConfig()
    model = DetectionModel()
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
    state, _ = load_checkpoint(args.model, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    with Image.open(args.image) as pil:
        grey = np.asarray(pil.convert("L"), dtype=np.float32)
    input_h, input_w = grey.shape
    input_img = (grey / 255.0 - 0.5)[..., None]

    img = resize(input_img, cfg.mask_size)
    to_pil_grey(img).save(f"{args.out_basename}-input.png")

    forward = jax.jit(lambda v, x: model.apply(v, x, train=False))
    x = jnp.array(img[None])
    pred = np.asarray(forward(variables, x))  # warm-up/compile
    start = time.time()
    pred = np.asarray(forward(variables, x))
    print(f"Predicted text in {time.time() - start:.2f}s", file=sys.stderr)

    probs = pred[0]  # [H, W, 1]
    binary = np.where(probs > 0.5, 1.0, 0.0)
    binary_full = resize(binary, (input_h, input_w), nearest=True)[..., 0]
    text_regions = ((grey / 255.0) * binary_full - 0.5).astype(np.float32)

    to_pil_grey(text_regions[..., None]).save(f"{args.out_basename}-text-regions.png")
    to_pil_grey(probs - 0.5).save(f"{args.out_basename}-text-probs.png")

    quads = extract_cc_quads(binary_full)
    quads = expand_quads(quads, dist=SHRINK_DISTANCE)
    draw_quads(input_img, quads).save(f"{args.out_basename}-text-words.png")
    print(f"Found {len(quads)} words")


if __name__ == "__main__":
    main()
