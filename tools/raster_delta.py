"""Bound the PIL-vs-first-party rasterization delta (VERDICT r1 task 8).

The first-party scanline fill (geometry/raster.py) fills every pixel the
polygon geometrically touches; PIL's ImageDraw.polygon (the reference's
rasterizer, datasets/util.py:78-110) under-fills some vertex rows. This
tool quantifies whether that difference can move detection training:

1. Renders N HierText-like pages: rotated word quads laid out in lines
   (sizes/aspect/rotation drawn from HierText-typical ranges), shrunk by
   the 3 px SHRINK_DISTANCE, rasterized with BOTH rules.
2. Reports pixel-level deltas (differing px fraction, per-mask IoU).
3. Reports the training-signal delta: balanced-BCE loss computed against
   both mask variants for the same prediction (a noisy sigmoid of the
   PIL mask — worst case, since loss is most sensitive near the target
   boundary), and the loss-gradient cosine similarity.

Writes RASTER_DELTA.json at the repo root.
"""

import json
import os
import sys

import numpy as np
from PIL import Image, ImageDraw

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pil_mask(width, height, polys):
    """Reference rasterization rule: PIL ImageDraw.polygon per polygon
    (reference datasets/util.py:93-103)."""
    img = Image.new("1", (width, height), 0)
    draw = ImageDraw.Draw(img)
    for poly in polys:
        if len(poly) >= 3:
            draw.polygon([tuple(p) for p in poly], fill=1)
    return np.asarray(img, dtype=np.float32)


def make_page(rng, width=608, height=800):
    """HierText-like word quads: lines of words with per-word rotation."""
    polys = []
    y = 20.0
    while y < height - 60:
        line_h = rng.uniform(14, 48)
        x = rng.uniform(5, 40)
        rot = np.deg2rad(rng.uniform(-4, 4))
        while x < width - 40:
            w = rng.uniform(1.0, 8.0) * line_h
            quad = np.array(
                [[0, 0], [w, 0], [w, line_h], [0, line_h]], dtype=np.float64
            )
            c, s = np.cos(rot), np.sin(rot)
            quad = quad @ np.array([[c, s], [-s, c]]) + [x, y]
            # sub-pixel placement exercises the vertex-row rule
            quad += rng.uniform(-0.5, 0.5, size=2)
            polys.append(quad)
            x += w + rng.uniform(4, 20)
        y += line_h + rng.uniform(6, 30)
    return polys


def main():
    from ocrs_models_tpu.geometry.polygon import shrink_polygon
    from ocrs_models_tpu.geometry.raster import fill_polygon

    rng = np.random.default_rng(42)
    n_pages = 200
    width, height = 608, 800

    tot_px = 0
    tot_diff = 0
    tot_mask_px = 0
    ious = []
    loss_rel_deltas = []
    grad_cos = []

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ocrs_models_tpu.ops.losses import balanced_cross_entropy_loss

    loss_grad = jax.jit(
        jax.value_and_grad(
            lambda pred, tgt: balanced_cross_entropy_loss(pred[None], tgt[None])
        )
    )

    n_words = 0
    for _ in range(n_pages):
        polys = [shrink_polygon(p, 3.0) for p in make_page(rng, width, height)]
        polys = [p for p in polys if len(p) >= 3]
        n_words += len(polys)

        ours = np.zeros((height, width), dtype=np.uint8)
        for p in polys:
            fill_polygon(width, height, p, out=ours)
        ours = ours.astype(np.float32)
        ref = pil_mask(width, height, polys)

        diff = ours != ref
        inter = np.logical_and(ours > 0, ref > 0).sum()
        union = np.logical_or(ours > 0, ref > 0).sum()
        tot_px += diff.size
        tot_diff += diff.sum()
        tot_mask_px += ref.sum()
        if union:
            ious.append(inter / union)

        # Worst-case training sensitivity: prediction hugging the reference
        # mask with boundary noise.
        noise = rng.normal(0, 0.15, ref.shape).astype(np.float32)
        pred = np.clip(ref * 0.9 + 0.05 + noise, 1e-4, 1 - 1e-4)
        pred_j = jnp.asarray(pred)
        l_ref, g_ref = loss_grad(pred_j, jnp.asarray(ref))
        l_ours, g_ours = loss_grad(pred_j, jnp.asarray(ours))
        l_ref, l_ours = float(l_ref), float(l_ours)
        loss_rel_deltas.append(abs(l_ours - l_ref) / max(l_ref, 1e-9))
        g_ref = np.asarray(g_ref).ravel()
        g_ours = np.asarray(g_ours).ravel()
        denom = np.linalg.norm(g_ref) * np.linalg.norm(g_ours)
        grad_cos.append(float(g_ref @ g_ours / max(denom, 1e-12)))

    report = {
        "n_pages": n_pages,
        "n_word_polygons": n_words,
        "differing_pixel_fraction": tot_diff / tot_px,
        "differing_fraction_of_text_pixels": float(tot_diff / max(tot_mask_px, 1)),
        "mean_mask_iou": float(np.mean(ious)),
        "min_mask_iou": float(np.min(ious)),
        "balanced_bce_rel_delta_mean": float(np.mean(loss_rel_deltas)),
        "balanced_bce_rel_delta_max": float(np.max(loss_rel_deltas)),
        "loss_grad_cosine_mean": float(np.mean(grad_cos)),
        "loss_grad_cosine_min": float(np.min(grad_cos)),
        "verdict_gate": "differing pixels <0.3% of mask px OR loss delta immaterial",
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "RASTER_DELTA.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
