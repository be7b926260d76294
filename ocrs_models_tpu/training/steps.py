"""Jitted train/eval steps for the three tasks.

One mesh-agnostic step per task: parameters arrive replicated, batches
arrive sharded along the ``data`` axis, and XLA's GSPMD partitioner inserts
the gradient all-reduce over ICI — there is no explicit collective code
(SURVEY.md §2.3: this subsystem replaces the reference's absent distributed
layer, not any ported code).

Conventions shared by all steps:
- ``lr`` is a scalar argument (host-driven schedules don't recompile).
- Batches may contain padding rows (to keep batch size divisible by the
  mesh); ``sample_weight`` zeroes them out of the loss. The reference
  instead *drops* CTC-incompatible samples at collation (train_rec.py:
  277-283) — masking is the static-shape equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..ops.ctc import ctc_loss_forward
from ..ops.losses import balanced_cross_entropy_loss, weighted_bce_with_logits


# ------------------------------ recognition ------------------------------


def make_recognition_steps(model, downsample: int = 4):
    """Build (train_step, eval_step) for the CRNN recognizer.

    Batch fields: ``image`` [N,64,W,1] float, ``text`` [N,L] int32 (blank
    padded), ``text_len`` [N] int32, ``image_width`` [N] int32,
    ``sample_weight`` [N] float32.
    """

    def loss_and_preds(params, batch_stats, batch, train, rngs=None):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            log_probs, mutated = model.apply(
                variables, batch["image"], train=True, mutable=["batch_stats"]
            )
            new_stats = mutated["batch_stats"]
        else:
            log_probs = model.apply(variables, batch["image"], train=False)
            new_stats = batch_stats
        # CTC input lengths use W//4, deliberately undercounting the model's
        # floor(W/4)+1 output by one (reference train_rec.py:110).
        input_lengths = batch["image_width"] // downsample
        nll = ctc_loss_forward(
            log_probs, batch["text"], input_lengths, batch["text_len"]
        )
        # torch CTCLoss 'mean': per-sample NLL / target_len, then batch mean
        # — computed over valid samples only.
        w = batch["sample_weight"]
        per_sample = nll / jnp.maximum(batch["text_len"], 1)
        loss = jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, (log_probs, new_stats)

    def train_step(state, batch, lr):
        (loss, (log_probs, new_stats)), grads = jax.value_and_grad(
            loss_and_preds, has_aux=True
        )(state.params, state.batch_stats, batch, True)
        grad_norm = optax.global_norm(grads)
        state = state.apply_gradients(grads, lr, new_batch_stats=new_stats)
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "preds": jnp.argmax(log_probs, axis=-1).astype(jnp.int32),
        }
        return state, metrics

    def eval_step(state, batch):
        loss, (log_probs, _) = loss_and_preds(
            state.params, state.batch_stats, batch, False
        )
        return {
            "loss": loss,
            "preds": jnp.argmax(log_probs, axis=-1).astype(jnp.int32),
        }

    return jax.jit(train_step, donate_argnums=0), jax.jit(eval_step)


# ------------------------------- detection -------------------------------


def make_detection_steps(model):
    """Build (train_step, eval_step) for the U-Net detector.

    Batch fields: ``image`` [N,H,W,1], ``mask`` [N,H,W,1].
    """

    def loss_fn(params, batch_stats, batch, train):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            pred, mutated = model.apply(
                variables, batch["image"], train=True, mutable=["batch_stats"]
            )
            new_stats = mutated["batch_stats"]
        else:
            pred = model.apply(variables, batch["image"], train=False)
            new_stats = batch_stats
        loss = balanced_cross_entropy_loss(pred, batch["mask"])
        return loss, (pred, new_stats)

    def train_step(state, batch, lr):
        (loss, (_, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, True
        )
        state = state.apply_gradients(grads, lr, new_batch_stats=new_stats)
        return state, {"loss": loss}

    def eval_step(state, batch):
        loss, (pred, _) = loss_fn(state.params, state.batch_stats, batch, False)
        return {"loss": loss, "pred": pred}

    return jax.jit(train_step, donate_argnums=0), jax.jit(eval_step)


# --------------------------------- layout --------------------------------


def make_layout_steps(model, pos_weight: float = 10.0):
    """Build (train_step, eval_step) for the layout transformer.

    Batch fields: ``boxes`` [N,W,4], ``labels`` [N,W,2]. Padded words carry
    zero boxes/labels and participate in the loss, matching the reference
    (train_layout.py:94-97 over zero-padded tensors).
    """

    def loss_fn(params, batch, rng, train):
        logits = model.apply(
            {"params": params},
            batch["boxes"],
            train=train,
            rngs={"dropout": rng} if train else None,
        )
        loss = weighted_bce_with_logits(logits, batch["labels"], pos_weight)
        return loss, logits

    def train_step(state, batch, lr, rng):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, True
        )
        state = state.apply_gradients(grads, lr)
        return state, {"loss": loss, "probs": jax.nn.sigmoid(logits)}

    def eval_step(state, batch):
        loss, logits = loss_fn(state.params, batch, None, False)
        return {"loss": loss, "probs": jax.nn.sigmoid(logits)}

    return jax.jit(train_step, donate_argnums=0), jax.jit(eval_step)
