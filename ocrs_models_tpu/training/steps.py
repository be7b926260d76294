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
from ..ops.platform import effective_platform


def layer_grad_norms(grads) -> dict:
    """Per-top-level-module gradient norms — the hermetic equivalent of the
    reference's ``wandb.watch(model)`` gradient histograms
    (train_detection.py:426-438)."""
    return {k: optax.global_norm(v) for k, v in grads.items()}


# ------------------------------ recognition ------------------------------


def make_recognition_steps(
    model,
    downsample: int = 4,
    mesh=None,
    axis: str = "data",
    force_shard_map: bool = False,
):
    """Build (train_step, eval_step) for the CRNN recognizer.

    Batch fields: ``image`` [N,64,W,1] float, ``text`` [N,L] int32 (blank
    padded), ``text_len`` [N] int32, ``image_width`` [N] int32,
    ``sample_weight`` [N] float32.

    With ``mesh`` of size > 1 the step is built with ``jax.shard_map``
    (manual SPMD: per-device batch shard, explicit ``psum`` of loss
    numerator/denominator and gradients, ``pmean`` of batch stats) — this
    keeps the Pallas GRU kernel a per-device call on TPU. Without a mesh
    (or size 1) it is a plain jit and GSPMD handles any sharding;
    ``force_shard_map=True`` builds the shard_map step even on a size-1
    mesh (used to exercise/measure the manual-SPMD path on one real chip).
    """

    use_shard_map = mesh is not None and (mesh.size > 1 or force_shard_map)
    if (
        use_shard_map
        and effective_platform() == "tpu"
        and getattr(model, "gru_backend", None) == "auto"
    ):
        # Inside shard_map the recurrence is a per-device call, so the
        # Pallas kernel applies even though the global device count is > 1.
        model = model.clone(gru_backend="pallas4")

    def local_parts(params, batch_stats, batch, train):
        """Per-shard (loss numerator, denominator, preds, stats) with NO
        collectives — keeping psum out of the differentiated function makes
        the gradient math independent of shard_map's transpose rules for
        collectives (check_vma modes transpose psum differently)."""
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
        # over valid samples (sample_weight masks padding rows).
        w = batch["sample_weight"]
        per_sample = nll / jnp.maximum(batch["text_len"], 1)
        return jnp.sum(per_sample * w), jnp.sum(w), log_probs, new_stats

    def train_step_core(state, batch, lr):
        def local_num(params):
            num, den, log_probs, new_stats = local_parts(
                params, state.batch_stats, batch, True
            )
            return num, (den, log_probs, new_stats)

        (num, (den, log_probs, new_stats)), grads = jax.value_and_grad(
            local_num, has_aux=True
        )(state.params)
        if use_shard_map:
            # grads here = d(num_local)/dθ exactly (no collectives under the
            # grad). Global gradient of Σnum/Σden is psum(grads)/psum(den);
            # batch stats pmean approximates global batch statistics from
            # per-shard moments.
            num = jax.lax.psum(num, axis)
            den = jax.lax.psum(den, axis)
            grads = jax.lax.psum(grads, axis)
            new_stats = jax.lax.pmean(new_stats, axis)
        den = jnp.maximum(den, 1.0)
        loss = num / den
        grads = jax.tree.map(lambda g: g / den, grads)
        grad_norm = optax.global_norm(grads)
        state = state.apply_gradients(grads, lr, new_batch_stats=new_stats)
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "grad_norms": layer_grad_norms(grads),
            "preds": jnp.argmax(log_probs, axis=-1).astype(jnp.int32),
        }
        return state, metrics

    def eval_step_core(state, batch):
        num, den, log_probs, _ = local_parts(
            state.params, state.batch_stats, batch, False
        )
        if use_shard_map:
            num = jax.lax.psum(num, axis)
            den = jax.lax.psum(den, axis)
        return {
            "loss": num / jnp.maximum(den, 1.0),
            "preds": jnp.argmax(log_probs, axis=-1).astype(jnp.int32),
        }

    if not use_shard_map:
        return jax.jit(train_step_core, donate_argnums=0), jax.jit(eval_step_core)

    from jax.sharding import PartitionSpec as P

    rep = P()
    batch_spec = P(axis)

    def specs_like(tree, spec):
        return jax.tree.map(lambda _: spec, tree)

    def train_step(state, batch, lr):
        mapped = jax.shard_map(
            train_step_core,
            mesh=mesh,
            in_specs=(specs_like(state, rep), specs_like(batch, batch_spec), rep),
            out_specs=(
                specs_like(state, rep),
                {
                    "loss": rep,
                    "grad_norm": rep,
                    "grad_norms": rep,
                    "preds": batch_spec,
                },
            ),
            check_vma=False,
        )
        return mapped(state, batch, lr)

    def eval_step(state, batch):
        mapped = jax.shard_map(
            eval_step_core,
            mesh=mesh,
            in_specs=(specs_like(state, rep), specs_like(batch, batch_spec)),
            out_specs={"loss": rep, "preds": batch_spec},
            check_vma=False,
        )
        return mapped(state, batch)

    return jax.jit(train_step, donate_argnums=0), jax.jit(eval_step)


# ------------------------------- detection -------------------------------


def make_detection_steps(model):
    """Build (train_step, eval_step) for the U-Net detector.

    Batch fields: ``image`` [N,H,W,1], ``mask`` [N,H,W,1], optional
    ``sample_weight`` [N] excluding batch-padding rows from the loss.
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
        loss = balanced_cross_entropy_loss(
            pred, batch["mask"], batch.get("sample_weight")
        )
        return loss, (pred, new_stats)

    def train_step(state, batch, lr):
        (loss, (pred, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, True
        )
        state = state.apply_gradients(grads, lr, new_batch_stats=new_stats)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "grad_norms": layer_grad_norms(grads),
            # Returned for --debug-images train-batch dumps (reference
            # train_detection.py:102-109); stays on device unless fetched.
            "pred": pred,
        }
        return state, metrics

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
        loss = weighted_bce_with_logits(
            logits, batch["labels"], pos_weight, batch.get("sample_weight")
        )
        return loss, logits

    def train_step(state, batch, lr, rng):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, True
        )
        state = state.apply_gradients(grads, lr)
        return state, {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "grad_norms": layer_grad_norms(grads),
            "probs": jax.nn.sigmoid(logits),
        }

    def eval_step(state, batch):
        loss, logits = loss_fn(state.params, batch, None, False)
        return {"loss": loss, "probs": jax.nn.sigmoid(logits)}

    return jax.jit(train_step, donate_argnums=0), jax.jit(eval_step)
