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


def _split_microbatches(batch, k: int):
    """Split every ``[N, ...]`` leaf into ``[k, N // k, ...]`` microbatches
    for a ``lax.scan``, with a STRIDED interleave: microbatch ``i`` takes
    samples ``i, i+k, i+2k, ...``. Under GSPMD with the batch sharded
    along axis 0 this split is device-local — each device's contiguous
    shard contributes the same row range to every microbatch — whereas a
    contiguous ``[k, n//k]`` block split would place whole microbatches on
    subsets of devices and reshard the batch across ICI every scan step.
    N must be divisible by k (the trainers' collation pads every batch
    to a multiple of ``k * mesh.size`` with zero-weight rows)."""

    def split(x):
        n = x.shape[0]
        if n % k:
            raise ValueError(
                f"batch size {n} not divisible by grad_accum={k}"
            )
        view = x.reshape((n // k, k) + x.shape[1:])
        return jnp.transpose(view, (1, 0) + tuple(range(2, view.ndim)))

    return jax.tree.map(split, batch)


def _merge_microbatches(stacked, batch_axis: int = 0):
    """Invert :func:`_split_microbatches` on a scan-stacked ``[k, ...]``
    per-microbatch output whose batch dimension is ``batch_axis`` of the
    per-microbatch array: sample ``j*k + i`` sits at ``stacked[i, ..j..]``,
    so moving ``k`` to just after the batch axis and merging restores the
    original sample order."""
    perm = (
        list(range(1, batch_axis + 2))
        + [0]
        + list(range(batch_axis + 2, stacked.ndim))
    )
    moved = jnp.transpose(stacked, perm)
    shape = list(moved.shape)
    merged = (
        shape[:batch_axis]
        + [shape[batch_axis] * shape[batch_axis + 1]]
        + shape[batch_axis + 2 :]
    )
    return moved.reshape(merged)


def _valid_count(batch, n: int):
    """Number of non-padding samples in a (micro)batch: the loss
    denominator each microbatch's gradient is weighted by."""
    w = batch.get("sample_weight")
    return jnp.sum(w) if w is not None else jnp.float32(n)


# ------------------------------ recognition ------------------------------


def make_recognition_steps(
    model,
    downsample: int = 4,
    mesh=None,
    axis: str = "data",
    force_shard_map: bool = False,
    grad_accum: int = 1,
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

    ``grad_accum=k`` splits the (per-device) batch into ``k`` microbatches
    driven by a ``lax.scan`` inside the one jitted step, summing loss
    numerators/denominators and gradients before the single optimizer
    update — activation memory drops ~k× at identical optimizer math (the
    CTC sum/count algebra makes the accumulated gradient *exactly* the
    full-batch gradient for fixed batch statistics; BatchNorm simply sees
    ``k`` sequential microbatches, as it would under torch-style
    accumulation). Composes with shard_map: each device scans over its
    own shard's microbatches, then psums once.
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

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

    def micro_value_and_grad(params, batch_stats, mb):
        def local_num(p):
            num, den, log_probs, new_stats = local_parts(p, batch_stats, mb, True)
            return num, (den, log_probs, new_stats)

        return jax.value_and_grad(local_num, has_aux=True)(params)

    def train_step_core(state, batch, lr):
        if grad_accum == 1:
            (num, (den, log_probs, new_stats)), grads = micro_value_and_grad(
                state.params, state.batch_stats, batch
            )
        else:
            micro = _split_microbatches(batch, grad_accum)

            def body(carry, mb):
                num_a, den_a, grads_a, bstats = carry
                (num, (den, log_probs, new_stats)), g = micro_value_and_grad(
                    state.params, bstats, mb
                )
                grads_a = jax.tree.map(jnp.add, grads_a, g)
                return (num_a + num, den_a + den, grads_a, new_stats), log_probs

            init = (
                jnp.float32(0.0),
                jnp.float32(0.0),
                jax.tree.map(jnp.zeros_like, state.params),
                state.batch_stats,
            )
            (num, den, grads, new_stats), stacked = jax.lax.scan(
                body, init, micro
            )
            # [k, n, T, C] -> [k*n, T, C], restoring original sample order
            # (log_probs are batch-major, ctc.py:47).
            log_probs = _merge_microbatches(stacked)
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


def make_detection_steps(model, grad_accum: int = 1):
    """Build (train_step, eval_step) for the U-Net detector.

    Batch fields: ``image`` [N,H,W,1], ``mask`` [N,H,W,1], optional
    ``sample_weight`` [N] excluding batch-padding rows from the loss.

    ``grad_accum=k`` scans over ``k`` microbatches inside the jitted step
    (~k× lower activation memory — the 800×600 page activations, not the
    622k params, bound detection batch size; reference envelope 28 @24 GB,
    docs/training.md:111-121). Each microbatch's loss/gradient is weighted
    by its valid-sample count. Note the balanced-BCE top-k pixel pools
    (losses.py) then equalize *within each microbatch* rather than across
    the full batch — the same semantics a torch user gets when splitting
    a batch across accumulation steps (reference train_detection.py's loss
    operates on whatever tensor reaches it).
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

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
        if grad_accum == 1:
            (loss, (pred, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch, True)
        else:
            micro = _split_microbatches(batch, grad_accum)
            n_micro = batch["image"].shape[0] // grad_accum

            def body(carry, mb):
                loss_a, den_a, grads_a, bstats = carry
                (mb_loss, (pred, new_stats)), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, bstats, mb, True)
                den = _valid_count(mb, n_micro)
                grads_a = jax.tree.map(
                    lambda a, b: a + b * den, grads_a, g
                )
                return (
                    loss_a + mb_loss * den,
                    den_a + den,
                    grads_a,
                    new_stats,
                ), pred

            init = (
                jnp.float32(0.0),
                jnp.float32(0.0),
                jax.tree.map(jnp.zeros_like, state.params),
                state.batch_stats,
            )
            (loss_sum, den, grads, new_stats), stacked = jax.lax.scan(
                body, init, micro
            )
            den = jnp.maximum(den, 1.0)
            loss = loss_sum / den
            grads = jax.tree.map(lambda g: g / den, grads)
            pred = _merge_microbatches(stacked)
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


def make_layout_steps(model, pos_weight: float = 10.0, grad_accum: int = 1):
    """Build (train_step, eval_step) for the layout transformer.

    Batch fields: ``boxes`` [N,W,4], ``labels`` [N,W,2]. Padded words carry
    zero boxes/labels and participate in the loss, matching the reference
    (train_layout.py:94-97 over zero-padded tensors).

    ``grad_accum=k`` scans over ``k`` microbatches inside the jitted step;
    since the BCE loss is an element mean and the encoder has no batch
    statistics, the accumulated (valid-count-weighted) gradient equals the
    full-batch gradient exactly up to dropout randomness (each microbatch
    draws its own dropout rng fold).
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

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
        if grad_accum == 1:
            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng, True
            )
        else:
            micro = _split_microbatches(batch, grad_accum)
            n_micro = batch["boxes"].shape[0] // grad_accum
            rngs = jax.random.split(rng, grad_accum)

            def body(carry, xs):
                loss_a, den_a, grads_a = carry
                mb, mb_rng = xs
                (mb_loss, logits), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, mb, mb_rng, True)
                den = _valid_count(mb, n_micro)
                grads_a = jax.tree.map(lambda a, b: a + b * den, grads_a, g)
                return (loss_a + mb_loss * den, den_a + den, grads_a), logits

            init = (
                jnp.float32(0.0),
                jnp.float32(0.0),
                jax.tree.map(jnp.zeros_like, state.params),
            )
            (loss_sum, den, grads), stacked = jax.lax.scan(
                body, init, (micro, rngs)
            )
            den = jnp.maximum(den, 1.0)
            loss = loss_sum / den
            grads = jax.tree.map(lambda g: g / den, grads)
            logits = _merge_microbatches(stacked)
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
