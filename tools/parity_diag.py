"""Diagnose the round-2 parity-oracle divergence (VERDICT item 2).

Round-2 PARITY.json: the torch reference recipe stalled at CER 0.468 on a
stream where the Flax model reached 0.028 — a 17x outcome gap on identical
batches. This tool isolates the cause with three experiments:

  1. same-weights single-batch check: torch loss/grad-norms vs Flax
     loss/grad-norms from the IDENTICAL (torch-initialized) weights on the
     same batch — any delta here is a harness bug (lengths, layout, loss
     scaling, clip/Adam wiring).
  2. flax-from-torch-init training: run the Flax recipe from torch's exact
     init. Converges => init distribution (torch kaiming-uniform vs flax
     lecun-normal) is the cause; stalls => dynamics differ.
  3. torch seed/schedule sweep: the reference recipe's actual scheduler is
     ReduceLROnPlateau(factor 0.1, patience 3) (train_rec.py:381-385) which
     the round-2 harness omitted; also try different seeds and longer
     training for a converged oracle.

Run:  nohup python tools/parity_diag.py > /tmp/parity_diag.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from ocrs_models.models import RecognitionModel as TorchRec  # noqa: E402

from ocrs_models_tpu.config import DEFAULT_ALPHABET  # noqa: E402
from ocrs_models_tpu.export import import_recognition_state_dict  # noqa: E402
from ocrs_models_tpu.models import RecognitionModel  # noqa: E402
from ocrs_models_tpu.training.state import TrainState, make_optimizer  # noqa: E402
from ocrs_models_tpu.training.steps import make_recognition_steps  # noqa: E402

from tools.parity_experiment import (  # noqa: E402
    SEED,
    rec_batches,
    torch_rec_eval,
)


def _torch_loss_and_grads(model, b):
    ctc = torch.nn.CTCLoss()
    keep = b["sample_weight"] > 0
    img = torch.tensor(b["image"][keep].transpose(0, 3, 1, 2))
    text = torch.tensor(b["text"][keep].astype(np.int64))
    tlen = torch.tensor(b["text_len"][keep].astype(np.int64))
    ilen = torch.tensor((b["image_width"][keep] // 4).astype(np.int64))
    model.train()
    pred = model(img)
    loss = ctc(pred, text, ilen, tlen)
    model.zero_grad()
    loss.backward()
    groups = {"conv": 0.0, "gru": 0.0, "output": 0.0}
    for name, p in model.named_parameters():
        g = float((p.grad**2).sum())
        for k in groups:
            if name.startswith(k):
                groups[k] += g
    return float(loss), {k: v**0.5 for k, v in groups.items()}


def _flax_loss_and_grads(variables, b):
    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
    from ocrs_models_tpu.ops.ctc import ctc_loss_forward

    keep = b["sample_weight"] > 0

    def loss_fn(params):
        lp, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(b["image"][keep]),
            train=True,
            mutable=["batch_stats"],
        )
        nll = ctc_loss_forward(
            lp,
            jnp.asarray(b["text"][keep]),
            jnp.asarray(b["image_width"][keep] // 4),
            jnp.asarray(b["text_len"][keep]),
        )
        return jnp.mean(nll / jnp.maximum(jnp.asarray(b["text_len"][keep]), 1))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    import optax

    # torch groups by sequential prefix: "conv." covers convs AND the BN
    # modules inside the conv stack; flax names them conv*/bn* separately.
    conv_tree = {k: v for k, v in grads.items() if k.startswith(("conv", "bn"))}
    groups = {
        "conv": optax.global_norm(conv_tree),
        "gru": optax.global_norm(grads["gru"]),
        "output": optax.global_norm(grads["output"]),
    }
    return float(loss), {k: float(v) for k, v in groups.items()}


def _flax_train(variables, epoch_batches, val, lr=1e-3, plateau=False):
    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
    tx = make_optimizer(4.0)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
    train_step, eval_step = make_recognition_steps(model)
    t0 = time.time()
    for e, batches in enumerate(epoch_batches):
        losses = []
        for b in batches:
            state, m = train_step(state, {k: jnp.asarray(v) for k, v in b.items()}, lr)
            losses.append(float(m["loss"]))
        print(f"  [flax-from-torch-init] epoch {e}: loss {np.mean(losses):.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)

    from tools.parity_experiment import rec_cer

    edits = chars = 0
    for b in val:
        m = eval_step(state, {k: jnp.asarray(v) for k, v in b.items()})
        e_, c = rec_cer(np.asarray(m["preds"]), b)
        edits += e_
        chars += c
    return edits / max(chars, 1)


def _torch_train(epoch_batches, val, seed, plateau, lr=1e-3, tag=""):
    torch.manual_seed(seed)
    model = TorchRec(alphabet=DEFAULT_ALPHABET)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    sched = (
        torch.optim.lr_scheduler.ReduceLROnPlateau(opt, factor=0.1, patience=3)
        if plateau
        else None
    )
    ctc = torch.nn.CTCLoss()
    t0 = time.time()
    for e, batches in enumerate(epoch_batches):
        model.train()
        losses = []
        for b in batches:
            keep = b["sample_weight"] > 0
            img = torch.tensor(b["image"][keep].transpose(0, 3, 1, 2))
            text = torch.tensor(b["text"][keep].astype(np.int64))
            tlen = torch.tensor(b["text_len"][keep].astype(np.int64))
            ilen = torch.tensor((b["image_width"][keep] // 4).astype(np.int64))
            pred = model(img)
            loss = ctc(pred, text, ilen, tlen)
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=4.0)
            opt.step()
            losses.append(loss.item())
        mean_loss = float(np.mean(losses))
        if sched is not None:
            sched.step(mean_loss)
        print(f"  [torch {tag}] epoch {e}: loss {mean_loss:.4f} "
              f"lr {opt.param_groups[0]['lr']:.2e} ({time.time()-t0:.0f}s)",
              flush=True)
    cer = torch_rec_eval(model, val)
    print(f"  [torch {tag}] final CER {cer:.4f}", flush=True)
    return cer, model


def main():
    epochs = int(os.environ.get("DIAG_EPOCHS", "10"))
    train_eps, val = rec_batches(n_train=768, n_val=128, epochs=epochs)

    print("=== 1. same-weights single-batch loss/grad check ===", flush=True)
    torch.manual_seed(SEED)
    tmodel = TorchRec(alphabet=DEFAULT_ALPHABET)
    variables = import_recognition_state_dict(tmodel.state_dict())
    b = train_eps[0][0]
    tl, tg = _torch_loss_and_grads(tmodel, b)
    fl, fg = _flax_loss_and_grads(variables, b)
    print(f"torch loss {tl:.6f}   flax loss {fl:.6f}   delta {abs(tl-fl):.2e}",
          flush=True)
    for k in tg:
        print(f"  grad-norm[{k}]: torch {tg[k]:.5f}  flax {fg[k]:.5f}  "
              f"rel-delta {abs(tg[k]-fg[k])/max(tg[k],1e-9):.3f}", flush=True)

    print("=== 2. flax trained FROM TORCH INIT ===", flush=True)
    cer = _flax_train(variables, train_eps, val)
    print(f"flax-from-torch-init CER: {cer:.4f}", flush=True)

    print("=== 3. torch seed/schedule sweep ===", flush=True)
    results = {}
    results["seed1234_const"] = _torch_train(
        train_eps, val, SEED, plateau=False, tag="seed1234 const-lr")[0]
    results["seed7_const"] = _torch_train(
        train_eps, val, 7, plateau=False, tag="seed7 const-lr")[0]
    results["seed1234_plateau"] = _torch_train(
        train_eps, val, SEED, plateau=True, tag="seed1234 plateau")[0]
    print("sweep:", results, flush=True)


if __name__ == "__main__":
    main()
