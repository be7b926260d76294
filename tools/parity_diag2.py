"""Parity diagnosis part 2: train the TORCH reference from FLAX's init.

parity_diag.py established: (1) same-weights loss/grads match to 1e-4
(harness exact); (2) flax-from-torch-init reaches CER 0.134 (vs 0.028
own-init, 0.468 torch) — torch's kaiming-uniform init lands CTC training
in the blank-collapse basin; (3) torch stalls across seeds (0.468 /
0.950) and plateau-LR never fires (loss still falling).

This closes the loop: export flax's lecun-normal init into the torch
model and run the torch recipe on the identical stream. If torch then
converges (CER <= 0.10), the round-2 divergence is fully attributed to
init-basin sensitivity of CTC training, not to any framework dynamics
difference — and the converged torch model becomes the parity oracle.

Run:  nohup python tools/parity_diag2.py > /tmp/parity_diag2.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

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
from ocrs_models_tpu.export.torch_export import (  # noqa: E402
    export_recognition_state_dict,
)
from ocrs_models_tpu.models import RecognitionModel  # noqa: E402

from tools.parity_experiment import SEED, rec_batches  # noqa: E402


def main():
    epochs = int(os.environ.get("DIAG_EPOCHS", "10"))
    train_eps, val = rec_batches(n_train=768, n_val=128, epochs=epochs)

    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1)
    variables = model.init(jax.random.key(SEED), jnp.zeros((1, 64, 64, 1)))
    sd_np = export_recognition_state_dict(
        {k: jax.tree.map(np.asarray, v) for k, v in variables.items()}
    )
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()}

    print("=== torch trained FROM FLAX INIT (lecun-normal) ===", flush=True)
    torch.manual_seed(SEED)
    tmodel = TorchRec(alphabet=DEFAULT_ALPHABET)
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    print("load_state_dict missing:", missing, "unexpected:", unexpected, flush=True)

    # Reuse the shared trainer but skip its own init by loading again after
    # manual_seed (the helper constructs its own model) — simplest: inline.
    import tools.parity_diag as pd

    orig_init = TorchRec.__init__

    def patched_init(self, alphabet):
        orig_init(self, alphabet)
        self.load_state_dict(sd, strict=False)

    TorchRec.__init__ = patched_init
    try:
        cer, _ = pd._torch_train(
            train_eps, val, SEED, plateau=False, tag="flax-init const-lr"
        )
    finally:
        TorchRec.__init__ = orig_init
    print(f"torch-from-flax-init CER: {cer:.4f}", flush=True)


if __name__ == "__main__":
    main()
