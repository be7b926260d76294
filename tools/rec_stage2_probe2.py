"""In-step A/B of stage-2 reformulations at the wide bucket (round 5).

Round-4 verdict weak #5: the NHCW/W-minor layout won its isolated probe
(2.18 ms vs 4.7) but was never integrated as an in-step XLA-level layout
change; the phase-conv split likewise. This probe measures FULL train
steps (fused stage-1 Pallas kernel + Pallas GRU/CTC + Adam + grad-clip)
at N=128 W=1024 with stage 2 (conv3 32->64 + bn4 + 2x2 maxpool + relu,
reference models.py:181-192 semantics) reformulated:

  base          shipping RecognitionModel (auto backends) — the control
  wminor        stage 2 in [N,H,C,W] layout: transpose in, NHCW conv,
                bn over axis 2, (1,2,1,2) reduce_window, transpose out.
                W=512 on the lanes removes the 4x/2x lane padding the
                C=32/64-minor tensors pay on every HBM pass.
  phase         the 2x2 pool realized as an elementwise max of four
                stride-2 conv phases (exact: phase (a,b) is the conv
                output at positions (2i+a, 2j+b)); the full-res
                [N,32,512,64] stage-2 tensor is never materialized.
                BN stats come from phase sums via BatchNormLite's
                moments interface; affine+relu fold into each phase
                (relu(max(x_i)) == max(relu(x_i))).
  phase_wminor  both combined.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/rec_stage2_probe2.py
"""

import functools
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    np.asarray(jax.device_get(jnp.sum(x)))


class RecStage2Variant(nn.Module):
    """Shipping CRNN forward with a pluggable stage-2 formulation."""

    n_classes: int
    mode: str = "base"
    dtype: jnp.dtype = jnp.bfloat16
    gru_backend: str = "auto"  # steps.py compat
    conv_backend: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = True):
        from ocrs_models_tpu.models.detection import BatchNormLite
        from ocrs_models_tpu.models.recognition import _Stage1Params
        from ocrs_models_tpu.ops.gru import BiGRU
        from ocrs_models_tpu.ops.pallas.stage1_kernel import stage1_fused
        from ocrs_models_tpu.ops.platform import effective_platform

        dt = self.dtype
        x = x.astype(dt)

        def bn(name, axis=-1):
            mod = BatchNormLite(momentum=0.9, epsilon=1e-5, axis=axis, name=name)
            return lambda v: mod(v, use_running_average=not train)

        kernel, bias = _Stage1Params(32, name="conv0")()
        interpret = effective_platform() != "tpu"
        x = stage1_fused(x, kernel, bias, interpret, dt)  # [N,32,W/2,32]

        # ---- stage 2 variants ----
        k3 = self.param(
            "conv3_kernel", nn.initializers.lecun_normal(), (3, 3, 32, 64)
        ).astype(dt)
        p1 = ((1, 1), (1, 1))
        if self.mode == "base":
            y = jax.lax.conv_general_dilated(
                x, k3, (1, 1), p1, dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            y = bn("bn4")(y).astype(dt)
            x = nn.max_pool(y, (2, 2), strides=(2, 2))
            x = nn.relu(x)
        elif self.mode == "wminor":
            xw = jnp.transpose(x, (0, 1, 3, 2))  # [N,H,C,W]
            y = jax.lax.conv_general_dilated(
                xw, k3, (1, 1), p1, dimension_numbers=("NHCW", "HWIO", "NHCW")
            )
            y = bn("bn4", axis=2)(y).astype(dt)
            p = jax.lax.reduce_window(
                y, -jnp.inf, jax.lax.max, (1, 2, 1, 2), (1, 2, 1, 2), "VALID"
            )
            x = jnp.transpose(nn.relu(p), (0, 1, 3, 2))  # [N,16,W/4,64]
        elif self.mode in ("phase", "phase_wminor"):
            wminor = self.mode == "phase_wminor"
            if wminor:
                x = jnp.transpose(x, (0, 1, 3, 2))
            dn = (
                ("NHCW", "HWIO", "NHCW") if wminor else ("NHWC", "HWIO", "NHWC")
            )
            cax = 2 if wminor else 3
            phases = [
                jax.lax.conv_general_dilated(
                    x, k3, (2, 2), ((1 - a, a), (1 - b, b)), dimension_numbers=dn
                )
                for a in (0, 1)
                for b in (0, 1)
            ]
            red = tuple(i for i in range(4) if i != cax)
            s1 = sum(jnp.sum(p.astype(jnp.float32), axis=red) for p in phases)
            s2 = sum(
                jnp.sum(jnp.square(p.astype(jnp.float32)), axis=red)
                for p in phases
            )
            count = 4 * int(np.prod([phases[0].shape[i] for i in red]))
            bn4 = BatchNormLite(momentum=0.9, epsilon=1e-5, name="bn4")
            inv, b2 = bn4(None, use_running_average=False, moments=(s1, s2, count))
            shape = [1, 1, 1, 1]
            shape[cax] = inv.shape[0]
            inv = inv.reshape(shape).astype(dt)
            b2 = b2.reshape(shape).astype(dt)
            x = functools.reduce(
                jnp.maximum,
                [jnp.maximum(p * inv + b2, 0) for p in phases],
            )
            if wminor:
                x = jnp.transpose(x, (0, 1, 3, 2))
        else:
            raise ValueError(self.mode)

        # ---- stages 3-5: shipping code verbatim ----
        x = nn.Conv(128, (3, 3), padding=p1, dtype=dt, name="conv7")(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding=p1, use_bias=False, dtype=dt, name="conv9")(x)
        x = nn.max_pool(bn("bn10")(x).astype(dt), (2, 1), strides=(2, 1))
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding=p1, dtype=dt, name="conv13")(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding=p1, use_bias=False, dtype=dt, name="conv15")(x)
        x = nn.max_pool(bn("bn16")(x).astype(dt), (2, 1), strides=(2, 1))
        x = nn.relu(x)
        x = nn.Conv(128, (2, 2), padding=p1, use_bias=False, dtype=dt, name="conv19")(x)
        x = bn("bn20")(x).astype(dt)
        x = nn.avg_pool(x, (4, 1), strides=(4, 1))

        n, h, t, c = x.shape
        x = x.transpose(0, 2, 3, 1).reshape(n, t, c * h)
        x = BiGRU(256, 2, compute_dtype=dt, backend=self.gru_backend, name="gru")(x)
        x = nn.Dense(self.n_classes, dtype=dt, name="output")(x.astype(dt))
        return nn.log_softmax(x.astype(jnp.float32), axis=-1)


def make_batch(n, width, rng):
    img = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 64, width, 1)).astype(np.float32))
    text = np.zeros((n, 64), np.int32)
    text[:, :48] = rng.integers(1, 97, (n, 48))
    return {
        "image": img,
        "text": jnp.asarray(text),
        "text_len": jnp.full((n,), 48, jnp.int32),
        "image_width": jnp.full((n,), width, jnp.int32),
        "sample_weight": jnp.ones((n,), jnp.float32),
    }


def time_step(model, batch, iters=30, warm=5):
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_recognition_steps

    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)), grad_clip_norm=4.0
    )
    train_step, _ = make_recognition_steps(model)
    lr = jnp.float32(1e-3)
    st = jax.tree.map(jnp.copy, state)
    for _ in range(warm):
        st, m = train_step(st, batch, lr)
    _fetch(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        st, m = train_step(st, batch, lr)
    _fetch(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    return dt, float(m["loss"])


def main(n=128, width=1024):
    from ocrs_models_tpu.config import DEFAULT_ALPHABET
    from ocrs_models_tpu.models import RecognitionModel

    rng = np.random.default_rng(0)
    batch = make_batch(n, width, rng)
    ncls = len(DEFAULT_ALPHABET) + 1

    ship = RecognitionModel(n_classes=ncls, dtype=jnp.bfloat16)
    t, loss = time_step(ship, batch)
    print(
        f"ship base:      {t*1e3:7.2f} ms  {n/t:8.0f} crops/s  loss={loss:.4f}",
        flush=True,
    )

    for mode in ("base", "wminor", "phase", "phase_wminor"):
        model = RecStage2Variant(n_classes=ncls, mode=mode)
        t, loss = time_step(model, batch)
        print(
            f"{mode:14s}: {t*1e3:7.2f} ms  {n/t:8.0f} crops/s  loss={loss:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
