"""Ablation probe: where do the wide-bucket train step's 32 ms go?

Times jitted variants of the recognition step at N=128, W=1024 (T=257),
each removing one component, to attribute the gap between the measured
step and the sum of the known parts (conv roofline + GRU kernel + CTC).

Run:  nohup python tools/rec_ablate.py > /tmp/rec_ablate.log 2>&1 &
"""

import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    np.asarray(jax.device_get(jnp.sum(x)))


def timeit(fn, *args, iters=20, warm=3):
    for _ in range(warm):
        out = fn(*args)
    _fetch(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


class ConvStack(nn.Module):
    """The recognition conv stack, verbatim (stages gated for ablation)."""

    stages: int = 5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        from ocrs_models_tpu.models.detection import BatchNormLite

        dt = self.dtype
        x = x.astype(dt)

        def bn(name):
            mod = BatchNormLite(momentum=0.9, epsilon=1e-5, axis=-1, name=name)
            return lambda x: mod(x, use_running_average=not train)

        p1 = ((1, 1), (1, 1))
        x = nn.Conv(32, (3, 3), padding=p1, dtype=dt, name="conv0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if self.stages == 1:
            return x
        x = nn.Conv(64, (3, 3), padding=p1, use_bias=False, dtype=dt, name="conv3")(x)
        x = nn.relu(bn("bn4")(x)).astype(dt)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if self.stages == 2:
            return x
        x = nn.Conv(128, (3, 3), padding=p1, dtype=dt, name="conv7")(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding=p1, use_bias=False, dtype=dt, name="conv9")(x)
        x = nn.relu(bn("bn10")(x)).astype(dt)
        x = nn.max_pool(x, (2, 1), strides=(2, 1))
        if self.stages == 3:
            return x
        x = nn.Conv(128, (3, 3), padding=p1, dtype=dt, name="conv13")(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding=p1, use_bias=False, dtype=dt, name="conv15")(x)
        x = nn.relu(bn("bn16")(x)).astype(dt)
        x = nn.max_pool(x, (2, 1), strides=(2, 1))
        if self.stages == 4:
            return x
        x = nn.Conv(128, (2, 2), padding=p1, use_bias=False, dtype=dt, name="conv19")(x)
        x = bn("bn20")(x).astype(dt)
        x = nn.avg_pool(x, (4, 1), strides=(4, 1))
        return x


def main(n=128, width=1024):
    from ocrs_models_tpu.config import DEFAULT_ALPHABET
    from ocrs_models_tpu.models import RecognitionModel
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_recognition_steps

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 64, width, 1)).astype(np.float32))
    text = np.zeros((n, 64), np.int32)
    text[:, :48] = rng.integers(1, 97, (n, 48))
    batch = {
        "image": img,
        "text": jnp.asarray(text),
        "text_len": jnp.full((n,), 48, jnp.int32),
        "image_width": jnp.full((n,), width, jnp.int32),
        "sample_weight": jnp.ones((n,), jnp.float32),
    }
    model = RecognitionModel(n_classes=len(DEFAULT_ALPHABET) + 1, dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)), grad_clip_norm=4.0
    )

    # A. full step (baseline)
    train_step, _ = make_recognition_steps(model)
    lr = jnp.float32(1e-3)
    st = jax.tree.map(jnp.copy, state)
    for _ in range(3):
        st, m = train_step(st, batch, lr)
    _fetch(m["loss"])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        st, m = train_step(st, batch, lr)
    _fetch(m["loss"])
    print(f"A full step:            {(time.perf_counter()-t0)/iters*1e3:7.2f} ms", flush=True)

    # B. full fwd only (train-mode apply, no grad)
    fwd = jax.jit(lambda p, bs, x: model.apply(
        {"params": p, "batch_stats": bs}, x, train=True, mutable=["batch_stats"]
    )[0])
    t = timeit(fwd, state.params, state.batch_stats, img)
    print(f"B full fwd (train):     {t*1e3:7.2f} ms", flush=True)

    # C. full value_and_grad of CTC loss, NO optimizer/metrics
    from ocrs_models_tpu.ops.ctc import ctc_loss_forward

    def loss_fn(p, bs, bch):
        lp, _ = model.apply(
            {"params": p, "batch_stats": bs}, bch["image"], train=True,
            mutable=["batch_stats"],
        )
        nll = ctc_loss_forward(lp, bch["text"], bch["image_width"] // 4, bch["text_len"])
        return jnp.mean(nll / jnp.maximum(bch["text_len"], 1))

    vg = jax.jit(lambda p, bs, bch: jax.value_and_grad(loss_fn)(p, bs, bch))
    t = timeit(vg, state.params, state.batch_stats, batch)
    print(f"C fwd+bwd (CTC loss):   {t*1e3:7.2f} ms", flush=True)

    # D. fwd+bwd with mean-logits loss (no CTC)
    def loss_sum(p, bs, bch):
        lp, _ = model.apply(
            {"params": p, "batch_stats": bs}, bch["image"], train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean(lp)

    vg2 = jax.jit(lambda p, bs, bch: jax.value_and_grad(loss_sum)(p, bs, bch))
    t = timeit(vg2, state.params, state.batch_stats, batch)
    print(f"D fwd+bwd (mean loss):  {t*1e3:7.2f} ms", flush=True)

    # E/F/G. conv-stack-only fwd+bwd at stages 5 / 2 / 1
    for stages in (5, 2, 1):
        conv = ConvStack(stages=stages)
        cvars = conv.init(jax.random.key(0), img[:1])
        cp, cbs = cvars["params"], cvars.get("batch_stats", {})

        def closs(p, bs, x, conv=conv):
            out = conv.apply(
                {"params": p, **({"batch_stats": bs} if bs else {})},
                x, train=True, **({"mutable": ["batch_stats"]} if bs else {}),
            )
            y = out[0] if isinstance(out, tuple) else out
            return jnp.mean(y.astype(jnp.float32))

        cvg = jax.jit(lambda p, bs, x, closs=closs: jax.value_and_grad(closs)(p, bs, x))
        t = timeit(cvg, cp, cbs, img)
        print(f"conv[:{stages}] fwd+bwd:     {t*1e3:7.2f} ms", flush=True)
        cfwd = jax.jit(lambda p, bs, x, conv=conv: conv.apply(
            {"params": p, **({"batch_stats": bs} if bs else {})},
            x, train=True, **({"mutable": ["batch_stats"]} if bs else {}),
        ))
        t = timeit(cfwd, cp, cbs, img)
        print(f"conv[:{stages}] fwd:         {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
