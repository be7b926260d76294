"""Round-3b attribution of the 23.8 ms wide-bucket step + bnpool in-step A/B.

  A. full step, auto backends (stage-1 kernel + GRU v4)      — baseline
  B. conv_backend="fused2": + the bnpool stage-2 kernel      — THE A/B
  C. conv_backend="xla": no conv kernels at all              — context
  D. per-stage conv-stack fwd+bwd with today's exact structure
     (fused stage 1, pool-before-relu stage 2) at stages 2..5

Run:  nohup python tools/rec_ablate2.py > /tmp/rec_ablate2.log 2>&1 &
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
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _fetch(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def step_time(model, batch, n=128, iters=15):
    from ocrs_models_tpu.training.state import create_train_state
    from ocrs_models_tpu.training.steps import make_recognition_steps

    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, 64, 1)), grad_clip_norm=4.0
    )
    train_step, _ = make_recognition_steps(model)
    lr = jnp.float32(1e-3)
    st = jax.tree.map(jnp.copy, state)
    for _ in range(3):
        st, m = train_step(st, batch, lr)
    _fetch(m["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            st, m = train_step(st, batch, lr)
        _fetch(m["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


class Stack(nn.Module):
    """Today's conv stack verbatim (fused stage 1 + stage-2 reorder)."""

    stages: int = 5
    stage2: str = "xla"  # "xla" | "fused"

    @nn.compact
    def __call__(self, x):
        from ocrs_models_tpu.models.detection import BatchNormLite
        from ocrs_models_tpu.models.recognition import _Stage1Params
        from ocrs_models_tpu.ops.pallas.stage1_kernel import stage1_fused

        dt = jnp.bfloat16
        x = x.astype(dt)

        def bn(name):
            mod = BatchNormLite(momentum=0.9, epsilon=1e-5, axis=-1, name=name)
            return lambda x: mod(x, use_running_average=False)

        p1 = ((1, 1), (1, 1))
        kernel, bias = _Stage1Params(32, name="conv0")()
        x = stage1_fused(x, kernel, bias, False, dt)
        if self.stages == 1:
            return x
        x = nn.Conv(64, (3, 3), padding=p1, use_bias=False, dtype=dt, name="conv3")(x)
        if self.stage2 == "fused":
            from ocrs_models_tpu.ops.pallas.bnpool_kernel import (
                bnpool_apply,
                bnpool_stats,
            )

            ny, hy, wy, _ = x.shape
            pmax, pmin, s1, s2 = bnpool_stats(x, False)
            inv, sh = BatchNormLite(
                momentum=0.9, epsilon=1e-5, axis=-1, name="bn4"
            )(None, use_running_average=False, moments=(s1, s2, ny * hy * wy))
            x = bnpool_apply(pmax, pmin, inv, sh)
        else:
            x = nn.max_pool(bn("bn4")(x).astype(dt), (2, 2), strides=(2, 2))
            x = nn.relu(x)
        if self.stages == 2:
            return x
        x = nn.Conv(128, (3, 3), padding=p1, dtype=dt, name="conv7")(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding=p1, use_bias=False, dtype=dt, name="conv9")(x)
        x = nn.max_pool(bn("bn10")(x).astype(dt), (2, 1), strides=(2, 1))
        x = nn.relu(x)
        if self.stages == 3:
            return x
        x = nn.Conv(128, (3, 3), padding=p1, dtype=dt, name="conv13")(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding=p1, use_bias=False, dtype=dt, name="conv15")(x)
        x = nn.max_pool(bn("bn16")(x).astype(dt), (2, 1), strides=(2, 1))
        x = nn.relu(x)
        if self.stages == 4:
            return x
        x = nn.Conv(128, (2, 2), padding=p1, use_bias=False, dtype=dt, name="conv19")(x)
        x = bn("bn20")(x).astype(dt)
        x = nn.avg_pool(x, (4, 1), strides=(4, 1))
        return x


def main(n=128, width=1024):
    from ocrs_models_tpu.config import DEFAULT_ALPHABET
    from ocrs_models_tpu.models import RecognitionModel

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
    nc = len(DEFAULT_ALPHABET) + 1

    for name, kw in (
        ("A auto (stage1+gru4)", {}),
        ("B fused2 (+bnpool)", {"conv_backend": "fused2"}),
        ("C xla convs", {"conv_backend": "xla"}),
    ):
        model = RecognitionModel(n_classes=nc, dtype=jnp.bfloat16, **kw)
        t = step_time(model, batch, n)
        print(f"{name:24s} {t*1e3:7.2f} ms  {n/t:8.0f} crops/s", flush=True)

    for stages in (2, 3, 4, 5):
        for s2 in ("xla", "fused"):
            stack = Stack(stages=stages, stage2=s2)
            svars = stack.init(jax.random.key(0), img[:1])
            sp, sbs = svars["params"], svars.get("batch_stats", {})

            def closs(p, bs, x, stack=stack):
                out = stack.apply(
                    {"params": p, "batch_stats": bs}, x,
                    mutable=["batch_stats"],
                )
                return jnp.mean(out[0].astype(jnp.float32))

            cvg = jax.jit(
                lambda p, bs, x, closs=closs: jax.value_and_grad(closs)(p, bs, x)
            )
            try:
                t = timeit(cvg, sp, sbs, img)
                print(f"stack[:{stages}] s2={s2:5s} fwd+bwd {t*1e3:7.2f} ms", flush=True)
            except Exception as e:  # noqa
                print(f"stack[:{stages}] s2={s2} FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
