"""A/B variants for the detection DepthwiseConv lowering (task 4).

Each variant rebuilds the grad step at batch 8 / 800x608 and reports
time + bytes accessed. Variants patch models.detection at trace time.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    np.asarray(jax.device_get(x))


def bench(name, jitted, args, n=8, iters=12):
    t0 = time.perf_counter()
    compiled = jitted.lower(*args).compile()
    compile_s = time.perf_counter() - t0
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        gb = ca.get("bytes accessed", 0) / 1e9
    except Exception:
        gb = 0
    try:
        temp = compiled.memory_analysis().temp_size_in_bytes / 1e6
    except Exception:
        temp = 0
    for _ in range(3):
        out = jitted(*args)
    _fetch(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    _fetch(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(
        f"{name:12s} {dt*1e3:8.2f} ms  {n/dt:7.1f} img/s  {gb:6.1f} GB "
        f"({gb/dt:4.0f} GB/s)  temp {temp:6.0f} MB  [compile {compile_s:.0f}s]",
        flush=True,
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    n, h, w = 8, 800, 608
    import ocrs_models_tpu.models.detection as det
    from ocrs_models_tpu.ops.losses import balanced_cross_entropy_loss
    from ocrs_models_tpu.training.state import create_train_state

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-0.5, 0.5, (n, h, w, 1)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(n, h, w, 1)) > 0.9).astype(np.float32))

    model = det.DetectionModel(dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 128, 128, 1)))

    def make_grad():
        def loss(params, batch_stats, img, mask):
            pred, _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                img,
                train=True,
                mutable=["batch_stats"],
            )
            return balanced_cross_entropy_loss(pred, mask)

        return jax.jit(jax.value_and_grad(loss))

    args = (state.params, state.batch_stats, img, mask)

    if which in ("all", "base"):
        bench("base", make_grad(), args)

    if which in ("all", "bf16out"):
        # einsum emits bf16 directly (skip f32 materialization + convert)
        orig_einsum = jnp.einsum

        def patched_einsum(spec, *ops, preferred_element_type=None, **kw):
            if spec in ("nchw,co->nohw", "nhwc,co->nhwo"):
                return orig_einsum(
                    spec, *ops, preferred_element_type=ops[0].dtype, **kw
                )
            return orig_einsum(
                spec, *ops, preferred_element_type=preferred_element_type, **kw
            )

        det.jnp.einsum = patched_einsum
        try:
            bench("bf16out", make_grad(), args)
        finally:
            det.jnp.einsum = orig_einsum

    if which in ("all", "dotg"):
        # pointwise as dot_general on [C, N*H*W] -> [O, N*H*W]
        orig_einsum = jnp.einsum

        def patched_einsum(spec, *ops, preferred_element_type=None, **kw):
            if spec == "nchw,co->nohw":
                x, wp = ops
                nn_, c, hh, ww = x.shape
                o = wp.shape[1]
                xf = x.reshape(nn_, c, hh * ww)
                y = jax.lax.dot_general(
                    wp,
                    xf,
                    (((0,), (1,)), ((), ())),
                    preferred_element_type=x.dtype,
                )  # [O, N, H*W]
                return y.transpose(1, 0, 2).reshape(nn_, o, hh, ww)
            return orig_einsum(
                spec, *ops, preferred_element_type=preferred_element_type, **kw
            )

        det.jnp.einsum = patched_einsum
        try:
            bench("dotg", make_grad(), args)
        finally:
            det.jnp.einsum = orig_einsum




def extra(which="all"):
    n, h, w = 8, 800, 608
    import ocrs_models_tpu.models.detection as det
    from ocrs_models_tpu.ops.losses import balanced_cross_entropy_loss
    from ocrs_models_tpu.training.state import create_train_state

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-0.5, 0.5, (n, h, w, 1)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(n, h, w, 1)) > 0.9).astype(np.float32))
    model = det.DetectionModel(dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 128, 128, 1)))

    def make_grad():
        def loss(params, batch_stats, img, mask):
            pred, _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                img, train=True, mutable=["batch_stats"],
            )
            return balanced_cross_entropy_loss(pred, mask)
        return jax.jit(jax.value_and_grad(loss))

    args = (state.params, state.batch_stats, img, mask)

    if which in ("all", "nchwconv"):
        # depthwise 3x3 channels-first as a real grouped conv op
        orig = det.DepthwiseConv.__call__

        import flax.linen as fnn

        def patched(self, x, train):
            if not self.channels_first:
                return orig(self, x, train)
            in_ch = x.shape[1]
            dw_kernel = self.param("dw_kernel", det._dw_init, (3, 3, 1, in_ch))
            pw_kernel = self.param(
                "pw_kernel", fnn.initializers.lecun_normal(), (in_ch, self.features)
            )
            dt = self.dtype
            xc = x.astype(dt)
            out = jax.lax.conv_general_dilated(
                xc, dw_kernel.astype(dt),
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                feature_group_count=in_ch,
                dimension_numbers=("NCHW", "HWIO", "NCHW"),
            )
            xc = jnp.einsum(
                "nchw,co->nohw", out, pw_kernel.astype(dt),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            xc = det.BatchNormLite(momentum=0.9, epsilon=1e-5, axis=1, name="bn")(
                xc, use_running_average=not train
            )
            return fnn.relu(xc)

        det.DepthwiseConv.__call__ = fnn.compact(patched)
        try:
            bench("nchwconv", make_grad(), args)
        finally:
            det.DepthwiseConv.__call__ = orig

    if which in ("all", "remat"):
        import flax.linen as fnn2

        orig_cls = det.DoubleConv
        det.DoubleConv = fnn2.remat(
            orig_cls, static_argnums=(2,), prevent_cse=False
        )
        try:
            bench("remat", make_grad(), args)
        finally:
            det.DoubleConv = orig_cls




if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ("nchwconv", "remat", "extra"):
        extra("all" if sys.argv[1] == "extra" else sys.argv[1])
    else:
        main()
