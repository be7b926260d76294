"""CRNN text recognition model.

Capability parity with the reference's ``RecognitionModel``
(models.py:146-268): greyscale 64-high text-line image in, per-timestep
character log-probabilities out, where the conv stack downsamples width by
4 (emitting ``floor(W/4) + 1`` timesteps — the final 2x2/pad-1 conv adds a
column) and collapses height to 1, followed by a 2-layer bidirectional GRU
and a linear + log-softmax head.

TPU-first design: NHWC layout, convs run in bfloat16 (optionally), the GRU
is a ``lax.scan`` with hoisted MXU-friendly input projections
(:class:`ocrs_models_tpu.ops.BiGRU`), and log-softmax is computed in
float32. Output layout is ``[N, T, C]`` (batch-major — better for TPU
sharding than the reference's torch-RNN-legacy ``[T, N, C]``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.gru import BiGRU
from ..ops.platform import effective_platform, is_single_chip_tpu
from .detection import BatchNormLite


class _Stage1Params(nn.Module):
    """Owns conv0's parameters with nn.Conv's exact tree structure and
    initializers ({kernel [3,3,1,C], bias [C]}, lecun_normal/zeros) so
    checkpoints are interchangeable between the fused and XLA paths."""

    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 1, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def _resolve_conv_backend(backend: str) -> str:
    """'auto' -> the fused stage-1 Pallas kernel on a single-device TPU
    process, XLA elsewhere. Measured: stage 1 under XLA costs 8.7 ms
    fwd+bwd of the 32 ms wide-bucket step vs ~1 ms fused (C_in=1 defeats
    XLA's conv tiling; every XLA reformulation probed worse —
    docs/rec_perf.md round 3)."""
    if backend != "auto":
        return backend
    if is_single_chip_tpu():
        return "fused"
    return "xla"


class RecognitionModel(nn.Module):
    """CRNN: conv feature extractor -> biGRU -> per-timestep classifier.

    Input ``[N, 64, W, 1]`` float in [-0.5, 0.5]; output ``[N, W//4 + 1,
    n_classes]`` log-probabilities (class 0 = CTC blank).
    """

    n_classes: int  # len(alphabet) + 1
    gru_hidden: int = 256
    gru_layers: int = 2
    dtype: jnp.dtype = jnp.float32
    # GRU matmul operand dtype. None => follow `dtype` (bf16 training fast
    # path); float32 bit-matches the reference's fp32 GRU for checkpoint
    # parity at inference.
    gru_dtype: jnp.dtype | None = None
    # "auto" picks the Pallas fused-recurrence kernel on single-chip TPU
    # and lax.scan elsewhere; "pallas4"/"scan" force a backend.
    gru_backend: str = "auto"
    # Conv-stack backend: "auto" | "fused" | "xla". "fused" uses the
    # Pallas stage-1 conv+relu+pool kernel (interpret mode off-TPU for
    # tests); "xla" the plain conv path.
    conv_backend: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)

        def bn(name):
            # BatchNormLite: float32 statistics with activation-dtype
            # traffic. nn.BatchNorm(dtype=f32) forced full f32 round trips
            # of the [N, H, W/2, 64..128] stage tensors — several hundred
            # MB per wide-bucket step. Parameter/batch-stats tree structure
            # is identical, so checkpoints load unchanged; note the
            # running-var UPDATE switched from flax's biased batch variance
            # to torch-style unbiased (n/(n-1)) variance — torch parity by
            # design, with O(1/n) eval-mode drift for batch_stats that were
            # accumulated under the old module.
            mod = BatchNormLite(momentum=0.9, epsilon=1e-5, axis=-1, name=name)
            return lambda x: mod(x, use_running_average=not train)

        p1 = ((1, 1), (1, 1))
        # Stage 1: 64xW -> 32 x W/2
        n_, h_, w_, _ = x.shape
        conv_backend = _resolve_conv_backend(self.conv_backend)
        if conv_backend.startswith("fused") and h_ % 16 == 0 and w_ % 2 == 0:
            from ..ops.pallas.stage1_kernel import stage1_fused

            kernel, bias = _Stage1Params(32, name="conv0")()
            interpret = effective_platform() != "tpu"
            x = stage1_fused(x, kernel, bias, interpret, dt)
        else:
            x = nn.Conv(32, (3, 3), padding=p1, dtype=dt, name="conv0")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # Stage 2: -> 16 x W/4
        x = nn.Conv(64, (3, 3), padding=p1, use_bias=False, dtype=dt, name="conv3")(x)
        # Pool BEFORE relu (bit-identical: max-pool commutes with the
        # monotone relu) so the activation pass touches 4x fewer bytes.
        # (A fused BN+pool+relu Pallas kernel for this stage was built and
        # A/B'd — it lost to XLA's fusion at every shape and was deleted;
        # numbers in docs/rec_perf.md, code in git history.)
        x = nn.max_pool(bn("bn4")(x).astype(dt), (2, 2), strides=(2, 2))
        x = nn.relu(x)
        # Stage 3: -> 8 x W/4
        x = nn.Conv(128, (3, 3), padding=p1, dtype=dt, name="conv7")(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding=p1, use_bias=False, dtype=dt, name="conv9")(x)
        x = nn.max_pool(bn("bn10")(x).astype(dt), (2, 1), strides=(2, 1))
        x = nn.relu(x)
        # Stage 4: -> 4 x W/4
        x = nn.Conv(128, (3, 3), padding=p1, dtype=dt, name="conv13")(x)
        x = nn.relu(x)
        x = nn.Conv(128, (3, 3), padding=p1, use_bias=False, dtype=dt, name="conv15")(x)
        x = nn.max_pool(bn("bn16")(x).astype(dt), (2, 1), strides=(2, 1))
        x = nn.relu(x)
        # Stage 5: 2x2 conv with pad 1 -> 5 x (W/4 + 1), then avg-pool height
        x = nn.Conv(128, (2, 2), padding=p1, use_bias=False, dtype=dt, name="conv19")(x)
        x = bn("bn20")(x).astype(dt)
        x = nn.avg_pool(x, (4, 1), strides=(4, 1))  # -> [N, 1, T, 128]

        # Collapse height into features: [N, T, C*H] with channel-major order
        # (the reference reshapes NCHW -> WN(CH); H is 1 so this is just C).
        n, h, t, c = x.shape
        x = x.transpose(0, 2, 3, 1).reshape(n, t, c * h)

        # Recurrent head: fp32 gates/state; matmul operand dtype follows the
        # model unless pinned (the reference pins its GRU to fp32).
        gru_dt = self.gru_dtype if self.gru_dtype is not None else self.dtype
        x = BiGRU(
            self.gru_hidden,
            self.gru_layers,
            compute_dtype=gru_dt,
            backend=self.gru_backend,
            name="gru",
        )(x)

        x = nn.Dense(self.n_classes, dtype=dt, name="output")(x.astype(dt))
        return nn.log_softmax(x.astype(jnp.float32), axis=-1)
