"""TPU-native OCR training + inference framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
robertknight/ocrs-models (reference at /root/reference): text detection
(U-Net semantic segmentation), text recognition (CRNN + CTC), and text
layout analysis (transformer over word boxes), trained on HierText with
data-parallel sharding over a ``jax.sharding.Mesh``.

Nothing here is a port: models are Flax modules in NHWC layout, the biGRU is
a ``lax.scan``, CTC loss/decode are first-party JAX (with Pallas fast paths),
and the OpenCV/Shapely/PIL geometry the reference leaned on is reimplemented
first-party (C++ with a numpy fallback).
"""

__version__ = "0.1.0"
