from .gru import BiGRU
from .ctc import ctc_loss, ctc_loss_forward
from .losses import balanced_cross_entropy_loss, weighted_bce_with_logits

__all__ = [
    "BiGRU",
    "ctc_loss",
    "ctc_loss_forward",
    "balanced_cross_entropy_loss",
    "weighted_bce_with_logits",
]
