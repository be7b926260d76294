from .text import (
    encode_text,
    decode_text,
    ctc_greedy_decode_text,
    ctc_greedy_decode_batch,
    levenshtein,
)
from .image import transform_image, untransform_image

__all__ = [
    "encode_text",
    "decode_text",
    "ctc_greedy_decode_text",
    "ctc_greedy_decode_batch",
    "levenshtein",
    "transform_image",
    "untransform_image",
]
