from .collate import (
    collate_recognition,
    collate_detection,
    collate_layout,
    ctc_input_and_target_compatible,
)
from .loader import DataLoader
from .synthetic import SyntheticRecognition, SyntheticDetection, SyntheticLayout

__all__ = [
    "collate_recognition",
    "collate_detection",
    "collate_layout",
    "ctc_input_and_target_compatible",
    "DataLoader",
    "SyntheticRecognition",
    "SyntheticDetection",
    "SyntheticLayout",
]
