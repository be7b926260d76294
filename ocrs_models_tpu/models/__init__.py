from .detection import DetectionModel
from .recognition import RecognitionModel
from .layout import LayoutModel

__all__ = ["DetectionModel", "RecognitionModel", "LayoutModel"]
