from .onnx_graph import (
    build_detection_onnx,
    build_layout_onnx,
    build_recognition_onnx,
)
from .torch_import import (
    import_detection_state_dict,
    import_layout_state_dict,
    import_recognition_state_dict,
)

__all__ = [
    "import_detection_state_dict",
    "import_recognition_state_dict",
    "import_layout_state_dict",
    "build_detection_onnx",
    "build_recognition_onnx",
    "build_layout_onnx",
]
