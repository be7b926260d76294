from .torch_import import (
    import_detection_state_dict,
    import_recognition_state_dict,
    import_layout_state_dict,
)

__all__ = [
    "import_detection_state_dict",
    "import_recognition_state_dict",
    "import_layout_state_dict",
]
