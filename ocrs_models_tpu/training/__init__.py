from .state import TrainState, create_train_state
from . import steps

__all__ = ["TrainState", "create_train_state", "steps"]
