from .train_state import TrainState
from .events import EventStorage
from .eval_loop import inference_on_dataset

__all__ = ["TrainState", "EventStorage", "inference_on_dataset"]
