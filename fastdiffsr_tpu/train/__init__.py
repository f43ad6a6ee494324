from .state import TrainState, create_train_state
from .steps import (make_train_step, make_cached_train_step, make_sample_fn,
                    pad_batch_with_keys)

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_cached_train_step",
           "make_sample_fn", "pad_batch_with_keys"]
