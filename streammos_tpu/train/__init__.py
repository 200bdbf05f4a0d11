from streammos_tpu.train.optim import (TSEnsemble, build_optimizer,
                                       build_schedule)
from streammos_tpu.train.trainer import (TrainState, create_train_state,
                                         make_eval_step, make_train_step)

__all__ = [
    "build_optimizer",
    "build_schedule",
    "TSEnsemble",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
