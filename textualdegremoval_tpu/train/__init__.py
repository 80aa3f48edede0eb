from textualdegremoval_tpu.train.trainer import (
    TrainState,
    build_optimizer,
    make_train_step,
    make_eval_step,
)

__all__ = ["TrainState", "build_optimizer", "make_train_step", "make_eval_step"]
