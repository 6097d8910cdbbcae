from mvlpt_tpu.train.optim import build_optimizer, build_lr_schedule
from mvlpt_tpu.train.train_step import (
    TrainState,
    init_train_state,
    make_train_step,
    make_eval_step,
    soft_cross_entropy,
    accuracy,
)
