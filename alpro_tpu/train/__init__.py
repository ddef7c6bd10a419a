from alpro_tpu.train.optimizer import (
    build_optimizer,
    get_lr_schedule,
    warmup_linear,
    noam_schedule,
    multi_step_schedule,
)
from alpro_tpu.train.state import TrainState
from alpro_tpu.train.step import (
    make_retrieval_train_step,
    make_qa_train_step,
    make_pretrain_train_step,
    make_prompter_train_step,
    shard_step,
)
