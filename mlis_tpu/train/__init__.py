from mlis_tpu.train.trainer import (  # noqa: F401
    TrainState,
    VPRTrainer,
    nt_xent_loss,
    make_train_step,
)
