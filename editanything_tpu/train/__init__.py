from editanything_tpu.train.controlnet_train import (
    TrainState,
    make_train_step,
    init_train_state,
)
