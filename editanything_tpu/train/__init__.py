from editanything_tpu.train.controlnet_train import (
    TrainState,
    make_train_step,
    init_train_state,
)
# runnable finetune programs (lazy-import heavy deps inside):
#   train.train_controlnet.main / train.train_dreambooth.main /
#   train.train_ti.main — also exposed as CLI subcommands (apps/cli.py)
