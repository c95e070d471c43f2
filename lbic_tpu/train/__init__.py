from lbic_tpu.train.losses import train_rd_loss, train_d_loss, valid_rd_loss
from lbic_tpu.train.step import (
    TrainState,
    init_state,
    make_train_step,
    make_eval_step,
    make_optimizer,
    get_lr,
    set_lr,
)
from lbic_tpu.train.plateau import ReduceLROnPlateau
