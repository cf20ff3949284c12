from uniir_tpu.train.losses import inbatch_contrastive_loss, momentum_distill_contrastive_loss
from uniir_tpu.train.optimizer import make_blip_optimizer, make_clip_optimizer, cosine_schedule
from uniir_tpu.train.state import MomentumTrainState, TrainState
from uniir_tpu.train.steps import (
    make_blip_eval_step,
    make_blip_train_step,
    make_clip_eval_step,
    make_clip_train_step,
    make_embed_step,
)
from uniir_tpu.train.engine import eval_engine, train_one_epoch
