from .loss import StyleGAN2Loss, LossConfig
from .train_step import TrainStep, TrainState, make_optimizer, trainable_mask
