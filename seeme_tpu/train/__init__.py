from .losses import LossWeights, diffusion_losses, kl_standard_normal, mse, smooth_l1, vae_losses, x0_losses
from .loop import make_eval_sample_step, make_train_step, run_epoch
from .state import STAGE_TRAINABLE, TrainState, create_train_state, make_optimizer, step_lr_schedule
