from .losses import LossWeights, diffusion_losses, kl_standard_normal, mse, smooth_l1, vae_losses, x0_losses
from .loop import (
    make_eval_sample_step,
    make_gather_scan_train_step,
    make_scan_train_step,
    make_train_step,
    run_epoch,
    run_epoch_device,
)
from .state import STAGE_TRAINABLE, TrainState, create_train_state, make_optimizer, step_lr_schedule
