from .sampling import ddim_sample, ddim_sample_with_trajectory, ddpm_sample
from .schedulers import DiffusionSchedule, make_betas, snr
