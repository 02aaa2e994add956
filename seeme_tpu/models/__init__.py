from .denoiser import Denoiser
from .vae import MotionVae, reparameterize
