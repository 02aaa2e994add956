from .denoiser import Denoiser
from .vae import MotionVae, reparameterize
from .egohmr import EgoHmr, EgoHmrConfig
from .prohmr import ProHMRConfig, ProHMRScene
from .seeme import SeeMeConfig, SeeMeSystem
