from .denoiser import Denoiser
from .vae import MotionVae, reparameterize
from .egohmr import EgoHmr, EgoHmrConfig
from .prohmr import ProHMRConfig, ProHMRScene
from .seeme import SeeMeConfig, SeeMeSystem
from .t2m import T2MConfig, T2MSystem
from .text_encoder import ClipTextEncoder
from .a2m import A2MConfig, A2MSystem
