from .build import build_system, load_smpl_or_synthetic, seeme_config_from_yaml
from .loader import Config, deep_merge, flatten, load_config, load_yaml, resolve_interpolations, save_config
from .registry import get_component, instantiate_from_config, register_component
