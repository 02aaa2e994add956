from .batch import host_to_device, stack_examples, validate_batch
from .synthetic import SyntheticEgoDataset
from .egobody import EgoBodyDataModule
from .registry import SyntheticDataModule, get_datamodule, register_dataset
from .humanml import HumanML3DDataModule, SyntheticT2MDataset
