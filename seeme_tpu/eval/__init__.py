from .metrics import EgoMetric, ego_sequence_metrics, interactee_mpjpe
from .stats import get_metric_statistics
from .t2m_metrics import MMMetrics, MRMetrics, TM2TMetrics
from .action_classifier import MotionDiscriminator
from .stgcn import STGCN
from .action_metrics import ActionMetrics, UncondMetrics
from .ape_ave import ApeAveMetrics
