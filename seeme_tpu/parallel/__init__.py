from .mesh import batch_sharding, make_mesh, replicated, shard_batch, stacked_batch_sharding
from .mesh import allreduce_metric_sums, initialize_multihost
from .shardings import infer_param_shardings, shard_params
