from .mesh import batch_sharding, make_mesh, replicated, shard_batch
from .mesh import initialize_multihost
from .shardings import infer_param_shardings, shard_params
