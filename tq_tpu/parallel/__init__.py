from tq_tpu.parallel.mesh import make_mesh, local_mesh
from tq_tpu.parallel.sharding import (
    mlp_param_specs,
    batch_spec,
    shard_pytree,
)

__all__ = [
    "make_mesh",
    "local_mesh",
    "mlp_param_specs",
    "batch_spec",
    "shard_pytree",
]
