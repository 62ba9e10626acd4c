from tq_tpu.parallel.mesh import make_mesh, local_mesh
from tq_tpu.parallel.pp import (
    make_pipeline_mesh,
    make_tr_block_fn,
    pipeline_apply,
)
from tq_tpu.parallel.sharding import (
    mlp_param_specs,
    batch_spec,
    shard_pytree,
)

__all__ = [
    "make_mesh",
    "local_mesh",
    "make_pipeline_mesh",
    "make_tr_block_fn",
    "pipeline_apply",
    "mlp_param_specs",
    "batch_spec",
    "shard_pytree",
]
