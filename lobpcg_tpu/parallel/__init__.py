from lobpcg_tpu.parallel.mesh import ROWS, replicated, row_mesh, row_sharding
from lobpcg_tpu.parallel.sharding import (
    shard_array,
    shard_operator,
    shard_problem,
)
from lobpcg_tpu.parallel.spmd_bsr import ShardedBSROperator
from lobpcg_tpu.parallel.spmd_stencil import (
    SpmdLaplacian1D,
    stencil_matmat_spmd,
    use_spmd_stencils,
)

__all__ = [
    "ROWS",
    "row_mesh",
    "row_sharding",
    "replicated",
    "shard_array",
    "shard_operator",
    "shard_problem",
    "SpmdLaplacian1D",
    "ShardedBSROperator",
    "stencil_matmat_spmd",
    "use_spmd_stencils",
]
