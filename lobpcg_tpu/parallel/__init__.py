from lobpcg_tpu.parallel.mesh import ROWS, replicated, row_mesh, row_sharding
from lobpcg_tpu.parallel.sharding import (
    shard_array,
    shard_operator,
    shard_problem,
)

__all__ = [
    "ROWS",
    "row_mesh",
    "row_sharding",
    "replicated",
    "shard_array",
    "shard_operator",
    "shard_problem",
]
