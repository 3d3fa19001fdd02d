from .dist import (
    ShardedCSR,
    distributed_spgemm,
    make_row_mesh,
    mesh_spgemm_fixed_cap,
    partition_rows,
)
from .multihost import global_row_mesh, initialize, local_row_range

__all__ = [
    "ShardedCSR", "distributed_spgemm", "make_row_mesh",
    "mesh_spgemm_fixed_cap", "partition_rows",
    "initialize", "global_row_mesh", "local_row_range",
]
