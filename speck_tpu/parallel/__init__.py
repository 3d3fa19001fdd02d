from .dist import (
    ShardedCSR,
    distributed_spgemm,
    make_row_mesh,
    mesh_spgemm_fixed_cap,
    partition_rows,
)

__all__ = [
    "ShardedCSR", "distributed_spgemm", "make_row_mesh",
    "mesh_spgemm_fixed_cap", "partition_rows",
]
