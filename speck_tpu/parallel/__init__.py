from .dist import (
    ShardedCSR,
    distributed_spgemm,
    make_row_mesh,
    mesh_spgemm_fixed_cap,
    partition_rows,
)
from .mesh_stream import (
    NeedsetStats,
    RowShards,
    balanced_row_ranges,
    mesh_stream_spgemm,
    mesh_stream_to_host_csr,
)
from .multihost import global_row_mesh, initialize, local_row_range

__all__ = [
    "ShardedCSR", "distributed_spgemm", "make_row_mesh",
    "mesh_spgemm_fixed_cap", "partition_rows",
    "NeedsetStats", "RowShards", "balanced_row_ranges",
    "mesh_stream_spgemm", "mesh_stream_to_host_csr",
    "initialize", "global_row_mesh", "local_row_range",
]
