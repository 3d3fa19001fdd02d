"""Multi-host (multi-controller) bootstrap.

The reference is single-GPU/single-process (SURVEY.md section 2.2); scaling
across hosts is new design. On a real TPU pod each host process calls
``initialize()`` once, then drives the binned pipeline for its own row
shard (``distributed_spgemm`` semantics) or participates in the SPMD
``mesh_spgemm_fixed_cap`` step; collectives ride ICI within a slice and DCN
across slices, scheduled by XLA.

This module is exercised for importability and argument handling only in
CI (no pod available); the mesh/shard_map execution path itself is tested
on a virtual 8-device CPU mesh (tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize JAX's distributed runtime (idempotent).

    With no arguments, relies on the TPU environment's auto-detection
    (JAX_COORDINATOR_ADDRESS etc.); explicit values override.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized -> keep going
        if "already" not in str(e).lower():
            raise


def global_row_mesh():
    """One-axis mesh over every device in the job (all hosts)."""
    from .dist import make_row_mesh

    return make_row_mesh(devices=jax.devices())


def local_row_range(m: int):
    """The contiguous row range this host owns under an even row partition
    of an m-row matrix across processes."""
    from .dist import partition_rows

    ranges = partition_rows(m, jax.process_count())
    return ranges[jax.process_index()]
