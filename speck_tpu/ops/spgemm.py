"""SpGEMM orchestrator: the TPU-native analogue of MultiplyspECKImplementation
(/root/reference/source/GPU/Multiply.cu:51-1122).

Pipeline stages (mirroring Multiply.cu's 9-stage structure; stage names match
include/Timings.h / Multiply.cu:1099-1113):

  1. analysis            (readOperations, Multiply.cu:245-252)   -> ops/analysis.py
  2. binning + grouping  (load balancer, :281-353)               -> ops/binning.py
  3. symbolic counting   (h_SpGEMMCountLauncher, :494-553)       -> ops/esc.py
  4. offset scan + alloc (cub ExclusiveSum + alloc C, :570-601)  -> cumsum + host sync
  5. numeric             (h_SpGEMMNumericLauncher, :837-1014)    -> ops/esc.py
  (no separate sort pass: rows are emitted sorted; no global hash maps: huge
   rows are just bigger static chunks)

Each bin is ONE scan-batched device dispatch (esc.py group kernels) — the
analogue of spECK's per-bin kernel launches on 6 streams, shaped for a
device that may sit behind a high-latency transport. Two host sync points
remain, exactly where the reference has D2H copies: after binning (bin
histogram; cf. the 8-byte sumProducts copy :249-252 and blockStarts readback
spECK_HashLoadBalancer.cuh:330-331) and after the offset scan (total nnz,
:572-575).

Beyond the reference:
  - when staging memory allows, counting and numeric are FUSED: one
    expand+sort yields both the counts and the compacted rows (staged, then
    emitted once offsets are known) — the two-phase pipeline re-iterates all
    products (Multiply.cu stages 7 and 13);
  - the symbolic result is reusable: ``plan_spgemm`` keeps the binning and
    row offsets so repeated multiplies with identical structure (AMG setup,
    graph contractions) skip analysis/counting entirely.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..utils.config import SpgemmConfig
from ..utils.timings import Timings, StageTimer
from .analysis import analyze
from .binning import Binning, ChunkGroup, bin_rows, plan_groups
from .device_csr import DeviceCSR
from .esc import (
    count_group,
    direct_group,
    emit_group,
    fused_group,
    numeric_group,
)


@dataclasses.dataclass
class SpgemmPlan:
    """Symbolic (structure) result of C = A @ B, reusable across numeric runs."""

    A: DeviceCSR
    B: DeviceCSR
    cfg: SpgemmConfig
    binning: Binning
    groups: List[ChunkGroup]
    row_offsets: jax.Array   # (m+1,) int32
    nnz: int
    sum_products: float
    # fused-pass staging: group index -> (counts (K,R), cols (K,R,cap),
    # vals (K,R,cap)) computed during planning (one expand/sort for both
    # phases); consumed by execute() on the planning operands
    staged: Dict[int, tuple] = dataclasses.field(default_factory=dict)

    @property
    def shape(self):
        return (self.A.shape[0], self.B.shape[1])

    def execute(
        self,
        A: Optional[DeviceCSR] = None,
        B: Optional[DeviceCSR] = None,
        timings: Optional[Timings] = None,
    ) -> DeviceCSR:
        """Numeric phase: fill C's values (and columns) at exact offsets.

        A/B may carry new ``data`` but must have the plan's structure.
        """
        use_staged = A is None and B is None
        A = self.A if A is None else A
        B = self.B if B is None else B
        m, n = self.shape
        track = timings is not None and timings.measure_all
        c_cols = jnp.zeros((max(self.nnz, 1),), jnp.int32)
        c_vals = jnp.zeros((max(self.nnz, 1),), A.data.dtype)
        with StageTimer(timings, "spGEMMNumeric", track) as st:
            for i, g in enumerate(self.groups):
                if use_staged and i in self.staged:
                    counts, cols_c, vals_c = self.staged[i]
                    c_cols, c_vals = emit_group(
                        self.binning.rows_sorted, g.starts, g.valids,
                        counts, cols_c, vals_c,
                        self.row_offsets, c_cols, c_vals,
                        chunk_rows=g.rows, cap=g.cap,
                    )
                elif g.direct:
                    c_cols, c_vals = direct_group(
                        self.binning.rows_sorted, g.starts, g.valids,
                        A.indptr, A.indices, A.data,
                        B.indptr, B.indices, B.data,
                        self.row_offsets, c_cols, c_vals,
                        chunk_rows=g.rows, cap=g.cap,
                    )
                else:
                    c_cols, c_vals = numeric_group(
                        self.binning.rows_sorted, g.starts, g.valids,
                        A.indptr, A.indices, A.data,
                        B.indptr, B.indices, B.data,
                        self.row_offsets, c_cols, c_vals,
                        chunk_rows=g.rows, cap=g.cap, n_cols=n,
                    )
            st.stop(c_cols, c_vals)
        return DeviceCSR(
            indptr=self.row_offsets,
            indices=c_cols,
            data=c_vals,
            shape=(m, n),
            nnz=self.nnz,
        )


@jax.jit
def _offsets_from_counts(nnz_row: jax.Array) -> jax.Array:
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nnz_row)]
    )


def plan_spgemm(
    A: DeviceCSR,
    B: DeviceCSR,
    cfg: Optional[SpgemmConfig] = None,
    timings: Optional[Timings] = None,
) -> SpgemmPlan:
    """Analysis + binning + symbolic counting: everything up to (and
    including) C's row offsets."""
    if A.shape[1] != B.shape[0]:
        raise ValueError(
            f"dimension mismatch: A is {A.shape}, B is {B.shape}"
        )
    cfg = cfg or SpgemmConfig()
    m, n = A.shape[0], B.shape[1]
    track = timings is not None and timings.measure_all

    with StageTimer(timings, "countProducts", track) as st:
        stats = analyze(A, B)
        st.stop(stats.row_ops)

    with StageTimer(timings, "loadBalanceCounting", track):
        # direct-copy bins require canonical B (see ops/binning.py docstring)
        direct_ok = bool(B.canonical) and cfg.enable_direct
        binning = bin_rows(stats, cfg, direct_ok)  # includes the histogram sync
        groups = plan_groups(binning, cfg)

    with StageTimer(timings, "spGEMMCounting", track) as st:
        # direct/empty rows already counted by the analysis pass
        nnz_row = binning.nnz_init
        staged: Dict[int, tuple] = {}
        staging_left = cfg.fused_staging_budget
        for i, g in enumerate(groups):
            if g.direct:
                continue
            if g.staging_slots <= staging_left:
                # fused pass: one expand/sort yields counts AND the staged
                # compacted rows for execute() (skips the numeric re-expand)
                staging_left -= g.staging_slots
                nnz_row, staged[i] = fused_group(
                    binning.rows_sorted, g.starts, g.valids,
                    A.indptr, A.indices, A.data,
                    B.indptr, B.indices, B.data, nnz_row,
                    chunk_rows=g.rows, cap=g.cap, n_cols=n,
                )
            else:
                nnz_row = count_group(
                    binning.rows_sorted, g.starts, g.valids,
                    A.indptr, A.indices, B.indptr, B.indices, nnz_row,
                    chunk_rows=g.rows, cap=g.cap, n_cols=n,
                )
        st.stop(nnz_row)

    with StageTimer(timings, "allocC", track):
        row_offsets = _offsets_from_counts(nnz_row)
        nnz = int(row_offsets[-1])  # host sync (Multiply.cu:572-575)

    return SpgemmPlan(
        A=A, B=B, cfg=cfg, binning=binning, groups=groups,
        row_offsets=row_offsets, nnz=nnz,
        sum_products=float(stats.sum_products),
        staged=staged,
    )


def spgemm(
    A: DeviceCSR,
    B: DeviceCSR,
    cfg: Optional[SpgemmConfig] = None,
    timings: Optional[Timings] = None,
) -> DeviceCSR:
    """C = A @ B on device: exact two-phase SpGEMM with sorted rows.

    Public entry point; parity with spECK::MultiplyspECK
    (/root/reference/include/Multiply.h:15-19)."""
    import time

    track_complete = timings is not None and timings.measure_complete
    t0 = time.perf_counter()
    plan = plan_spgemm(A, B, cfg, timings)
    C = plan.execute(timings=timings)
    if track_complete:
        jax.block_until_ready(C.data)
        timings.add("complete", (time.perf_counter() - t0) * 1e3)
    return C
