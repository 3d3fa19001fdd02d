"""SpGEMM orchestrator: the TPU-native analogue of MultiplyspECKImplementation
(/root/reference/source/GPU/Multiply.cu:51-1122).

Pipeline stages (mirroring Multiply.cu's 9-stage structure; stage names match
include/Timings.h / Multiply.cu:1099-1113):

  1. analysis            (readOperations, Multiply.cu:245-252)   -> ops/analysis.py
  2. dense-tile planning (dense-mode heuristic, :379)            -> ops/dense.py
  3. binning + grouping  (load balancer, :281-353)               -> ops/binning.py
  4. symbolic counting   (h_SpGEMMCountLauncher, :494-553)       -> ops/esc.py
  5. offset scan + alloc (cub ExclusiveSum + alloc C, :570-601)  -> cumsum + host sync
  6. numeric             (h_SpGEMMNumericLauncher, :837-1014)    -> ops/esc.py
  (no separate sort pass: rows are emitted sorted; no global hash maps: huge
   rows are just bigger static chunks)

Chunks are dispatched from host loops — dispatches are asynchronous, so
their latency overlaps device work; only genuine host syncs (histogram,
tile stats, total nnz) block, exactly where the reference has D2H copies
(the 8-byte sumProducts copy :249-252, blockStarts readback
spECK_HashLoadBalancer.cuh:330-331, nnz readback :572-575).

Beyond the reference:
  - low-colrange row tiles run as dense matmuls on the MXU (ops/dense.py);
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
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import SpgemmConfig
from ..utils.timings import Timings, StageTimer
from .analysis import analyze, cumsum1d
from .binning import Binning, ChunkGroup, bin_caps, plan_groups
from .dense import dense_emit, dense_gather_emit, dense_tiles
from .plan_device import plan_device
from .device_csr import DeviceCSR
from .esc import (
    count_chunk,
    direct_chunk,
    emit_chunk,
    fused_chunk,
    numeric_chunk,
    pack_csr_arrays,
    pack_row_meta,
    packable,
)


def _pack_operands(A, B):
    """Interleaved (col id, value) records for gather-count halving
    (esc.pack_csr_arrays); None for non-32-bit value dtypes."""
    ap = pack_csr_arrays(A.indices, A.data) if packable(A.data) else None
    if B.indices is A.indices and B.data is A.data:
        bp = ap
    else:
        bp = pack_csr_arrays(B.indices, B.data) if packable(B.data) else None
    return ap, bp, pack_row_meta(B.indptr)


def _pow2(n: int) -> int:
    return 1 << (n - 1).bit_length() if n > 1 else 1


@dataclasses.dataclass(frozen=True)
class DenseGroup:
    """Dense-eligible MXU tiles (ops/dense.py), pre-sliced into dispatch
    batches: batch b covers tiles [boffs[b], boffs[b+1]) of the padded
    per-tile arrays (device-resident; only their count crossed to the
    host). Tile i covers rows [r0s[i], r0s[i] + valids[i])."""

    r0s: jax.Array
    kbases: jax.Array
    cbases: jax.Array
    valids: jax.Array
    boffs: List[int]
    tile_rows: int
    # effective window dims: fitted to the eligible tiles' actual spans
    # (rounded to a bounded class ladder) — the config values are only
    # eligibility ceilings. Sort/matmul cost scales with these.
    kw: int
    cw: int
    la: int
    lb: int
    # True iff EVERY row tile of the matrix is dense-eligible, so tile i
    # covers rows [i*tile_rows, ...) in order and staged row index ==
    # matrix row index (the gather-emit precondition). Not implied by
    # "no ESC groups": an all-empty tile is ineligible (cspan == 0) yet
    # contributes no groups either.
    full_cover: bool = False

    @property
    def staging_slots(self) -> int:
        return len(self.r0s) * self.tile_rows * self.cw

    def batches(self):
        for b in range(len(self.boffs) - 1):
            s, e = self.boffs[b], self.boffs[b + 1]
            yield (self.r0s[s:e], self.kbases[s:e],
                   self.cbases[s:e], self.valids[s:e])


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
    sum_products: jax.Array  # () device scalar; float() it lazily — every
    # device->host read through a remote transport is a potential stall
    # fused-pass staging: (group, chunk) -> (counts (R,), cols (R, cap),
    # vals (R, cap)) computed during planning (one expand/sort for both
    # phases); consumed by execute() on the planning operands
    staged: Dict[Tuple[int, int], tuple] = dataclasses.field(default_factory=dict)
    # MXU dense-tile batches (ops/dense.py) + their staged results
    dense: Optional["DenseGroup"] = None
    dense_staged: Optional[List[tuple]] = None
    max_count: int = 0  # max nnz of any C row (trims emit scatter widths)

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
        pk = None  # packed operands, built lazily for numeric recompute
        with StageTimer(timings, "spGEMMNumeric", track) as st:
            if self.dense is not None:
                d = self.dense
                # pure-dense fast path: every tile is dense-eligible
                # (full_cover) and no ESC/direct rows remain, so staged row
                # index == matrix row index across the batch sequence —
                # build C by gather instead of masked scatter
                pure = (
                    use_staged and self.dense_staged is not None
                    and not self.groups and d.full_cover and self.nnz > 0
                )
                if pure:
                    if len(self.dense_staged) == 1:
                        _, cols_c, vals_c = self.dense_staged[0]
                    else:
                        cols_c = jnp.concatenate(
                            [s[1].reshape(-1, d.cw)
                             for s in self.dense_staged])
                        vals_c = jnp.concatenate(
                            [s[2].reshape(-1, d.cw)
                             for s in self.dense_staged])
                    c_cols, c_vals = dense_gather_emit(
                        cols_c, vals_c, self.row_offsets,
                        tile_rows=d.tile_rows, cw=d.cw, m=m, nnz=self.nnz,
                    )
                    st.stop(c_cols, c_vals)
                    return DeviceCSR(
                        indptr=self.row_offsets, indices=c_cols,
                        data=c_vals, shape=(m, n), nnz=self.nnz,
                    )
                for bi, (r0s, kbs, cbs, valids) in enumerate(d.batches()):
                    if use_staged and self.dense_staged is not None:
                        counts, cols_c, vals_c = self.dense_staged[bi]
                    else:
                        # new operands: recompute tile values on the MXU
                        _, (counts, cols_c, vals_c) = dense_tiles(
                            r0s, kbs, cbs,
                            A.indptr, A.indices, A.data,
                            B.indptr, B.indices, B.data,
                            jnp.zeros((m,), jnp.int32),
                            tile_rows=d.tile_rows, kw=d.kw,
                            cw=d.cw, la=d.la, lb=d.lb,
                            m=m, k_dim=A.shape[1], n_cols=n,
                        )
                    c_cols, c_vals = dense_emit(
                        r0s, counts, cols_c, vals_c,
                        self.row_offsets, c_cols, c_vals,
                        tile_rows=d.tile_rows, cw=d.cw, m=m,
                        emit_cap=_pow2(self.max_count),
                    )
            for gi, g in enumerate(self.groups):
                for ci, (start, valid) in enumerate(zip(g.starts, g.valids)):
                    if valid == 0:
                        continue
                    if use_staged and (gi, ci) in self.staged:
                        counts, cols_c, vals_c = self.staged[(gi, ci)]
                        c_cols, c_vals = emit_chunk(
                            self.binning.rows_sorted, int(start), int(valid),
                            counts, cols_c, vals_c,
                            self.row_offsets, c_cols, c_vals,
                            chunk_rows=g.rows, cap=g.cap,
                            emit_cap=_pow2(self.max_count),
                        )
                    elif g.direct:
                        c_cols, c_vals = direct_chunk(
                            self.binning.rows_sorted, int(start), int(valid),
                            A.indptr, A.indices, A.data,
                            B.indptr, B.indices, B.data,
                            self.row_offsets, c_cols, c_vals,
                            chunk_rows=g.rows, cap=g.cap,
                        )
                    else:
                        if pk is None:
                            pk = _pack_operands(A, B)
                        c_cols, c_vals = numeric_chunk(
                            self.binning.rows_sorted, int(start), int(valid),
                            A.indptr, A.indices, A.data,
                            B.indptr, B.indices, B.data,
                            self.row_offsets, c_cols, c_vals,
                            pk[0], pk[1], pk[2],
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
def _offsets_from_counts(nnz_row: jax.Array):
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), cumsum1d(nnz_row)]
    )
    # nnz and max row count packed into one array -> ONE host fetch
    meta = jnp.stack([offs[-1], jnp.max(nnz_row, initial=0)])
    return offs, meta


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
        # one fused device pass computes dense-tile eligibility (spECK's
        # dense-mode heuristic, Multiply.cu:379), covered-row exclusion, and
        # the ESC bin histogram; ONE packed readback serves all host
        # decisions (every readback through a remote transport is a full
        # round trip)
        caps = bin_caps(cfg)
        nbins = len(caps)
        pad_to = max(1, cfg.product_budget // cfg.min_cap)
        direct_ok = bool(B.canonical) and cfg.enable_direct
        use_dense = bool(
            cfg.enable_dense and A.canonical and B.canonical
            and m > 0 and A.nnz > 0 and B.nnz > 0
        )
        tr = cfg.dense_tile_rows
        max_tiles = max(0, cfg.fused_staging_budget // (tr * cfg.dense_cw))
        rows_sorted, nnz_init, t_r0, t_kb, t_cb, t_valid, pack = plan_device(
            A.indptr, A.indices, B.indptr, B.indices,
            stats.row_ops, stats.a_len, stats.work,
            caps=tuple(caps), pad_to=pad_to, direct_ok=direct_ok,
            use_dense=use_dense and max_tiles > 0, tile_rows=tr,
            kw_max=cfg.dense_kw, cw_max=cfg.dense_cw,
            la_max=cfg.dense_la, lb_max=cfg.dense_lb,
            max_tiles=max_tiles, m=m,
        )
        pack_h = np.asarray(pack)  # the ONE planning host sync
        counts_h = pack_h[: 2 * nbins + 1]
        n_elig, kw_e, cw_e, la_e, lb_e = (int(x) for x in pack_h[2 * nbins + 1:])
        starts_h = np.zeros_like(counts_h)
        np.cumsum(counts_h[:-1], out=starts_h[1:])
        binning = Binning(rows_sorted=rows_sorted, bin_counts=counts_h,
                          bin_starts=starts_h, caps=caps, nnz_init=nnz_init)
        groups = plan_groups(binning, cfg)
        dense_grp = None
        if n_elig > 0:
            db = max(1, cfg.dense_tiles_per_dispatch)
            n_full, tail = divmod(n_elig, db)
            k = n_full * db + (_pow2(tail) if tail else 0)
            boffs = [i * db for i in range(n_full + 1)]
            if tail:
                boffs.append(k)
            if k > t_r0.shape[0]:
                padn = k - t_r0.shape[0]
                t_r0 = jnp.concatenate(
                    [t_r0, jnp.full((padn,), m, jnp.int32)])
                t_kb = jnp.concatenate([t_kb, jnp.zeros((padn,), jnp.int32)])
                t_cb = jnp.concatenate([t_cb, jnp.zeros((padn,), jnp.int32)])
                t_valid = jnp.concatenate(
                    [t_valid, jnp.zeros((padn,), jnp.int32)])

            def _ceil128(v):
                return max(128, -(-int(v) // 128) * 128)

            dense_grp = DenseGroup(
                r0s=t_r0[:k], kbases=t_kb[:k], cbases=t_cb[:k],
                valids=t_valid[:k], boffs=boffs, tile_rows=tr,
                kw=_ceil128(kw_e), cw=_ceil128(cw_e),
                la=_pow2(max(8, la_e)), lb=_pow2(max(8, lb_e)),
                full_cover=(n_elig == -(-m // tr)),
            )

    a_packed, b_packed, b_meta = _pack_operands(A, B)

    with StageTimer(timings, "spGEMMCounting", track) as st:
        # direct/empty rows already counted by the analysis pass
        nnz_row = binning.nnz_init
        staged: Dict[Tuple[int, int], tuple] = {}
        staging_left = cfg.fused_staging_budget
        dense_staged: Optional[List[tuple]] = None
        if dense_grp is not None:
            # dense tiles reserve their staging first; the pow2 padding of
            # the tile tail can push the reservation slightly past the
            # budget, so floor at 0 (ESC chunks then take the two-phase
            # path rather than fusing on a negative budget)
            staging_left = max(0, staging_left - dense_grp.staging_slots)
            dense_staged = []
            for r0s, kbs, cbs, _ in dense_grp.batches():
                nnz_row, st_b = dense_tiles(
                    r0s, kbs, cbs,
                    A.indptr, A.indices, A.data,
                    B.indptr, B.indices, B.data, nnz_row,
                    tile_rows=dense_grp.tile_rows, kw=dense_grp.kw,
                    cw=dense_grp.cw, la=dense_grp.la, lb=dense_grp.lb,
                    m=m, k_dim=A.shape[1], n_cols=n,
                )
                dense_staged.append(st_b)
        for gi, g in enumerate(groups):
            if g.direct:
                continue
            slots = g.rows * g.cap
            for ci, (start, valid) in enumerate(zip(g.starts, g.valids)):
                if valid == 0:
                    continue
                if slots <= staging_left:
                    # fused pass: one expand/sort yields counts AND the
                    # staged compacted rows (skips the numeric re-expand)
                    staging_left -= slots
                    nnz_row, staged[(gi, ci)] = fused_chunk(
                        binning.rows_sorted, int(start), int(valid),
                        A.indptr, A.indices, A.data,
                        B.indptr, B.indices, B.data, nnz_row,
                        a_packed, b_packed, b_meta,
                        chunk_rows=g.rows, cap=g.cap, n_cols=n,
                    )
                else:
                    nnz_row = count_chunk(
                        binning.rows_sorted, int(start), int(valid),
                        A.indptr, A.indices, B.indptr, B.indices, nnz_row,
                        a_packed, b_packed, b_meta,
                        chunk_rows=g.rows, cap=g.cap, n_cols=n,
                    )
        st.stop(nnz_row)

    with StageTimer(timings, "allocC", track):
        row_offsets, meta = _offsets_from_counts(nnz_row)
        nnz, max_count = (int(x) for x in np.asarray(meta))  # ONE host sync
        # (Multiply.cu:572-575); max_count trims emit widths

    return SpgemmPlan(
        A=A, B=B, cfg=cfg, binning=binning, groups=groups,
        row_offsets=row_offsets, nnz=nnz,
        sum_products=stats.sum_products,
        staged=staged, dense=dense_grp, dense_staged=dense_staged,
        max_count=max_count,
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
