"""Load-balanced row binning: rows -> kernel size classes.

TPU-native replacement for spECK's load balancer
(h_AssignHashSpGEMMBlocksToRowsOfSameSize[Operations],
/root/reference/include/GPU/spECK_HashLoadBalancer.cuh:265-347 and the
merge-scan prescanArrayKernelNew, scan_largearray_kernel.cuh:183-281):

- Each row is classified by work = max(ops, a_nnz) into a capacity ladder of
  ``num_bins`` power-of-``bin_growth`` classes (the analogue of spECK's 6
  kernel scales, RowLengthReaderKernelScale bit trick,
  spECK_HashLoadBalancer.cuh:49-68), plus power-of-2 "huge" levels above the
  ladder (the analogue of the global-memory-map fallback path) and an
  "empty" class for rows with zero products.
- Rows with exactly one A-nonzero get their own "direct" bin ladder (the
  analogue of the per-block direct method selection,
  spECK_HashSpGEMM.cuh:1761-1764,1829-1832): their C row is a scaled copy of
  one B row — no expansion or sort needed, and their nnz counts come free
  from the analysis pass. Used only when B is canonical (sorted columns, no
  duplicates), since a raw copy preserves duplicates the general path would
  merge; the reference's direct path makes the same assumption.
- Instead of a custom merge-scan emitting packed blockRanges, the TPU build
  sorts row ids by bin key (one lax.sort) so each bin is a contiguous slice
  of ``rows_sorted``; only the small per-bin histogram is synced to host.
- Chunking: each bin is processed in fixed-shape chunks of at most
  ``product_budget // cap`` rows (the analogue of spECK's shared-memory
  budgeting, Multiply.cu:103-134), bucketed to the bin population so
  compiled kernel shapes are stable across matrices.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import SpgemmConfig
from .analysis import AnalysisResult

# Huge-row levels above the ladder: cap doubles per level. 2^31 products is
# the per-row ceiling (int32 indexing): 65536 * 2^15 = 2^31.
MAX_HUGE_LEVELS = 15


def bin_caps(cfg: SpgemmConfig) -> List[int]:
    """Capacity per general bin: the ladder, then power-of-2 huge levels."""
    caps = list(cfg.caps)
    top = caps[-1]
    for lvl in range(1, MAX_HUGE_LEVELS + 1):
        caps.append(min(top * (2 ** lvl), 2**31 - 1))
    return caps


@dataclasses.dataclass(frozen=True)
class Binning:
    """Host-side view of the device binning result.

    Bin id layout: [0, n_general) general ESC bins keyed by work;
    [n_general, 2*n_general) direct-copy bins keyed by B-row length;
    2*n_general = empty rows."""

    rows_sorted: jax.Array      # (m + pad,) int32, grouped by bin, -1 padded
    bin_counts: np.ndarray      # (2*n_general + 1,) host ints
    bin_starts: np.ndarray      # offsets into rows_sorted
    caps: List[int]             # capacity per general bin
    nnz_init: jax.Array         # (m,) int32: exact counts for direct/empty rows, 0 else


def n_general_bins(cfg: SpgemmConfig) -> int:
    return cfg.num_bins + MAX_HUGE_LEVELS


@partial(jax.jit, static_argnames=("caps", "pad_to", "direct_ok"))
def _bin_rows_impl(work, row_ops, a_len, caps: Tuple[int, ...], pad_to: int,
                   direct_ok: bool, dense_mask=None):
    m = work.shape[0]
    nbins = len(caps)
    caps_arr = jnp.asarray(caps, dtype=jnp.int32)
    # general bin = first ladder/huge level with cap >= work
    bin_id = jnp.searchsorted(caps_arr, work, side="left").astype(jnp.int32)
    if direct_ok:
        # single-A-nnz rows: direct bin keyed by copy length (== row_ops)
        is_direct = (a_len == 1) & (row_ops > 0)
        if dense_mask is not None:
            is_direct = is_direct & ~dense_mask
        bin_id = jnp.where(is_direct, bin_id + nbins, bin_id)
    else:
        is_direct = jnp.zeros_like(work, dtype=bool)
    bin_id = jnp.where(work <= 0, jnp.int32(2 * nbins), bin_id)
    if dense_mask is not None:
        # rows covered by dense MXU tiles (ops/dense.py) are counted and
        # emitted there; park them in the ignored "empty" class
        bin_id = jnp.where(dense_mask, jnp.int32(2 * nbins), bin_id)
    # direct and empty rows have exact counts already (analysis pass)
    nnz_init = jnp.where(is_direct, row_ops, 0)

    row_ids = jnp.arange(m, dtype=jnp.int32)
    # group rows by bin with one stable sort (replaces the blockRange
    # merge-scan; rows stay ascending within each bin)
    bin_sorted, rows_sorted = jax.lax.sort(
        (bin_id, row_ids), dimension=0, num_keys=1, is_stable=True
    )
    counts = jnp.sum(
        bin_sorted[None, :] == jnp.arange(2 * nbins + 1, dtype=jnp.int32)[:, None],
        axis=1,
        dtype=jnp.int32,
    )
    pad = jnp.full((pad_to,), -1, dtype=jnp.int32)
    return jnp.concatenate([rows_sorted, pad]), counts, nnz_init


def bin_rows(stats: AnalysisResult, cfg: SpgemmConfig, direct_ok: bool = False,
             dense_mask=None) -> Binning:
    caps = bin_caps(cfg)
    # padding lets fixed-size chunk slices run past the bin end safely
    max_chunk_rows = max(1, cfg.product_budget // cfg.min_cap)
    rows_sorted, counts, nnz_init = _bin_rows_impl(
        stats.work, stats.row_ops, stats.a_len, tuple(caps), max_chunk_rows,
        direct_ok, dense_mask,
    )
    counts_h = np.asarray(counts)
    starts_h = np.zeros_like(counts_h)
    np.cumsum(counts_h[:-1], out=starts_h[1:])
    return Binning(
        rows_sorted=rows_sorted,
        bin_counts=counts_h,
        bin_starts=starts_h,
        caps=caps,
        nnz_init=nnz_init,
    )


@dataclasses.dataclass(frozen=True)
class ChunkGroup:
    """All same-shape chunks of one bin, dispatched as ONE scan-batched
    kernel: chunk c covers rows_sorted[starts[c] : starts[c]+rows] with the
    first valids[c] entries live, per-row product capacity ``cap``.

    The chunk count K is padded to a power of two (valid=0 padding steps) so
    compiled shapes stay on a bounded ladder across matrices — the analogue
    of spECK's canonical launch shapes (Multiply.cu:439-482)."""

    bin_id: int
    cap: int
    rows: int            # static rows per chunk
    starts: np.ndarray   # (K,) int32 offsets into rows_sorted
    valids: np.ndarray   # (K,) int32 live rows per chunk (0 = padding step)
    direct: bool = False

    @property
    def k(self) -> int:
        return len(self.starts)

    @property
    def staging_slots(self) -> int:
        return self.k * self.rows * self.cap


def _bucket_rows(count: int, full: int) -> int:
    """Chunk row count: the full budget-limited size for populous bins, else
    the next power of 4 >= count (bounded compile-shape ladder, <= 2x..4x
    row padding; the analogue of spECK's occupancy shift-up keeping launch
    shapes canonical, Multiply.cu:439-482)."""
    if count >= full:
        return full
    pow4 = 1 << (((count - 1).bit_length() + 1) // 2 * 2) if count > 1 else 1
    return max(1, min(full, pow4))


def _pow2_pad(n: int) -> int:
    return 1 << (n - 1).bit_length() if n > 1 else 1


def plan_groups(binning: Binning, cfg: SpgemmConfig) -> List[ChunkGroup]:
    """Split each populated bin into fixed-shape chunks, grouped per bin."""
    groups: List[ChunkGroup] = []
    nbins = len(binning.caps)
    for b in range(2 * nbins):  # the final histogram slot (empty rows) is skipped
        count = int(binning.bin_counts[b])
        if count == 0:
            continue
        direct = b >= nbins
        cap = binning.caps[b - nbins if direct else b]
        # direct chunks are pure copies (no cap^2 sort); allow more rows
        budget = cfg.product_budget * (4 if direct else 1)
        full = max(1, budget // cap)
        rows_per_chunk = _bucket_rows(count, full)
        n_chunks = math.ceil(count / rows_per_chunk)
        k = _pow2_pad(n_chunks)
        starts = np.zeros(k, np.int32)
        valids = np.zeros(k, np.int32)
        for c in range(n_chunks):
            starts[c] = int(binning.bin_starts[b]) + c * rows_per_chunk
            valids[c] = min(rows_per_chunk, count - c * rows_per_chunk)
        groups.append(
            ChunkGroup(bin_id=b, cap=cap, rows=rows_per_chunk,
                       starts=starts, valids=valids, direct=direct)
        )
    return groups
