"""Multi-device SpGEMM: row-partitioned A over a device mesh.

The reference is single-GPU (SURVEY.md §2.2); this layer is new design per
BASELINE.json's north star: A row-partitioned across devices, B row shards
exchanged with XLA collectives over ICI, C row-partitioned.

Two execution paths:

1. ``mesh_spgemm_fixed_cap`` — one jitted ``shard_map`` over a Mesh:
   per-device A row block, B row-sharded; B shards are exchanged with
   ``jax.lax.all_gather`` (ICI), then each device runs the uniform-shape
   fused ESC kernel on its rows. Fully SPMD (static shapes everywhere), the
   path the driver's multichip dryrun compiles. Per-row capacity is the
   global work bound, so this is the "correctness-first replicated-compute
   shape" — the binned path below is the fast one.

2. ``distributed_spgemm`` — per-device *independent* pipelines: each device
   gets its A row slice and runs the full binned single-device pipeline
   (analysis/binning/count/numeric) on its own rows. With B replicated there
   is no cross-device dependency, so per-device shapes may differ freely and
   all dispatches overlap; this matches how a multi-controller deployment
   drives one pipeline per host. Returns a ShardedCSR (per-device row
   ranges + local CSR).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.csr import HostCSR
from ..ops.device_csr import DeviceCSR, device_get_csr, device_put_csr
from ..ops.esc import esc_fixed
from ..ops.spgemm import spgemm
from ..utils.config import SpgemmConfig

ROW_AXIS = "rows"


def make_row_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ROW_AXIS,))


def partition_rows(m: int, n_shards: int) -> List[Tuple[int, int]]:
    """Contiguous row ranges, balanced to within one row."""
    base, rem = divmod(m, n_shards)
    out = []
    start = 0
    for d in range(n_shards):
        size = base + (1 if d < rem else 0)
        out.append((start, start + size))
        start += size
    return out


@dataclasses.dataclass
class ShardedCSR:
    """C row-partitioned across devices: per-shard local CSR + row ranges."""

    row_ranges: List[Tuple[int, int]]
    shards: List[DeviceCSR]
    shape: Tuple[int, int]

    @property
    def nnz(self) -> int:
        return sum(s.nnz for s in self.shards)

    def to_host(self) -> HostCSR:
        offs = [np.zeros(1, np.int64)]
        cols = []
        vals = []
        base = 0
        for s in self.shards:
            h = device_get_csr(s)
            offs.append(np.asarray(h.row_offsets[1:], np.int64) + base)
            base += h.nnz
            cols.append(h.col_ids)
            vals.append(h.data)
        return HostCSR(
            rows=self.shape[0],
            cols=self.shape[1],
            row_offsets=np.concatenate(offs),
            col_ids=np.concatenate(cols) if cols else np.zeros(0, np.int64),
            data=np.concatenate(vals) if vals else np.zeros(0),
        )


def _slice_rows(a: HostCSR, r0: int, r1: int) -> HostCSR:
    """Host row-slice with rebased offsets."""
    o0, o1 = int(a.row_offsets[r0]), int(a.row_offsets[r1])
    return HostCSR(
        rows=r1 - r0,
        cols=a.cols,
        row_offsets=np.asarray(a.row_offsets[r0:r1 + 1], np.int64) - o0,
        col_ids=a.col_ids[o0:o1],
        data=a.data[o0:o1],
    )


def distributed_spgemm(
    a: HostCSR,
    b: HostCSR,
    devices: Optional[Sequence] = None,
    cfg: Optional[SpgemmConfig] = None,
    dtype=jnp.float32,
) -> ShardedCSR:
    """Row-partitioned SpGEMM with per-device independent binned pipelines
    (B replicated per device)."""
    devices = list(devices if devices is not None else jax.devices())
    cfg = cfg or SpgemmConfig()
    ranges = partition_rows(a.rows, len(devices))
    shards: List[DeviceCSR] = []
    for dev, (r0, r1) in zip(devices, ranges):
        A_d = device_put_csr(_slice_rows(a, r0, r1), dtype=dtype, device=dev)
        B_d = device_put_csr(b, dtype=dtype, device=dev)
        shards.append(spgemm(A_d, B_d, cfg))
    return ShardedCSR(row_ranges=ranges, shards=shards, shape=(a.rows, b.cols))


# ---------------------------------------------------------------------------
# SPMD mesh path: one jitted shard_map step with an ICI all_gather of B.
# ---------------------------------------------------------------------------

def _pad_to(x: np.ndarray, size: int, fill=0) -> np.ndarray:
    out = np.full((size,), fill, dtype=x.dtype)
    out[: x.shape[0]] = x
    return out


def stack_row_shards(a: HostCSR, n_shards: int, dtype=jnp.float32):
    """Stack per-shard padded CSR arrays: (D, m_loc+1), (D, nnz_max), ...

    Shards are ceil-sized (m_loc = ceil(m / D)) so that global row k sits at
    padded position k exactly (shard k // m_loc, slot k % m_loc); pad rows
    (global index >= m) are empty. This identity layout is what lets the
    gathered B shards be indexed by A's global column ids directly.
    Nonzeros are padded to the max shard nnz (pad column id 0, value 0 —
    never referenced because pad rows are empty)."""
    m_loc = max(1, -(-a.rows // n_shards))
    ranges = [
        (min(d * m_loc, a.rows), min((d + 1) * m_loc, a.rows))
        for d in range(n_shards)
    ]
    slices = [_slice_rows(a, r0, r1) for r0, r1 in ranges]
    nnz_max = max((s.nnz for s in slices), default=0)
    nnz_max = max(nnz_max, 1)
    indptr = np.stack([
        _pad_to(np.asarray(s.row_offsets, np.int32), m_loc + 1, fill=int(s.nnz))
        for s in slices
    ])
    indices = np.stack([
        _pad_to(np.asarray(s.col_ids, np.int32), nnz_max) for s in slices
    ])
    data = np.stack([
        _pad_to(np.asarray(s.data, np.dtype(dtype)), nnz_max) for s in slices
    ])
    return indptr, indices, data, ranges


def mesh_spgemm_fixed_cap(
    a: HostCSR,
    b: HostCSR,
    mesh: Mesh,
    cap: Optional[int] = None,
    dtype=jnp.float32,
):
    """C = A @ B as ONE jitted SPMD step over ``mesh``.

    .. deprecated:: round 5
        LEGACY round-1 path, retired from the dryrun surface and kept
        only for its tests: the global fixed row cap makes every row
        pay the widest row's rectangle (documented skew explosion).
        Use ``parallel.mesh_stream.mesh_stream_spgemm`` — the stream
        formulation with tight packing, the wide-row ladder, k-split
        and need-set exchange.

    A and B are row-sharded over the mesh axis; each device all_gathers the
    B row shards (the collective rides ICI on a real slice), then runs the
    uniform fused ESC kernel on its local A rows. Returns
    (counts (m,), cols (m, cap), vals (m, cap)) sharded by rows — a padded
    row-major CSR precursor (counts -> offsets on host if a packed CSR is
    needed).
    """
    if a.cols != b.rows:
        raise ValueError(f"dimension mismatch: A is {a.shape}, B is {b.shape}")
    D = mesh.devices.size
    n_cols = b.cols
    if cap is None:
        # global per-row work bound (analysis on host; the device analysis
        # pass is used by the binned single-device path)
        a_len = np.diff(a.row_offsets)
        b_len_h = np.diff(b.row_offsets)
        ops = np.zeros(a.rows, np.int64)
        np.add.at(ops, np.repeat(np.arange(a.rows), a_len), b_len_h[a.col_ids])
        work = int(max(np.maximum(ops, a_len).max(initial=0), 1))
        cap = 1 << (work - 1).bit_length() if work > 1 else 1

    ai, ax, ad, _ = stack_row_shards(a, D, dtype)
    bi, bx, bd, _ = stack_row_shards(b, D, dtype)
    k_loc = bi.shape[1] - 1
    bnnz_max = bx.shape[1]

    def step(ai, ax, ad, bi, bx, bd):
        # local blocks arrive with a leading shard dim of 1
        ai, ax, ad = ai[0], ax[0], ad[0]
        # exchange B row shards over ICI (lax.all_gather inside shard_map)
        g_indptr = jax.lax.all_gather(bi[0], ROW_AXIS)    # (D, k_loc+1)
        g_indices = jax.lax.all_gather(bx[0], ROW_AXIS).reshape(-1)
        g_data = jax.lax.all_gather(bd[0], ROW_AXIS).reshape(-1)
        base = jnp.arange(D, dtype=jnp.int32)[:, None] * bnnz_max
        b_start = (g_indptr[:, :-1] + base).reshape(-1)   # (D*k_loc,)
        b_len = (g_indptr[:, 1:] - g_indptr[:, :-1]).reshape(-1)
        counts, cols, vals = esc_fixed(
            ai, ax, ad, b_start, b_len, g_indices, g_data,
            cap=cap, n_cols=n_cols,
        )
        return counts[None], cols[None], vals[None]

    sharded = jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS),
                      P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS)),
            out_specs=(P(ROW_AXIS), P(ROW_AXIS), P(ROW_AXIS)),
        )
    )
    put = lambda x: jax.device_put(x, NamedSharding(mesh, P(ROW_AXIS)))
    counts, cols, vals = sharded(put(ai), put(ax), put(ad), put(bi), put(bx), put(bd))
    # flatten shard dim: (D, m_loc, ...) -> (D*m_loc, ...); trailing pad rows
    # of each shard have count 0
    return (
        counts.reshape(-1),
        cols.reshape(-1, cap),
        vals.reshape(-1, cap),
    )


def padded_to_host_csr(counts, cols, vals, m: int, n: int) -> HostCSR:
    """Convert the mesh path's padded row-major output (identity row layout,
    pad rows at the tail) to a HostCSR."""
    counts = np.asarray(counts)[:m]
    cols = np.asarray(cols)[:m]
    vals = np.asarray(vals)[:m]
    offsets = np.zeros(m + 1, np.int64)
    np.cumsum(counts.astype(np.int64), out=offsets[1:])
    width = cols.shape[1] if cols.ndim == 2 else 0
    mask = np.arange(width)[None, :] < counts[:, None]
    return HostCSR(
        rows=m,
        cols=n,
        row_offsets=offsets,
        col_ids=cols[mask],
        data=vals[mask],
    )
