"""Pallas TPU kernels for the ESC contract stage.

The contract stage of the expand-sort-contract pipeline (ops/esc.py) turns a
column-sorted (rows, W) rectangle into run boundaries, per-run sums, and
per-row distinct counts — the analogue of spECK's hash-map occupancy
write-out and atomic accumulation (spECK_HashSpGEMM.cuh:1005-1057,
HashMap.cuh:99-107). As plain XLA this is ~15 elementwise passes (boundary
shifts + log2(W) Hillis-Steele doubling steps), each materializing a
(rows, W) intermediate to HBM. The Pallas kernel keeps the whole stage
resident in VMEM: one grid step loads a row-block once, runs every step
on-chip, and writes only the three results.

VMEM budget: a (BR, W) block with ~4 live f32/i32 buffers; BR is chosen so
BR * W * 16 bytes stays well under the ~16 MB core budget. Rows are
independent, so blocking along rows is exact. W above _MAX_W falls back to
the XLA path (ops/esc.py handles that).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:  # pallas import is safe on CPU (kernels run in interpret mode there)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

# widest rectangle the kernel keeps in VMEM; wider bins use the XLA path
_MAX_W = 2048
_BLOCK_BYTES = 1 * 1024 * 1024  # per-buffer block budget (~8 live buffers)


def contract_supported(W: int) -> bool:
    return _HAVE_PALLAS and W <= _MAX_W


def _block_rows(R: int, W: int) -> int:
    return max(1, min(R, 512, _BLOCK_BYTES // (4 * W)))


def _contract_kernel(n_cols: int, col_ref, val_ref, last_ref, sum_ref):
    # flags are carried as int32: Mosaic rejects some bool vector casts
    col = col_ref[:]
    val = val_ref[:]
    R, W = col.shape

    prev = jnp.concatenate(
        [jnp.full((R, 1), -1, jnp.int32), col[:, :-1]], axis=1
    )
    nxt = jnp.concatenate(
        [col[:, 1:], jnp.full((R, 1), -2, jnp.int32)], axis=1
    )
    first = jnp.where(col != prev, jnp.int32(1), jnp.int32(0))
    last = jnp.where((col != nxt) & (col < n_cols), jnp.int32(1),
                     jnp.int32(0))

    # segmented inclusive sums via Hillis-Steele doubling, all in VMEM
    v, f = val, first
    d = 1
    while d < W:
        v_s = jnp.concatenate([jnp.zeros_like(v[:, :d]), v[:, :-d]], axis=1)
        f_s = jnp.concatenate([jnp.ones_like(f[:, :d]), f[:, :-d]], axis=1)
        v = jnp.where(f > 0, v, v + v_s)
        f = jnp.maximum(f, f_s)
        d <<= 1

    last_ref[:] = last
    sum_ref[:] = v


def contract_divisible(R: int, W: int) -> bool:
    """Row count must split evenly into VMEM blocks (chunk shapes are
    power-of-two bucketed, so this holds on the hot paths)."""
    return contract_supported(W) and R % _block_rows(R, W) == 0


_STREAM_MAX_W = 8192


def _stream_block_rows(R: int, W: int) -> int:
    # ~6 live (br, W) f32/i32 planes; keep them well under the ~16 MB core
    return max(1, min(R, 64, (6 * 1024 * 1024) // (4 * W)))


def stream_contract_supported(R: int, W: int) -> bool:
    return (_HAVE_PALLAS and W <= _STREAM_MAX_W
            and R % _stream_block_rows(R, W) == 0)


def _stream_contract_kernel(n_cols: int, rid_ref, col_ref, val_ref,
                            last_ref, sum_ref):
    rid = rid_ref[:]
    col = col_ref[:]
    val = val_ref[:]
    R, W = col.shape
    changed = jnp.concatenate(
        [jnp.ones((R, 1), jnp.int32),
         jnp.where((col[:, 1:] != col[:, :-1])
                   | (rid[:, 1:] != rid[:, :-1]),
                   jnp.int32(1), jnp.int32(0))], axis=1)
    nxt = jnp.concatenate([changed[:, 1:], jnp.ones((R, 1), jnp.int32)],
                          axis=1)
    last = jnp.where((nxt > 0) & (col < n_cols), jnp.int32(1), jnp.int32(0))
    v, f = val, changed
    d = 1
    while d < W:
        v_s = jnp.concatenate([jnp.zeros_like(v[:, :d]), v[:, :-d]], axis=1)
        f_s = jnp.concatenate([jnp.ones_like(f[:, :d]), f[:, :-d]], axis=1)
        v = jnp.where(f > 0, v, v + v_s)
        f = jnp.maximum(f, f_s)
        d <<= 1
    last_ref[:] = last
    sum_ref[:] = v


@partial(jax.jit, static_argnames=("n_cols",))
def stream_contract_runs(rid_s: jax.Array, col_s: jax.Array,
                         val_s: jax.Array, n_cols: int):
    """(run-last mask, per-run sums) of (rid, col)-sorted rectangle rows,
    VMEM-resident: the stream analogue of ``contract_runs`` with the row
    channel in the boundary predicate. Semantically identical to
    stream._contract_rect (same doubling order)."""
    R, W = col_s.shape
    br = _stream_block_rows(R, W)
    interpret = jax.default_backend() != "tpu"
    last8, sums = pl.pallas_call(
        partial(_stream_contract_kernel, n_cols),
        grid=(R // br,),
        in_specs=[
            pl.BlockSpec((br, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((br, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, W), jnp.int32),
            jax.ShapeDtypeStruct((R, W), val_s.dtype),
        ],
        interpret=interpret,
    )(rid_s, col_s, val_s)
    return last8 > 0, sums


@partial(jax.jit, static_argnames=("n_cols",))
def contract_runs(col_s: jax.Array, val_s: jax.Array, n_cols: int):
    """(run-last mask, per-run sums at run-last positions) of a
    column-sorted rectangle, as one VMEM-resident Pallas pass.

    Semantically and numerically identical to esc._run_boundaries +
    esc._run_sums (same doubling order).
    """
    R, W = col_s.shape
    br = _block_rows(R, W)
    grid = (R // br,)
    interpret = jax.default_backend() != "tpu"
    last8, sums = pl.pallas_call(
        partial(_contract_kernel, n_cols),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((br, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, W), jnp.int32),
            jax.ShapeDtypeStruct((R, W), val_s.dtype),
        ],
        interpret=interpret,
    )(col_s, val_s)
    return last8 > 0, sums
