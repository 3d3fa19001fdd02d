"""Expand-sort-contract SpGEMM kernels (per-bin, fixed shapes).

TPU-native replacement for spECK's shared-memory hash-map kernels
(hashSpGEMMCount/Numeric and their single-row/direct/dense variants,
/root/reference/include/GPU/spECK_HashSpGEMM.cuh:39-1853, hash maps
include/HashMap.cuh). TPUs have no fine-grained atomics or efficient random
scatter, so instead of hashing, each chunk of rows is processed as a dense
rectangle of ``cap`` product slots per row:

  expand   — each row's intermediate products (colB, valA*valB) are gathered
             into a (rows, cap) rectangle: a branchless batched binary search
             over the row's cumulative B-row lengths finds the owning A-slot
             of each product (the analogue of spECK's threads-per-nnz
             striding, iterateMatrixCounting, spECK_HashSpGEMM.cuh:39-128).
  sort     — one batched lax.sort along the product axis groups duplicate
             column ids (replaces hash-probe insertion; output rows come out
             sorted for free, eliminating spECK's separate sorting kernel,
             spECK_HashSpGEMM.cuh:1857-1925).
  contract — run boundaries give exact per-row nnz (counting phase,
             hashSpGEMMCount analogue) and run sums give the numeric values
             (hashSpGEMMNumeric analogue) via segmented scans.

Counting and numeric are separate phases (exact allocation, no estimation),
exactly like the reference's two-phase pipeline (Multiply.cu stages 7 and
13) — but when staging memory allows, the fused kernel computes both from
ONE expand+sort (beyond-reference optimization).

All kernels here process a *group* of same-shape chunks in one dispatch via
``lax.scan`` over the chunk offsets: where spECK launches one CUDA grid per
bin on its own stream (Multiply.cu:494-553), the TPU build launches one
scan-batched jit per bin — essential when the device sits behind a
high-latency transport, and XLA pipelines the scan steps regardless.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _batched_searchsorted_right(cum: jax.Array, t: jax.Array) -> jax.Array:
    """Count of elements <= t per row: branchless batched binary search.

    cum: (R, W) nondecreasing per row; t: (1 or R, W) queries.
    Returns int32 (R, W) in [0, W]."""
    R, W = cum.shape
    t = jnp.broadcast_to(t, (R, W))
    lo = jnp.zeros((R, W), jnp.int32)
    hi = jnp.full((R, W), W, jnp.int32)
    for _ in range(max(1, (W).bit_length())):
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(cum, jnp.minimum(mid, W - 1), axis=1)
        go_right = v <= t
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def _expand(rows, valid_rows, a_indptr, a_indices, a_data,
            b_start, b_len, b_indices, b_data, cap: int, n_cols: int,
            with_values: bool):
    """Gather the (rows, cap) rectangle of intermediate products.

    B is described by per-row (start, length) arrays rather than an indptr so
    that gathered/padded B layouts (multi-device all_gather of row shards)
    work unchanged; for a plain CSR, b_start = indptr[:-1], b_len = diff.

    Returns (col, val, ops): col[r, t] is the B column id of product t of
    row r (or the sentinel ``n_cols`` when t >= ops[r]); val is the product
    valA*valB (0 beyond ops); ops is the live product count per row.
    """
    r = jnp.where(valid_rows, rows, 0)
    a0 = a_indptr[r]
    alen = jnp.where(valid_rows, a_indptr[r + 1] - a0, 0)

    j = jnp.arange(cap, dtype=jnp.int32)[None, :]
    va = j < alen[:, None]
    aidx = jnp.where(va, a0[:, None] + j, 0)
    acol = jnp.where(va, a_indices[aidx], 0)
    blen = jnp.where(va, b_len[acol], 0)
    cum = jnp.cumsum(blen, axis=1)                      # (R, cap)
    ops = cum[:, -1]

    t = j  # product slot index, broadcast over rows
    p = _batched_searchsorted_right(cum, t)             # owning A-slot
    pc = jnp.minimum(p, cap - 1)
    s_prev = jnp.where(
        p > 0, jnp.take_along_axis(cum, jnp.maximum(p - 1, 0), axis=1), 0
    )
    o = t - s_prev                                      # offset within B row
    valid_t = t < ops[:, None]
    acol_p = jnp.take_along_axis(acol, pc, axis=1)
    src = jnp.where(valid_t, b_start[acol_p] + o, 0)
    col = jnp.where(valid_t, b_indices[src], jnp.int32(n_cols))
    if with_values:
        aval_p = jnp.take_along_axis(jnp.where(va, a_data[aidx], 0), pc, axis=1)
        val = jnp.where(valid_t, aval_p * b_data[src], 0)
    else:
        val = None
    return col, val, ops


def _run_boundaries(col_s, n_cols: int):
    """first/last masks of equal-column runs of a sorted rectangle
    (sentinel ``n_cols`` runs excluded from ``last``)."""
    R = col_s.shape[0]
    prev = jnp.concatenate(
        [jnp.full((R, 1), -1, jnp.int32), col_s[:, :-1]], axis=1
    )
    nxt = jnp.concatenate(
        [col_s[:, 1:], jnp.full((R, 1), -2, jnp.int32)], axis=1
    )
    first = col_s != prev
    last = (col_s != nxt) & (col_s < n_cols)
    return first, last


def _seg_op(a, b):
    av, af = a
    bv, bf = b
    return jnp.where(bf, bv, av + bv), af | bf


def _run_sums(val_s, first):
    """Per-run sums at run-last positions: segmented inclusive scan
    restarting at each run boundary (numerically local — no cross-run
    cancellation). Replaces the hash-map atomic_add accumulation
    (HashMap.cuh:99-107)."""
    run_sum, _ = jax.lax.associative_scan(_seg_op, (val_s, first), axis=1)
    return run_sum


def _compact_by_rank(last, col_s, run_sum, cap: int):
    """Move run-last (col, sum) pairs to the front, order preserved: rank
    keys < cap for run-lasts, cap+t for the rest, then one key sort."""
    t = jnp.arange(cap, dtype=jnp.int32)[None, :]
    rank = jnp.cumsum(last.astype(jnp.int32), axis=1) - 1
    key = jnp.where(last, rank, cap + t)
    _, cols_c, vals_c = jax.lax.sort((key, col_s, run_sum), dimension=1, num_keys=1)
    return cols_c, vals_c


def _slice_chunk(rows_sorted, start, chunk_rows: int):
    rows = jax.lax.dynamic_slice_in_dim(rows_sorted, start, chunk_rows)
    return rows


# ---------------------------------------------------------------------------
# Group kernels: one dispatch per bin, lax.scan over same-shape chunks.
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=("chunk_rows", "cap", "n_cols"),
    donate_argnames=("nnz_row",),
)
def count_group(rows_sorted, starts, valids, a_indptr, a_indices,
                b_indptr, b_indices, nnz_row, *,
                chunk_rows: int, cap: int, n_cols: int):
    """Symbolic counting for a group of chunks: exact distinct-column count
    per row, scattered into the global nnz_row array.

    Analogue of spGEMMCountLauncher -> hashSpGEMMCountImplementation
    (spECK_HashSpGEMM.cuh:1797-1853, 919-1058); the occupancyPerRow hash-map
    writeout (:1005-1057) becomes a sorted-run boundary count.
    """
    m = nnz_row.shape[0]
    b_start = b_indptr[:-1]
    b_len = b_indptr[1:] - b_indptr[:-1]

    def step(nnz_row, sv):
        start, valid = sv
        rows = _slice_chunk(rows_sorted, start, chunk_rows)
        valid_rows = jnp.arange(chunk_rows, dtype=jnp.int32) < valid
        col, _, _ = _expand(
            rows, valid_rows, a_indptr, a_indices, None,
            b_start, b_len, b_indices, None, cap, n_cols, with_values=False,
        )
        col_s = jax.lax.sort(col, dimension=1)
        _, last = _run_boundaries(col_s, n_cols)
        counts = jnp.sum(last, axis=1, dtype=jnp.int32)
        target = jnp.where(valid_rows, rows, m)
        nnz_row = nnz_row.at[target].set(
            counts, mode="drop", unique_indices=True
        )
        return nnz_row, None

    nnz_row, _ = jax.lax.scan(step, nnz_row, (starts, valids))
    return nnz_row


@partial(
    jax.jit,
    static_argnames=("chunk_rows", "cap", "n_cols"),
    donate_argnames=("c_cols", "c_vals"),
)
def numeric_group(rows_sorted, starts, valids, a_indptr, a_indices, a_data,
                  b_indptr, b_indices, b_data, row_offsets, c_cols, c_vals,
                  *, chunk_rows: int, cap: int, n_cols: int):
    """Numeric accumulation for a group of chunks, written straight to the
    final CSR arrays at their exact offsets.

    Analogue of spGEMMNumericLauncher -> hashSpGEMMNumericImplementation
    (spECK_HashSpGEMM.cuh:1714-1794, 591-738): duplicate-column products are
    summed per run of the sorted rectangle and compacted directly into C via
    one masked scatter (replacing the compaction + counting-sort output
    stage, :693-737). Output columns are ascending per row by construction.
    """
    oob = c_cols.shape[0]
    b_start = b_indptr[:-1]
    b_len = b_indptr[1:] - b_indptr[:-1]

    def step(carry, sv):
        c_cols, c_vals = carry
        start, valid = sv
        rows = _slice_chunk(rows_sorted, start, chunk_rows)
        valid_rows = jnp.arange(chunk_rows, dtype=jnp.int32) < valid
        col, val, _ = _expand(
            rows, valid_rows, a_indptr, a_indices, a_data,
            b_start, b_len, b_indices, b_data, cap, n_cols, with_values=True,
        )
        col_s, val_s = jax.lax.sort((col, val), dimension=1, num_keys=1)
        first, last = _run_boundaries(col_s, n_cols)
        run_sum = _run_sums(val_s, first)
        # exact output slot: row_offsets[row] + rank of this run in the row
        out_rank = jnp.cumsum(last.astype(jnp.int32), axis=1) - 1
        r = jnp.where(valid_rows, rows, 0)
        flat = row_offsets[r][:, None] + out_rank
        flat = jnp.where(last & valid_rows[:, None], flat, oob)
        c_cols = c_cols.at[flat].set(col_s, mode="drop", unique_indices=True)
        c_vals = c_vals.at[flat].set(run_sum, mode="drop", unique_indices=True)
        return (c_cols, c_vals), None

    (c_cols, c_vals), _ = jax.lax.scan(step, (c_cols, c_vals), (starts, valids))
    return c_cols, c_vals


@partial(
    jax.jit,
    static_argnames=("chunk_rows", "cap", "n_cols"),
    donate_argnames=("nnz_row",),
)
def fused_group(rows_sorted, starts, valids, a_indptr, a_indices, a_data,
                b_indptr, b_indices, b_data, nnz_row, *,
                chunk_rows: int, cap: int, n_cols: int):
    """Single-pass count + numeric for a group of chunks: ONE expand + ONE
    sort produce both the exact per-row nnz (scattered into ``nnz_row``) and
    the compacted, column-sorted padded results (staged until the global
    offsets are known, then emitted by ``emit_group``).

    This halves the dominant expand/sort work relative to the reference's
    two-phase pipeline (Multiply.cu stages 7 and 13 both re-iterate all
    products); the trade is (chunks, rows, cap) staging memory, which the
    planner budgets (ops/spgemm.py) — oversized groups fall back to the
    two-phase count_group/numeric_group path.
    """
    m = nnz_row.shape[0]
    b_start = b_indptr[:-1]
    b_len = b_indptr[1:] - b_indptr[:-1]

    def step(nnz_row, sv):
        start, valid = sv
        rows = _slice_chunk(rows_sorted, start, chunk_rows)
        valid_rows = jnp.arange(chunk_rows, dtype=jnp.int32) < valid
        col, val, _ = _expand(
            rows, valid_rows, a_indptr, a_indices, a_data,
            b_start, b_len, b_indices, b_data, cap, n_cols, with_values=True,
        )
        col_s, val_s = jax.lax.sort((col, val), dimension=1, num_keys=1)
        first, last = _run_boundaries(col_s, n_cols)
        run_sum = _run_sums(val_s, first)
        counts = jnp.sum(last, axis=1, dtype=jnp.int32)
        target = jnp.where(valid_rows, rows, m)
        nnz_row = nnz_row.at[target].set(
            counts, mode="drop", unique_indices=True
        )
        cols_c, vals_c = _compact_by_rank(last, col_s, run_sum, cap)
        return nnz_row, (counts, cols_c, vals_c)

    nnz_row, staged = jax.lax.scan(step, nnz_row, (starts, valids))
    return nnz_row, staged


@partial(
    jax.jit,
    static_argnames=("chunk_rows", "cap"),
    donate_argnames=("c_cols", "c_vals"),
)
def emit_group(rows_sorted, starts, valids, counts, cols_c, vals_c,
               row_offsets, c_cols, c_vals, *, chunk_rows: int, cap: int):
    """Scatter a fused group's staged padded rows into the final CSR arrays
    at their exact offsets (pure masked scatter, no expand/sort).

    counts: (K, R); cols_c/vals_c: (K, R, cap) from fused_group."""
    oob = c_cols.shape[0]

    def step(carry, xs):
        c_cols, c_vals = carry
        start, valid, cnt, cc, vv = xs
        rows = _slice_chunk(rows_sorted, start, chunk_rows)
        valid_rows = jnp.arange(chunk_rows, dtype=jnp.int32) < valid
        r = jnp.where(valid_rows, rows, 0)
        t = jnp.arange(cap, dtype=jnp.int32)[None, :]
        live = (t < cnt[:, None]) & valid_rows[:, None]
        flat = jnp.where(live, row_offsets[r][:, None] + t, oob)
        c_cols = c_cols.at[flat].set(cc, mode="drop", unique_indices=True)
        c_vals = c_vals.at[flat].set(vv, mode="drop", unique_indices=True)
        return (c_cols, c_vals), None

    (c_cols, c_vals), _ = jax.lax.scan(
        step, (c_cols, c_vals), (starts, valids, counts, cols_c, vals_c)
    )
    return c_cols, c_vals


@partial(
    jax.jit,
    static_argnames=("chunk_rows", "cap"),
    donate_argnames=("c_cols", "c_vals"),
)
def direct_group(rows_sorted, starts, valids, a_indptr, a_indices,
                 a_data, b_indptr, b_indices, b_data, row_offsets,
                 c_cols, c_vals, *, chunk_rows: int, cap: int):
    """Numeric fill for single-A-nonzero rows: C row = valA * B row, already
    sorted — a pure gather + masked scatter, no expansion or sort.

    Analogue of directSpGEMMNumericImplementation
    (spECK_HashSpGEMM.cuh:543-569). Assumes B rows are canonical (sorted,
    no duplicate columns), like the reference's direct path.
    """
    oob = c_cols.shape[0]

    def step(carry, sv):
        c_cols, c_vals = carry
        start, valid = sv
        rows = _slice_chunk(rows_sorted, start, chunk_rows)
        valid_rows = jnp.arange(chunk_rows, dtype=jnp.int32) < valid
        r = jnp.where(valid_rows, rows, 0)
        p = a_indptr[r]                       # the row's single nonzero
        acol = a_indices[p]
        aval = a_data[p]
        b0 = b_indptr[acol]
        blen = b_indptr[acol + 1] - b0

        t = jnp.arange(cap, dtype=jnp.int32)[None, :]
        valid_t = (t < blen[:, None]) & valid_rows[:, None]
        src = jnp.where(valid_t, b0[:, None] + t, 0)
        cols = b_indices[src]
        vals = aval[:, None] * b_data[src]

        flat = jnp.where(valid_t, row_offsets[r][:, None] + t, oob)
        c_cols = c_cols.at[flat].set(cols, mode="drop", unique_indices=True)
        c_vals = c_vals.at[flat].set(vals, mode="drop", unique_indices=True)
        return (c_cols, c_vals), None

    (c_cols, c_vals), _ = jax.lax.scan(step, (c_cols, c_vals), (starts, valids))
    return c_cols, c_vals


# ---------------------------------------------------------------------------
# Fused one-shot kernel (uniform cap, no binning) — the SPMD/mesh building
# block and the driver entry's flagship fn.
# ---------------------------------------------------------------------------

def esc_fixed(a_indptr, a_indices, a_data, b_start, b_len, b_indices, b_data,
              *, cap: int, n_cols: int):
    """One-shot fused count+numeric over ALL rows at a single capacity.

    Scatter-free and fully jittable (no data-dependent allocation): returns
    (counts (m,), cols (m, cap), vals (m, cap)) where each row's first
    counts[r] slots hold the compacted, column-sorted result. Compaction uses
    a second key sort instead of a scatter, so the whole kernel is
    gather/sort/scan only — the shape XLA and a SPMD mesh want. This is the
    uniform-shape kernel used per shard by the distributed path
    (speck_tpu.parallel) and by __graft_entry__.entry().
    """
    m = a_indptr.shape[0] - 1
    rows = jnp.arange(m, dtype=jnp.int32)
    valid_rows = jnp.ones((m,), dtype=bool)
    col, val, _ = _expand(
        rows, valid_rows, a_indptr, a_indices, a_data,
        b_start, b_len, b_indices, b_data, cap, n_cols, with_values=True,
    )
    col_s, val_s = jax.lax.sort((col, val), dimension=1, num_keys=1)
    first, last = _run_boundaries(col_s, n_cols)
    run_sum = _run_sums(val_s, first)
    counts = jnp.sum(last, axis=1, dtype=jnp.int32)
    cols_c, vals_c = _compact_by_rank(last, col_s, run_sum, cap)
    return counts, cols_c, vals_c
