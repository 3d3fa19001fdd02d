"""SPMD mesh SpGEMM on the flat product stream.

Replaces the fixed-cap shard_map path's global per-row capacity (which
paid the widest row's rectangle on every row of every shard) with the
stream formulation: each shard runs the full stream pipeline on its local
A rows -- planning sort, tight packing, (G, W) chunks, sort/contract,
device-side offsets, emission into a padded output -- entirely inside ONE
jitted ``shard_map``. Per-shard working memory is bounded by the chunk
budget (G*W slots), NOT by max-row-work times rows, so skewed matrices
shard cleanly.

The rectangle width W is raised to cover the widest row of any shard (no
merge levels inside SPMD -- a wide row just becomes a few whole rectangle
rows of one chunk); G shrinks correspondingly, so memory stays
~product_budget regardless of skew.

B exchange over the mesh axis (ICI on a real slice):

- ``exchange="allgather"``: every shard gathers all B row shards
  (jax.lax.all_gather), then indexes rows directly -- the correctness
  baseline.
- ``exchange="needset"``: the host computes, per (dst, src) shard pair,
  exactly which B rows dst needs (the per-partition generalization of the
  reference's per-row column-range analysis, toRowColMinMax,
  /root/reference/include/common.cuh:303-319); the rows' (col, val)
  records move in D-1 round-robin ``jax.lax.ppermute`` rounds (round r:
  src s -> dst (s+r)%D), each round padded only to ITS OWN largest pair —
  self-need is a local gather (zero communication) and all-empty rounds
  are skipped outright. A's column ids are pre-remapped to
  received-buffer slots on the host. meta["stats"] reports the
  exchanged-bytes reduction vs all_gather.

The reference is single-GPU (SURVEY.md §2.2); this layer is new design
per the BASELINE.json north star.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.csr import HostCSR
from ..ops.analysis import cumsum1d
from ..ops.esc import pack_csr_arrays
from ..ops.stream import (_plan_stream_impl, _pow2ceil, stream_chunk,
                          stream_emit, tight_total_host)
from ..utils.config import SpgemmConfig
from .dist import ROW_AXIS, _slice_rows, stack_row_shards


def _host_row_ops(a: HostCSR, b_len: np.ndarray) -> np.ndarray:
    alen = np.diff(a.row_offsets)
    ops = np.zeros(a.rows, np.int64)
    np.add.at(ops, np.repeat(np.arange(a.rows), alen),
              b_len[np.asarray(a.col_ids, np.int64)])
    return ops


@dataclasses.dataclass
class NeedsetStats:
    """Communication-volume accounting for the need-set exchange."""

    allgather_bytes: int   # (col, val) bytes every shard receives via all_gather
    needset_bytes: int     # padded (col, val) bytes exchanged per shard
    pairs_nnz: np.ndarray  # (D, D) true nnz needed dst<-src

    @property
    def reduction(self) -> float:
        return self.allgather_bytes / max(self.needset_bytes, 1)


def _make_shard_body(cfg: SpgemmConfig, m_loc: int, W: int, G: int,
                     n_chunks: int, out_cap: int, n_cols: int):
    """The per-shard stream pipeline (traced inside shard_map): analysis,
    planning, chunked count+stage, device-side offsets, emission."""
    CP = G * W

    def shard_body(ai, ax, ad, b_start, b_len, b_packed):
        blen_a = b_len[ax]
        cse = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), cumsum1d(blen_a)])
        row_ops = cse[ai[1:]] - cse[ai[:-1]]
        stream_mask = row_ops > 0
        no_direct = jnp.zeros((m_loc,), bool)
        a32 = jax.lax.bitcast_convert_type(ad, jnp.int32)
        (rows_sorted, e, q_sorted, el, ops_sorted, p0, su, sa, src, pend,
         _) = _plan_stream_impl(
            row_ops, stream_mask, no_direct, ai, ax, a32, b_start, b_len,
            min_q=cfg.stream_min_q, m=m_loc, tight=True, w_fixed=W)
        nnz_row = jnp.zeros((m_loc,), jnp.int32)
        rowend = jnp.where(q_sorted > 0, e + ops_sorted, -1)
        zero = jnp.int32(0)
        staged = []
        for c in range(n_chunks):
            cs = jnp.int32(c * CP)
            nnz_row, stg = stream_chunk(
                rows_sorted, e, rowend, q_sorted, el, ops_sorted, p0,
                su, sa, pend, b_packed, b_packed[:, 0], ad, ad, src,
                nnz_row, cs,
                jnp.searchsorted(e, cs).astype(jnp.int32),
                jnp.searchsorted(p0, cs).astype(jnp.int32),
                G=G, W=W, n_cols=n_cols, pack_bits=0, stage=True,
                f64=False)
            staged.append(stg)
        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), cumsum1d(nnz_row)])
        c_cols = jnp.zeros((out_cap,), jnp.int32)
        c_vals = jnp.zeros((out_cap,), jnp.float32)
        for stg in staged:
            c_cols, c_vals = stream_emit(
                rows_sorted, stg[0], stg[1], stg[2], stg[3], zero,
                offs, c_cols, c_vals, contained_only=True)
        return nnz_row[None], c_cols[None], c_vals[None]

    return shard_body


def mesh_stream_spgemm(
    a: HostCSR,
    b: HostCSR,
    mesh: Mesh,
    cfg: Optional[SpgemmConfig] = None,
    exchange: str = "allgather",
):
    """C = A @ B as ONE jitted SPMD step over ``mesh`` (see module
    docstring). Returns (nnz_row, cols, vals, meta): padded row-major
    per-shard outputs; assemble with ``mesh_stream_to_host_csr``."""
    if a.cols != b.rows:
        raise ValueError(f"dimension mismatch: A is {a.shape}, B is {b.shape}")
    if exchange not in ("allgather", "needset"):
        raise ValueError(f"unknown exchange mode {exchange!r}")
    cfg = cfg or SpgemmConfig()
    D = mesh.devices.size
    n_cols = b.cols

    ai_h, ax_h, ad_h, a_ranges = stack_row_shards(a, D, jnp.float32)
    m_loc = ai_h.shape[1] - 1
    b_len_h = np.diff(np.asarray(b.row_offsets, np.int64))

    # per-shard stream shape parameters (host analysis; SPMD needs one
    # static shape across shards). W covers the widest row of any shard
    # (no merge levels inside SPMD); the per-shard totals use the exact
    # host twin of the device's tight layout (stream.tight_total_host).
    min_q = cfg.stream_min_q
    max_ops, shard_ops = min_q, []
    for r0, r1 in a_ranges:
        ops = _host_row_ops(_slice_rows(a, r0, r1), b_len_h)
        if ops.size and int(ops.max(initial=0)) > 2 ** 30:
            raise ValueError(
                f"row with {int(ops.max())} products exceeds the 2^30 "
                "per-row int32 ceiling (shard rows {r0}:{r1})")
        shard_ops.append(ops)
        if ops.size:
            max_ops = max(max_ops, int(ops.max(initial=min_q)))
    W = max(cfg.stream_width, _pow2ceil(max_ops))
    total_qs = []
    for (r0, r1), ops in zip(a_ranges, shard_ops):
        total_qs.append(tight_total_host(ops, W, min_q))
        if total_qs[-1] >= 2 ** 31:
            raise ValueError(
                f"shard rows {r0}:{r1} pack to {total_qs[-1]} stream "
                "slots, past the 2^31 int32 ceiling; use more shards")
    G = max(1, cfg.product_budget // W)
    CP = G * W
    n_chunks = max(1, -(-max(total_qs + [1]) // CP))
    out_cap = _pow2ceil(max(total_qs + [1]))
    body = _make_shard_body(cfg, m_loc, W, G, n_chunks, out_cap, n_cols)

    def put(x):
        # make_array_from_callback works identically under one controller
        # and under multi-process (jax.distributed): every process holds
        # the same full host array and each only materializes the shards
        # its local devices own (addressable-shard assembly).
        x = np.asarray(x)
        sh = NamedSharding(mesh, P(ROW_AXIS))
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    stats = None

    if exchange == "allgather":
        bi_h, bx_h, bd_h, _ = stack_row_shards(b, D, jnp.float32)
        bnnz_max = bx_h.shape[1]

        def step(ai, ax, ad, bi, bx, bd):
            ai, ax, ad = ai[0], ax[0], ad[0]
            g_indptr = jax.lax.all_gather(bi[0], ROW_AXIS)   # (D, k_loc+1)
            g_packed = jax.lax.all_gather(
                pack_csr_arrays(bx[0], bd[0]), ROW_AXIS).reshape(-1, 2)
            base = jnp.arange(D, dtype=jnp.int32)[:, None] * bnnz_max
            b_start = (g_indptr[:, :-1] + base).reshape(-1)
            b_len = (g_indptr[:, 1:] - g_indptr[:, :-1]).reshape(-1)
            return body(ai, ax, ad, b_start, b_len, g_packed)

        sharded = jax.jit(jax.shard_map(
            step, mesh=mesh, in_specs=(P(ROW_AXIS),) * 6,
            out_specs=(P(ROW_AXIS),) * 3))
        nnz_row, cols, vals = sharded(
            put(ai_h), put(ax_h), put(ad_h), put(bi_h), put(bx_h),
            put(bd_h))
    else:
        # ---- need-set exchange plan (host numpy) ----
        k_loc = max(1, -(-b.rows // D))
        b_off = np.asarray(b.row_offsets, np.int64)
        # need set per dst shard: unique B rows referenced by its A cols
        needs: List[np.ndarray] = []
        for r0, r1 in a_ranges:
            sl = _slice_rows(a, r0, r1)
            needs.append(np.unique(np.asarray(sl.col_ids, np.int64)))
        pair_rows = [[nd[(nd // k_loc) == s] for s in range(D)]
                     for nd in needs]
        pair_nnz = np.array([[int(b_len_h[pr].sum()) for pr in row]
                             for row in pair_rows])
        # round r moves pairs src -> dst=(src+r)%D; round 0 is the local
        # self-need (no communication). Each round pads to its own max.
        round_nnz = [int(_pow2ceil(max(1, max(
            pair_nnz[(s + r) % D, s] for s in range(D)))))
            if max(pair_nnz[(s + r) % D, s] for s in range(D)) > 0 else 0
            for r in range(D)]
        seg_off = np.concatenate([[0], np.cumsum(round_nnz)])
        RB_total = int(seg_off[-1])

        # per-round send gather plan (src-local nnz positions) and, per
        # dst, the received-buffer (start, len) of every needed row
        send_idx = [np.zeros((D, round_nnz[r]), np.int64)
                    for r in range(D)]
        send_valid = [np.zeros((D, round_nnz[r]), bool) for r in range(D)]
        P_rows = int(_pow2ceil(max(1, max(len(pr) for row in pair_rows
                                          for pr in row))))
        RB = D * P_rows
        rb_start = np.zeros((D, RB), np.int32)
        rb_len = np.zeros((D, RB), np.int32)
        ax_remap = np.array(ax_h)
        for src in range(D):
            for r in range(D):
                dst = (src + r) % D
                rows = pair_rows[dst][src]
                lens = b_len_h[rows]
                nz = int(lens.sum())
                if nz:
                    pos = np.concatenate(
                        [np.arange(b_off[q], b_off[q + 1]) for q in rows])
                    send_idx[r][src, :nz] = pos - b_off[src * k_loc]
                    send_valid[r][src, :nz] = True
        for dst in range(D):
            lut = np.zeros(b.rows, np.int64)
            for src in range(D):
                r = (dst - src) % D
                rows = pair_rows[dst][src]
                lens = b_len_h[rows]
                starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
                slots = src * P_rows + np.arange(len(rows))
                rb_start[dst, slots] = seg_off[r] + starts
                rb_len[dst, slots] = lens
                lut[rows] = slots
            ax_remap[dst] = lut[np.asarray(ax_h[dst], np.int64)]

        _, bx_h, bd_h, _ = stack_row_shards(b, D, jnp.float32)
        perms = [[(s, (s + r) % D) for s in range(D)] for r in range(D)]

        def step(ai, axr, ad, bx, bd, rbs, rbl, *sends):
            ai, axr, ad = ai[0], axr[0], ad[0]
            packed = pack_csr_arrays(bx[0], bd[0])
            segs = []
            si = 0
            for r in range(D):
                if round_nnz[r] == 0:
                    continue
                sidx, sval = sends[2 * si][0], sends[2 * si + 1][0]
                si += 1
                payload = packed[jnp.clip(sidx, 0, packed.shape[0] - 1)]
                payload = jnp.where(sval[:, None], payload, 0)
                if r == 0:
                    segs.append(payload)        # self-need: no comm
                else:
                    segs.append(jax.lax.ppermute(payload, ROW_AXIS,
                                                 perms[r]))
            b_packed = (jnp.concatenate(segs) if segs
                        else jnp.zeros((1, 2), jnp.int32))
            return body(ai, axr, ad, rbs[0], rbl[0], b_packed)

        live_sends = []
        for r in range(D):
            if round_nnz[r] == 0:
                continue
            live_sends.append(put(send_idx[r].astype(np.int32)))
            live_sends.append(put(send_valid[r]))
        n_in = 7 + len(live_sends)
        sharded = jax.jit(jax.shard_map(
            step, mesh=mesh, in_specs=(P(ROW_AXIS),) * n_in,
            out_specs=(P(ROW_AXIS),) * 3))
        nnz_row, cols, vals = sharded(
            put(ai_h), put(ax_remap), put(ad_h), put(bx_h), put(bd_h),
            put(rb_start), put(rb_len), *live_sends)
        stats = NeedsetStats(
            # per-shard volume actually moved over the interconnect:
            # all_gather replicates all of B's (col, val) records; the
            # need-set rounds move only the padded non-self rounds
            allgather_bytes=int(b.nnz) * 8,
            needset_bytes=int(sum(round_nnz[1:])) * 8,
            pairs_nnz=pair_nnz,
        )

    meta = {"ranges": a_ranges, "out_cap": out_cap, "m_loc": m_loc,
            "shape": (a.rows, b.cols), "stats": stats}
    return nnz_row, cols, vals, meta


def _fetch_global(x) -> np.ndarray:
    """Fetch a possibly non-fully-addressable sharded array to host.
    Under multi-process (jax.distributed) every process gets the full
    logical array via an all-gather over hosts; single-controller this
    is a plain device fetch."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def mesh_stream_to_host_csr(nnz_row, cols, vals, meta) -> HostCSR:
    """Assemble the padded per-shard outputs into one HostCSR (every
    process gets the full matrix; see _fetch_global)."""
    m, n = meta["shape"]
    m_loc, out_cap = meta["m_loc"], meta["out_cap"]
    nnz_row = _fetch_global(nnz_row).reshape(-1, m_loc)
    cols = _fetch_global(cols).reshape(-1, out_cap)
    vals = _fetch_global(vals).reshape(-1, out_cap)
    parts_c, parts_v, counts = [], [], []
    for d, (r0, r1) in enumerate(meta["ranges"]):
        cnt = nnz_row[d][: r1 - r0]
        tot = int(cnt.sum())
        parts_c.append(cols[d][:tot])
        parts_v.append(vals[d][:tot])
        counts.append(cnt)
    cnt_all = np.concatenate(counts) if counts else np.zeros(0, np.int64)
    offsets = np.zeros(m + 1, np.int64)
    if cnt_all.shape[0]:
        np.cumsum(cnt_all, out=offsets[1:1 + cnt_all.shape[0]])
        offsets[1 + cnt_all.shape[0]:] = offsets[cnt_all.shape[0]]
    return HostCSR(
        rows=m, cols=n, row_offsets=offsets,
        col_ids=(np.concatenate(parts_c) if parts_c
                 else np.zeros(0, np.int64)),
        data=(np.concatenate(parts_v) if parts_v else np.zeros(0)),
    )
